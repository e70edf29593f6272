"""Exact distributed quantiles, Misra-Gries heavy hitters, BM25."""

import numpy as np
import pandas as pd
import pytest

from pdf_to_text_ray.stages.quantiles import _rank_for, exact_quantiles
from pdf_to_text_ray.stages.sketches import (
    heavy_hitter_tokens, mg_summary, tokenize_ascii)


def _quantile_disc_ref(vals: np.ndarray, q: float) -> float:
    s = np.sort(vals)
    return float(s[_rank_for(q, len(s))])


QS = [0.0, 0.01, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]


@pytest.mark.parametrize("case", ["uniform", "lognormal", "plateau", "ints"])
def test_exact_quantiles_matches_sorted_rank(ray_session, case):
    import ray.data as rd

    rng = np.random.RandomState(11)
    if case == "uniform":
        vals = rng.uniform(-50, 50, 20_000)
    elif case == "lognormal":
        vals = rng.lognormal(3, 2, 20_000)
    elif case == "plateau":
        # 90% identical value → degenerate-interval termination path
        vals = np.concatenate([np.full(18_000, 7.25),
                               rng.uniform(0, 10, 2_000)])
        rng.shuffle(vals)
    else:
        vals = rng.randint(0, 40, 20_000).astype(np.float64)

    ds = rd.from_pandas(pd.DataFrame({"x": vals})).repartition(8)
    # tiny buckets/cap force several refinement rounds
    out = exact_quantiles(ds, "x", QS, n_buckets=16, collect_cap=64)
    expect = [_quantile_disc_ref(vals, q) for q in QS]
    assert out["q"].tolist() == QS
    assert out["value"].tolist() == expect


def test_exact_quantiles_empty_and_single(ray_session):
    import ray.data as rd

    out = exact_quantiles(
        rd.from_pandas(pd.DataFrame({"x": [42.0]})), "x", [0.5])
    assert out["value"].tolist() == [42.0]
    out = exact_quantiles(
        rd.from_pandas(pd.DataFrame({"x": pd.Series([], dtype="float64")})),
        "x", [0.5])
    assert np.isnan(out["value"].iloc[0])


def test_exact_group_quantiles(ray_session):
    import ray.data as rd

    from pdf_to_text_ray.stages.quantiles import exact_group_quantiles

    rng = np.random.RandomState(2)
    n = 12_000
    groups = rng.choice(["a", "b", "c"], n, p=[0.7, 0.2, 0.1])
    vals = np.where(groups == "a", rng.lognormal(2, 1, n),
                    rng.uniform(-5, 5, n))
    df = pd.DataFrame({"g": groups, "x": vals})
    ds = rd.from_pandas(df).repartition(6)
    out = exact_group_quantiles(ds, "g", "x", [0.25, 0.5, 0.9],
                                n_buckets=16, collect_cap=64)
    assert out["g"].tolist() == ["a", "b", "c"]
    for g in "abc":
        gv = df.loc[df["g"] == g, "x"].to_numpy()
        row = out[out["g"] == g].iloc[0]
        for q, cname in [(0.25, "q_25"), (0.5, "q_50"), (0.9, "q_90")]:
            assert row[cname] == _quantile_disc_ref(gv, q), (g, q)


def test_mg_summary_guarantee():
    rng = np.random.RandomState(3)
    # zipf-ish stream: frequent items must survive trimming
    stream = [f"t{int(z)}" for z in rng.zipf(1.5, 50_000) if z < 1000]
    from collections import Counter

    exact = Counter(stream)
    n = len(stream)
    cap = 64
    s = mg_summary(dict(exact), cap)
    assert len(s) <= cap
    for tok, cnt in exact.items():
        if cnt > n / cap:
            assert tok in s, f"frequent item {tok} ({cnt}) dropped"
        # MG estimate never overcounts and undercounts by ≤ n/cap
        if tok in s:
            assert s[tok] <= cnt
            assert cnt - s[tok] <= n / cap + 1


def test_heavy_hitters_exact_topk(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(5)
    vocab = [f"w{i}" for i in range(500)]
    weights = 1.0 / np.arange(1, 501)
    weights /= weights.sum()
    docs = [" ".join(rng.choice(vocab, size=60, p=weights))
            for _ in range(300)]
    ds = rd.from_pandas(pd.DataFrame({"text": docs})).repartition(6)
    out = heavy_hitter_tokens(ds, k=15, capacity=256)

    from collections import Counter

    exact = Counter(t for d in docs for t in tokenize_ascii(d))
    expect = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    assert list(zip(out["token"], out["cnt"])) == expect


def test_quantile_sketch_rank_error(ray_session):
    import ray.data as rd

    from pdf_to_text_ray.stages.sketches import approx_quantiles

    rng = np.random.RandomState(8)
    vals = np.concatenate([rng.lognormal(1, 2, 60_000),
                           rng.uniform(-100, 0, 40_000)])
    ds = rd.from_pandas(pd.DataFrame({"x": vals})).repartition(10)
    qs = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    est = approx_quantiles(ds, "x", qs, size=512)
    s = np.sort(vals)
    for q, e in zip(qs, est):
        rank = np.searchsorted(s, e, side="right") / len(s)
        assert abs(rank - q) <= 0.01, (q, e, rank)


def test_bm25_term_scores_reference(ray_session):
    import ray.data as rd

    from pdf_to_text_ray.stages.analysis import bm25_term_scores

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["cat dog cat", "dog bird", "fish fish fish cat", "bird"],
    })
    out = bm25_term_scores(rd.from_pandas(docs).repartition(2),
                           ["cat", "fish"], k1=1.2, b=0.75)
    # df: cat=2, fish=1; N=4; avgdl=(3+2+4+1)/4=2.5
    n, avgdl = 4, 2.5

    def score(tf, df, dl, k1=1.2, b=0.75):
        idf = np.log((n - df + 0.5) / (df + 0.5) + 1)
        return round(idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl)), 6)

    expect = pd.DataFrame({
        "doc_id": [1, 3, 3],
        "term": ["cat", "cat", "fish"],
        "score": [score(2, 2, 3), score(1, 2, 4), score(3, 1, 4)],
    })
    pd.testing.assert_frame_equal(out, expect, check_dtype=False)


def test_member_mask_matches_clip_binning_at_edges():
    """Refinement membership must equal the set each histogram COUNTED:
    np.clip puts an ulp-below-lo value in bucket 0 and an ulp-above-hi
    value in bucket B-1, so the mask must include both edge cases —
    bounded by the full ancestor chain, not admitted globally."""
    import numpy as np

    from pdf_to_text_ray.stages.quantiles import _member_mask

    plo = 0.1 + 0.2              # 0.30000000000000004
    width = (1.0 - plo) / 4
    v = np.array([0.3, plo, 0.5, 1.0 - 1e-17, 2.0])
    ok = np.ones(len(v), bool)
    idx_clip = np.clip(np.floor((v - plo) / width), 0, 3)
    for pb in range(4):
        m = _member_mask(v, ok, plo, 1.0, ((plo, width, pb, 4),))
        assert m.tolist() == (idx_clip == pb).tolist(), pb
    # chained: the idx<0 case of an inner level must stay bounded by
    # the outer level's bucket — a value below BOTH levels is excluded
    outer = (0.0, 0.25, 1, 4)    # bucket [0.25, 0.5)
    inner_lo = np.nextafter(0.25, 1.0)
    inner = (inner_lo, 0.0625, 0, 4)
    vv = np.array([0.05, 0.25, 0.26, 0.4])
    m = _member_mask(vv, np.ones(4, bool), 0.0, 1.0, (outer, inner))
    # 0.05 is below the outer bucket → excluded even though its inner
    # idx is negative; 0.25 floors to -1 inside the inner level by an
    # ulp but was clip-counted in inner bucket 0 → included
    assert m.tolist() == [False, True, True, False]
