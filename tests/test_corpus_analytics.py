"""Unit tests for the corpus-analytics queries (bigram PMI, per-doc
lexical richness, per-source token entropy) against hand-computed
values on a tiny constructed documents table."""
import math

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pdf_to_text_ray.pipelines.queries import (
    bigram_pmi_top,
    doc_vocab_richness,
    source_token_entropy,
    user_activity_rollup,
)


@pytest.fixture()
def tiny_docs(tmp_path):
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["a b a b c", "a a a a", "b c"], pa.string()),
        "lang": pa.array(["en"] * 3, pa.string()),
        "source": pa.array(["s0", "s0", "s1"], pa.string()),
        "n_chars": pa.array([9, 7, 3], pa.int64()),
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    return str(tmp_path)


def test_doc_vocab_richness(ray_session, tiny_docs):
    out = (doc_vocab_richness(tiny_docs).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out["n_tokens"].tolist() == [5, 4, 2]
    assert out["n_distinct"].tolist() == [3, 1, 2]
    assert out["ttr"].tolist() == [3 / 5, 1 / 4, 1.0]


def test_bigram_pmi_values(ray_session, tiny_docs):
    out = bigram_pmi_top(tiny_docs, k=10, min_count=1)
    # bigrams: doc1 → ab, ba, ab, bc; doc2 → aa ×3; doc3 → bc.  N=8.
    # unigrams: a=6 b=3 c=2, T=11.
    got = {(r.w1, r.w2): (r.pair_count, r.pmi) for r in out.itertuples()}
    assert got[("a", "b")][0] == 2
    assert got[("a", "a")][0] == 3
    assert got[("b", "c")][0] == 2
    T, N = 11.0, 8.0
    exp = math.log((2 / N) / ((6 / T) * (3 / T)))
    assert got[("a", "b")][1] == pytest.approx(exp, rel=1e-12)
    exp_bc = math.log((2 / N) / ((3 / T) * (2 / T)))
    assert got[("b", "c")][1] == pytest.approx(exp_bc, rel=1e-12)
    # ranked by pmi desc: bc (ln 5.04...) above aa and ab
    assert out.iloc[0][["w1", "w2"]].tolist() == ["b", "c"]


def test_bigram_min_count_floor(ray_session, tiny_docs):
    out = bigram_pmi_top(tiny_docs, k=10, min_count=2)
    pairs = set(zip(out["w1"], out["w2"]))
    assert ("b", "a") not in pairs  # count 1 floored away
    assert {("a", "b"), ("a", "a"), ("b", "c")} == pairs


def test_source_token_entropy(ray_session, tiny_docs):
    out = source_token_entropy(tiny_docs)
    assert out["source"].tolist() == ["s0", "s1"]
    assert out["vocab"].tolist() == [3, 2]
    assert out["n_tokens"].tolist() == [9, 2]
    # s0: a=6 b=2 c=1 of 9; s1: b,c uniform → ln 2
    h0 = -sum(p * math.log(p) for p in (6 / 9, 2 / 9, 1 / 9))
    assert out["entropy"][0] == pytest.approx(round(h0, 6), abs=1e-9)
    assert out["entropy"][1] == pytest.approx(round(math.log(2), 6), abs=1e-9)


def test_containment_catches_inclusion_jaccard_misses(ray_session):
    import ray.data as rd

    from pdf_to_text_ray.stages.dedup import jaccard_neardup_pairs

    inner = " ".join(f"w{i}" for i in range(8))          # 4 word-5-grams
    outer = inner + " " + " ".join(f"x{i}" for i in range(40))
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array([inner, outer], pa.string())}))
    cont = jaccard_neardup_pairs(docs, threshold=0.9,
                                 metric="containment").to_pandas()
    assert cont["containment_sim"].tolist() == [1.0]     # A fully inside B
    jac = jaccard_neardup_pairs(docs, threshold=0.5).to_pandas()
    assert len(jac) == 0                                  # Jaccard misses it


def test_pca_matches_dense_numpy(ray_session):
    import numpy as np
    import ray.data as rd

    from pdf_to_text_ray.stages.similarity import pca_fit, pca_project

    rng = np.random.default_rng(7)
    # anisotropic cloud: variance concentrated along two known axes
    base = rng.normal(size=(300, 6))
    x = base * np.array([5.0, 3.0, 1.0, 0.5, 0.2, 0.1])
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(300), pa.int64()),
        "embedding": pa.array([r.tolist() for r in x],
                              pa.list_(pa.float32()))})).repartition(5)
    mean, comps, ev = pca_fit(ds, k=2)
    xf = x.astype(np.float32).astype(np.float64)  # fixture round-trip
    c = np.cov(xf, rowvar=False)
    w, v = np.linalg.eigh(c)
    dense = v[:, np.argsort(w)[::-1][:2]].T
    # same subspace up to sign
    for i in range(2):
        assert abs(abs(dense[i] @ comps[i])) == pytest.approx(1.0, abs=1e-9)
        assert ev[i] == pytest.approx(np.sort(w)[::-1][i], rel=1e-9)
    # sign pin: largest-|coeff| entry positive
    assert all(comps[i, np.abs(comps[i]).argmax()] > 0 for i in range(2))
    proj = (pca_project(ds, mean, comps).to_pandas()
            .sort_values("vec_id").reset_index(drop=True))
    expect = (xf - xf.mean(0)) @ comps.T
    assert np.allclose(proj[["pc1", "pc2"]].to_numpy(), expect, atol=1e-9)


def test_pca_fit_power_matches_eigh_subspace(ray_session):
    """pca_fit_power (the oracle-replayable fixed-iteration twin) finds
    the same leading subspace as the eigh-based pca_fit on a
    well-separated spectrum, and its projection is deterministic."""
    import numpy as np
    import ray.data as rd

    from pdf_to_text_ray.stages.similarity import (
        pca_fit, pca_fit_power, pca_project)

    rng = np.random.default_rng(11)
    x = rng.normal(size=(240, 6)) * np.array([7.0, 3.0, 0.9, 0.4, 0.2, 0.1])
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(240), pa.int64()),
        "embedding": pa.array([r.tolist() for r in x],
                              pa.list_(pa.float32()))})).repartition(4)
    mean_e, comps_e, ev_e = pca_fit(ds, k=2)
    mean_p, comps_p, ev_p = pca_fit_power(ds, k=2, iters=60)
    assert np.allclose(mean_e, mean_p, atol=1e-12)
    for i in range(2):
        assert abs(abs(comps_e[i] @ comps_p[i])) == pytest.approx(
            1.0, abs=1e-6)
        assert ev_p[i] == pytest.approx(ev_e[i], rel=1e-6)
    # identical reruns: the fixed-iteration map is fully deterministic
    _, comps_p2, _ = pca_fit_power(ds, k=2, iters=60)
    assert np.array_equal(comps_p, comps_p2)
    proj = (pca_project(ds, mean_p, comps_p).to_pandas()
            .sort_values("vec_id").reset_index(drop=True))
    assert list(proj.columns[:3]) == ["vec_id", "pc1", "pc2"]


def test_winnow_fingerprint_md5_variant():
    """token_hash='md5' is the engine-portable winnow path: stable,
    locality-sensitive, and the too-short-for-one-kgram case digests
    the empty string (exactly what the DuckDB oracle's LEFT JOIN +
    coalesce(md5('')) produces)."""
    import hashlib

    from pdf_to_text_ray.stages.analysis import winnow_fingerprint

    a = winnow_fingerprint("the quick brown fox jumps over it" * 6,
                           token_hash="md5")
    b = winnow_fingerprint("the quick brown fox jumps over it" * 6,
                           token_hash="md5")
    c = winnow_fingerprint("an entirely different body of text" * 6,
                           token_hash="md5")
    assert a == b and a != c and len(a) == 32
    assert (winnow_fingerprint("short", token_hash="md5")
            == hashlib.md5(b"").hexdigest())
    # normalization parity with the sip path: case/whitespace folded
    assert (winnow_fingerprint("CASE and   spacing", token_hash="md5")
            == winnow_fingerprint("case and spacing", token_hash="md5"))


def test_hits_matches_dense_power_iteration(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from pdf_to_text_ray.stages.graph import hits

    edges = [(0, 1), (0, 2), (1, 2), (3, 2), (2, 4)]
    out = hits(rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"])),
               iters=5).set_index("node")
    n = 5
    A = np.zeros((n, n))
    for s, d in edges:
        A[s, d] = 1.0
    hub = np.full(n, 1 / np.sqrt(n))
    auth = np.full(n, 1 / np.sqrt(n))
    for _ in range(5):
        auth = A.T @ hub
        auth /= np.linalg.norm(auth)
        hub = A @ auth
        hub /= np.linalg.norm(hub)
    assert np.allclose(out["hub"].to_numpy(), hub, atol=1e-9)
    assert np.allclose(out["authority"].to_numpy(), auth, atol=1e-9)
    # node 2 is the authority (3 in-edges), node 0 the strongest hub
    assert out["authority"].idxmax() == 2
    assert out["hub"].idxmax() == 0


def test_user_activity_rollup_window(ray_session, tmp_path):
    # user 1 active on days 0 and 8; user 2 on day 1 only
    days = [0, 8, 1]
    users = [1, 1, 2]
    t = pa.table({
        "event_id": pa.array(range(3), pa.int64()),
        "ts": pa.array([d * 86_400_000_000 for d in days],
                       pa.timestamp("us")),
        "user_id": pa.array(users, pa.int64()),
        "event_type": pa.array(["view"] * 3, pa.string()),
        "value": pa.array([1.0] * 3, pa.float64()),
        "props": pa.array(["{}"] * 3, pa.string()),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    out = user_activity_rollup(str(tmp_path))
    assert out["day"].tolist() == [0, 1, 8]
    assert out["dau"].tolist() == [1, 1, 1]
    # wau(0)={u1}; wau(1)={u1,u2}; wau(8)={u1} (day 1 is 7 days back,
    # outside the [d-6, d] window)
    assert out["wau"].tolist() == [1, 2, 1]
    assert out["stickiness"].tolist() == [1.0, 0.5, 1.0]


def test_triangle_count_empty_and_selfloop_edges(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from pdf_to_text_ray.stages.graph import triangle_count

    empty = rd.from_arrow(pa.table({"u": pa.array([], pa.int64()),
                                    "v": pa.array([], pa.int64())}))
    assert triangle_count(empty)["n_triangles"].item() == 0
    loops = rd.from_arrow(pa.table({"u": pa.array([1, 2], pa.int64()),
                                    "v": pa.array([1, 2], pa.int64())}))
    assert triangle_count(loops)["n_triangles"].item() == 0


def test_bm25_topk_empty_corpus(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from pdf_to_text_ray.stages.index import bm25_topk

    ds = rd.from_arrow(pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                                 "text": pa.array(["", None], pa.string())}))
    out = bm25_topk(ds, ["hash"])
    assert len(out) == 0


# ── Z-order clustering (stages/zorder.py) ─────────────────────────────

def test_morton2_interleaves_bits():
    import numpy as np

    from pdf_to_text_ray.stages.zorder import morton2

    a = np.array([0b101, 0, 0xFFFFFFFF], dtype=np.uint64)
    b = np.array([0b011, 1, 0], dtype=np.uint64)
    z = morton2(a, b)
    # a→even bits, b→odd bits: (101, 011) interleaves to 0b011011... :
    # bit pairs (b1 a1) from MSB: a=101,b=011 → 0_1 1_0 1_1 → 0b010111?
    # verify positionally instead of by hand: reconstruct both inputs
    def unspread(x, shift):
        x = (x >> np.uint64(shift)) & np.uint64(0x5555555555555555)
        x = (x | (x >> np.uint64(1))) & np.uint64(0x3333333333333333)
        x = (x | (x >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        x = (x | (x >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
        x = (x | (x >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
        x = (x | (x >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
        return x
    assert (unspread(z, 0) == a).all()
    assert (unspread(z, 1) == b).all()
    # locality: nearby (a, b) points get nearby codes within a quadrant
    assert morton2(np.array([2], dtype=np.uint64),
                   np.array([3], dtype=np.uint64))[0] == 0b1110


def test_zorder_layout_prunes_both_dimensions(ray_session, tmp_path):
    """A box predicate over a Z-ordered layout must skip files via BOTH
    columns' footers — fewer files than either 1D bound alone."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from pdf_to_text_ray.stages.zorder import (zonemap_box_files,
                                               zorder_layout)

    import pandas as pd

    rng = np.random.default_rng(3)
    n = 20_000
    df = pd.DataFrame({
        "x": rng.integers(0, 1024, n).astype("int64"),
        "y": rng.integers(0, 1024, n).astype("int64"),
        "v": rng.random(n),
    })
    out = str(tmp_path / "z")
    zorder_layout(rd.from_arrow(pa.Table.from_pandas(df)), ("x", "y"),
                  out, num_files=16)
    keep, total = zonemap_box_files(
        out, {"x": (0, 256), "y": (0, 256)})  # 1/16 of the plane
    assert total == 16
    assert len(keep) <= total // 2  # genuine 2D pruning
    # correctness: kept files + exact filter == plain filter
    got = (rd.read_parquet(keep).to_pandas().query(
        "0 <= x < 256 and 0 <= y < 256"))
    want = df.query("0 <= x < 256 and 0 <= y < 256")
    assert len(got) == len(want)
    assert got["v"].sum() == pytest.approx(want["v"].sum())


def test_audit_rules_count_violations(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from pdf_to_text_ray.stages.audit import run_audit

    t = pa.table({
        "k": [1, 2, 2, 3, None],
        "v": [0.5, None, 5.0, 50.0, 51.0],
        "fk": [10, 10, 11, 99, 98],
    })
    ref = pa.table({"rk": [10, 11, 12]})
    ds = rd.from_arrow(t)
    out = run_audit([
        {"rule": "k_not_null", "kind": "not_null", "ds": ds, "col": "k"},
        {"rule": "v_range", "kind": "in_range", "ds": ds, "col": "v",
         "lo": 1, "hi": 50},
        {"rule": "k_unique", "kind": "unique", "ds": ds, "col": "k"},
        {"rule": "fk_ref", "kind": "foreign_key", "ds": ds, "col": "fk",
         "ref_ds": rd.from_arrow(ref), "ref_col": "rk"},
    ])
    got = dict(zip(out["rule"], out["n_violations"]))
    # v_range: 0.5 below, 51.0 above, None counts ONCE as a violation
    assert got == {"k_not_null": 1, "v_range": 3, "k_unique": 1,
                   "fk_ref": 2}
    assert (out["n_rows"] == 5).all()


def test_host_mirror_max_posting_caps_hot_words(ray_session):
    """A stop word present on EVERY host must not explode into
    C(n_hosts, 2) pair rows: the max_posting cap drops it from the
    intersection counts (logged, returned), keeps it in the union
    sizes (capped jaccard = lower bound), and leaves sub-cap words
    exact."""
    import pyarrow as pa
    import ray.data as rd

    from pdf_to_text_ray.pipelines.queries import host_mirror_frame

    n_hosts = 600  # uncapped, the hot word alone would emit 179,700 pairs
    texts = ["zzcommon only" + str(i) for i in range(n_hosts)]
    texts[0] += " shared01"
    texts[1] += " shared01"
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(n_hosts), pa.int64()),
        "text": texts}))

    out, dropped = host_mirror_frame(docs, n_hosts=n_hosts, max_posting=4)
    assert dropped == 1  # zzcommon (601 > 4); shared01 (2 hosts) survives
    # only the genuinely-shared pair remains: C(600,2) hot-word pairs gone
    assert len(out) == 1
    row = out.iloc[0]
    assert (row["host_a"], row["host_b"]) == ("host0", "host1")
    # union keeps the dropped word: |A|=|B|=3, inter=1 → 1/(3+3-1)
    assert row["n_common"] == 1
    assert row["jaccard"] == pytest.approx(0.2)

    # uncapped on a small slice stays exact: pair (0,1) shares both words
    small = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(3), pa.int64()),
        "text": [texts[0], texts[1], texts[2]]}))
    exact, dropped0 = host_mirror_frame(small, n_hosts=3,
                                        max_posting=None)
    assert dropped0 == 0
    pair01 = exact[(exact["host_a"] == "host0")
                   & (exact["host_b"] == "host1")].iloc[0]
    assert pair01["n_common"] == 2  # zzcommon + shared01
    assert pair01["jaccard"] == pytest.approx(2 / (3 + 3 - 2))


def test_audit_foreign_key_empty_ref_and_null_probes(ray_session):
    """An empty/missing referenced table must report every NON-NULL
    probe row as a violation (not crash indexing an empty array), and
    NULL probe values must match SQL NOT-IN semantics: never counted."""
    import pyarrow as pa
    import ray.data as rd

    from pdf_to_text_ray.stages.audit import audit_foreign_key

    probe = rd.from_arrow(pa.table({"fk": [10, None, 11, None, 99]}))

    # empty referenced table: 3 non-null probes violate, 2 nulls don't
    empty_ref = rd.from_arrow(pa.table({"rk": pa.array([], pa.int64())}))
    n, bad = audit_foreign_key(probe, "fk", empty_ref, "rk")
    assert (n, bad) == (5, 3)

    # non-empty ref with nulls on BOTH sides: null ref keys are
    # dropped from the key set, null probes are never violations
    ref = rd.from_arrow(pa.table({"rk": [10, None, 11]}))
    n, bad = audit_foreign_key(probe, "fk", ref, "rk")
    assert (n, bad) == (5, 1)  # only 99 misses
