"""Round-14 operators: KMV/theta intersection sketch, weighted SSSP
(Bellman-Ford), item-item co-occurrence recommender, hashed Naive
Bayes — kernel/e2e tests against brute-force references on tiny
constructed tables."""
import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from pdf_to_text_ray.pipelines.queries import (
    kmv_user_overlap,
    nb_lang_classify,
    part_copurchase_sssp,
    part_recommendations,
)


def _write_events_users(tmp_path, rows):
    """rows: list of (user_id, event_type)."""
    n = len(rows)
    t = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(range(n), pa.int64()),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[1] for r in rows], pa.string()),
        "value": pa.array([0.0] * n, pa.float64()),
        "props": pa.array(["{}"] * n, pa.string()),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    return str(tmp_path)


def _write_lineitem_pairs(tmp_path, orders):
    """orders: list of part-id tuples, one per order."""
    rows = [(o + 1, p) for o, parts in enumerate(orders) for p in parts]
    t = pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
    })
    pq.write_table(t, tmp_path / "lineitem.parquet")
    return str(tmp_path)


# ── KMV / theta sketch ────────────────────────────────────────────────

def test_kmv_exact_mode_small(ray_session, tmp_path):
    # fewer than k=64 distinct users per audience → exact mode: the
    # sketch IS the set, every estimate is the true cardinality
    rows = ([(u, "view") for u in range(30)]
            + [(u, "purchase") for u in range(20, 45)]
            + [(u, "click") for u in range(100)])  # ignored type
    d = _write_events_users(tmp_path, rows)
    out = kmv_user_overlap(d)
    assert out["n_view_est"].tolist() == [30.0]
    assert out["n_purchase_est"].tolist() == [25.0]
    assert out["n_both_est"].tolist() == [10.0]


def test_kmv_estimate_within_error(ray_session, tmp_path):
    # 500 viewers, 500 purchasers, 250 shared → estimation mode
    # (n > k = 64). KMV RSE ≈ 1/sqrt(k-2) ≈ 0.13; intersection error
    # scales with 1/jaccard — allow a generous deterministic bound.
    view = list(range(0, 500))
    purch = list(range(250, 750))
    rows = ([(u, "view") for u in view]
            + [(u, "purchase") for u in purch])
    d = _write_events_users(tmp_path, rows)
    out = kmv_user_overlap(d)
    assert abs(out["n_view_est"][0] - 500) / 500 < 0.4
    assert abs(out["n_purchase_est"][0] - 500) / 500 < 0.4
    assert abs(out["n_both_est"][0] - 250) / 250 < 0.6


def test_kmv_partial_merge_invariance():
    # k smallest of the union of per-batch k-minima == global k
    # smallest — the property that makes the sketch mergeable
    k = 16
    rng = np.random.default_rng(3)
    hashes = rng.integers(0, 2**63, size=1000, dtype=np.int64) \
        .astype(np.uint64)
    batches = np.array_split(hashes, 7)
    merged = np.unique(np.concatenate(
        [np.unique(b)[:k] for b in batches]))[:k]
    want = np.unique(hashes)[:k]
    assert merged.tolist() == want.tolist()


# ── weighted SSSP ─────────────────────────────────────────────────────

def test_sssp_weighted_chain(ray_session, tmp_path):
    # parts 1-2 share 9 orders (w = max(1, 10-9) = 1); 2-3 share one
    # (w = 9); 3-4 share 12 (w = max(1, -2) = 1) → dists 0, 1, 10, 11
    orders = [(1, 2)] * 9 + [(2, 3)] + [(3, 4)] * 12
    d = _write_lineitem_pairs(tmp_path, orders)
    out = part_copurchase_sssp(d)
    assert dict(zip(out["node"], out["dist"])) == {1: 0, 2: 1, 3: 10,
                                                   4: 11}


def test_sssp_matches_bruteforce_bellman_ford(ray_session, tmp_path):
    rng = np.random.default_rng(5)
    # random multi-part orders over 12 parts
    orders = [tuple(rng.choice(np.arange(1, 13), size=rng.integers(2, 5),
                               replace=False).tolist())
              for _ in range(40)]
    d = _write_lineitem_pairs(tmp_path, orders)
    out = part_copurchase_sssp(d)

    # brute force: same edge weights, 6 relaxation rounds
    lp = {(o + 1, p) for o, parts in enumerate(orders) for p in parts}
    lp = pd.DataFrame(sorted(lp), columns=["o", "p"])
    m = lp.merge(lp, on="o")
    m = m[m["p_x"] != m["p_y"]]
    shared = m.groupby(["p_x", "p_y"]).size()
    src = int(lp["p"].min())
    dist = {src: 0}
    for _ in range(6):
        upd = dict(dist)
        for (a, b), c in shared.items():
            w = max(1, 10 - int(c))
            if a in dist and dist[a] + w < upd.get(b, 1 << 62):
                upd[b] = dist[a] + w
        if upd == dist:
            break
        dist = upd
    assert dict(zip(out["node"], out["dist"])) == dist


# ── item-item recommender ─────────────────────────────────────────────

def test_part_recommendations_bruteforce(ray_session, tmp_path):
    rng = np.random.default_rng(9)
    orders = [tuple(rng.choice(np.arange(1, 10), size=rng.integers(2, 4),
                               replace=False).tolist())
              for _ in range(30)]
    d = _write_lineitem_pairs(tmp_path, orders)
    out = part_recommendations(d)

    lp = {(o + 1, p) for o, parts in enumerate(orders) for p in parts}
    lp = pd.DataFrame(sorted(lp), columns=["o", "p"])
    tot = lp.groupby("p").size()
    m = lp.merge(lp, on="o")
    m = m[m["p_x"] != m["p_y"]]
    co = m.groupby(["p_x", "p_y"]).size().reset_index(name="c")
    co["sim"] = co["c"] / np.sqrt(
        (tot[co["p_x"]].to_numpy() * tot[co["p_y"]].to_numpy())
        .astype(np.float64))
    co = co.sort_values(["p_x", "sim", "p_y"],
                        ascending=[True, False, True], kind="stable")
    co["rank"] = co.groupby("p_x").cumcount() + 1
    want = co[co["rank"] <= 3].reset_index(drop=True)
    assert out["p_partkey"].tolist() == want["p_x"].tolist()
    assert out["rec_partkey"].tolist() == want["p_y"].tolist()
    assert out["sim"].tolist() == want["sim"].tolist()  # bit-identical
    assert out["rank"].tolist() == want["rank"].tolist()


# ── hashed Naive Bayes ────────────────────────────────────────────────

def _write_documents(tmp_path, texts, langs):
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    return str(tmp_path)


def test_nb_classifies_separable_langs(ray_session, tmp_path):
    rng = np.random.default_rng(21)
    texts, langs = [], []
    vocab = {"aa": ["foo", "bar", "quux"], "bb": ["baz", "qux", "zap"]}
    for lang, words in vocab.items():
        for _ in range(20):
            texts.append(" ".join(rng.choice(words, size=12)))
            langs.append(lang)
    d = _write_documents(tmp_path, texts, langs)
    out = nb_lang_classify(d)
    assert len(out) == 40
    got = dict(zip(out["doc_id"], out["pred_lang"]))
    assert all(got[i] == langs[i] for i in range(40))


def test_nb_excludes_empty_docs(ray_session, tmp_path):
    d = _write_documents(tmp_path,
                         ["foo foo bar", "", "   ", "baz qux baz"],
                         ["aa", "aa", "bb", "bb"])
    out = nb_lang_classify(d)
    # docs 1 and 2 have no tokens (empty / whitespace-only under the
    # single-space split) → excluded, matching the SQL inner join
    assert out["doc_id"].tolist() == [0, 3]
    assert out["pred_lang"].tolist() == ["aa", "bb"]


def test_nb_bucket_hash_is_md5_portable():
    # the Python bucket must equal DuckDB's
    # ('0x' || substr(md5(tok), 1, 16))::UBIGINT % 65536
    from pdf_to_text_ray.stages.dedup import _md5_token_hashes

    toks = np.array(["the", "fox", "héllo", "42"], dtype=object)
    got = (_md5_token_hashes(toks) % np.uint64(65536)).tolist()
    want = [int(hashlib.md5(t.encode()).hexdigest()[:16], 16) % 65536
            for t in toks]
    assert got == want
