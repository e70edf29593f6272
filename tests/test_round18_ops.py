"""Round-18 operators: hybrid RRF retrieval, MMR diversified top-k,
leakage-safe group split."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


# ── reciprocal-rank fusion ───────────────────────────────────────────

def test_hybrid_rrf_fuses_both_legs(ray_session):
    from pdf_to_text_ray.pipelines.queries import (RRF_K0, RRF_LEG_K,
                                                   RRF_TOPK,
                                                   hybrid_search_rrf)

    out = hybrid_search_rrf(SF)
    assert list(out.columns) == ["doc_id", "lex_rank", "sem_rank",
                                 "rrf_score"]
    assert len(out) == RRF_TOPK
    # ranks are within the leg depth; 0 means "absent from that leg"
    assert out["lex_rank"].between(0, RRF_LEG_K).all()
    assert out["sem_rank"].between(0, RRF_LEG_K).all()
    # no doc can miss BOTH legs and still be in the fused top-k
    assert ((out["lex_rank"] > 0) | (out["sem_rank"] > 0)).all()
    # the fused score is exactly the two-term RRF sum of the ranks
    lr = out["lex_rank"].to_numpy(np.float64)
    sr = out["sem_rank"].to_numpy(np.float64)
    want = (np.where(lr > 0, 1.0 / (RRF_K0 + lr), 0.0)
            + np.where(sr > 0, 1.0 / (RRF_K0 + sr), 0.0))
    assert np.allclose(out["rrf_score"].to_numpy(), want, atol=5e-7)
    # descending by fused score, doc_id tiebreak
    key = list(zip(-out["rrf_score"], out["doc_id"]))
    assert key == sorted(key)
    # a rank-1 doc on either leg always survives the fusion cut
    # (1/61 alone beats any single rank >= 2 and any fused tail)
    assert (out["lex_rank"] == 1).any() or (out["sem_rank"] == 1).any()


def test_hybrid_rrf_deterministic(ray_session):
    from pdf_to_text_ray.pipelines.queries import hybrid_search_rrf

    a = hybrid_search_rrf(SF)
    b = hybrid_search_rrf(SF)
    pd.testing.assert_frame_equal(a, b)


# ── MMR ──────────────────────────────────────────────────────────────

def _write_embeddings(tmp_path, vecs):
    d = os.path.join(str(tmp_path), "mmr")
    os.makedirs(d, exist_ok=True)
    mat = np.asarray(vecs, np.float32)
    pq.write_table(pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in mat],
                              pa.list_(pa.float32())),
        "label": pa.array([0] * len(vecs), pa.int32()),
    }), os.path.join(d, "embeddings.parquet"))
    return d


def test_mmr_prefers_diversity_over_redundancy(ray_session, tmp_path,
                                               monkeypatch):
    """Two near-identical high-relevance vectors: pure cosine top-2
    picks both; MMR picks one of them, then the diverse lower-rel
    vector instead of the near-clone."""
    import pdf_to_text_ray.pipelines.queries as q

    # vec 0 = query. 1 and 2 are near-clones, closest to the query;
    # 3 is nearly as relevant but far from the clones, so at λ=0.7 its
    # MMR objective (0.7·0.78 − 0.3·0.25 ≈ 0.47) beats the redundant
    # clone's (0.7·0.80 − 0.3·1.00 ≈ 0.26).
    vecs = [
        [1.0, 0.0, 0.0],          # query (vec_id 0)
        [0.80, 0.60, 0.0],        # rel 0.80
        [0.80, 0.60, 0.02],       # rel ~0.80, sim(1,2) ~0.9998
        [0.78, -0.6246, 0.0],     # rel 0.78, sim to clones ~0.25
    ]
    d = _write_embeddings(tmp_path, vecs)
    monkeypatch.setattr(q, "MMR_CAND", 3)
    monkeypatch.setattr(q, "MMR_K", 2)
    out = q.mmr_diverse_topk(d)
    assert len(out) == 2
    first, second = out["doc_id"].tolist()
    assert first in (1, 2)          # pure relevance winner
    assert second == 3              # the diverse pick beats the clone
    # step-2 objective actually penalized the clone: the winning
    # diverse score ≈ 0.47 sits well above the clone's ≈ 0.26
    assert out["mmr_score"].iloc[1] > 0.4


def test_mmr_monotone_scores_and_determinism(ray_session):
    from pdf_to_text_ray.pipelines.queries import (MMR_K,
                                                   mmr_diverse_topk)

    a = mmr_diverse_topk(SF)
    b = mmr_diverse_topk(SF)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == MMR_K
    assert a["doc_id"].is_unique
    assert (a["step"].to_numpy() == np.arange(1, MMR_K + 1)).all()
    # greedy MMR picks in non-increasing objective order per step is
    # NOT guaranteed (the selected set grows), but the first pick is
    # the pure-relevance argmax, so its score is the per-step maximum
    assert a["mmr_score"].iloc[0] >= a["mmr_score"].max() - 1e-12


# ── leakage-safe group split ─────────────────────────────────────────

def test_source_split_is_group_pure(ray_session):
    from pdf_to_text_ray.pipelines.queries import source_split_assign
    from pdf_to_text_ray.stages.sketches import md5_uniform

    out = source_split_assign(SF).to_pandas()
    # every source maps to exactly one split — no origin straddles
    per_src = out.groupby("source")["split"].nunique()
    assert (per_src == 1).all()
    # and the assignment is the pinned md5-uniform thresholding
    srcs = sorted(out["source"].unique())
    u = md5_uniform(srcs)
    want = np.where(u < 0.8, "train", np.where(u < 0.9, "val", "test"))
    got = out.drop_duplicates("source").set_index("source")["split"]
    for s, w in zip(srcs, want):
        assert got[s] == w
    # full row coverage: one output row per document
    import duckdb

    n = duckdb.sql(
        f"SELECT count(*) FROM '{SF}/documents.parquet'").fetchone()[0]
    assert len(out) == n


# ── pseudo-relevance-feedback BM25 ───────────────────────────────────

def _write_documents(tmp_path, texts, name="prf"):
    d = os.path.join(str(tmp_path), name)
    os.makedirs(d, exist_ok=True)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["s0"] * len(texts), pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), os.path.join(d, "documents.parquet"))
    return d


def test_prf_expansion_recalls_term_free_doc(ray_session, tmp_path):
    """A doc with NO original query term but rich in the expansion
    term scores 0 under plain BM25 and positive after PRF expansion."""
    from pdf_to_text_ray.pipelines.queries import bm25_prf_search
    from pdf_to_text_ray.stages.index import bm25_topk
    import ray.data as rd

    texts = [
        "hash join merge merge probe build",   # feedback doc
        "hash join merge merge partition",     # feedback doc
        "merge merge merge sort runs",         # no query term at all
        "totally unrelated words here now",
    ]
    d = _write_documents(tmp_path, texts)
    docs = rd.read_parquet(os.path.join(d, "documents.parquet"))
    plain = bm25_topk(docs, ["hash", "join"], topk=4).set_index("doc_id")
    assert plain.loc[2, "score"] == 0.0
    out = bm25_prf_search(d).set_index("doc_id")
    # 'merge' dominates the feedback docs' TF, so it joins the query
    assert out.loc[2, "score"] > 0.0


def test_prf_deterministic_on_testdata(ray_session):
    from pdf_to_text_ray.pipelines.queries import (PRF_TOPK,
                                                   bm25_prf_search)

    a = bm25_prf_search(SF)
    b = bm25_prf_search(SF)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == PRF_TOPK
    assert (a["score"].to_numpy()[:-1] >= a["score"].to_numpy()[1:]).all()


# ── per-source token KL ──────────────────────────────────────────────

def test_source_token_kl_flags_vocab_shift(ray_session, tmp_path):
    """A source matching the corpus distribution sits near KL 0; a
    source with a disjoint vocabulary scores much higher."""
    from pdf_to_text_ray.pipelines.queries import source_token_kl

    d = os.path.join(str(tmp_path), "kl")
    os.makedirs(d, exist_ok=True)
    # srcA dominates the corpus with a uniform 'a b c' mix; srcB only
    # ever says 'zzz' (still in the global top-100 vocab cut)
    texts = ["a b c"] * 50 + ["zzz zzz zzz"] * 5
    srcs = ["srcA"] * 50 + ["srcB"] * 5
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(srcs, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), os.path.join(d, "documents.parquet"))
    out = source_token_kl(d).set_index("source")
    assert out.loc["srcB", "kl"] > out.loc["srcA", "kl"] + 0.5


def test_source_token_kl_nonnegative_testdata(ray_session):
    """Smoothed p and q are both proper distributions over the same
    restricted vocabulary, so KL must be >= 0 for every source."""
    from pdf_to_text_ray.pipelines.queries import source_token_kl

    out = source_token_kl(SF)
    assert len(out) == 20          # sf0.001 has src0..src19
    assert (out["kl"].to_numpy() >= 0).all()


# ── exactly-portable HLL ─────────────────────────────────────────────

def test_hll_portable_accuracy_both_branches(ray_session):
    """sf0.001 (100 users) exercises the linear-counting branch,
    sf0.01 (999 users) the raw-estimate branch; with 64 registers the
    rse is ~13%, so 3-sigma bounds hold comfortably."""
    import duckdb

    from pdf_to_text_ray.pipelines.queries import \
        hll_estimate_users_per_type

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        out = hll_estimate_users_per_type(sf).set_index("event_type")
        truth = duckdb.sql(f"""
            SELECT event_type, count(DISTINCT user_id) AS n
            FROM '{sf}/events.parquet' GROUP BY event_type
        """).df().set_index("event_type")
        assert set(out.index) == set(truth.index)
        for et in truth.index:
            n = float(truth.loc[et, "n"])
            est = float(out.loc[et, "hll_estimate"])
            assert abs(est - n) / n < 0.4, (sf, et, est, n)


def test_hll_portable_batching_invariant(ray_session, tmp_path):
    """Register max-merge makes the estimate independent of how rows
    are batched/partitioned — rerunning over a differently-blocked
    copy of the same rows gives the identical estimate."""
    import duckdb

    from pdf_to_text_ray.pipelines.queries import \
        hll_estimate_users_per_type

    src = "/root/testdata/sf0.001"
    d = os.path.join(str(tmp_path), "hllrepart")
    os.makedirs(d, exist_ok=True)
    # same rows, reshuffled order + different row-group size
    duckdb.sql(f"""
        COPY (SELECT * FROM '{src}/events.parquet'
              ORDER BY md5(event_id::VARCHAR))
        TO '{os.path.join(d, "events.parquet")}'
        (FORMAT PARQUET, ROW_GROUP_SIZE 128)
    """)
    a = hll_estimate_users_per_type(src)
    b = hll_estimate_users_per_type(d)
    pd.testing.assert_frame_equal(a, b)


# ── source-overlap matrix ────────────────────────────────────────────

def test_source_overlap_detects_syndication(ray_session, tmp_path):
    """Two sources sharing a syndicated paragraph overlap strongly;
    a vocabulary-disjoint source shares nothing with either."""
    from pdf_to_text_ray.pipelines.queries import source_overlap_matrix

    d = os.path.join(str(tmp_path), "overlap")
    os.makedirs(d, exist_ok=True)
    shared = "the quick brown fox jumps over the lazy dog today"
    texts = [shared + " alpha beta gamma",
             shared + " delta epsilon zeta",
             "uno dos tres cuatro cinco seis siete ocho nueve diez"]
    srcs = ["sA", "sB", "sC"]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(3), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * 3, pa.string()),
        "source": pa.array(srcs, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), os.path.join(d, "documents.parquet"))
    out = source_overlap_matrix(d)
    pairs = {(a, b): j for a, b, j in
             zip(out["source_a"], out["source_b"], out["jaccard"])}
    # 13 words → 11 trigrams per doc, 8 shared (the syndicated span)
    # → J = 8 / (11 + 11 − 8)
    assert pairs[("sA", "sB")] == pytest.approx(8 / 14, abs=1e-6)
    # the disjoint source pairs with nobody
    assert ("sA", "sC") not in pairs and ("sB", "sC") not in pairs


def test_source_overlap_shape_testdata(ray_session):
    from pdf_to_text_ray.pipelines.queries import source_overlap_matrix

    out = source_overlap_matrix(SF)
    # pairs are canonical (a < b), unique, jaccard in (0, 1]
    assert (out["source_a"] < out["source_b"]).all()
    assert not out.duplicated(["source_a", "source_b"]).any()
    assert out["jaccard"].between(0, 1, inclusive="right").all()
    assert (out["n_common"] > 0).all()


# ── Markov stationary distribution ───────────────────────────────────

def test_markov_stationary_is_fixed_point(ray_session):
    """After 20 power iterations on this chain the vector is at the
    fixed point: one more application of P moves nothing (1e-9)."""
    from pdf_to_text_ray.pipelines.queries import (
        event_markov_stationary, event_transition_matrix)

    out = event_markov_stationary(SF)
    assert list(out.columns) == ["event_type", "stationary_prob"]
    probs = out["stationary_prob"].to_numpy(np.float64)
    assert probs.sum() == pytest.approx(1.0, abs=2e-5)
    assert (probs >= 0).all()

    counts = event_transition_matrix(SF)
    types = list(out["event_type"])
    idx = {t: i for i, t in enumerate(types)}
    k = len(types)
    P = np.zeros((k, k))
    for ft, tt, n in zip(counts["from_type"], counts["to_type"],
                         counts["n"]):
        P[idx[ft], idx[tt]] = float(n)
    P /= P.sum(axis=1, keepdims=True)
    # rounding to 6 dp dominates the residual; the unrounded chain
    # converges far tighter than the displayed precision
    assert np.abs(probs @ P - probs).max() < 2e-6


def test_markov_stationary_two_state_analytic(ray_session, tmp_path):
    """Hand-built 2-state chain with known stationary distribution:
    P(a→b)=1, P(b→a)=0.5 ⇒ π = (1/3, 2/3)."""
    from pdf_to_text_ray.pipelines.queries import event_markov_stationary

    d = os.path.join(str(tmp_path), "markov")
    os.makedirs(d, exist_ok=True)
    # one user, sequence a b b a b b a b b ... : transitions
    # a→b ×n, b→b ×n, b→a ×(n-1)  ⇒ rows a:[0,1], b:[~.5,~.5]
    seq = (["a", "b", "b"] * 40)
    n = len(seq)
    pq.write_table(pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "user_id": pa.array([7] * n, pa.int64()),
        "event_type": pa.array(seq, pa.string()),
        "ts": pa.array(pd.date_range("2024-01-01", periods=n,
                                     freq="s")),
        "value": pa.array([1.0] * n, pa.float64()),
    }), os.path.join(d, "events.parquet"))
    out = event_markov_stationary(d).set_index("event_type")
    # exact chain: a→b 40, b→b 40, b→a 39 ⇒ π solves πP=π
    pa_, pb = out.loc["a", "stationary_prob"], out.loc["b",
                                                       "stationary_prob"]
    assert pa_ + pb == pytest.approx(1.0, abs=2e-6)
    # π_a = P(b→a)·π_b ⇒ π_a/π_b = 39/79 ≈ 0.3306
    assert pa_ / pb == pytest.approx(39 / 79, abs=1e-3)


# ── Unicode script mix ───────────────────────────────────────────────

def test_script_mix_pins_known_fractions(ray_session, tmp_path):
    from pdf_to_text_ray.pipelines.queries import doc_script_mix

    d = os.path.join(str(tmp_path), "scripts")
    os.makedirs(d, exist_ok=True)
    texts = ["abc где 漢字 12!",   # 3 latin, 3 cyr, 2 han, 2 digit, 1 other
             "   \t\n  ",          # whitespace only → dropped
             None,                 # null → dropped
             "é١٢٣"]               # é is latin (0xC0-0x24F), ٣ arabic digits → other
    pq.write_table(pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["xx"] * 4, pa.string()),
        "source": pa.array(["s"] * 4, pa.string()),
    }), os.path.join(d, "documents.parquet"))
    out = doc_script_mix(d).to_pandas().set_index("doc_id")
    assert sorted(out.index) == [0, 3]
    r = out.loc[0]
    assert r["n_cp"] == 11
    assert r["f_latin"] == pytest.approx(3 / 11, abs=1e-6)
    assert r["f_cyrillic"] == pytest.approx(3 / 11, abs=1e-6)
    assert r["f_han"] == pytest.approx(2 / 11, abs=1e-6)
    assert r["f_digit"] == pytest.approx(2 / 11, abs=1e-6)
    assert r["f_other"] == pytest.approx(1 / 11, abs=1e-6)
    r3 = out.loc[3]
    assert r3["n_cp"] == 4
    assert r3["f_latin"] == pytest.approx(0.25, abs=1e-6)
    assert r3["f_other"] == pytest.approx(0.75, abs=1e-6)


def test_script_mix_fractions_sum_to_one(ray_session):
    from pdf_to_text_ray.pipelines.queries import doc_script_mix

    out = doc_script_mix(SF).to_pandas()
    assert (out["n_cp"] > 0).all()
    tot = (out["f_latin"] + out["f_cyrillic"] + out["f_han"]
           + out["f_digit"] + out["f_other"])
    assert np.abs(tot - 1.0).max() < 3e-6
