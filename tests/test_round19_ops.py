"""Round-19 operators: Poisson-bootstrap CI, JL random projection,
transition entropy, temperature mixing weights, OOV rate."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


# ── Poisson bootstrap ────────────────────────────────────────────────

def test_bootstrap_ci_brackets_mean(ray_session):
    from pdf_to_text_ray.pipelines.queries import poisson_bootstrap_value_ci

    out = poisson_bootstrap_value_ci(SF)
    assert list(out.columns) == ["n", "mean_value", "ci_lo", "ci_hi"]
    assert len(out) == 1
    r = out.iloc[0]
    assert r["ci_lo"] < r["mean_value"] < r["ci_hi"]
    assert r["n"] == 1000


def test_bootstrap_ci_narrows_with_n(ray_session):
    """10× the rows ⇒ the CI width shrinks ~1/√10 (allow 2× slack —
    the value distributions at the two scales differ)."""
    from pdf_to_text_ray.pipelines.queries import poisson_bootstrap_value_ci

    w1 = poisson_bootstrap_value_ci(SF).iloc[0]
    w2 = poisson_bootstrap_value_ci(SF01).iloc[0]
    width1 = w1["ci_hi"] - w1["ci_lo"]
    width2 = w2["ci_hi"] - w2["ci_lo"]
    assert width2 < width1 * 0.7


def test_bootstrap_constant_values_collapse(ray_session, tmp_path):
    """All values equal c ⇒ every replicate mean is exactly c."""
    from pdf_to_text_ray.pipelines.queries import poisson_bootstrap_value_ci

    d = os.path.join(str(tmp_path), "boot")
    os.makedirs(d, exist_ok=True)
    n = 400
    pq.write_table(pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(pd.date_range("2024-01-01", periods=n, freq="s")),
        "user_id": pa.array([1] * n, pa.int64()),
        "event_type": pa.array(["x"] * n, pa.string()),
        "value": pa.array([5.25] * n, pa.float64()),
        "props": pa.array(["{}"] * n, pa.string()),
    }), os.path.join(d, "events.parquet"))
    r = poisson_bootstrap_value_ci(d).iloc[0]
    assert r["mean_value"] == r["ci_lo"] == r["ci_hi"] == 5.25


def test_bootstrap_drops_null_values(ray_session, tmp_path):
    from pdf_to_text_ray.pipelines.queries import poisson_bootstrap_value_ci

    d = os.path.join(str(tmp_path), "bootnull")
    os.makedirs(d, exist_ok=True)
    vals = [1.0, None, 3.0, None, 5.0, 7.0]
    n = len(vals)
    pq.write_table(pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(pd.date_range("2024-01-01", periods=n, freq="s")),
        "user_id": pa.array([1] * n, pa.int64()),
        "event_type": pa.array(["x"] * n, pa.string()),
        "value": pa.array(vals, pa.float64()),
        "props": pa.array(["{}"] * n, pa.string()),
    }), os.path.join(d, "events.parquet"))
    r = poisson_bootstrap_value_ci(d).iloc[0]
    assert r["n"] == 4
    assert r["mean_value"] == pytest.approx(4.0, abs=1e-6)


def test_poisson_thresholds_are_cdf():
    from pdf_to_text_ray.pipelines.queries import _POIS_CUM

    # strictly increasing, approaching 1 from below
    assert all(a < b for a, b in zip(_POIS_CUM, _POIS_CUM[1:]))
    assert _POIS_CUM[0] == pytest.approx(np.exp(-1.0))
    assert 1.0 - _POIS_CUM[-1] < 2e-5
    # mean of the truncated weight distribution stays ≈ 1
    pmf = np.diff([0.0] + _POIS_CUM)
    mean = (pmf * np.arange(len(pmf))).sum() + (1 - _POIS_CUM[-1]) * 8
    assert mean == pytest.approx(1.0, abs=1e-3)


# ── JL random projection ─────────────────────────────────────────────

def test_rp_unbiased_on_testdata(ray_session):
    """JL estimator unbiasedness: E[‖y_i−y_j‖²] = ‖x_i−x_j‖², so the
    mean squared distance ratio over random pairs is ≈ 1. (The
    testdata embeddings have near-constant pairwise distances —
    CV ≈ 0.06 — so a correlation test carries no signal; the ratio
    does.)"""
    from pdf_to_text_ray.pipelines.queries import RP_K, embedding_rp_project
    from pdf_to_text_ray.stages.similarity import list_column_to_matrix

    out = embedding_rp_project(SF).to_pandas().sort_values("vec_id")
    y = out[[f"rp{j + 1}" for j in range(RP_K)]].to_numpy(np.float64)

    tab = pq.read_table(os.path.join(SF, "embeddings.parquet"),
                        columns=["vec_id", "embedding"])
    order = np.argsort(tab["vec_id"].to_numpy())
    x = list_column_to_matrix(tab["embedding"])[order].astype(np.float64)

    rng = np.random.default_rng(7)
    i = rng.integers(0, len(x), 2000)
    j = rng.integers(0, len(x), 2000)
    keep = i != j
    dx = np.linalg.norm(x[i[keep]] - x[j[keep]], axis=1)
    dy = np.linalg.norm(y[i[keep]] - y[j[keep]], axis=1)
    assert np.mean((dy / dx) ** 2) == pytest.approx(1.0, abs=0.15)


def test_rp_separates_real_clusters(ray_session, tmp_path):
    """Two genuinely separated 64-d clusters stay separated after the
    64→8 projection: every between-cluster distance exceeds every
    within-cluster distance."""
    from pdf_to_text_ray.pipelines.queries import RP_K, embedding_rp_project

    d = os.path.join(str(tmp_path), "rp")
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(3)
    a = rng.normal(0.0, 0.05, (30, 64))
    b = rng.normal(0.0, 0.05, (30, 64)) + 4.0
    mat = np.vstack([a, b]).astype(np.float32)
    pq.write_table(pa.table({
        "vec_id": pa.array(range(60), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in mat],
                              pa.list_(pa.float32())),
        "label": pa.array([0] * 30 + [1] * 30, pa.int32()),
    }), os.path.join(d, "embeddings.parquet"))
    out = embedding_rp_project(d).to_pandas().sort_values("vec_id")
    y = out[[f"rp{j + 1}" for j in range(RP_K)]].to_numpy(np.float64)
    ya, yb = y[:30], y[30:]
    within = max(
        np.linalg.norm(ya[:, None] - ya[None], axis=2).max(),
        np.linalg.norm(yb[:, None] - yb[None], axis=2).max())
    between = np.linalg.norm(ya[:, None] - yb[None], axis=2).min()
    assert between > within


def test_rp_matrix_deterministic_and_balanced():
    from pdf_to_text_ray.pipelines.queries import _rp_signs

    a, b = _rp_signs(64), _rp_signs(64)
    assert np.array_equal(a, b)
    assert set(np.unique(a)) == {-1.0, 1.0}
    # hash-derived signs are near-balanced
    assert abs(a.mean()) < 0.15


# ── transition entropy ───────────────────────────────────────────────

def test_transition_entropy_deterministic_funnel(ray_session, tmp_path):
    """a always → b ⇒ H(next|a) = 0; b splits evenly to a/c ⇒ 1 bit."""
    from pdf_to_text_ray.pipelines.queries import event_transition_entropy

    d = os.path.join(str(tmp_path), "ent")
    os.makedirs(d, exist_ok=True)
    seq = ["a", "b", "a", "b", "c", "a", "b", "a", "b", "c"] * 4
    n = len(seq)
    pq.write_table(pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(pd.date_range("2024-01-01", periods=n, freq="s")),
        "user_id": pa.array([9] * n, pa.int64()),
        "event_type": pa.array(seq, pa.string()),
        "value": pa.array([0.0] * n, pa.float64()),
        "props": pa.array(["{}"] * n, pa.string()),
    }), os.path.join(d, "events.parquet"))
    out = event_transition_entropy(d).set_index("from_type")
    assert out.loc["a", "entropy_bits"] == 0.0
    # b → a (~half) / c (~half): entropy close to 1 bit
    assert out.loc["b", "entropy_bits"] == pytest.approx(1.0, abs=0.05)


def test_transition_entropy_bounded(ray_session):
    from pdf_to_text_ray.pipelines.queries import event_transition_entropy

    out = event_transition_entropy(SF)
    k = len(out)
    assert (out["entropy_bits"] >= 0).all()
    assert (out["entropy_bits"] <= np.log2(k) + 1e-9).all()
    assert (out["n_out"] > 0).all()


# ── temperature mixing weights ───────────────────────────────────────

def test_mix_weights_upsample_small_sources(ray_session):
    from pdf_to_text_ray.pipelines.queries import source_mix_weights

    out = source_mix_weights(SF)
    assert out["w_temp"].sum() == pytest.approx(1.0, abs=2e-5)
    # α<1 compresses: the smallest source gets boost > 1, the largest
    # gets boost < 1, and boost is monotone decreasing in n_docs
    s = out.sort_values("n_docs")
    assert s["boost"].iloc[0] >= s["boost"].iloc[-1]
    if s["n_docs"].iloc[0] < s["n_docs"].iloc[-1]:
        assert s["boost"].iloc[0] > 1.0 > s["boost"].iloc[-1]
    # boost ordering is exactly the reverse of size ordering
    assert (np.diff(s["boost"].to_numpy()) <= 1e-12).all()


def test_mix_weights_alpha_one_is_proportional(ray_session, tmp_path):
    """With equal source sizes the temperature does nothing: uniform
    weights and boost exactly 1."""
    from pdf_to_text_ray.pipelines.queries import source_mix_weights

    d = os.path.join(str(tmp_path), "mix")
    os.makedirs(d, exist_ok=True)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(40), pa.int64()),
        "text": pa.array(["w"] * 40, pa.string()),
        "lang": pa.array(["en"] * 40, pa.string()),
        "source": pa.array([f"s{i % 4}" for i in range(40)], pa.string()),
    }), os.path.join(d, "documents.parquet"))
    out = source_mix_weights(d)
    assert (out["w_temp"] == 0.25).all()
    assert (out["boost"] == 1.0).all()


# ── OOV rate ─────────────────────────────────────────────────────────

def test_oov_rate_pins_known_fractions(ray_session, tmp_path):
    from pdf_to_text_ray.pipelines.queries import doc_oov_rate

    d = os.path.join(str(tmp_path), "oov")
    os.makedirs(d, exist_ok=True)
    # 'common' appears in 6 docs (df=6 ≥ 5 ⇒ in-vocab); every docN
    # token is unique (df=1 ⇒ OOV)
    texts = [f"common common doc{i}tok" for i in range(6)]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * 6, pa.string()),
        "source": pa.array(["s"] * 6, pa.string()),
    }), os.path.join(d, "documents.parquet"))
    out = doc_oov_rate(d).to_pandas()
    assert (out["n_tok"] == 3).all()
    assert np.allclose(out["oov_rate"], 1 / 3, atol=1e-6)


def test_oov_rate_bounded_testdata(ray_session):
    from pdf_to_text_ray.pipelines.queries import doc_oov_rate

    out = doc_oov_rate(SF).to_pandas()
    assert out["oov_rate"].between(0, 1).all()
    assert (out["n_tok"] > 0).all()
    assert len(out) == 500


# ── Flesch reading ease ──────────────────────────────────────────────

def test_flesch_pins_known_counts(ray_session, tmp_path):
    from pdf_to_text_ray.pipelines.queries import doc_flesch_score

    d = os.path.join(str(tmp_path), "flesch")
    os.makedirs(d, exist_ok=True)
    texts = ["The cat sat. The dog ran!",
             "Extraordinary bureaucratic investigations notwithstanding.",
             "   "]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(3), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * 3, pa.string()),
        "source": pa.array(["s"] * 3, pa.string()),
    }), os.path.join(d, "documents.parquet"))
    out = doc_flesch_score(d).to_pandas().set_index("doc_id")
    assert sorted(out.index) == [0, 1]   # whitespace-only doc dropped
    r = out.loc[0]
    # 6 monosyllables, 2 sentences
    assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (6, 2, 6)
    assert r["flesch"] == pytest.approx(
        206.835 - 1.015 * 3.0 - 84.6 * 1.0, abs=1e-6)
    # polysyllabic single sentence scores far lower than simple prose
    assert out.loc[1, "flesch"] < out.loc[0, "flesch"] - 100


def test_flesch_bounded_testdata(ray_session):
    from pdf_to_text_ray.pipelines.queries import doc_flesch_score

    out = doc_flesch_score(SF).to_pandas()
    assert len(out) == 500
    assert (out["n_syllables"] >= out["n_words"]).all()
    assert (out["n_sentences"] >= 1).all()


# ── char entropy ─────────────────────────────────────────────────────

def test_char_entropy_analytic(ray_session, tmp_path):
    from pdf_to_text_ray.pipelines.queries import doc_char_entropy

    d = os.path.join(str(tmp_path), "ent2")
    os.makedirs(d, exist_ok=True)
    texts = ["aaaaaaaa",        # one symbol → 0 bits
             "abcd abcd",       # 4 equiprobable symbols → 2 bits
             "ab" * 32]         # 2 symbols → 1 bit
    pq.write_table(pa.table({
        "doc_id": pa.array(range(3), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["xx"] * 3, pa.string()),
        "source": pa.array(["s"] * 3, pa.string()),
    }), os.path.join(d, "documents.parquet"))
    out = doc_char_entropy(d).to_pandas().set_index("doc_id")
    assert out.loc[0, "entropy_bits"] == 0.0
    assert out.loc[1, "entropy_bits"] == pytest.approx(2.0, abs=1e-6)
    assert out.loc[2, "entropy_bits"] == pytest.approx(1.0, abs=1e-6)


def test_char_entropy_flags_gibberish_vs_spam(ray_session):
    """On the real corpus every doc lands between the spam floor and
    the uniform ceiling."""
    from pdf_to_text_ray.pipelines.queries import doc_char_entropy

    out = doc_char_entropy(SF).to_pandas()
    assert (out["entropy_bits"] > 0).all()
    assert (out["entropy_bits"] <= np.log2(out["n_cp"]) + 1e-9).all()


# ── Benford audit ────────────────────────────────────────────────────

def test_benford_digit_extraction(ray_session, tmp_path):
    from pdf_to_text_ray.pipelines.queries import value_benford_chisq

    d = os.path.join(str(tmp_path), "benford")
    os.makedirs(d, exist_ok=True)
    # one value per leading digit (signs/magnitudes vary), zeros and
    # NULLs excluded
    vals = [1.5, -23.0, 0.0037, 450.0, 5e6, -0.61, 7.77, 888.8, 90.1,
            0.0, None]
    n = len(vals)
    pq.write_table(pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(pd.date_range("2024-01-01", periods=n, freq="s")),
        "user_id": pa.array([1] * n, pa.int64()),
        "event_type": pa.array(["x"] * n, pa.string()),
        "value": pa.array(vals, pa.float64()),
        "props": pa.array(["{}"] * n, pa.string()),
    }), os.path.join(d, "events.parquet"))
    out = value_benford_chisq(d)
    assert (out["n"] == 1).all()          # each digit seen exactly once
    assert out["p_obs"].sum() == pytest.approx(1.0, abs=2e-5)
    assert out["p_benford"].sum() == pytest.approx(1.0, abs=2e-5)
    assert (out["chisq_contrib"] >= 0).all()


def test_benford_testdata_shape(ray_session):
    from pdf_to_text_ray.pipelines.queries import value_benford_chisq

    out = value_benford_chisq(SF)
    assert list(out["digit"]) == list(range(1, 10))
    assert out["p_obs"].sum() == pytest.approx(1.0, abs=2e-5)
    # Benford reference is monotone decreasing
    assert (np.diff(out["p_benford"].to_numpy()) < 0).all()


# ── duplicate-cluster histogram ──────────────────────────────────────

def test_dup_hist_counts_clusters(ray_session, tmp_path):
    from pdf_to_text_ray.pipelines.queries import dup_cluster_size_hist

    d = os.path.join(str(tmp_path), "dup")
    os.makedirs(d, exist_ok=True)
    texts = ["A"] * 4 + ["B"] * 2 + ["C"]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(7), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * 7, pa.string()),
        "source": pa.array(["s"] * 7, pa.string()),
    }), os.path.join(d, "documents.parquet"))
    out = dup_cluster_size_hist(d).set_index("cluster_size")
    assert out.loc[1, "n_clusters"] == 1
    assert out.loc[2, "n_clusters"] == 1
    assert out.loc[4, "n_clusters"] == 1
    # mass check: Σ size·count = row count
    assert (out.index.to_numpy() * out["n_clusters"].to_numpy()).sum() == 7


# ── AMS self-join size ───────────────────────────────────────────────

def test_f2_analytic_fixture(ray_session, tmp_path):
    from pdf_to_text_ray.pipelines.queries import events_selfjoin_size_f2

    d = os.path.join(str(tmp_path), "f2")
    os.makedirs(d, exist_ok=True)
    users = [10] * 3 + [20] + [30]       # counts 3,1,1 → F2 = 11
    n = len(users)
    pq.write_table(pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(pd.date_range("2024-01-01", periods=n, freq="s")),
        "user_id": pa.array(users, pa.int64()),
        "event_type": pa.array(["x"] * n, pa.string()),
        "value": pa.array([1.0] * n, pa.float64()),
        "props": pa.array(["{}"] * n, pa.string()),
    }), os.path.join(d, "events.parquet"))
    out = events_selfjoin_size_f2(d).iloc[0]
    assert out["true_f2"] == 11
    # bucketing only merges keys ⇒ the estimate is an upper bound
    assert out["bucket_f2"] >= 11
    assert out["inflation"] >= 1.0


def test_f2_upper_bound_testdata(ray_session):
    from pdf_to_text_ray.pipelines.queries import events_selfjoin_size_f2

    out = events_selfjoin_size_f2(SF).iloc[0]
    assert out["bucket_f2"] >= out["true_f2"] > 0
    assert out["inflation"] >= 1.0


# ── split-leakage PSI ────────────────────────────────────────────────

def test_split_psi_moderate_on_hash_split(ray_session):
    """Source-granular splitting over only 20 sources leaves ~2
    sources on the test side, so PSI sits in the moderate band
    (~0.26 here) — well under the planted-skew magnitude the next
    test produces, but above the per-row-split noise floor. That gap
    IS the metric's value: it quantifies the price of leakage-safe
    (source-level) splitting on a low-source-count corpus."""
    from pdf_to_text_ray.pipelines.queries import split_length_psi

    out = split_length_psi(SF).iloc[0]
    assert out["n_bins"] >= 5
    assert 0.0 <= out["psi"] < 0.5


def test_split_psi_detects_planted_skew(ray_session, tmp_path):
    """A corpus whose test-side sources are all long documents gets a
    large PSI — the check actually fires on leakage-shaped skew."""
    from pdf_to_text_ray.pipelines.queries import split_length_psi
    from pdf_to_text_ray.stages.sketches import md5_uniform

    d = os.path.join(str(tmp_path), "psi")
    os.makedirs(d, exist_ok=True)
    srcs = [f"src{i}" for i in range(40)]
    u = md5_uniform(srcs)
    # plant: test sources (u >= 0.9) get 10× longer docs
    rows_src, rows_len = [], []
    for s, uu in zip(srcs, u):
        for k in range(20):
            rows_src.append(s)
            rows_len.append(5000 + 17 * k if uu >= 0.9 else 500 + 17 * k)
    n = len(rows_src)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(["w"] * n, pa.string()),
        "lang": pa.array(["en"] * n, pa.string()),
        "source": pa.array(rows_src, pa.string()),
        "n_chars": pa.array(rows_len, pa.int64()),
    }), os.path.join(d, "documents.parquet"))
    out = split_length_psi(d).iloc[0]
    assert out["psi"] > 1.0


# ── event-type lift ──────────────────────────────────────────────────

def test_lift_analytic_fixture(ray_session, tmp_path):
    """4 users: {a,b} {a,b} {a} {b} ⇒ lift(a,b) = (2·4)/(3·3)."""
    from pdf_to_text_ray.pipelines.queries import event_type_lift

    d = os.path.join(str(tmp_path), "lift")
    os.makedirs(d, exist_ok=True)
    pairs = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (4, "b"),
             (1, "a")]        # duplicate (1,a) must not double-count
    n = len(pairs)
    pq.write_table(pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(pd.date_range("2024-01-01", periods=n, freq="s")),
        "user_id": pa.array([p[0] for p in pairs], pa.int64()),
        "event_type": pa.array([p[1] for p in pairs], pa.string()),
        "value": pa.array([1.0] * n, pa.float64()),
        "props": pa.array(["{}"] * n, pa.string()),
    }), os.path.join(d, "events.parquet"))
    out = event_type_lift(d)
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["type_a"], r["type_b"], r["n_both"]) == ("a", "b", 2)
    assert r["lift"] == pytest.approx(8 / 9, abs=1e-6)


def test_lift_positive_and_complete(ray_session):
    from pdf_to_text_ray.pipelines.queries import event_type_lift

    out = event_type_lift(SF)
    # 5 event types → all 10 unordered pairs co-occur in this corpus
    assert len(out) == 10
    assert (out["type_a"] < out["type_b"]).all()
    assert (out["lift"] > 0).all()
    assert (out["n_both"] > 0).all()


# ── selectivity evaluation ───────────────────────────────────────────

def test_selectivity_est_close_to_true(ray_session):
    """Equi-depth interpolation over 20 buckets keeps the estimate
    within half a bucket (2.5 pp) of the true selectivity."""
    from pdf_to_text_ray.pipelines.queries import price_selectivity_eval

    out = price_selectivity_eval(SF)
    assert len(out) == 3
    assert (out["abs_err"] < 0.025).all()
    assert out["est_sel"].is_monotonic_increasing
    assert out["true_sel"].is_monotonic_increasing


def test_rank_for_matches_duckdb_decimal_semantics():
    """The 0.55×6000 float edge: exact-decimal ceil(q·n)−1 must pick
    rank 3299, not the float-drifted 3300 (regression for the
    price_selectivity_eval mismatch)."""
    from pdf_to_text_ray.stages.quantiles import _rank_for

    assert _rank_for(0.55, 6000) == 3299
    assert _rank_for(0.05, 6000) == 299
    assert _rank_for(0.5, 7) == 3
    assert _rank_for(0.0, 10) == 0
    assert _rank_for(1.0, 10) == 9
    # positions where ceil genuinely lands mid-bucket
    assert _rank_for(0.41, 10) == 4
    assert _rank_for(0.39, 10) == 3


# ── source quality report card ───────────────────────────────────────

def test_quality_report_consistent_with_parts(ray_session):
    """The report's columns agree with the standalone operators it
    composes (same doc populations, same aggregation)."""
    from pdf_to_text_ray.pipelines.queries import (doc_char_entropy,
                                                   doc_flesch_score,
                                                   source_quality_report)

    rep = source_quality_report(SF).set_index("source")
    assert rep["n_docs"].sum() == 500
    # recompute mean flesch per source from the per-doc operator
    fl = doc_flesch_score(SF).to_pandas()
    docs = pq.read_table(os.path.join(SF, "documents.parquet"),
                         columns=["doc_id", "source"]).to_pandas()
    fl = fl.merge(docs, on="doc_id")
    # per-doc flesch is rounded 6dp in the standalone op, the report
    # averages unrounded values — agree to ~1e-4
    want = fl.groupby("source")["flesch"].mean()
    got = rep["mean_flesch"]
    assert np.abs((want - got).to_numpy()).max() < 1e-3
    ent = doc_char_entropy(SF).to_pandas().merge(docs, on="doc_id")
    want_h = ent.groupby("source")["entropy_bits"].mean()
    assert np.abs((want_h - rep["mean_entropy"]).to_numpy()).max() < 1e-3
    assert rep["oov_rate"].between(0, 1).all()


# ── k-anonymity audit ────────────────────────────────────────────────

def test_kanon_counts_planted_small_groups(ray_session, tmp_path):
    """3 rows of (a, hour0), 1 of (b, hour0), 1 of (b, hour1):
    k=5 ⇒ all 3 groups small, 5 rows at risk."""
    from pdf_to_text_ray.pipelines.queries import k_anonymity_audit

    d = os.path.join(str(tmp_path), "kanon")
    os.makedirs(d, exist_ok=True)
    ts = (["2024-01-01 10:15:00"] * 3
          + ["2024-01-01 10:45:00", "2024-01-01 11:05:00"])
    types = ["a"] * 3 + ["b", "b"]
    n = len(ts)
    pq.write_table(pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(pd.to_datetime(ts)),
        "user_id": pa.array([1] * n, pa.int64()),
        "event_type": pa.array(types, pa.string()),
        "value": pa.array([1.0] * n, pa.float64()),
        "props": pa.array(["{}"] * n, pa.string()),
    }), os.path.join(d, "events.parquet"))
    out = k_anonymity_audit(d).iloc[0]
    assert (out["n_groups"], out["n_small_groups"],
            out["rows_at_risk"]) == (3, 3, 5)


def test_kanon_risk_bounded(ray_session):
    from pdf_to_text_ray.pipelines.queries import k_anonymity_audit

    out = k_anonymity_audit(SF).iloc[0]
    assert out["n_small_groups"] <= out["n_groups"]
    assert out["rows_at_risk"] <= out["n_small_groups"] * (out["k"] - 1)


# ── DP noisy counts ──────────────────────────────────────────────────

def test_dp_noise_matches_inverse_laplace(ray_session):
    from pdf_to_text_ray.pipelines.queries import (DP_EPSILON,
                                                   dp_noisy_type_counts)
    from pdf_to_text_ray.stages.sketches import md5_uniform

    out = dp_noisy_type_counts(SF)
    u = md5_uniform([f"dp:{t}" for t in out["event_type"]])
    b = 1.0 / DP_EPSILON
    want = -b * np.sign(u - 0.5) * np.log(1.0 - 2.0 * np.abs(u - 0.5))
    got = out["n_noisy"].to_numpy() - out["n"].to_numpy()
    assert np.allclose(got, want, atol=5e-6)
    # Laplace(1) noise: every draw finite, typically within ~7 = ln(1/u_min)
    assert np.abs(got).max() < 25


# ── contrastive negative plan ────────────────────────────────────────

def test_negative_plan_excludes_same_source(ray_session):
    from pdf_to_text_ray.pipelines.queries import (NEG_K,
                                                   contrastive_negative_plan)

    out = contrastive_negative_plan(SF)
    docs = pq.read_table(os.path.join(SF, "documents.parquet"),
                         columns=["doc_id", "source"]).to_pandas()
    src = docs.set_index("doc_id")["source"]
    assert (out["anchor_id"] != out["neg_id"]).all()
    assert (src.loc[out["anchor_id"]].to_numpy()
            != src.loc[out["neg_id"]].to_numpy()).all()
    per = out.groupby("anchor_id")["rank"].agg(["count", "max"])
    assert (per["count"] <= NEG_K).all()
    assert (per["count"] == per["max"]).all()   # dense 1..k ranks
    # same plan every run
    again = contrastive_negative_plan(SF)
    pd.testing.assert_frame_equal(out, again)


# ── RFM segmentation ─────────────────────────────────────────────────

def test_rfm_bins_and_segment_consistent(ray_session):
    from pdf_to_text_ray.pipelines.queries import user_rfm_segments

    out = user_rfm_segments(SF).to_pandas()
    for c in ("r_bin", "f_bin", "m_bin"):
        assert out[c].between(1, 4).all()
    assert (out["segment"] == out["r_bin"] * 100 + out["f_bin"] * 10
            + out["m_bin"]).all()
    assert (out["r_days"] >= 0).all()
    assert (out["f"] >= 1).all()
    # bins are monotone in their metric: a strictly larger metric can
    # never land in a strictly smaller bin
    for metric, b in (("r_days", "r_bin"), ("f", "f_bin"), ("m", "m_bin")):
        s = out.sort_values(metric)
        assert s[b].is_monotonic_increasing


def test_rfm_quartiles_roughly_balanced(ray_session):
    """With 150 purchasers at sf0.01 each quartile holds a nontrivial
    share (ties can skew but not empty a bin)."""
    from pdf_to_text_ray.pipelines.queries import user_rfm_segments

    out = user_rfm_segments(SF01).to_pandas()
    assert len(out) == 150
    for c in ("f_bin", "m_bin"):
        counts = out[c].value_counts()
        assert counts.min() >= len(out) * 0.05


# ── churn labels ─────────────────────────────────────────────────────

def test_churn_labels_match_window(ray_session, tmp_path):
    from pdf_to_text_ray.pipelines.queries import user_churn_labels

    d = os.path.join(str(tmp_path), "churn")
    os.makedirs(d, exist_ok=True)
    rows = [(1, "2024-01-01"), (1, "2024-01-10"),   # 21d before horizon → churned
            (2, "2024-01-28"),                       # 3d before → active
            (3, "2024-01-31"),                       # horizon user → active
            (4, "2024-01-17 00:00:01")]              # 13d23h59m → active (< 14d)
    n = len(rows)
    pq.write_table(pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(pd.to_datetime([r[1] for r in rows],
                                      format="mixed")),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array(["x"] * n, pa.string()),
        "value": pa.array([1.0] * n, pa.float64()),
        "props": pa.array(["{}"] * n, pa.string()),
    }), os.path.join(d, "events.parquet"))
    out = user_churn_labels(d).to_pandas().set_index("user_id")
    assert out.loc[1, "churned"] == 1
    assert out.loc[2, "churned"] == 0
    assert out.loc[3, "churned"] == 0
    assert out.loc[4, "churned"] == 0
    assert out.loc[1, "n_events"] == 2


def test_churn_rate_sane(ray_session):
    from pdf_to_text_ray.pipelines.queries import user_churn_labels

    out = user_churn_labels(SF).to_pandas()
    assert set(out["churned"].unique()) <= {0, 1}
    assert len(out) == 15


# ── k-core decomposition ─────────────────────────────────────────────

def _order_rows(order_part_pairs):
    n = len(order_part_pairs)
    return pa.table({
        "l_orderkey": pa.array([p[0] for p in order_part_pairs],
                               pa.int64()),
        "l_partkey": pa.array([p[1] for p in order_part_pairs],
                              pa.int64()),
        "l_quantity": pa.array([1.0] * n, pa.float64()),
        "l_extendedprice": pa.array([10.0] * n, pa.float64()),
        "l_discount": pa.array([0.0] * n, pa.float64()),
        "l_tax": pa.array([0.0] * n, pa.float64()),
    })


def test_kcore_peels_planted_fringe(ray_session, tmp_path):
    """A 4-clique (order with 4 parts) is a 3-core; a pendant chain
    hanging off it peels away over the rounds."""
    from pdf_to_text_ray.pipelines.queries import part_kcore

    d = os.path.join(str(tmp_path), "kcore")
    os.makedirs(d, exist_ok=True)
    rows = [(1, p) for p in (10, 11, 12, 13)]      # K4 → 3-core
    rows += [(2, 13), (2, 20), (3, 20), (3, 21)]   # chain 13-20-21
    pq.write_table(_order_rows(rows),
                   os.path.join(d, "lineitem.parquet"))
    out = part_kcore(d).to_pandas()
    assert sorted(out["part"]) == [10, 11, 12, 13]
    assert (out["core_degree"] == 3).all()


def test_kcore_is_subgraph_closed(ray_session):
    """Every member of the reported 3-core has degree ≥ 3 WITHIN the
    core — the defining closure property."""
    from pdf_to_text_ray.pipelines.queries import KCORE_K, part_kcore

    out = part_kcore(SF).to_pandas()
    assert (out["core_degree"] >= KCORE_K).all()
    assert out["part"].is_unique


# ── rank-biased overlap ──────────────────────────────────────────────

def test_rbo_matches_standalone_legs(ray_session):
    """Recompute RBO from the standalone BM25 and KNN operators' own
    outputs — the composed metric must agree with its parts."""
    import math

    from pdf_to_text_ray.pipelines.queries import (RBO_DEPTH, RBO_P,
                                                   RRF_QUERY_ID,
                                                   retrieval_rbo)
    from pdf_to_text_ray.stages.index import bm25_topk
    from pdf_to_text_ray.stages.similarity import knn_bruteforce
    from pdf_to_text_ray.pipelines.queries import (BM25_SEARCH_TERMS,
                                                   _read)

    out = retrieval_rbo(SF).iloc[0]
    assert 0.0 <= out["rbo"] <= 1.0

    lex = bm25_topk(_read(SF, "documents", ["doc_id", "text"]),
                    BM25_SEARCH_TERMS, topk=RBO_DEPTH)
    a = lex["doc_id"].to_numpy(np.int64)
    sem = knn_bruteforce(_read(SF, "embeddings", ["vec_id", "embedding"]),
                         [RRF_QUERY_ID], k=RBO_DEPTH).sort_values("rank")
    b = sem["vec_id"].to_numpy(np.int64)
    want = (1 - RBO_P) * sum(
        math.pow(RBO_P, k - 1) * len(set(a[:k]) & set(b[:k])) / k
        for k in range(1, RBO_DEPTH + 1))
    assert out["rbo"] == pytest.approx(want, abs=2e-6)
    assert out["overlap_at_depth"] == len(set(a) & set(b))
    # lexical and semantic views of this synthetic corpus are nearly
    # independent — RBO should sit far below the identical-list 1.0
    assert out["rbo"] < 0.5


# ── degree assortativity ─────────────────────────────────────────────

def test_assortativity_bounded_and_matches_numpy(ray_session):
    """|r| ≤ 1, and the distributed moments agree with a direct numpy
    recomputation from the oracle-identical edge list."""
    import duckdb

    from pdf_to_text_ray.pipelines.queries import copurchase_assortativity

    out = copurchase_assortativity(SF).iloc[0]
    assert -1.0 <= out["assortativity"] <= 1.0
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"'{SF}/lineitem.parquet'")
    e = con.execute("""
        WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        SELECT DISTINCT a.l_partkey u, b.l_partkey v
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    """).df()
    assert out["n_edges"] == len(e)
    import collections
    deg = collections.Counter()
    for u, v in zip(e["u"], e["v"]):
        deg[u] += 1
        deg[v] += 1
    x = np.array([deg[u] for u in e["u"]] + [deg[v] for v in e["v"]],
                 np.float64)
    y = np.array([deg[v] for v in e["v"]] + [deg[u] for u in e["u"]],
                 np.float64)
    want = np.corrcoef(x, y)[0, 1]
    assert out["assortativity"] == pytest.approx(want, abs=1e-5)


# ── cross-source duplicate crosstab ──────────────────────────────────

def test_dup_crosstab_closed_form(ray_session, tmp_path):
    """Cluster A spans s1(×3), s2(×2); cluster B spans s2(×1), s3(×1):
    cells (s1,s1)=3, (s1,s2)=6, (s2,s2)=1, (s2,s3)=1."""
    from pdf_to_text_ray.pipelines.queries import source_dup_crosstab

    d = os.path.join(str(tmp_path), "crosstab")
    os.makedirs(d, exist_ok=True)
    rows = [("A", "s1")] * 3 + [("A", "s2")] * 2 \
        + [("B", "s2"), ("B", "s3"), ("C", "s3")]
    n = len(rows)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array([r[0] for r in rows], pa.string()),
        "lang": pa.array(["en"] * n, pa.string()),
        "source": pa.array([r[1] for r in rows], pa.string()),
    }), os.path.join(d, "documents.parquet"))
    out = source_dup_crosstab(d).set_index(["source_a", "source_b"])
    assert out.loc[("s1", "s1"), "n_pairs"] == 3
    assert out.loc[("s1", "s2"), "n_pairs"] == 6
    assert out.loc[("s2", "s2"), "n_pairs"] == 1
    assert out.loc[("s2", "s3"), "n_pairs"] == 1
    assert len(out) == 4        # singleton C contributes nothing


def test_dup_crosstab_mass_matches_cluster_hist(ray_session):
    """Σ crosstab pairs == Σ C(cluster_size, 2) from the cluster-size
    histogram — same dup structure, two views (sf0.1 has real dups)."""
    from pdf_to_text_ray.pipelines.queries import (dup_cluster_size_hist,
                                                   source_dup_crosstab)

    sf = "/root/testdata/sf0.1"
    ct = source_dup_crosstab(sf)
    hist = dup_cluster_size_hist(sf)
    want = sum(n * (s * (s - 1) // 2)
               for s, n in zip(hist["cluster_size"], hist["n_clusters"]))
    assert ct["n_pairs"].sum() == want > 0


# ── seasonality index ────────────────────────────────────────────────

def test_seasonality_index_normalized(ray_session):
    from pdf_to_text_ray.pipelines.queries import orders_seasonality_index

    out = orders_seasonality_index(SF)
    assert len(out) == 12
    # count-weighted... no: the UNWEIGHTED mean of the index is 1 by
    # construction (each month's n·k/total averages to 1 over months)
    assert out["seasonality_index"].mean() == pytest.approx(1.0,
                                                            abs=2e-5)
    assert (out["seasonality_index"] > 0).all()


# ── session bounce rate ──────────────────────────────────────────────

def test_bounce_rate_fixture(ray_session, tmp_path):
    """User 1: [a] (bounce), 31 min later [b, c] (entry b, no bounce);
    user 2: [a, a] (entry a, no bounce) ⇒ a: 2 sessions 1 bounce."""
    from pdf_to_text_ray.pipelines.queries import session_bounce_rate

    d = os.path.join(str(tmp_path), "bounce")
    os.makedirs(d, exist_ok=True)
    rows = [(1, "a", "2024-01-01 10:00:00"),
            (1, "b", "2024-01-01 10:31:00"),
            (1, "c", "2024-01-01 10:32:00"),
            (2, "a", "2024-01-01 09:00:00"),
            (2, "a", "2024-01-01 09:10:00")]
    n = len(rows)
    pq.write_table(pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(pd.to_datetime([r[2] for r in rows])),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[1] for r in rows], pa.string()),
        "value": pa.array([1.0] * n, pa.float64()),
        "props": pa.array(["{}"] * n, pa.string()),
    }), os.path.join(d, "events.parquet"))
    out = session_bounce_rate(d).set_index("entry_type")
    assert out.loc["a", "n_sessions"] == 2
    assert out.loc["a", "n_bounces"] == 1
    assert out.loc["a", "bounce_rate"] == pytest.approx(0.5)
    assert out.loc["b", "n_sessions"] == 1
    assert out.loc["b", "n_bounces"] == 0
    assert "c" not in out.index          # c never opens a session


def test_bounce_rate_bounded(ray_session):
    from pdf_to_text_ray.pipelines.queries import session_bounce_rate

    out = session_bounce_rate(SF)
    assert (out["bounce_rate"].between(0, 1)).all()
    assert (out["n_bounces"] <= out["n_sessions"]).all()


# ── Lorenz curve ─────────────────────────────────────────────────────

def test_lorenz_monotone_convex_and_ends_at_one(ray_session):
    from pdf_to_text_ray.pipelines.queries import user_event_lorenz

    out = user_event_lorenz(SF)
    assert len(out) == 10
    s = out["cum_share"].to_numpy()
    assert (np.diff(s) > 0).all()            # strictly increasing
    assert s[-1] == pytest.approx(1.0)
    # Lorenz property: the bottom x% of users (x = the REALIZED
    # fraction n_users/U — ceil overshoots p on a 15-user corpus)
    # hold at most x% of the volume
    u_total = out["n_users"].iloc[-1]
    x = out["n_users"].to_numpy() / u_total
    assert (s <= x + 1e-9).all()


def test_lorenz_consistent_with_gini(ray_session):
    """Gini ≈ 1 − 2·AUC of the Lorenz curve (trapezoid over deciles;
    coarse grid ⇒ loose tolerance)."""
    from pdf_to_text_ray.pipelines.queries import (user_event_gini,
                                                   user_event_lorenz)

    lz = user_event_lorenz(SF)
    g = user_event_gini(SF).iloc[0]["gini"]
    xs = np.concatenate([[0.0], lz["p"].to_numpy()])
    ys = np.concatenate([[0.0], lz["cum_share"].to_numpy()])
    auc = np.trapz(ys, xs)
    assert g == pytest.approx(1 - 2 * auc, abs=0.05)


# ── code-review r19 regressions ──────────────────────────────────────

def test_lift_empty_when_no_user_has_two_types(ray_session, tmp_path):
    """Every user holds exactly one type ⇒ an EMPTY typed frame, not a
    KeyError (code-review r19 finding)."""
    from pdf_to_text_ray.pipelines.queries import event_type_lift

    d = os.path.join(str(tmp_path), "lift0")
    os.makedirs(d, exist_ok=True)
    pq.write_table(pa.table({
        "event_id": pa.array(range(4), pa.int64()),
        "ts": pa.array(pd.date_range("2024-01-01", periods=4, freq="s")),
        "user_id": pa.array([1, 1, 2, 3], pa.int64()),
        "event_type": pa.array(["a", "a", "b", "c"], pa.string()),
        "value": pa.array([1.0] * 4, pa.float64()),
        "props": pa.array(["{}"] * 4, pa.string()),
    }), os.path.join(d, "events.parquet"))
    out = event_type_lift(d)
    assert len(out) == 0
    assert list(out.columns) == ["type_a", "type_b", "n_both", "lift"]


def test_markov_universe_includes_transitionless_type(ray_session,
                                                      tmp_path):
    """A type that only ever appears as a user's single event (no
    transition in or out) must still appear in the output with prob 0,
    matching the oracle's DISTINCT-event_type universe (code-review
    r19 finding)."""
    from pdf_to_text_ray.pipelines.queries import event_markov_stationary

    d = os.path.join(str(tmp_path), "markov2")
    os.makedirs(d, exist_ok=True)
    # user 1 cycles a<->b; user 2 fires a single 'z' event
    rows = [(1, "a"), (1, "b"), (1, "a"), (1, "b"), (2, "z")]
    n = len(rows)
    pq.write_table(pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(pd.date_range("2024-01-01", periods=n, freq="s")),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[1] for r in rows], pa.string()),
        "value": pa.array([0.0] * n, pa.float64()),
        "props": pa.array(["{}"] * n, pa.string()),
    }), os.path.join(d, "events.parquet"))
    out = event_markov_stationary(d).set_index("event_type")
    assert "z" in out.index
    assert out.loc["z", "stationary_prob"] == 0.0
    # the a<->b cycle keeps all surviving mass; uniform start leaks
    # z's 1/3 (documented dangling-type behavior, identical in SQL)
    assert out.loc["a", "stationary_prob"] + \
        out.loc["b", "stationary_prob"] == pytest.approx(2 / 3, abs=1e-5)


# ── Kaplan–Meier ─────────────────────────────────────────────────────

def test_km_analytic_with_censoring(ray_session, tmp_path):
    """3 viewers: converts at 10s, converts at 20s, censored at 30s ⇒
    S(10)=2/3, S(20)=1/3 (the censored user stays at risk through 20)."""
    from pdf_to_text_ray.pipelines.queries import view_purchase_kaplan_meier

    d = os.path.join(str(tmp_path), "km")
    os.makedirs(d, exist_ok=True)
    rows = [(1, "view", "2024-01-01 00:00:00"),
            (1, "purchase", "2024-01-01 00:00:10"),
            (2, "view", "2024-01-01 00:00:00"),
            (2, "purchase", "2024-01-01 00:00:20"),
            (3, "view", "2024-01-01 00:00:00"),
            (3, "click", "2024-01-01 00:00:30")]   # horizon: censored
    n = len(rows)
    pq.write_table(pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(pd.to_datetime([r[2] for r in rows])),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[1] for r in rows], pa.string()),
        "value": pa.array([1.0] * n, pa.float64()),
        "props": pa.array(["{}"] * n, pa.string()),
    }), os.path.join(d, "events.parquet"))
    out = view_purchase_kaplan_meier(d).set_index("t_us")
    assert out.loc[10_000_000, "n_risk"] == 3
    assert out.loc[10_000_000, "survival"] == pytest.approx(2 / 3,
                                                            abs=1e-6)
    assert out.loc[20_000_000, "n_risk"] == 2
    assert out.loc[20_000_000, "survival"] == pytest.approx(1 / 3,
                                                            abs=1e-6)


def test_km_monotone_nonincreasing(ray_session):
    from pdf_to_text_ray.pipelines.queries import view_purchase_kaplan_meier

    out = view_purchase_kaplan_meier(SF)
    s = out["survival"].to_numpy()
    assert (np.diff(s) <= 1e-9).all()
    assert (out["n_events"] >= 1).all()
    assert ((0 <= s) & (s <= 1)).all()
    # at-risk counts shrink as time advances
    assert (np.diff(out["n_risk"].to_numpy()) <= 0).all()


# ── CUPED ────────────────────────────────────────────────────────────

def test_cuped_perfect_covariate(ray_session, tmp_path):
    """Post value = 2 × pre value per user ⇒ corr² = 1: CUPED removes
    ALL variance and θ = 2."""
    from pdf_to_text_ray.pipelines.queries import cuped_variance_reduction

    d = os.path.join(str(tmp_path), "cuped")
    os.makedirs(d, exist_ok=True)
    rows = []
    for uid in range(1, 9):
        rows.append((uid, f"2024-01-0{(uid % 3) + 1}", float(uid)))
        rows.append((uid, f"2024-02-0{(uid % 3) + 1}", 2.0 * uid))
    n = len(rows)
    pq.write_table(pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(pd.to_datetime([r[1] for r in rows])),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array(["x"] * n, pa.string()),
        "value": pa.array([r[2] for r in rows], pa.float64()),
        "props": pa.array(["{}"] * n, pa.string()),
    }), os.path.join(d, "events.parquet"))
    out = cuped_variance_reduction(d).iloc[0]
    assert out["n_users"] == 8
    assert out["theta"] == pytest.approx(2.0, abs=1e-6)
    assert out["var_reduction"] == pytest.approx(1.0, abs=1e-6)


def test_cuped_bounded_on_testdata(ray_session):
    from pdf_to_text_ray.pipelines.queries import cuped_variance_reduction

    out = cuped_variance_reduction(SF).iloc[0]
    assert 0.0 <= out["var_reduction"] <= 1.0
    assert out["n_users"] > 0


# ── difference-in-differences ────────────────────────────────────────

def test_did_recovers_planted_effect(ray_session, tmp_path):
    """Plant +5 on treated users' post-period values over a flat base:
    DiD recovers exactly 5 (parallel trends hold by construction)."""
    from pdf_to_text_ray.pipelines.queries import did_value_estimate
    from pdf_to_text_ray.stages.sketches import md5_uniform

    d = os.path.join(str(tmp_path), "did")
    os.makedirs(d, exist_ok=True)
    users = list(range(1, 41))
    treat = {u: md5_uniform([f"did:{u}"])[0] < 0.5 for u in users}
    rows = []
    for u in users:
        rows.append((u, "2024-01-01", 10.0))                  # pre
        rows.append((u, "2024-03-01",
                     12.0 + (5.0 if treat[u] else 0.0)))      # post
    n = len(rows)
    pq.write_table(pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(pd.to_datetime([r[1] for r in rows])),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array(["x"] * n, pa.string()),
        "value": pa.array([r[2] for r in rows], pa.float64()),
        "props": pa.array(["{}"] * n, pa.string()),
    }), os.path.join(d, "events.parquet"))
    out = did_value_estimate(d).iloc[0]
    assert out["did"] == pytest.approx(5.0, abs=1e-6)
    assert out["mean_c_post"] - out["mean_c_pre"] == pytest.approx(
        2.0, abs=1e-6)
    assert out["n_events"] == n


def test_did_near_zero_without_effect(ray_session):
    """On the synthetic stream the hash coin is independent of value,
    so DiD sits near zero relative to the value scale."""
    from pdf_to_text_ray.pipelines.queries import did_value_estimate

    out = did_value_estimate(SF01).iloc[0]
    scale = abs(out["mean_c_post"]) + abs(out["mean_t_post"])
    assert abs(out["did"]) < 0.5 * scale


# ── Theil–Sen robust slope ───────────────────────────────────────────

def test_theil_sen_immune_to_planted_outliers(ray_session, tmp_path):
    """y = 3x with 10% wild outliers: Theil–Sen recovers slope 3 while
    OLS on the same data would be dragged far off."""
    from pdf_to_text_ray.pipelines.queries import lineitem_theil_sen

    d = os.path.join(str(tmp_path), "tsen")
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(11)
    n = 400
    x = rng.uniform(1, 50, n).round(2)
    y = 3.0 * x
    out_idx = rng.choice(n, n // 10, replace=False)
    y[out_idx] = 50_000.0        # wild outliers
    pq.write_table(pa.table({
        "l_orderkey": pa.array(range(n), pa.int64()),
        "l_linenumber": pa.array([1] * n, pa.int64()),
        "l_quantity": pa.array(x, pa.float64()),
        "l_extendedprice": pa.array(y, pa.float64()),
        "l_discount": pa.array([0.0] * n, pa.float64()),
        "l_tax": pa.array([0.0] * n, pa.float64()),
    }), os.path.join(d, "lineitem.parquet"))
    out = lineitem_theil_sen(d).iloc[0]
    assert out["n_sample"] == 200
    assert out["theil_sen_slope"] == pytest.approx(3.0, abs=0.2)


def test_theil_sen_positive_on_testdata(ray_session):
    from pdf_to_text_ray.pipelines.queries import lineitem_theil_sen

    out = lineitem_theil_sen(SF).iloc[0]
    # the synthetic lineitem prices are independent of quantity (no
    # TPC-H qty×unit-price structure), so only shape is asserted
    assert np.isfinite(out["theil_sen_slope"])
    assert out["n_sample"] == 200
    assert out["n_slopes"] > 19_000      # few duplicate-x pairs drop


# ── Herfindahl index ─────────────────────────────────────────────────

def test_hhi_uniform_sources(ray_session, tmp_path):
    """4 equal sources ⇒ HHI = 0.25, effective sources = 4."""
    from pdf_to_text_ray.pipelines.queries import source_hhi

    d = os.path.join(str(tmp_path), "hhi")
    os.makedirs(d, exist_ok=True)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(40), pa.int64()),
        "text": pa.array(["w"] * 40, pa.string()),
        "lang": pa.array(["en"] * 40, pa.string()),
        "source": pa.array([f"s{i % 4}" for i in range(40)], pa.string()),
    }), os.path.join(d, "documents.parquet"))
    out = source_hhi(d).iloc[0]
    assert out["hhi"] == pytest.approx(0.25, abs=1e-6)
    assert out["effective_sources"] == pytest.approx(4.0, abs=1e-5)


def test_hhi_bounds(ray_session):
    from pdf_to_text_ray.pipelines.queries import source_hhi

    out = source_hhi(SF).iloc[0]
    k = out["n_sources"]
    assert 1.0 / k - 1e-9 <= out["hhi"] <= 1.0
    assert 1.0 <= out["effective_sources"] <= k
