"""Round-15 operators: distributed ROC-AUC, CUSUM changepoint, Welch
A/B t-test, key-collision fingerprint clustering, Cohen's kappa —
each checked against a naive brute-force reference on tiny
constructed tables."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from pdf_to_text_ray.pipelines.queries import (
    ab_test_value_welch,
    doc_fingerprint_clusters,
    event_value_auc,
    event_value_cusum,
    langid_agreement_kappa,
)


def _write_events(tmp_path, types, users, values):
    n = len(values)
    t = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(
            pd.to_datetime(np.arange(n), unit="s"), pa.timestamp("us")),
        "user_id": pa.array(users, pa.int64()),
        "event_type": pa.array(types, pa.string()),
        "value": pa.array(values, pa.float64()),
        "props": pa.array(["{}"] * n, pa.string()),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    return str(tmp_path)


def _write_docs(tmp_path, texts, langs=None):
    n = len(texts)
    t = pa.table({
        "doc_id": pa.array(range(1, n + 1), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs or ["en"] * n, pa.string()),
        "source": pa.array(["s"] * n, pa.string()),
        "n_chars": pa.array([len(x) for x in texts], pa.int64()),
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    return str(tmp_path)


def _naive_auc(scores, labels):
    """O(P*N) pairwise AUC with 0.5 credit for ties."""
    pos = [s for s, y in zip(scores, labels) if y]
    neg = [s for s, y in zip(scores, labels) if not y]
    wins = sum(1.0 if p > q else 0.5 if p == q else 0.0
               for p in pos for q in neg)
    return wins / (len(pos) * len(neg))


def test_auc_matches_naive_pairwise_with_ties(tmp_path):
    rng = np.random.default_rng(7)
    n = 400
    labels = rng.random(n) < 0.3
    # ties on purpose: quantized scores, positives shifted up
    values = np.round(rng.random(n) * 10 + labels * 2.0, 1)
    types = np.where(labels, "purchase", "view")
    sf = _write_events(tmp_path, list(types), list(range(n)),
                       list(values))
    out = event_value_auc(sf)
    assert int(out["n_pos"][0]) == int(labels.sum())
    assert int(out["n_neg"][0]) == int((~labels).sum())
    expect = round(_naive_auc(values, labels), 6)
    assert float(out["auc"][0]) == expect


def test_auc_perfect_and_random_extremes(tmp_path):
    # perfectly separated: every purchase value above every view value
    types = ["view"] * 5 + ["purchase"] * 5
    values = [1.0, 2, 3, 4, 5, 10, 11, 12, 13, 14.0]
    sf = _write_events(tmp_path, types, list(range(10)), values)
    assert float(event_value_auc(sf)["auc"][0]) == 1.0


def _naive_cusum(values, m, sd, k=0.5, h=4.0):
    s, mx, alarms, first = 0.0, 0.0, 0, None
    out = []
    for i, v in enumerate(values):
        s = max(0.0, s + (v - m) / sd - k)
        out.append(round(s, 9))
    for i, si in enumerate(out):
        mx = max(mx, si)
        if si > h:
            alarms += 1
            if first is None:
                first = i
    return round(mx, 6), alarms, first


def test_cusum_identity_matches_sequential_loop(tmp_path):
    rng = np.random.default_rng(11)
    vals = list(rng.normal(5.0, 1.0, 300))
    vals += list(rng.normal(9.0, 1.0, 40))  # level shift -> alarms
    sf = _write_events(tmp_path, ["m"] * len(vals),
                       list(range(len(vals))), vals)
    out = event_value_cusum(sf)
    assert list(out["event_type"]) == ["m"]
    arr = np.asarray(vals)
    m = round(float(arr.mean()), 9)
    sd = round(float(arr.std()), 9)
    mx, n_alarms, first = _naive_cusum(vals, m, sd)
    assert float(out["max_cusum"][0]) == mx
    assert int(out["n_alarms"][0]) == n_alarms
    got_first = out["first_alarm_ts"][0]
    assert got_first == pd.to_datetime(first, unit="s")


def test_cusum_no_alarms_null_timestamp(tmp_path):
    rng = np.random.default_rng(3)
    vals = list(rng.normal(0.0, 1.0, 100))
    sf = _write_events(tmp_path, ["a"] * 50 + ["b"] * 50,
                       list(range(100)), vals)
    out = event_value_cusum(sf)
    assert set(out["event_type"]) == {"a", "b"}
    assert (out["n_alarms"] == 0).all()
    assert out["first_alarm_ts"].isna().all()


def test_welch_matches_hand_formula(tmp_path):
    rng = np.random.default_rng(5)
    n = 500
    users = list(range(n))
    vals = rng.normal(10, 2, n)
    vals[np.asarray(users) % 2 == 1] += 0.7  # arm B lifted
    sf = _write_events(tmp_path, ["x"] * n, users, list(vals))
    out = ab_test_value_welch(sf)
    a = vals[np.arange(n) % 2 == 0]
    b = vals[np.arange(n) % 2 == 1]
    va, vb = a.var(ddof=1), b.var(ddof=1)
    se2 = va / len(a) + vb / len(b)
    t = (a.mean() - b.mean()) / np.sqrt(se2)
    df = se2 ** 2 / ((va / len(a)) ** 2 / (len(a) - 1)
                     + (vb / len(b)) ** 2 / (len(b) - 1))
    row = out.iloc[0]
    assert row["n_a"] == len(a) and row["n_b"] == len(b)
    assert abs(row["t_stat"] - round(t, 4)) <= 1e-4
    assert abs(row["df_welch"] - round(df, 2)) <= 0.01
    assert row["t_stat"] < -2  # the lift is detectable


def test_fingerprint_clusters_order_case_punct_insensitive(tmp_path):
    texts = [
        "The quick brown fox",
        "fox BROWN quick the!!",          # same fingerprint as 0
        "quick quick brown fox the",      # duplication collapses too
        "a completely different doc",
        "different a doc completely",     # clusters with 3
        "unique snowflake",
    ]
    sf = _write_docs(tmp_path, texts)
    out = doc_fingerprint_clusters(sf)
    assert len(out) == 2
    assert sorted(out["n_docs"]) == [2, 3]
    big = out[out["n_docs"] == 3].iloc[0]
    assert big["min_doc_id"] == 1
    small = out[out["n_docs"] == 2].iloc[0]
    assert small["min_doc_id"] == 4


def test_kappa_hand_computed(tmp_path):
    # stopword lists: en has 'the','and'; de has 'der','und'; fr 'le'
    texts = ["the and the", "der und der", "le le le", "xyzzy qwerty",
             "the the the", "und der und"]
    langs = ["en", "de", "fr", "en", "de", "de"]
    sf = _write_docs(tmp_path, texts, langs)
    out = langid_agreement_kappa(sf)
    # predicted: en, de, fr, und, en, de
    # agreement on docs 1,2,3,6 -> po = 4/6
    n = 6
    po = 4 / float(n)
    # actual marginals: en2 de3 fr1; predicted: en2 de2 fr1 und1
    pe = (2 * 2 + 3 * 2 + 1 * 1) / (float(n) * n)
    kappa = (po - pe) / (1 - pe)
    assert int(out["n_docs"][0]) == n
    assert float(out["po"][0]) == round(po, 6)
    assert float(out["pe"][0]) == round(pe, 6)
    assert float(out["kappa"][0]) == round(kappa, 6)
