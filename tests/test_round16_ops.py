"""Round-16 operators: point-in-time SCD2 join, Adamic-Adar link
prediction, seeded local clustering coefficient, calibration table,
seasonal-naive forecast backtest, NDCG ranking eval — each checked
against a naive brute-force reference on tiny constructed tables."""
import collections
import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from pdf_to_text_ray.pipelines.queries import (
    BM25_SEARCH_TERMS,
    bm25_ndcg_eval,
    event_hourly_forecast_backtest,
    event_value_calibration,
    part_adamic_adar,
    part_clustering_coeff,
    round2,
    SHUFFLE_EPOCH,
    epoch_shuffle_plan,
    label_centroid_drift,
    session_first_touch,
    source_length_ks,
    source_length_psi,
    user_event_gini,
    round6,
    user_state_at_purchase,
)


def _write_events(tmp_path, *, ts, users, types, values=None):
    n = len(ts)
    t = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(pd.to_datetime(ts), pa.timestamp("us")),
        "user_id": pa.array(users, pa.int64()),
        "event_type": pa.array(types, pa.string()),
        "value": pa.array(values or [1.0] * n, pa.float64()),
        "props": pa.array(["{}"] * n, pa.string()),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    return str(tmp_path)


def _write_lineitem(tmp_path, order_parts):
    """order_parts: list of (orderkey, [partkeys])."""
    ok, pk = [], []
    for o, parts in order_parts:
        for p in parts:
            ok.append(o)
            pk.append(p)
    n = len(ok)
    t = pa.table({
        "l_orderkey": pa.array(ok, pa.int64()),
        "l_partkey": pa.array(pk, pa.int64()),
        "l_suppkey": pa.array([1] * n, pa.int64()),
        "l_linenumber": pa.array(range(n), pa.int32()),
        "l_quantity": pa.array([1.0] * n, pa.float64()),
        "l_extendedprice": pa.array([1.0] * n, pa.float64()),
        "l_discount": pa.array([0.0] * n, pa.float64()),
        "l_tax": pa.array([0.0] * n, pa.float64()),
        "l_returnflag": pa.array(["N"] * n, pa.string()),
        "l_linestatus": pa.array(["O"] * n, pa.string()),
        "l_shipdate": pa.array(
            pd.to_datetime(["2024-01-01"] * n), pa.timestamp("us")),
    })
    pq.write_table(t, tmp_path / "lineitem.parquet")
    return str(tmp_path)


def _write_docs(tmp_path, texts):
    n = len(texts)
    t = pa.table({
        "doc_id": pa.array(range(1, n + 1), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * n, pa.string()),
        "source": pa.array(["s"] * n, pa.string()),
        "n_chars": pa.array([len(x) for x in texts], pa.int64()),
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    return str(tmp_path)


def _adj(order_parts):
    adj = collections.defaultdict(set)
    for _, parts in order_parts:
        for a in set(parts):
            for b in set(parts):
                if a != b:
                    adj[a].add(b)
    return adj


# ── user_state_at_purchase ───────────────────────────────────────────

def test_pit_state_basic_none_and_boundary(tmp_path):
    # user 1: view@0, click@10, purchase@10 (boundary: click run starts
    # at 10, valid_from <= ts inclusive → 'click'), purchase@5 → 'view'
    # user 2: purchase@0 before any state → 'none'
    sf = _write_events(
        tmp_path,
        ts=["2024-01-01 00:00:00", "2024-01-01 00:00:10",
            "2024-01-01 00:00:10", "2024-01-01 00:00:05",
            "2024-01-01 00:00:00"],
        users=[1, 1, 1, 1, 2],
        types=["view", "click", "purchase", "purchase", "purchase"])
    out = user_state_at_purchase(sf)
    got = dict(zip(out["event_id"], out["state_at"]))
    assert got == {2: "click", 3: "view", 4: "none"}


def test_pit_state_tracks_latest_run(tmp_path):
    # view→click→view runs; purchases probe each interval
    sf = _write_events(
        tmp_path,
        ts=["2024-01-01 00:00:00", "2024-01-01 00:01:00",
            "2024-01-01 00:02:00", "2024-01-01 00:00:30",
            "2024-01-01 00:01:30", "2024-01-01 00:05:00"],
        users=[7, 7, 7, 7, 7, 7],
        types=["view", "click", "view", "purchase", "purchase",
               "purchase"])
    out = user_state_at_purchase(sf)
    got = dict(zip(out["event_id"], out["state_at"]))
    assert got == {3: "view", 4: "click", 5: "view"}


# ── part_adamic_adar ─────────────────────────────────────────────────

def _naive_aa(order_parts, topk=20):
    adj = _adj(order_parts)
    rows = []
    for u in sorted(adj)[:50]:
        scores = collections.defaultdict(float)
        for z in adj[u]:
            for v in adj[z]:
                if v != u:
                    scores[v] += 1.0 / math.log(len(adj[z]))
        for v, s in scores.items():
            if v not in adj[u]:
                rows.append((u, v, float(round2(s))))
    rows.sort(key=lambda r: (-r[2], r[0], r[1]))
    return rows[:topk]


def test_adamic_adar_matches_naive(tmp_path):
    # path-ish graph with a hub: 1-2-3, 2-4, 3-4, 4-5 (orders = edges)
    order_parts = [(1, [1, 2]), (2, [2, 3]), (3, [2, 4]), (4, [3, 4]),
                   (5, [4, 5])]
    sf = _write_lineitem(tmp_path, order_parts)
    out = part_adamic_adar(sf)
    got = list(zip(out["u"], out["v"], out["aa_score"]))
    assert [(int(u), int(v), float(s)) for u, v, s in got] == \
        _naive_aa(order_parts)


def test_adamic_adar_excludes_direct_edges(tmp_path):
    # triangle 1-2-3 plus pendant 4 on 3: (1,2) adjacent → never
    # predicted even though they share neighbor 3
    order_parts = [(1, [1, 2, 3]), (2, [3, 4])]
    sf = _write_lineitem(tmp_path, order_parts)
    out = part_adamic_adar(sf)
    pairs = set(zip(out["u"].astype(int), out["v"].astype(int)))
    assert (1, 2) not in pairs and (2, 1) not in pairs
    assert (1, 4) in pairs and (4, 1) in pairs  # 2-hop via 3
    assert list(zip(out["u"], out["v"], out["aa_score"])) == [
        (u, v, float(s)) for u, v, s in _naive_aa(order_parts)]


# ── part_clustering_coeff ────────────────────────────────────────────

def test_clustering_coeff_matches_naive(tmp_path):
    # K4 minus one edge plus a pendant
    order_parts = [(1, [1, 2]), (2, [1, 3]), (3, [1, 4]), (4, [2, 3]),
                   (5, [3, 4]), (6, [4, 5])]
    sf = _write_lineitem(tmp_path, order_parts)
    out = part_clustering_coeff(sf)
    adj = _adj(order_parts)
    for _, r in out.iterrows():
        u = int(r["node"])
        nb = adj[u]
        d = len(nb)
        assert int(r["deg"]) == d
        t2 = sum(1 for x in nb for y in nb if x != y and y in adj[x])
        want = float(round6(t2 / (d * (d - 1)))) if d > 1 else 0.0
        assert float(r["coeff"]) == want


def test_clustering_coeff_triangle_is_one(tmp_path):
    sf = _write_lineitem(tmp_path, [(1, [1, 2, 3])])
    out = part_clustering_coeff(sf)
    assert (out["coeff"] == 1.0).all() and (out["deg"] == 2).all()


# ── event_value_calibration ──────────────────────────────────────────

def test_calibration_matches_naive(tmp_path):
    rng = np.random.default_rng(7)
    n = 400
    vals = rng.normal(10, 3, n).round(3)
    types = np.where(rng.random(n) < (vals - vals.min())
                     / (vals.max() - vals.min()), "purchase", "view")
    sf = _write_events(tmp_path, ts=["2024-01-01"] * n,
                       users=list(range(n)), types=list(types),
                       values=list(vals))
    out = event_value_calibration(sf)
    # naive: percent_rank = count(strictly smaller)/(n-1), 6dp
    order = np.sort(vals)
    below = np.searchsorted(order, vals, side="left")
    pr = np.floor(np.abs(below / (n - 1)) * 1e6 + 0.5) / 1e6
    bins = np.minimum(np.floor(pr * 10), 9).astype(int)
    for _, r in out.iterrows():
        m = bins == int(r["bin"])
        assert int(r["n"]) == int(m.sum())
        assert float(r["mean_score"]) == float(round6(pr[m].mean()))
        assert float(r["frac_purchase"]) == \
            (types[m] == "purchase").sum() / m.sum()
    assert int(out["n"].sum()) == n


# ── event_hourly_forecast_backtest ───────────────────────────────────

def test_forecast_backtest_matches_naive(tmp_path):
    # 50 hours of data, two types with different hourly patterns
    ts, types = [], []
    for h in range(50):
        for _ in range(h % 3):
            ts.append(pd.Timestamp("2024-01-01") + pd.Timedelta(hours=h))
            types.append("view")
        for _ in range(h % 2):
            ts.append(pd.Timestamp("2024-01-01") + pd.Timedelta(hours=h))
            types.append("click")
    sf = _write_events(tmp_path, ts=ts, users=[1] * len(ts), types=types)
    out = event_hourly_forecast_backtest(sf)

    # hour 0 emits no events (0%2 = 0%3 = 0), so the global span the
    # operator densifies over starts at hour 1
    hours = np.arange(1, 50)
    for et, mod in [("click", 2), ("view", 3)]:
        s = np.array([h % mod for h in hours], dtype=np.int64)
        ae = np.abs(s[24:] - s[:-24])
        d1 = np.abs(s[1:] - s[:-1])
        r = out[out["event_type"] == et].iloc[0]
        assert int(r["n_eval"]) == len(ae)
        assert float(r["mae"]) == ae.sum() / len(ae)
        assert float(r["mase"]) == float(round6(
            (ae.sum() / len(ae)) / (d1.sum() / len(d1))))


# ── bm25_ndcg_eval ───────────────────────────────────────────────────

def test_ndcg_perfect_ranking_is_one(tmp_path):
    # rel strictly decreasing with bm25 score: identical doc lengths,
    # tf decreasing → bm25 order == ideal order → NDCG = 1
    texts = [("hash join " * (10 - i) + "filler " * i).strip()
             for i in range(10)]
    sf = _write_docs(tmp_path, texts)
    out = bm25_ndcg_eval(sf)
    assert float(out["ndcg_10"].iloc[0]) == 1.0


def test_ndcg_matches_naive(tmp_path):
    # mixed lengths so bm25 and raw-tf orders diverge
    texts = [
        "hash " * 3 + "x " * 40,           # high tf, long
        "hash join",                        # low tf, tiny doc
        "join " * 2 + "y " * 5,
        "no match here at all",
        "hash join hash join " + "z " * 60,
    ]
    sf = _write_docs(tmp_path, [t.strip() for t in texts])
    out = bm25_ndcg_eval(sf)

    # naive reference: serial bm25 + ndcg
    docs = [t.strip().split(" ") for t in texts]
    n = len(docs)
    avgdl = sum(len(d) for d in docs) / n
    scores = []
    for i, d in enumerate(docs):
        s = 0.0
        for term in BM25_SEARCH_TERMS:
            tf = d.count(term)
            df = sum(1 for dd in docs if term in dd)
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            s += idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75
                                                 * len(d) / avgdl))
        scores.append((i + 1, float(round2(s))))
    scores.sort(key=lambda r: (-r[1], r[0]))
    rel = {i + 1: sum(d.count(t) for t in BM25_SEARCH_TERMS)
           for i, d in enumerate(docs)}
    ranked = [doc_id for doc_id, _ in scores[:10]]
    dcg = sum(rel[d] / math.log2(i + 2) for i, d in enumerate(ranked))
    ideal = sorted(rel.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    idcg = sum(r / math.log2(i + 2) for i, (_, r) in enumerate(ideal))
    assert float(out["ndcg_10"].iloc[0]) == float(round6(dcg / idcg))

# ── user_event_gini ──────────────────────────────────────────────────

def test_gini_uniform_zero_and_concentrated(tmp_path):
    # equal counts → gini 0
    sf = _write_events(tmp_path, ts=["2024-01-01"] * 6,
                       users=[1, 1, 2, 2, 3, 3], types=["view"] * 6)
    out = user_event_gini(sf)
    assert float(out["gini"].iloc[0]) == 0.0
    assert int(out["n_users"].iloc[0]) == 3


def test_gini_matches_naive(tmp_path):
    users = [1] * 10 + [2] * 3 + [3] * 1 + [4] * 6
    sf = _write_events(tmp_path, ts=["2024-01-01"] * len(users),
                       users=users, types=["view"] * len(users))
    out = user_event_gini(sf)
    c = np.sort(np.array([10, 3, 1, 6], dtype=np.int64))
    n, s = len(c), c.sum()
    i = np.arange(1, n + 1)
    want = ((2 * i - n - 1) * c).sum() / (float(n) * float(s))
    assert float(out["gini"].iloc[0]) == want


# ── source_length_ks ─────────────────────────────────────────────────

def test_ks_identical_zero_disjoint_one(tmp_path):
    # identical distributions → D = 0
    n = 6
    t = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(["x"] * n, pa.string()),
        "lang": pa.array(["en"] * n, pa.string()),
        "source": pa.array(["src0", "src1"] * 3, pa.string()),
        "n_chars": pa.array([10, 10, 20, 20, 30, 30], pa.int64()),
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    out = source_length_ks(str(tmp_path))
    assert float(out["ks_d"].iloc[0]) == 0.0

    # disjoint supports → D = 1
    t2 = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(["x"] * n, pa.string()),
        "lang": pa.array(["en"] * n, pa.string()),
        "source": pa.array(["src0"] * 3 + ["src1"] * 3, pa.string()),
        "n_chars": pa.array([1, 2, 3, 100, 200, 300], pa.int64()),
    })
    pq.write_table(t2, tmp_path / "documents.parquet")
    out2 = source_length_ks(str(tmp_path))
    assert float(out2["ks_d"].iloc[0]) == 1.0


def test_ks_matches_naive(tmp_path):
    rng = np.random.default_rng(3)
    a = rng.integers(0, 40, 30)
    b = rng.integers(10, 60, 20)
    nch = np.concatenate([a, b])
    src = ["src0"] * 30 + ["src1"] * 20
    n = len(nch)
    t = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(["x"] * n, pa.string()),
        "lang": pa.array(["en"] * n, pa.string()),
        "source": pa.array(src, pa.string()),
        "n_chars": pa.array(nch, pa.int64()),
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    out = source_length_ks(str(tmp_path))
    xs = np.unique(nch)
    ca = np.array([(a <= x).sum() for x in xs]) / len(a)
    cb = np.array([(b <= x).sum() for x in xs]) / len(b)
    assert float(out["ks_d"].iloc[0]) == float(np.max(np.abs(ca - cb)))


# ── session_first_touch ──────────────────────────────────────────────

def test_first_touch_attribution(tmp_path):
    base = pd.Timestamp("2024-01-01")
    mins = lambda m: base + pd.Timedelta(minutes=m)  # noqa: E731
    # user 1: session A starts with view, converts (value 5 + 7);
    #         session B (gap 60m) starts with click, no purchase
    # user 2: one session starting with purchase (value 3)
    ts = [mins(0), mins(10), mins(20), mins(90), mins(95),
          mins(0)]
    users = [1, 1, 1, 1, 1, 2]
    types = ["view", "purchase", "purchase", "click", "view",
             "purchase"]
    values = [0.0, 5.0, 7.0, 0.0, 0.0, 3.0]
    sf = _write_events(tmp_path, ts=ts, users=users, types=types,
                       values=values)
    out = session_first_touch(sf).set_index("first_touch")
    assert int(out.loc["view", "n_sessions"]) == 1
    assert int(out.loc["view", "n_converted"]) == 1
    assert float(out.loc["view", "purchase_value"]) == 12.0
    assert int(out.loc["click", "n_sessions"]) == 1
    assert int(out.loc["click", "n_converted"]) == 0
    assert float(out.loc["click", "purchase_value"]) == 0.0
    assert int(out.loc["purchase", "n_sessions"]) == 1
    assert int(out.loc["purchase", "n_converted"]) == 1
    assert float(out.loc["purchase", "purchase_value"]) == 3.0


def test_first_touch_exact_30min_gap_same_session(tmp_path):
    base = pd.Timestamp("2024-01-01")
    ts = [base, base + pd.Timedelta(minutes=30)]
    sf = _write_events(tmp_path, ts=ts, users=[1, 1],
                       types=["view", "purchase"], values=[0.0, 2.0])
    out = session_first_touch(sf)
    # gap == 30min exactly is NOT > threshold → one session
    assert len(out) == 1 and out["first_touch"].iloc[0] == "view"
    assert int(out["n_sessions"].iloc[0]) == 1

# ── epoch_shuffle_plan ───────────────────────────────────────────────

def test_epoch_shuffle_is_bijective_and_matches_md5_rank(tmp_path):
    import hashlib

    n = 137
    sf = _write_docs(tmp_path, [f"doc {i}" for i in range(n)])
    out = epoch_shuffle_plan(sf).to_pandas()
    assert sorted(out["pos"]) == list(range(1, n + 1))  # bijection
    ranks = sorted(
        range(1, n + 1),
        key=lambda i: (hashlib.md5(f"{i}:{SHUFFLE_EPOCH}".encode())
                       .hexdigest()[:12], i))
    want = {doc_id: pos + 1 for pos, doc_id in enumerate(ranks)}
    got = dict(zip(out["doc_id"].astype(int), out["pos"].astype(int)))
    assert got == want


# ── label_centroid_drift ─────────────────────────────────────────────

def _write_embeddings(tmp_path, vecs, labels):
    t = pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    })
    pq.write_table(t, tmp_path / "embeddings.parquet")
    return str(tmp_path)


def test_centroid_drift_identical_halves_is_one(tmp_path):
    # even and odd vec_ids carry the same vector per label → cos = 1
    vecs = [[1.0, 0.0], [1.0, 0.0], [0.0, 2.0], [0.0, 2.0]]
    sf = _write_embeddings(tmp_path, vecs, [0, 0, 1, 1])
    out = label_centroid_drift(sf)
    assert list(out["label"]) == [0, 1]
    assert (out["cos_drift"] == 1.0).all()


def test_centroid_drift_matches_naive(tmp_path):
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(40, 8)).astype(np.float32)
    labels = list(rng.integers(0, 3, 40))
    sf = _write_embeddings(tmp_path, vecs, labels)
    out = label_centroid_drift(sf)
    labs = np.array(labels)
    half = np.arange(40) % 2
    for _, r in out.iterrows():
        lab = int(r["label"])
        a = round6(vecs[(labs == lab) & (half == 0)]
                   .astype(np.float64).mean(axis=0))
        b = round6(vecs[(labs == lab) & (half == 1)]
                   .astype(np.float64).mean(axis=0))
        want = float(round6(float(a @ b)
                            / np.sqrt(float(a @ a) * float(b @ b))))
        assert float(r["cos_drift"]) == want


def test_centroid_drift_drops_single_half_labels(tmp_path):
    # label 5 exists only at even vec_ids → dropped like the SQL join
    vecs = [[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]]
    sf = _write_embeddings(tmp_path, vecs, [5, 0, 0])
    out = label_centroid_drift(sf)
    assert list(out["label"]) == [0]

# ── source_length_psi ────────────────────────────────────────────────

def test_psi_identical_distributions_zero(tmp_path):
    n = 40
    nch = list(range(20)) * 2
    src = ["src0"] * 20 + ["src1"] * 20
    t = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(["x"] * n, pa.string()),
        "lang": pa.array(["en"] * n, pa.string()),
        "source": pa.array(src, pa.string()),
        "n_chars": pa.array(nch, pa.int64()),
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    out = source_length_psi(str(tmp_path))
    assert float(out["psi"].iloc[0]) == 0.0


def test_psi_matches_naive(tmp_path):
    rng = np.random.default_rng(5)
    a = rng.integers(0, 50, 60)
    b = rng.integers(20, 80, 45)
    nch = np.concatenate([a, b])
    src = ["src0"] * 60 + ["src1"] * 45
    n = len(nch)
    t = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(["x"] * n, pa.string()),
        "lang": pa.array(["en"] * n, pa.string()),
        "source": pa.array(src, pa.string()),
        "n_chars": pa.array(nch, pa.int64()),
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    out = source_length_psi(str(tmp_path))

    from pdf_to_text_ray.stages.quantiles import _rank_for
    sa = np.sort(a)
    edges = np.unique([sa[_rank_for(q, len(a))]
                       for q in (0.1, 0.2, 0.3, 0.4, 0.5,
                                 0.6, 0.7, 0.8, 0.9)])
    ca = np.bincount(np.searchsorted(edges, a, side="left"),
                     minlength=len(edges) + 1)
    cb = np.bincount(np.searchsorted(edges, b, side="left"),
                     minlength=len(edges) + 1)
    m = (ca > 0) & (cb > 0)
    pa_, pb_ = ca[m] / len(a), cb[m] / len(b)
    want = float(round6(((pa_ - pb_) * np.log(pa_ / pb_)).sum()))
    assert float(out["psi"].iloc[0]) == want
    assert int(out["n_bins"].iloc[0]) == int(m.sum())

# ── weighted_median_price ────────────────────────────────────────────

def test_weighted_median_matches_naive(tmp_path):
    import pyarrow.parquet as _pq

    rng = np.random.default_rng(13)
    n = 300
    flags = rng.choice(["A", "N", "R"], n)
    prices = rng.choice([10.0, 20.0, 30.0, 40.0, 50.0], n)
    qty = rng.integers(1, 9, n).astype(float)
    t = pa.table({
        "l_orderkey": pa.array(range(n), pa.int64()),
        "l_partkey": pa.array([1] * n, pa.int64()),
        "l_suppkey": pa.array([1] * n, pa.int64()),
        "l_linenumber": pa.array(range(n), pa.int32()),
        "l_quantity": pa.array(qty, pa.float64()),
        "l_extendedprice": pa.array(prices, pa.float64()),
        "l_discount": pa.array([0.0] * n, pa.float64()),
        "l_tax": pa.array([0.0] * n, pa.float64()),
        "l_returnflag": pa.array(flags, pa.string()),
        "l_linestatus": pa.array(["O"] * n, pa.string()),
        "l_shipdate": pa.array(
            pd.to_datetime(["2024-01-01"] * n), pa.timestamp("us")),
    })
    _pq.write_table(t, tmp_path / "lineitem.parquet")
    from pdf_to_text_ray.pipelines.queries import weighted_median_price
    out = weighted_median_price(str(tmp_path)).set_index("l_returnflag")
    for f in ("A", "N", "R"):
        m = flags == f
        df = (pd.DataFrame({"p": prices[m], "w": qty[m]})
              .groupby("p", as_index=True)["w"].sum().sort_index())
        cw = df.cumsum()
        want = float(cw.index[(cw * 2 >= df.sum()).argmax()])
        assert float(out.loc[f, "wmedian_price"]) == want

# ── users_to_half_events ─────────────────────────────────────────────

def test_pareto_coverage_matches_naive(tmp_path):
    from pdf_to_text_ray.pipelines.queries import users_to_half_events

    # counts: u1=10, u2=5, u3=3, u4=2 (total 20; u1 alone covers 50%)
    users = [1] * 10 + [2] * 5 + [3] * 3 + [4] * 2
    sf = _write_events(tmp_path, ts=["2024-01-01"] * len(users),
                       users=users, types=["view"] * len(users))
    out = users_to_half_events(sf)
    assert int(out["n_users"].iloc[0]) == 1
    assert float(out["covered_share"].iloc[0]) == 0.5

    # u1=6, u2=5, u3=5, u4=4 (total 20): u1+u2=11 > 10 → 2 users
    users = [1] * 6 + [2] * 5 + [3] * 5 + [4] * 4
    sf = _write_events(tmp_path, ts=["2024-01-01"] * len(users),
                       users=users, types=["view"] * len(users))
    out = users_to_half_events(sf)
    assert int(out["n_users"].iloc[0]) == 2
    assert float(out["covered_share"].iloc[0]) == 11 / 20
