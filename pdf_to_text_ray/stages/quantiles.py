"""Exact distributed quantiles by iterative histogram refinement.

The reference engine has no quantile operator (it aggregates per-chunk
record stats only, src/main.ts:94); this is part of the added
web-scale battery. The algorithm is the classic multi-round
bisect-by-histogram selection (a.k.a. distributed k-selection, cf.
Munro & Paterson 1980 multi-pass selection): the column is NEVER
materialized — each round is one streaming ``map_batches`` pass that
bins values into per-spec histograms, a tiny ``groupby`` merges the
partial counts, and the driver narrows each spec's value interval to
the single bucket containing its rank. Rounds end when a bucket holds
few enough DISTINCT values to collect exactly (or degenerates to a
single float). With B buckets per round, r rounds resolve ranks over
domains of B^r distinct values — 2 rounds at B=4096 cover 16M distinct
values per interval; 100 TB columns take 3-4 passes.

Membership across rounds is defined by the CHAIN OF ANCESTOR BIN
TESTS (``clip(floor((v - lo)/width), 0, B-1) == b`` at every level),
not by a re-derived float interval — the two can disagree by an ulp at
bucket edges, and a value binned into bucket b but excluded from the
next round's interval would silently shift every later rank. The whole
chain is kept because the clip's edge cases (floor of -1 or B by an
ulp) are only bounded by the levels above them.

The final gather ships (value, count) DISTINCT partials through a Ray
groupby, so the driver holds one row per distinct value in the target
bucket — a value plateau of 10^9 identical floats costs one row, not
10^9 (the raw-value gather this replaces was unbounded there).

Grouped quantiles share the same rounds: every (group, q) pair is one
spec in the combined histogram pass, so pass count stays O(rounds)
regardless of group count (per-batch work is O(|specs|) masks — sized
for few-hundred-group dimensions; beyond that, pre-shuffle by group
and run per-partition).

Matches DuckDB ``quantile_disc`` semantics: the element at 0-indexed
rank ``ceil(q*n) - 1`` of the sorted NON-NULL column (NULL/NaN rows
are excluded from n, as SQL does).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _rank_for(q: float, n: int) -> int:
    """0-indexed quantile_disc rank: ceil(q·n) − 1 in EXACT decimal
    arithmetic. DuckDB parses a quantile literal like 0.55 as
    DECIMAL and ranks exactly, so float q·n must not stray: with
    doubles, 0.55 × 6000 = 3300.0000000000005 → ceil gives rank 3300
    where DuckDB picks 3299 (caught by price_selectivity_eval's
    20-bucket edges). Fraction(str(q)) recovers the decimal the
    literal was written as."""
    from fractions import Fraction
    from math import ceil

    return max(ceil(Fraction(str(q)) * n) - 1, 0)


def _member_mask(v: np.ndarray, ok: np.ndarray, lo: float, hi: float,
                 chain) -> np.ndarray:
    """Spec membership: the conjunction of EVERY ancestor round's exact
    bin test (bit-consistent with how each histogram binned, including
    the ``np.clip`` at BOTH edge buckets — a value flooring to -1 by an
    ulp was counted in bucket 0, one flooring to B in bucket B-1), else
    the seed interval [lo, hi]. The full chain is required: a single
    level's ``idx < 0`` would admit values below the whole ancestor
    bucket, not just the clipped ulp stragglers inside it."""
    if not chain:
        return ok & (v >= lo) & (v <= hi)
    m = ok & np.isfinite(v)
    for plo, pwidth, pb, B in chain:
        if pwidth <= 0:  # that interval was a single float
            m &= v == plo
            continue
        idx = np.floor((v - plo) / pwidth)
        mm = idx == pb
        if pb == B - 1:  # last bucket was closed: min(floor, B-1)
            mm |= idx >= B
        if pb == 0:  # first bucket was clipped: max(floor, 0)
            mm |= idx < 0
        m &= mm
    return m


def _refine(ds, col: str, state: dict, *, group_col: str | None,
            n_buckets: int, collect_cap: int, max_rounds: int) -> dict:
    """Core engine. ``state``: spec_id -> (group_value | None, lo, hi,
    rank-within-interval, parent_bin | None). Returns spec_id -> exact
    value."""
    resolved: dict = {}

    for _ in range(max_rounds):
        live = {i: st for i, st in state.items() if i not in resolved}
        for i, (gv, lo, hi, r, parent) in list(live.items()):
            if lo == hi or not np.isfinite(lo) or not np.isfinite(hi):
                resolved[i] = lo
                del live[i]
        if not live:
            break
        specs = {i: (st[0], st[1], st[2], st[4]) for i, st in live.items()}

        def hist_batch(t: pa.Table, specs=specs, B=n_buckets) -> pa.Table:
            v = t[col].to_numpy(zero_copy_only=False).astype(np.float64,
                                                             copy=False)
            ok = ~np.isnan(v)
            gcol = (t[group_col].to_numpy(zero_copy_only=False)
                    if group_col else None)
            si, bk, ct = [], [], []
            for i, (gv, lo, hi, parent) in specs.items():
                m = _member_mask(v, ok, lo, hi, parent)
                if gcol is not None:
                    m &= gcol == gv
                mv = v[m]
                if len(mv) == 0:
                    continue
                width = (hi - lo) / B
                idx = (np.clip(np.floor((mv - lo) / width).astype(np.int64),
                               0, B - 1)
                       if width > 0 else np.zeros(len(mv), np.int64))
                buckets, counts = np.unique(idx, return_counts=True)
                si.extend([i] * len(buckets))
                bk.extend(buckets.tolist())
                ct.extend(counts.tolist())
            return pa.table({"si": pa.array(si, pa.int64()),
                             "bucket": pa.array(bk, pa.int64()),
                             "cnt": pa.array(ct, pa.int64())})

        # merge the per-batch histogram partials INCREMENTALLY on the
        # driver: the old groupby(si,bucket) exchange landed the same
        # |specs|×B merged rows on the driver anyway (to_pandas), so
        # the exchange bought nothing but a full sort round trip —
        # measured ~2× per refinement pass at sf0.1. Peak driver
        # memory is the |specs|×B counts matrix plus ONE partial
        # batch; partials stream through with backpressure.
        spec_row = {i: k for k, i in enumerate(live.keys())}
        counts_m = np.zeros((len(live), n_buckets), np.int64)
        for b in (ds.map_batches(hist_batch, batch_format="pyarrow")
                  .iter_batches(batch_format="pyarrow")):
            if b.num_rows == 0:
                continue
            rows = np.fromiter((spec_row[s] for s in
                                b["si"].to_numpy(zero_copy_only=False)),
                               np.int64, b.num_rows)
            np.add.at(counts_m, (rows, b["bucket"].to_numpy()),
                      b["cnt"].to_numpy())
        to_gather: dict = {}
        for i in list(live.keys()):
            gv, lo, hi, r, _parent = live[i]
            counts = counts_m[spec_row[i]]
            cum = np.cumsum(counts)
            b = min(int(np.searchsorted(cum, r + 1)), n_buckets - 1)
            prior = int(cum[b - 1]) if b > 0 else 0
            width = (hi - lo) / n_buckets
            new_lo = lo + b * width
            new_hi = hi if b == n_buckets - 1 else lo + (b + 1) * width
            in_bucket = int(counts[b])
            new_r = r - prior
            child = (_parent or ()) + ((lo, width, b, n_buckets),)
            if in_bucket <= collect_cap or (new_lo == lo and new_hi == hi):
                # small enough to gather exactly, or float-degenerate
                # (≤2 distinct floats — the distinct-value gather is
                # bounded either way)
                to_gather[i] = (gv, new_lo, new_hi, new_r, child)
            else:
                state[i] = (gv, new_lo, new_hi, new_r, child)
        resolved.update(_collect_ranks(ds, col, to_gather,
                                       group_col=group_col))

    leftovers = {i: (gv, lo, hi, r, parent)
                 for i, (gv, lo, hi, r, parent) in state.items()
                 if i not in resolved}  # max_rounds exhausted
    resolved.update(_collect_ranks(ds, col, leftovers, group_col=group_col))
    return resolved


def _nonnull_stats(ds, col: str, group_col: str | None = None) -> pd.DataFrame:
    """(group?, min, max, n) over NON-NULL values — SQL quantile
    semantics exclude NULLs from the rank base, while Ray's ``Count()``
    counts rows. One streaming partial pass + tiny driver merge."""
    def partial(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64,
                                                         copy=False)
        ok = ~np.isnan(v)
        if group_col is None:
            mv = v[ok]
            if len(mv) == 0:
                return pa.table({"g": pa.array([], pa.string()),
                                 "lo": pa.array([], pa.float64()),
                                 "hi": pa.array([], pa.float64()),
                                 "n": pa.array([], pa.int64())})  # typed empty
            return pa.table({"g": pa.array([""], pa.string()),
                             "lo": pa.array([float(mv.min())], pa.float64()),
                             "hi": pa.array([float(mv.max())], pa.float64()),
                             "n": pa.array([len(mv)], pa.int64())})
        df = pd.DataFrame({"g": t[group_col].to_numpy(zero_copy_only=False),
                           "v": v})[ok]
        agg = df.groupby("g", sort=False)["v"].agg(["min", "max", "count"])
        return pa.table({"g": pa.array(agg.index.to_numpy(),
                                       type=t[group_col].type),
                         "lo": pa.array(agg["min"].to_numpy(), pa.float64()),
                         "hi": pa.array(agg["max"].to_numpy(), pa.float64()),
                         "n": pa.array(agg["count"].to_numpy(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return parts
    return (parts.groupby("g", as_index=False)
            .agg(lo=("lo", "min"), hi=("hi", "max"), n=("n", "sum")))


def exact_quantiles(ds, col: str, qs: list[float], *,
                    n_buckets: int = 4096, collect_cap: int = 200_000,
                    max_rounds: int = 8) -> pd.DataFrame:
    """Exact ``quantile_disc`` values for every q in ``qs`` →
    DataFrame(q, value), computed in O(rounds) streaming passes.

    ``collect_cap`` bounds when an interval switches from refinement to
    the exact distinct-value gather (whose driver volume is one row per
    DISTINCT value, so plateaus stay cheap)."""
    stats = _nonnull_stats(ds, col)
    if stats.empty or int(stats["n"].iloc[0]) == 0:
        return pd.DataFrame({"q": pd.Series(qs, dtype="float64"),
                             "value": pd.Series([np.nan] * len(qs))})
    n = int(stats["n"].iloc[0])
    glo, ghi = float(stats["lo"].iloc[0]), float(stats["hi"].iloc[0])
    state = {i: (None, glo, ghi, _rank_for(q, n), None)
             for i, q in enumerate(qs)}
    resolved = _refine(ds, col, state, group_col=None, n_buckets=n_buckets,
                       collect_cap=collect_cap, max_rounds=max_rounds)
    return pd.DataFrame({"q": pd.Series(qs, dtype="float64"),
                         "value": [resolved[i] for i in range(len(qs))]})


def exact_group_quantiles(ds, group_col: str, col: str, qs: list[float], *,
                          n_buckets: int = 4096, collect_cap: int = 200_000,
                          max_rounds: int = 8) -> pd.DataFrame:
    """Per-group exact quantile_disc → wide DataFrame(group, q_<nn>...).

    One non-null (min, max, count) pass seeds per-(group, q) interval
    specs; all specs then share each refinement round's single
    histogram pass. Designed for small-to-moderate group dimensions
    (specs = groups × quantiles live in every batch task)."""
    names = [f"q_{round(q * 100):02d}" for q in qs]
    if len(set(names)) != len(names):
        raise ValueError(f"quantile column names collide: {names} "
                         f"(qs within 0.005 share a q_<nn> name)")
    gstats = _nonnull_stats(ds, col, group_col).sort_values("g")
    state, meta = {}, {}
    sid = 0
    for _, row in gstats.iterrows():
        gv, n = row["g"], int(row["n"])
        for q in qs:
            state[sid] = (gv, float(row["lo"]), float(row["hi"]),
                          _rank_for(q, n), None)
            meta[sid] = (gv, q)
            sid += 1
    resolved = _refine(ds, col, state, group_col=group_col,
                       n_buckets=n_buckets, collect_cap=collect_cap,
                       max_rounds=max_rounds)
    rows: dict = {}
    for i, (gv, q) in meta.items():
        rows.setdefault(gv, {})[q] = resolved[i]
    out = pd.DataFrame([
        {group_col: gv, **{names[j]: v[qs[j]] for j in range(len(qs))}}
        for gv, v in sorted(rows.items())
    ])
    return out.reset_index(drop=True)


def _collect_ranks(ds, col: str, specs: dict, *,
                   group_col: str | None) -> dict:
    """ONE combined exact gather for every spec
    (spec_id -> (gv, lo, hi, rank, parent_bin)): each batch emits
    DISTINCT (si, value, count) partials for values in the spec's
    parent bin; a Ray groupby merges them, so the driver holds one row
    per distinct value — bounded by the bucket's distinct count, NOT
    its row count (a 10^9-row plateau is one row)."""
    if not specs:
        return {}

    def keep(t: pa.Table, specs=specs) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64,
                                                         copy=False)
        ok = ~np.isnan(v)
        gcol = (t[group_col].to_numpy(zero_copy_only=False)
                if group_col else None)
        si, out, cnt = [], [], []
        for i, (gv, lo, hi, _r, parent) in specs.items():
            m = _member_mask(v, ok, lo, hi, parent)
            if gcol is not None:
                m &= gcol == gv
            vals, counts = np.unique(v[m], return_counts=True)
            si.extend([i] * len(vals))
            out.extend(vals.tolist())
            cnt.extend(counts.tolist())
        return pa.table({"si": pa.array(si, pa.int64()),
                         "val": pa.array(out, pa.float64()),
                         "cnt": pa.array(cnt, pa.int64())})

    # incremental driver merge (no exchange): partials stream through
    # the driver and are re-compacted to DISTINCT (si, val) rows every
    # few batches, so peak driver memory stays one row per distinct
    # gathered value (the same bound the old groupby exchange's
    # to_pandas landed) plus one compaction window.
    window: list = []
    acc = pd.DataFrame({"si": pd.Series([], dtype="int64"),
                        "val": pd.Series([], dtype="float64"),
                        "cnt": pd.Series([], dtype="int64")})

    def _compact(frames: list) -> pd.DataFrame:
        return (pd.concat(frames, ignore_index=True)
                .groupby(["si", "val"], as_index=False)["cnt"].sum())

    for b in (ds.map_batches(keep, batch_format="pyarrow")
              .iter_batches(batch_format="pandas")):
        if len(b):
            window.append(b)
        if len(window) >= 64:
            acc = _compact([acc] + window)
            window = []
    pdf = _compact([acc] + window) if window else acc
    resolved = {}
    for i, (gv, lo, hi, r, parent) in specs.items():
        g = pdf[pdf["si"] == i].sort_values("val")
        if g.empty:
            resolved[i] = lo
            continue
        cum = g["cnt"].to_numpy().cumsum()
        j = min(int(np.searchsorted(cum, r + 1)), len(cum) - 1)
        resolved[i] = float(g["val"].to_numpy()[j])
    return resolved
