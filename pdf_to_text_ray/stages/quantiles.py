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
few enough values to collect exactly (or degenerates to a single
float). With B buckets per round, r rounds resolve ranks over domains
of B^r distinct values — 2 rounds at B=4096 cover 16M distinct values
per interval; 100 TB columns take 3-4 passes.

Grouped quantiles share the same rounds: every (group, q) pair is one
spec in the combined histogram pass, so pass count stays O(rounds)
regardless of group count (per-batch work is O(|specs|) masks — sized
for few-hundred-group dimensions; beyond that, pre-shuffle by group
and run per-partition).

Matches DuckDB ``quantile_disc`` semantics: the element at 0-indexed
rank ``ceil(q*n) - 1`` of the sorted column.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _rank_for(q: float, n: int) -> int:
    """0-indexed quantile_disc rank."""
    return max(int(np.ceil(q * n)) - 1, 0)


def _refine(ds, col: str, state: dict, *, group_col: str | None,
            n_buckets: int, collect_cap: int, max_rounds: int) -> dict:
    """Core engine. ``state``: spec_id -> (group_value | None, lo, hi,
    rank-within-interval). Returns spec_id -> exact value."""
    resolved: dict = {}

    for _ in range(max_rounds):
        live = {i: st for i, st in state.items() if i not in resolved}
        for i, (gv, lo, hi, r) in list(live.items()):
            if lo == hi or not np.isfinite(lo) or not np.isfinite(hi):
                resolved[i] = lo
                del live[i]
        if not live:
            break
        specs = {i: st[:3] for i, st in live.items()}

        def hist_batch(t: pa.Table, specs=specs, B=n_buckets) -> pa.Table:
            v = t[col].to_numpy(zero_copy_only=False).astype(np.float64,
                                                             copy=False)
            ok = ~np.isnan(v)
            gcol = (t[group_col].to_numpy(zero_copy_only=False)
                    if group_col else None)
            si, bk, ct = [], [], []
            for i, (gv, lo, hi) in specs.items():
                m = ok & (v >= lo) & (v <= hi)
                if gcol is not None:
                    m &= gcol == gv
                mv = v[m]
                if len(mv) == 0:
                    continue
                width = (hi - lo) / B
                idx = (np.minimum(np.floor((mv - lo) / width).astype(np.int64),
                                  B - 1)
                       if width > 0 else np.zeros(len(mv), np.int64))
                buckets, counts = np.unique(idx, return_counts=True)
                si.extend([i] * len(buckets))
                bk.extend(buckets.tolist())
                ct.extend(counts.tolist())
            return pa.table({"si": pa.array(si, pa.int64()),
                             "bucket": pa.array(bk, pa.int64()),
                             "cnt": pa.array(ct, pa.int64())})

        from ray.data.aggregate import Sum

        merged = (
            ds.map_batches(hist_batch, batch_format="pyarrow")
            .groupby(["si", "bucket"]).aggregate(Sum("cnt", alias_name="cnt"))
            .to_pandas()
        )
        to_gather: dict = {}
        for i in list(live.keys()):
            gv, lo, hi, r = live[i]
            h = merged[merged["si"] == i].sort_values("bucket")
            counts = np.zeros(n_buckets, np.int64)
            counts[h["bucket"].to_numpy()] = h["cnt"].to_numpy()
            cum = np.cumsum(counts)
            b = int(np.searchsorted(cum, r + 1))
            prior = int(cum[b - 1]) if b > 0 else 0
            width = (hi - lo) / n_buckets
            new_lo = lo + b * width
            new_hi = hi if b == n_buckets - 1 else lo + (b + 1) * width
            in_bucket = int(counts[b])
            new_r = r - prior
            if in_bucket <= collect_cap:
                to_gather[i] = (gv, new_lo, new_hi, new_r,
                                b < n_buckets - 1)
            elif new_lo == lo and new_hi == hi:
                # float-degenerate: every value equals one of ≤2 floats
                to_gather[i] = (gv, new_lo, new_hi, new_r, False)
            else:
                state[i] = (gv, new_lo, new_hi, new_r)
        resolved.update(_collect_ranks(ds, col, to_gather,
                                       group_col=group_col))

    leftovers = {i: (gv, lo, hi, r, False)
                 for i, (gv, lo, hi, r) in state.items()
                 if i not in resolved}  # max_rounds exhausted
    resolved.update(_collect_ranks(ds, col, leftovers, group_col=group_col))
    return resolved


def exact_quantiles(ds, col: str, qs: list[float], *,
                    n_buckets: int = 4096, collect_cap: int = 200_000,
                    max_rounds: int = 8) -> pd.DataFrame:
    """Exact ``quantile_disc`` values for every q in ``qs`` →
    DataFrame(q, value), computed in O(rounds) streaming passes.

    ``collect_cap`` bounds the driver-side final gather per quantile;
    intervals above it keep refining. Skewed value plateaus terminate
    via the degenerate-interval rule (lo == hi ⇒ every value in the
    interval equals lo).
    """
    from ray.data.aggregate import Count, Max, Min

    stats = ds.aggregate(Min(col), Max(col), Count())
    n = int(stats["count()"])
    if n == 0:
        return pd.DataFrame({"q": pd.Series(qs, dtype="float64"),
                             "value": pd.Series([np.nan] * len(qs))})
    glo, ghi = float(stats[f"min({col})"]), float(stats[f"max({col})"])
    state = {i: (None, glo, ghi, _rank_for(q, n)) for i, q in enumerate(qs)}
    resolved = _refine(ds, col, state, group_col=None, n_buckets=n_buckets,
                       collect_cap=collect_cap, max_rounds=max_rounds)
    return pd.DataFrame({"q": pd.Series(qs, dtype="float64"),
                         "value": [resolved[i] for i in range(len(qs))]})


def exact_group_quantiles(ds, group_col: str, col: str, qs: list[float], *,
                          n_buckets: int = 4096, collect_cap: int = 200_000,
                          max_rounds: int = 8) -> pd.DataFrame:
    """Per-group exact quantile_disc → wide DataFrame(group, q_<nn>...).

    One (Min, Max, Count) groupby pass seeds per-(group, q) interval
    specs; all specs then share each refinement round's single
    histogram pass. Designed for small-to-moderate group dimensions
    (specs = groups × quantiles live in every batch task)."""
    from ray.data.aggregate import Count, Max, Min

    gstats = (ds.groupby(group_col)
              .aggregate(Min(col), Max(col), Count())
              .to_pandas().sort_values(group_col))
    state, meta = {}, {}
    sid = 0
    for _, row in gstats.iterrows():
        gv, n = row[group_col], int(row["count()"])
        for q in qs:
            state[sid] = (gv, float(row[f"min({col})"]),
                          float(row[f"max({col})"]), _rank_for(q, n))
            meta[sid] = (gv, q)
            sid += 1
    resolved = _refine(ds, col, state, group_col=group_col,
                       n_buckets=n_buckets, collect_cap=collect_cap,
                       max_rounds=max_rounds)
    rows: dict = {}
    for i, (gv, q) in meta.items():
        rows.setdefault(gv, {})[q] = resolved[i]
    out = pd.DataFrame([
        {group_col: gv, **{f"q_{round(q * 100):02d}": v[q] for q in qs}}
        for gv, v in sorted(rows.items())
    ])
    return out.reset_index(drop=True)


def _collect_ranks(ds, col: str, specs: dict, *,
                   group_col: str | None) -> dict:
    """ONE combined gather pass for every spec in ``specs``
    (spec_id -> (gv, lo, hi, rank, open_hi)): each batch emits
    (si, value) for values inside each spec's interval ([lo, hi) for
    inner buckets, [lo, hi] for the last one, so the group max is not
    dropped); the driver selects each spec's rank. Gathered volume is
    bounded by |specs| × collect_cap."""
    if not specs:
        return {}

    def keep(t: pa.Table, specs=specs) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64,
                                                         copy=False)
        ok = ~np.isnan(v)
        gcol = (t[group_col].to_numpy(zero_copy_only=False)
                if group_col else None)
        si, out = [], []
        for i, (gv, lo, hi, _r, open_hi) in specs.items():
            m = ok & (v >= lo) & ((v < hi) if open_hi else (v <= hi))
            if gcol is not None:
                m &= gcol == gv
            mv = v[m]
            si.extend([i] * len(mv))
            out.extend(mv.tolist())
        return pa.table({"si": pa.array(si, pa.int64()),
                         "val": pa.array(out, pa.float64())})

    pdf = ds.map_batches(keep, batch_format="pyarrow").to_pandas()
    resolved = {}
    for i, (gv, lo, hi, r, open_hi) in specs.items():
        vals = np.sort(pdf.loc[pdf["si"] == i, "val"].to_numpy())
        resolved[i] = float(vals[min(r, len(vals) - 1)])
    return resolved
