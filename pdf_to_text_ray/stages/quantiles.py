"""Exact distributed quantiles by iterative histogram refinement.

The reference engine has no quantile operator (it aggregates per-chunk
record stats only, src/main.ts:94); this is part of the added
web-scale battery. The algorithm is the classic multi-round
bisect-by-histogram selection (a.k.a. distributed k-selection, cf.
Munro & Paterson 1980 multi-pass selection): the column is NEVER
materialized — each round is one streaming ``map_batches`` pass that
bins values into per-quantile histograms, a tiny ``groupby`` merges
the partial counts, and the driver narrows each quantile's value
interval to the single bucket containing its rank. Rounds end when a
bucket holds few enough values to collect exactly (or degenerates to
a single float). With B buckets per round, r rounds resolve ranks
over domains of B^r distinct values — 2 rounds at B=4096 cover 16M
distinct values per interval; 100 TB columns take 3-4 passes.

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
    from ray.data.aggregate import Count, Max, Min, Sum

    stats = ds.aggregate(Min(col), Max(col), Count())
    n = int(stats["count()"])
    if n == 0:
        return pd.DataFrame({"q": pd.Series(qs, dtype="float64"),
                             "value": pd.Series([np.nan] * len(qs))})
    glo, ghi = float(stats[f"min({col})"]), float(stats[f"max({col})"])

    # per-quantile state: (lo, hi, rank-within-interval 0-indexed)
    state = {i: (glo, ghi, _rank_for(q, n)) for i, q in enumerate(qs)}
    resolved: dict[int, float] = {}

    for _ in range(max_rounds):
        live = {i: st for i, st in state.items() if i not in resolved}
        if not live:
            break
        for i, (lo, hi, r) in list(live.items()):
            if lo == hi or not np.isfinite(lo) or not np.isfinite(hi):
                resolved[i] = lo
                del live[i]
        if not live:
            break
        # one combined histogram pass for every unresolved quantile
        specs = {i: (lo, hi) for i, (lo, hi, _) in live.items()}

        def hist_batch(t: pa.Table, specs=specs, B=n_buckets) -> pa.Table:
            v = pc.drop_null(t[col]).to_numpy(zero_copy_only=False)
            v = v.astype(np.float64, copy=False)
            qi, bk, ct = [], [], []
            for i, (lo, hi) in specs.items():
                m = v[(v >= lo) & (v <= hi)]
                if len(m) == 0:
                    continue
                width = (hi - lo) / B
                idx = np.minimum((np.floor((m - lo) / width)).astype(np.int64)
                                 if width > 0 else np.zeros(len(m), np.int64),
                                 B - 1)
                buckets, counts = np.unique(idx, return_counts=True)
                qi.extend([i] * len(buckets))
                bk.extend(buckets.tolist())
                ct.extend(counts.tolist())
            return pa.table({"qi": pa.array(qi, pa.int64()),
                             "bucket": pa.array(bk, pa.int64()),
                             "cnt": pa.array(ct, pa.int64())})

        merged = (
            ds.map_batches(hist_batch, batch_format="pyarrow")
            .groupby(["qi", "bucket"]).aggregate(Sum("cnt", alias_name="cnt"))
            .to_pandas()
        )
        for i in list(live.keys()):
            lo, hi, r = live[i]
            h = merged[merged["qi"] == i].sort_values("bucket")
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
                resolved[i] = _collect_rank(ds, col, new_lo, new_hi, new_r,
                                            open_hi=b < n_buckets - 1)
            elif new_lo == lo and new_hi == hi:
                # float-degenerate: every value equals one of ≤2 floats
                resolved[i] = _collect_rank(ds, col, new_lo, new_hi, new_r,
                                            open_hi=False)
            else:
                state[i] = (new_lo, new_hi, new_r)

    for i, (lo, hi, r) in state.items():
        if i not in resolved:  # max_rounds exhausted — exact gather
            resolved[i] = _collect_rank(ds, col, lo, hi, r, open_hi=False)
    return pd.DataFrame({"q": pd.Series(qs, dtype="float64"),
                         "value": [resolved[i] for i in range(len(qs))]})


def _collect_rank(ds, col: str, lo: float, hi: float, r: int,
                  *, open_hi: bool) -> float:
    """Gather the (bounded) interval's values and select rank ``r``.

    ``open_hi``: interval is [lo, hi) for inner buckets, [lo, hi] for
    the last one (so the global max is not dropped).
    """

    def keep(t: pa.Table) -> pa.Table:
        v = t[col]
        m = pc.and_(pc.greater_equal(v, pa.scalar(lo)),
                    pc.less(v, pa.scalar(hi)) if open_hi
                    else pc.less_equal(v, pa.scalar(hi)))
        return t.select([col]).filter(pc.fill_null(m, False))

    vals = np.sort(
        ds.map_batches(keep, batch_format="pyarrow")
        .to_pandas()[col].to_numpy())
    return float(vals[min(r, len(vals) - 1)])
