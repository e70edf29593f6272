"""Join strategies for Ray Data (SURVEY.md §2.4).

Ray 2.49 has no stable ``Dataset.join``; these are the portable
patterns (documented in the public Ray Data guidance):

- ``broadcast_join``: small side via ``ray.put`` + per-batch pandas
  merge. No shuffle. (Used by queries.join_customer_orders.)
- ``bucketed_hash_join``: both sides large — add
  ``bucket = stable_hash(key) % B`` to both sides, union them with a
  side tag, shuffle once on the bucket, then one vectorized pandas
  merge per bucket. Partitioning assumption: every key's rows fit in
  one bucket's memory; salt hot keys into sub-buckets if not.
- ``asof_join``: per-key ordered backward join (latest right row with
  ts ≤ left ts) — bucket by key, ``pd.merge_asof`` per bucket over
  key-sorted frames.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _bucket_of(values: pd.Series, num_buckets: int) -> np.ndarray:
    return (pd.util.hash_array(values.to_numpy()) % num_buckets).astype("int64")


def bucketed_hash_join(left, right, on: str, *, num_buckets: int = 32,
                       suffixes: tuple[str, str] = ("_l", "_r"), how: str = "inner"):
    """Explicit partitioned hash join of two Datasets on one key column.

    One all-to-all (the bucket groupby over the union); the per-bucket
    merge is vectorized pandas. Column name collisions get suffixes."""

    def tag(side: str):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            b["_bucket"] = _bucket_of(b[on], num_buckets)
            b["_side"] = side
            return b

        return fn

    both = left.map_batches(tag("l"), batch_format="pandas").union(
        right.map_batches(tag("r"), batch_format="pandas")
    )

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["_side"] == "l"].drop(columns=["_bucket", "_side"])
        rg = g[g["_side"] == "r"].drop(columns=["_bucket", "_side"])
        # pandas union of heterogeneous sides leaves NaN-padded columns;
        # restrict each side to its own non-all-null columns + key
        lg = lg.dropna(axis=1, how="all")
        rg = rg.dropna(axis=1, how="all")
        if lg.empty or (rg.empty and how == "inner"):
            return pd.DataFrame()
        return lg.merge(rg, on=on, how=how, suffixes=suffixes)

    return both.groupby("_bucket").map_groups(join_bucket, batch_format="pandas")


def asof_join(left, right, *, key: str, left_ts: str, right_ts: str,
              value_cols: list[str], num_buckets: int = 32):
    """For each left row, the latest right row with the same ``key`` and
    ``right_ts`` ≤ ``left_ts`` (backward as-of). Right value columns are
    appended (NaN/NaT when no match). One bucket shuffle; per-bucket
    ``pd.merge_asof`` over sorted frames."""

    def tag(side: str, ts_col: str):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            b["_bucket"] = _bucket_of(b[key], num_buckets)
            b["_side"] = side
            b["_ts"] = b[ts_col]
            return b

        return fn

    both = left.map_batches(tag("l", left_ts), batch_format="pandas").union(
        right.map_batches(tag("r", right_ts), batch_format="pandas")
    )

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["_side"] == "l"].drop(columns=["_bucket", "_side"]).dropna(axis=1, how="all")
        rg = g[g["_side"] == "r"].drop(columns=["_bucket", "_side"]).dropna(axis=1, how="all")
        if lg.empty:
            return pd.DataFrame()
        lg = lg.sort_values(["_ts", key], kind="stable")
        if rg.empty:
            out = lg.copy()
            for c in value_cols:
                out[c] = pd.Series([pd.NA] * len(out), index=out.index)
        else:
            rg = rg.sort_values(["_ts", key], kind="stable")
            out = pd.merge_asof(
                lg, rg[[key, "_ts"] + value_cols], on="_ts", by=key,
                direction="backward", allow_exact_matches=True,
            )
        return out.drop(columns=["_ts"])

    return both.groupby("_bucket").map_groups(join_bucket, batch_format="pandas")
