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
                       suffixes: tuple[str, str] = ("_l", "_r"),
                       how: str = "inner",
                       left_cols: list[str] | None = None,
                       right_cols: list[str] | None = None):
    """Explicit partitioned hash join of two Datasets on one key column.

    One all-to-all (the bucket groupby over the union); the per-bucket
    merge is vectorized pandas. Column name collisions get suffixes.

    ``left_cols``/``right_cols``: each side's non-key column names. The
    per-bucket schema is otherwise inferred from the rows present —
    a bucket that happens to contain only one side would drop the other
    side's columns under outer joins. Pass them for non-inner joins."""

    # Side membership is carried explicitly via column PREFIXES (not
    # inferred from all-null columns post-union, which silently drops a
    # genuine column whose values happen to be all null in a bucket):
    # each side's non-key columns are renamed "l::x" / "r::x" before the
    # union and stripped after the per-bucket merge.
    def tag(side: str):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            b = b.rename(columns={c: f"{side}::{c}" for c in b.columns if c != on})
            b["_bucket"] = _bucket_of(b[on], num_buckets)
            b["_side"] = side
            return b

        return fn

    both = left.map_batches(tag("l"), batch_format="pandas").union(
        right.map_batches(tag("r"), batch_format="pandas")
    )

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lcols = [c for c in g.columns if c.startswith("l::")]
        rcols = [c for c in g.columns if c.startswith("r::")]
        lg = g.loc[g["_side"] == "l", [on] + lcols].rename(
            columns={c: c[3:] for c in lcols})
        rg = g.loc[g["_side"] == "r", [on] + rcols].rename(
            columns={c: c[3:] for c in rcols})
        for cols, side in ((left_cols, lg), (right_cols, rg)):
            if cols:
                for c in cols:
                    if c not in side.columns:
                        side[c] = pd.Series([], dtype=object) if side.empty \
                            else pd.NA
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

    # side membership via column prefixes (see bucketed_hash_join)
    def tag(side: str, ts_col: str):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            b = b.rename(columns={c: f"{side}::{c}" for c in b.columns if c != key})
            b["_bucket"] = _bucket_of(b[key], num_buckets)
            b["_side"] = side
            b["_ts"] = b[f"{side}::{ts_col}"]
            return b

        return fn

    both = left.map_batches(tag("l", left_ts), batch_format="pandas").union(
        right.map_batches(tag("r", right_ts), batch_format="pandas")
    )

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lcols = [c for c in g.columns if c.startswith("l::")]
        rcols = [c for c in g.columns if c.startswith("r::")]
        lg = g.loc[g["_side"] == "l", [key, "_ts"] + lcols].rename(
            columns={c: c[3:] for c in lcols})
        rg = g.loc[g["_side"] == "r", [key, "_ts"] + rcols].rename(
            columns={c: c[3:] for c in rcols})
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
