"""Hash-bucketed grouped execution.

``groupby(key).map_groups`` invokes Python ONCE PER KEY — measured in
this repo at a ~0.2 scaling efficiency floor on high-cardinality keys
(BENCH/BASELINE.md; 40k one-row groups). The scalable shape is to
shuffle on ``bucket = stable_hash(key) % B`` and run ONE vectorized
pandas call per bucket: per-group work becomes pandas' C-level grouped
kernels (sort / drop_duplicates / groupby.cumsum / groupby.head), and
the Python-call count drops from O(keys) to O(B).

Partitioning assumption: every key's rows land in one bucket (hash
partitioning guarantees it); a bucket must fit in a worker's heap —
size ``num_buckets`` ≳ 4× total cores at cluster scale and salt hot
keys if one key dominates a bucket.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def stable_bucket(values: pd.Series | np.ndarray, num_buckets: int) -> np.ndarray:
    arr = values.to_numpy() if isinstance(values, pd.Series) else values
    if arr.dtype.kind not in "iu":
        arr = np.asarray(arr, dtype=object)
    return (pd.util.hash_array(arr) % num_buckets).astype("int64")


def bucketed_group_apply(ds, keys: list[str] | str, per_bucket_fn,
                         num_buckets: int = 32):
    """Shuffle ``ds`` by hash(keys) and run ``per_bucket_fn`` (a
    VECTORIZED pandas function — it sees every group of its bucket at
    once, complete) once per bucket.

    ``per_bucket_fn(df) -> df`` must itself use pandas grouped kernels
    (``df.groupby(keys)...``), not iterate groups, for the speedup to
    be real."""
    key_list = [keys] if isinstance(keys, str) else list(keys)

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        if len(key_list) == 1:
            h = stable_bucket(b[key_list[0]], num_buckets)
        else:
            h = np.zeros(len(b), dtype=np.uint64)
            for k in key_list:  # order-sensitive combine of per-key hashes
                arr = b[k].to_numpy()
                if arr.dtype.kind not in "iu":
                    arr = np.asarray(arr, dtype=object)
                h = h * np.uint64(0x9E3779B97F4A7C15) + pd.util.hash_array(arr)
            h = (h % num_buckets).astype("int64")
        b = b.copy()
        b["_bucket"] = h
        return b

    def run_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return per_bucket_fn(g.drop(columns=["_bucket"]))

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(run_bucket, batch_format="pandas")
    )
