"""File-level Bloom-filter index — point-lookup file skipping for
UNSORTED keys.

Zone maps (`events_zonemap_range_query`) and Z-order layouts prune
range predicates via footer min/max, but a point lookup on a key the
layout was NOT sorted by reads every file. A per-file Bloom sidecar
fixes that: at write time each data file gets an m-bit filter over its
key column; a lookup probes the (tiny, driver-resident) index and
opens only the files whose filter says *maybe* — false positives cost
one wasted read, false negatives cannot happen.

Build is a single Dataset pass: the key column is read with
``include_paths=True`` and bucketed BY FILE (`groupby("path")`), so
each file's bits are OR-accumulated where its rows already are — only
(path, m/8 bytes) leaves the cluster. The index for a 100 TB corpus at
16 KiB/file × ~100k files is ~1.6 GB — broadcastable via ``ray.put``;
here it stays a driver dict.

Hashing is Kirsch-Mitzenmacher double hashing: probe_i = (h1 + i·h2)
mod m with h1/h2 from two seeded ``pd.util.hash_array`` passes — k
probes from two vectorized hashes, no per-key Python loop.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa


def _h1h2(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    # hash_key is ignored for numeric arrays, so the second hash is a
    # re-hash of the (xor-perturbed) first — works for any key dtype
    h1 = pd.util.hash_array(keys)
    h2 = pd.util.hash_array(h1 ^ np.uint64(0x9E3779B97F4A7C15))
    return h1, (h2 | np.uint64(1))  # odd h2 → full-period probe walk


def _bloom_bits(keys: np.ndarray, m: int, k: int) -> np.ndarray:
    """Packed bit array (uint8[m/8]) with all k probes of every key."""
    bits = np.zeros(m // 8, dtype=np.uint8)
    h1, h2 = _h1h2(keys)
    for i in range(k):
        idx = (h1 + np.uint64(i) * h2) % np.uint64(m)
        np.bitwise_or.at(bits, (idx >> np.uint64(3)).astype(np.int64),
                         np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8))
    return bits


def _bloom_maybe(bits: np.ndarray, keys: np.ndarray, m: int,
                 k: int) -> np.ndarray:
    """Per-key boolean: every probe bit set (maybe-present)."""
    out = np.ones(len(keys), dtype=bool)
    h1, h2 = _h1h2(keys)
    for i in range(k):
        idx = (h1 + np.uint64(i) * h2) % np.uint64(m)
        byte = bits[(idx >> np.uint64(3)).astype(np.int64)]
        out &= (byte >> (idx & np.uint64(7)).astype(np.uint8)) & 1 > 0
    return out


def build_bloom_index(data_dir: str, key: str, *, m_bits: int = 1 << 14,
                      k: int = 4) -> str:
    """Scan ``data_dir``'s parquet files (key column only) and write a
    ``_bloom_index.json`` sidecar mapping file path → hex bit string.

    One distributed pass — a Dataset of file paths fans out one task
    per file; each task reads ITS file's key column (a pruned local
    parquet read, exactly what a ReadParquet task does) and emits
    (path, m/8 bytes). Only the tiny index rows leave the workers.
    (``read_parquet(include_paths=True)`` would express this as one
    grouped read, but this Ray version drops the path column under
    ``columns=`` pruning.)"""
    import ray.data as rd

    from .groups import arrow_out

    files = sorted(
        os.path.join(data_dir, f) for f in os.listdir(data_dir)
        if f.endswith(".parquet") and not f.startswith(("_", ".")))

    def per_file(df: pd.DataFrame) -> pa.Table:
        import pyarrow.parquet as pq

        rows = []
        for path in df["path"]:
            arr = pq.read_table(path, columns=[key])[key].to_numpy(
                zero_copy_only=False)
            bits = _bloom_bits(arr, m_bits, k)
            rows.append({"path": path, "bits": bits.tobytes().hex()})
        return arrow_out(pd.DataFrame(rows, columns=["path", "bits"]))

    idx = {r["path"]: r["bits"]
           for r in rd.from_items([{"path": p} for p in files])
           .map_batches(per_file, batch_format="pandas").take_all()}
    sidecar = os.path.join(data_dir, "_bloom_index.json")
    tmp = sidecar + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"key": key, "m_bits": m_bits, "k": k, "files": idx}, f)
    os.replace(tmp, sidecar)  # atomic: a crashed build leaves no index
    return sidecar


def bloom_candidate_files(data_dir: str, keys) -> tuple[list[str], int]:
    """Files whose Bloom filter admits ANY of ``keys`` (and the total
    file count, for prune-ratio assertions)."""
    with open(os.path.join(data_dir, "_bloom_index.json")) as f:
        idx = json.load(f)
    karr = np.asarray(keys)
    keep = []
    for path, hexbits in idx["files"].items():
        bits = np.frombuffer(bytes.fromhex(hexbits), dtype=np.uint8)
        if _bloom_maybe(bits, karr, idx["m_bits"], idx["k"]).any():
            keep.append(path)
    return sorted(keep), len(idx["files"])


def bloom_point_lookup(data_dir: str, key: str, keys, columns=None):
    """Point lookup through the Bloom index: read only maybe-files,
    then exact-filter. Returns a Dataset."""
    import ray.data as rd

    keep, _total = bloom_candidate_files(data_dir, keys)
    want = pa.array(list(keys))
    if not keep:
        return None

    def exact(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.is_in(t[key], value_set=want))

    return rd.read_parquet(keep, columns=columns).map_batches(
        exact, batch_format="pyarrow")
