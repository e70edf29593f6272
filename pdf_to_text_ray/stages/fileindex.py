"""File-level Bloom-filter index — point-lookup file skipping for
UNSORTED keys.

Zone maps (`events_zonemap_range_query`) and Z-order layouts prune
range predicates via footer min/max, but a point lookup on a key the
layout was NOT sorted by reads every file. A per-file Bloom sidecar
fixes that: at write time each data file gets an m-bit filter over its
key column; a lookup probes the (tiny, driver-resident) index and
opens only the files whose filter says *maybe* — false positives cost
one wasted read, false negatives cannot happen.

Build is one Dataset pass: files group into SHARDS (one per data
subdirectory, large flat directories chunked every ``files_per_shard``
files) and one task per shard reads its files' key columns, writes the
shard's sidecar JSON (``_bloom_shards/shard-NNNNN.json``) from the
worker, and returns only a tiny manifest row — the driver never holds
more than shard-count rows, not per-file filters. Each manifest row
carries a SHARD-AGGREGATE Bloom (over all keys in the shard's files,
``agg_m_bits`` wide) so a lookup prunes whole shards before opening
any sidecar; maybe-shards are then probed ONE AT A TIME, so driver
memory is bounded by a single shard regardless of corpus file count
(raise ``files_per_shard`` if shard count itself grows past ~10⁵).

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


def _walk_parquet(data_dir: str) -> list[str]:
    out = []
    for dp, dns, fns in os.walk(data_dir):
        dns[:] = [d for d in dns if not d.startswith(("_", "."))]
        out += [os.path.join(dp, f) for f in fns
                if f.endswith(".parquet") and not f.startswith(("_", "."))]
    return sorted(out)


def build_bloom_index(data_dir: str, key: str, *, m_bits: int = 1 << 14,
                      k: int = 4, files_per_shard: int = 64,
                      agg_m_bits: int | None = None) -> str:
    """Scan ``data_dir``'s parquet files (key column only, recursive)
    and build the SHARDED Bloom index: per-file filters live in
    per-shard sidecar JSONs written by the workers; the driver-side
    ``_bloom_index.json`` manifest holds only one row per shard (path,
    file count, shard-aggregate filter).

    One distributed pass — files group into shards (one shard per
    subdirectory; a directory with more than ``files_per_shard`` files
    splits into chunks), one task per shard reads its files' key
    columns (pruned local parquet reads), writes
    ``_bloom_shards/shard-NNNNN.json`` atomically, and emits one
    manifest row. No per-file filter ever reaches the driver; sidecar
    writes land on the shared filesystem/object store like every other
    sink in this repo."""
    import ray.data as rd

    from .groups import arrow_out

    if agg_m_bits is None:
        agg_m_bits = m_bits * 8
    files = _walk_parquet(data_dir)
    shard_dir = os.path.join(data_dir, "_bloom_shards")
    os.makedirs(shard_dir, exist_ok=True)

    # shard = (parent directory, chunk index) — per-directory sidecars,
    # with big flat directories chunked so one shard stays bounded
    by_dir: dict[str, list[str]] = {}
    for p in files:
        by_dir.setdefault(os.path.dirname(p), []).append(p)
    rows, shard_id = [], 0
    for d in sorted(by_dir):
        fs = sorted(by_dir[d])
        for i in range(0, len(fs), files_per_shard):
            for p in fs[i:i + files_per_shard]:
                rows.append({"shard": shard_id, "path": p})
            shard_id += 1

    def per_shard(df: pd.DataFrame) -> pa.Table:
        import pyarrow.parquet as pq

        sid = int(df["shard"].iloc[0])
        agg = np.zeros(agg_m_bits // 8, dtype=np.uint8)
        per_file = {}
        for path in sorted(df["path"]):
            arr = pq.read_table(path, columns=[key])[key].to_numpy(
                zero_copy_only=False)
            per_file[path] = _bloom_bits(arr, m_bits, k).tobytes().hex()
            agg |= _bloom_bits(arr, agg_m_bits, k)
        sidecar = os.path.join(shard_dir, f"shard-{sid:05d}.json")
        tmp = sidecar + f".tmp{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump({"files": per_file}, f)
        os.replace(tmp, sidecar)  # atomic: crashed shard is invisible
        return arrow_out(pd.DataFrame({
            "shard": [sid],
            "sidecar": [os.path.relpath(sidecar, data_dir)],
            "n_files": [len(per_file)],
            "agg": [agg.tobytes().hex()],
        }))

    manifest_rows = (rd.from_items(rows)
                     .groupby("shard")
                     .map_groups(per_shard, batch_format="pandas")
                     .to_pandas().sort_values("shard"))
    sidecar = os.path.join(data_dir, "_bloom_index.json")
    tmp = sidecar + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"version": 2, "key": key, "m_bits": m_bits, "k": k,
                   "agg_m_bits": agg_m_bits,
                   "shards": manifest_rows.to_dict("records")}, f)
    os.replace(tmp, sidecar)  # atomic: a crashed build leaves no index
    return sidecar


def bloom_candidate_files(data_dir: str, keys, *, with_stats: bool = False):
    """Files whose Bloom filter admits ANY of ``keys`` (and the total
    file count, for prune-ratio assertions).

    Shard-aggregate filters prune whole sidecars first; surviving
    sidecars are opened ONE AT A TIME and discarded, so driver memory
    is one shard's filters regardless of total file count. With
    ``with_stats=True`` also returns
    ``{"shards_total", "shards_loaded", "loaded_sidecars"}`` (used by
    tests to assert the driver opened at most one sidecar per probed
    directory and none for pruned ones)."""
    with open(os.path.join(data_dir, "_bloom_index.json")) as f:
        idx = json.load(f)
    karr = np.asarray(keys)
    keep = []
    if "files" in idx:  # legacy unsharded format (pre-v2)
        for path, hexbits in idx["files"].items():
            bits = np.frombuffer(bytes.fromhex(hexbits), dtype=np.uint8)
            if _bloom_maybe(bits, karr, idx["m_bits"], idx["k"]).any():
                keep.append(path)
        out = (sorted(keep), len(idx["files"]))
        return (*out, {"shards_total": 1, "shards_loaded": 1,
                       "loaded_sidecars": ["_bloom_index.json"]}) \
            if with_stats else out
    total_files = 0
    loaded = []
    for sh in idx["shards"]:
        total_files += int(sh["n_files"])
        agg = np.frombuffer(bytes.fromhex(sh["agg"]), dtype=np.uint8)
        if not _bloom_maybe(agg, karr, idx["agg_m_bits"], idx["k"]).any():
            continue  # whole shard pruned — sidecar never opened
        loaded.append(sh["sidecar"])
        with open(os.path.join(data_dir, sh["sidecar"])) as f:
            shard = json.load(f)  # one shard resident at a time
        for path, hexbits in shard["files"].items():
            bits = np.frombuffer(bytes.fromhex(hexbits), dtype=np.uint8)
            if _bloom_maybe(bits, karr, idx["m_bits"], idx["k"]).any():
                keep.append(path)
    if with_stats:
        return sorted(keep), total_files, {
            "shards_total": len(idx["shards"]),
            "shards_loaded": len(loaded),
            "loaded_sidecars": loaded}
    return sorted(keep), total_files


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
