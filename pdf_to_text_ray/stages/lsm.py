"""LSM-style sorted runs + range compaction — the ingest layout for a
continuously-growing corpus.

Streaming ingest can't afford a global re-sort per wave; the
log-structured pattern writes each wave as its own KEY-SORTED RUN and
periodically compacts runs into one sorted, range-partitioned level:

  write_run():  wave → sort(key) → ``run=NNN/`` directory
  compact():    all runs → exact-quantile splitters (R-1 values,
                computed by the distributed refinement in
                stages/quantiles.py — no full-key driver gather) →
                every row maps to its range via one broadcast
                ``searchsorted`` → per-range sort + ONE file per range
                written by the worker that owns the range → manifest.

The compacted level's files are key-disjoint and individually sorted,
so footer zone maps prune range scans exactly (the property unsorted
runs lose). Ranges are quantile-balanced, so a skewed key distribution
still yields even file sizes. Scale contract: one range's rows fit a
worker (raise ``num_ranges`` with data volume); the splitter list is
R-1 scalars, broadcast-cheap at any corpus size.

Tie rule: a row goes to range ``#{splitters < key}`` (strictly-less
count), replayable in SQL as ``count(*) FROM splitters WHERE v < key``.

Key contract: the sort key must be NUMERIC (int or float). Integer
keys stay int64 end-to-end through the range assignment (no float64
round-trip), so 64-bit ids above 2^53 route correctly; the quantile
SPLITTER search itself refines through float64 bounds, so integer keys
with magnitude ≥ 2^53 are rejected with an error rather than risking a
silently misplaced splitter.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa

from .groups import arrow_out


def write_run(ds, key: str, runs_dir: str, run_id: int):
    """One ingest wave → a sorted run directory."""
    out = os.path.join(runs_dir, f"run={run_id:04d}")
    ds.sort(key).write_parquet(out)
    return out


def list_runs(runs_dir: str) -> list[str]:
    """Every run's parquet files (read_parquet wants files, not a list
    of directories)."""
    files = []
    for d in sorted(os.listdir(runs_dir)):
        if not d.startswith("run="):
            continue
        sub = os.path.join(runs_dir, d)
        files += sorted(
            os.path.join(sub, f) for f in os.listdir(sub)
            if f.endswith(".parquet") and not f.startswith(("_", ".")))
    return files


def compact(runs_dir: str, key: str, out_dir: str, *,
            num_ranges: int = 8) -> pd.DataFrame:
    """Merge all runs into ``num_ranges`` key-disjoint sorted files.

    Returns the per-range stats frame (range_idx, n, min/max key) that
    is also persisted as the level manifest."""
    import ray.data as rd

    from .quantiles import exact_quantiles

    runs = list_runs(runs_dir)
    ds = rd.read_parquet(runs)
    _sch = ds.schema()
    key_type = dict(zip(_sch.names, _sch.types))[key]
    key_is_int = pa.types.is_integer(key_type)
    qs = [i / num_ranges for i in range(1, num_ranges)]
    splitters = np.asarray(
        exact_quantiles(ds, key, qs)["value"].to_numpy(), dtype=np.float64)
    if key_is_int:
        # quantile refinement ran through float64; past 2^53 a splitter
        # could have rounded onto the wrong side of a key, silently
        # breaking range disjointness — refuse rather than risk it
        if len(splitters) and np.abs(splitters).max() >= 2.0 ** 53:
            raise ValueError(
                f"integer key '{key}' has splitter magnitude ≥ 2^53; "
                "float64 quantile refinement cannot guarantee exact "
                "placement — remap ids below 2^53 first")
        splitters = splitters.astype(np.int64)

    def assign(t: pa.Table) -> pa.Table:
        # integer keys stay int64 (searchsorted is exact on int vs int
        # splitters); only genuinely-float keys touch float64
        k = t[key].to_numpy(zero_copy_only=False)
        if not key_is_int:
            k = k.astype(np.float64)
        # range = #{splitters < key} == searchsorted side="left"
        rng = np.searchsorted(splitters, k, side="left")
        return t.append_column("_range", pa.array(rng, pa.int64()))

    os.makedirs(out_dir, exist_ok=True)

    def write_range(df: pd.DataFrame) -> pa.Table:
        rng = int(df["_range"].iloc[0])
        part = df.sort_values(key).drop(columns=["_range"])
        part_path = os.path.join(out_dir, f"part-{rng:05d}.parquet")
        import pyarrow.parquet as pq

        # arrow_out strips the pandas schema-metadata blob — writing
        # via DataFrame.to_parquet would reattach it and make the
        # level's blocks unhashable on later reads (see groups.arrow_out)
        pq.write_table(arrow_out(part), part_path)
        return arrow_out(pd.DataFrame({
            "range_idx": [rng],
            "n": [len(part)],
            # floor/ceil keeps the manifest bounds CONSERVATIVE for
            # float keys (a truncated max would wrongly prune the file)
            "min_key": [int(np.floor(part[key].iloc[0]))],
            "max_key": [int(np.ceil(part[key].iloc[-1]))],
        }))

    stats = (ds.map_batches(assign, batch_format="pyarrow")
             .groupby("_range")
             .map_groups(write_range, batch_format="pandas")
             .to_pandas()
             .sort_values("range_idx").reset_index(drop=True))
    stats = stats.astype({"range_idx": "int64", "n": "int64",
                          "min_key": "int64", "max_key": "int64"})
    manifest = os.path.join(out_dir, "_level_manifest.json")
    tmp = manifest + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"key": key, "splitters": splitters.tolist(),
                   "ranges": stats.to_dict("records")}, f)
    os.replace(tmp, manifest)  # atomic: crashed compaction is invisible
    return stats
