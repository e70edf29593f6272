"""Mergeable sketches: HyperLogLog distinct counting.

The canonical at-scale aggregation shape (ray_guide "Aggregation at
scale"): each batch emits ONE serialized sketch; sketches merge
associatively in a tiny second stage — no shuffle of raw values.

HLL per Flajolet et al. 2007 ("HyperLogLog: the analysis of a
near-optimal cardinality estimation algorithm") with the standard bias
correction for small/large ranges. Hashes via pandas' stable siphash
(process-stable, seeded)."""

from __future__ import annotations

import numpy as np
import pandas as pd

HLL_P = 12                     # 2^12 = 4096 registers → ~1.6% std error
HLL_M = 1 << HLL_P
_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)


def hll_sketch(values) -> np.ndarray:
    """(HLL_M,) uint8 register array for a batch of values."""
    arr = np.asarray(values, dtype=object)
    regs = np.zeros(HLL_M, dtype=np.uint8)
    if len(arr) == 0:
        return regs
    h = pd.util.hash_array(arr)  # stable 64-bit
    idx = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
    rest = (h << np.uint64(HLL_P)) | np.uint64((1 << HLL_P) - 1)
    # rank = leading zeros of the remaining 64-P bits + 1
    lz = np.zeros(len(h), dtype=np.uint8)
    mask = np.uint64(1) << np.uint64(63)
    cur = rest.copy()
    found = np.zeros(len(h), dtype=bool)
    for r in range(1, 64 - HLL_P + 2):
        hit = (~found) & ((cur & mask) != 0)
        lz[hit] = r
        found |= hit
        if found.all():
            break
        cur = cur << np.uint64(1)
    np.maximum.at(regs, idx, lz)
    return regs


def hll_merge(sketches: list[np.ndarray]) -> np.ndarray:
    out = np.zeros(HLL_M, dtype=np.uint8)
    for s in sketches:
        np.maximum(out, s, out=out)
    return out


def hll_estimate(regs: np.ndarray) -> float:
    est = _ALPHA * HLL_M * HLL_M / np.sum(np.float64(2.0) ** -regs.astype(np.float64))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * HLL_M and zeros:
        est = HLL_M * np.log(HLL_M / zeros)  # linear counting
    return float(est)


def approx_distinct(ds, col: str) -> float:
    """Distributed approximate COUNT(DISTINCT col): one sketch per
    batch (serialized bytes), merged on the driver (4 KiB each)."""
    import pyarrow as pa

    def batch_sketch(b: pa.Table) -> pa.Table:
        s = hll_sketch(b[col].to_pylist())
        return pa.table({"sketch": pa.array([s.tobytes()], pa.binary())})

    parts = ds.map_batches(batch_sketch, batch_format="pyarrow").to_pandas()
    merged = hll_merge([np.frombuffer(buf, dtype=np.uint8) for buf in parts["sketch"]])
    return hll_estimate(merged)
