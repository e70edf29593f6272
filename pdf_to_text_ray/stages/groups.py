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
import pyarrow as pa


def arrow_out(df: pd.DataFrame):
    """pandas → Arrow block at stage boundaries.

    Ray's sort/aggregate exchange operators take a per-row python slow
    path on pandas-format blocks — measured ~5× on a 2000-group
    Aggregate in this repo (13.3 s → 3.0 s once the blocks were
    Arrow). Every helper here therefore emits Arrow even when the
    per-bucket compute is pandas — INCLUDING empty frames: Ray's
    sort-boundary sampler asserts homogeneous block types across a
    dataset, so one pandas empty among Arrow blocks aborts the
    exchange. Empty object columns become Arrow ``null`` type, which
    Ray's permissive schema promotion unifies with the non-empty
    blocks' concrete types.

    The pandas metadata blob ``from_pandas`` attaches is stripped: it
    makes the schema UNHASHABLE, which defeats Ray's schema-dedup
    early exit in every exchange and spams 'Failed to hash the
    schemas' warnings from reduce workers; nothing downstream reads
    it."""
    return pa.Table.from_pandas(df, preserve_index=False) \
        .replace_schema_metadata(None)


def _meta_free(t: pa.Table) -> pa.Table:
    """Strip schema metadata before an exchange: parquet written by
    pandas carries a ``b'pandas'`` blob that makes block schemas
    UNHASHABLE, defeating Ray's schema-dedup early exit in every
    sort/aggregate and spamming 'Failed to hash the schemas' from
    reduce workers. Zero-copy; nothing downstream reads the blob."""
    return t.replace_schema_metadata(None) if t.schema.metadata else t


def arrow_blocks(ds, *, batch_size: int = 32768):
    """Force a Dataset onto homogeneous Arrow blocks.

    A plain ``map_batches(..., batch_format="pyarrow")`` does NOT do
    this: Ray short-circuits ZERO-ROW blocks past the UDF unconverted,
    so a pandas-block stage (e.g. the blob-friendly
    ``block_format="pandas"`` join) leaks empty pandas blocks through
    every later pyarrow-declared map — and Ray's sort-boundary sampler
    asserts block-type homogeneity, killing the next exchange with
    ``BlockType.PANDAS != BlockType.ARROW`` (probabilistically: only
    when a sample draws both types). An EXPLICIT ``batch_size`` routes
    every block through the batcher, which drains empty blocks into
    its neighbors, so the output is all-Arrow with no empties.

    Use at the boundary where a pandas-block stage feeds an Arrow
    exchange (sort/groupby/aggregate)."""
    return ds.map_batches(lambda t: _meta_free(t),
                          batch_format="pyarrow", batch_size=batch_size)


def small_key_counts(ds, keys, alias: str = "n") -> pd.DataFrame:
    """Grouped row counts for a SMALL key domain, without an
    all-to-all exchange: each batch emits vectorized count partials
    (≤ |keys| rows), the driver merges them.

    Use this instead of ``groupby(key).aggregate(Count())`` when the
    distinct-key count is small (hosts, languages, event types): the
    Aggregate exchange shuffles everything only to land a handful of
    groups — and when output partitions outnumber keys it emits empty
    schema-less pandas blocks that trip the executor's RefBundle
    schema-consistency warning. Driver volume here is
    O(batches × keys) partial rows — fine while keys ≲ 10⁴."""
    key_list = [keys] if isinstance(keys, str) else list(keys)

    def part(t: pa.Table) -> pa.Table:
        g = (t.select(key_list).to_pandas()
             .groupby(key_list, sort=False).size().reset_index(name=alias))
        return arrow_out(g)

    parts = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    return parts.groupby(key_list, as_index=False)[alias].sum()


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

    # Both boundary maps DECLARE batch_format="pyarrow": the declared
    # format of the map fused into an exchange decides the exchange's
    # block type (a pandas-declared upstream map forces the whole
    # sort/aggregate onto the pandas slow path and makes Ray emit
    # empty PANDAS partitions that poison the type-homogeneity assert,
    # even when the UDF itself returns Arrow). Per-bucket compute
    # stays pandas internally.
    def add_bucket(t: pa.Table) -> pa.Table:
        if len(key_list) == 1:
            h = stable_bucket(
                t[key_list[0]].to_numpy(zero_copy_only=False), num_buckets)
        else:
            h = np.zeros(t.num_rows, dtype=np.uint64)
            for k in key_list:  # order-sensitive combine of per-key hashes
                arr = t[k].to_numpy(zero_copy_only=False)
                if arr.dtype.kind not in "iu":
                    arr = np.asarray(arr, dtype=object)
                h = h * np.uint64(0x9E3779B97F4A7C15) + pd.util.hash_array(arr)
            h = (h % num_buckets).astype("int64")
        return _meta_free(t).append_column("_bucket", pa.array(h, pa.int64()))

    def run_bucket(g: pa.Table):
        df = g.drop_columns(["_bucket"]).to_pandas()
        return arrow_out(per_bucket_fn(df))

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(run_bucket, batch_format="pyarrow")
    )


def salted_group_agg(ds, key: str, *, sum_cols: list[str],
                     num_salts: int = 16, count_alias: str = "n"):
    """Skew-defusing two-stage aggregation for ALGEBRAIC aggregates
    (sum/count here; mean = sum/count downstream): stage 1 groups by
    ``(key, salt)`` — a hot key's rows split across ``num_salts``
    reducers instead of landing on one — stage 2 merges the ≤
    num_salts partials per key (tiny: |keys| × num_salts rows).

    Per-group functions that need the WHOLE group (median, top-k per
    key) cannot be salted; use ``bucketed_group_apply`` and size
    buckets instead."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def add_salt(t: pa.Table) -> pa.Table:
        n = t.num_rows
        # deterministic per-row salt: low bits of a cheap row mix —
        # independent of key so a hot key spreads uniformly
        salt = (np.arange(n, dtype=np.int64) * 0x9E3779B9) % num_salts
        return t.append_column("_salt", pa.array(salt, pa.int64()))

    stage1 = (
        ds.map_batches(add_salt, batch_format="pyarrow")
        .groupby([key, "_salt"])
        .aggregate(*(Sum(c, alias_name=f"{c}_p") for c in sum_cols),
                   _count_agg(count_alias))
    )
    stage2 = (
        stage1.groupby(key)
        .aggregate(*(Sum(f"{c}_p", alias_name=c) for c in sum_cols),
                   Sum(count_alias, alias_name=count_alias))
    )
    return stage2


def _count_agg(alias: str):
    from ray.data.aggregate import Count

    return Count(alias_name=alias)


def _cumsum_dtype(ds, value_col: str):
    """Arrow dtype a pandas cumsum over ``value_col`` would produce."""
    sch = ds.schema()
    try:
        vt = dict(zip(sch.names, sch.types))[value_col]
    except (KeyError, AttributeError):
        return pa.int64()
    return pa.float64() if pa.types.is_floating(vt) else pa.int64()


def _append_null_col(ds, out_col: str, dtype) -> "object":
    """map_batches an all-null typed ``out_col`` onto ``ds`` so an
    empty dataset keeps schema parity with the populated code path."""
    def add(t: pa.Table) -> pa.Table:
        return t.append_column(out_col, pa.nulls(t.num_rows, dtype))

    return ds.map_batches(add, batch_format="pyarrow")


def ordered_prefix_sum(ds, *, order_col: str, value_col: str,
                       out_col: str = "cum", num_buckets: int = 32,
                       domain: tuple[int, int] | None = None):
    """Distributed inclusive prefix sum of ``value_col`` in
    ``order_col`` order — a SCAN, the one shape neither map_batches nor
    groupby expresses alone (each row depends on every earlier row).

    Classic two-level scan: range-bucket on ``order_col`` (so bucket i
    holds only keys ordered before bucket i+1), per-bucket totals via a
    tiny (bucket, sum) groupby, an exclusive prefix over the B totals
    on the driver (B scalars, not rows), then one vectorized
    sort+cumsum per bucket with its offset added. Rows shuffle once,
    carrying only (order, value) plus carried columns.

    ``order_col`` must be numeric with distinct values (ties would make
    the scan order ambiguous). Skewed key ranges skew bucket sizes —
    acceptable for dense ids; use quantile boundaries for heavy skew.
    ``domain=(lo, hi)``: pass the order key's known inclusive range
    (e.g. a hash prefix's full space) to skip the min/max aggregate
    pass — one fewer sequential execution; the caller guarantees every
    key falls inside it.
    """
    import ray
    from ray.data.aggregate import Max, Min, Sum

    # Pin the input ONCE: without this the upstream plan executes three
    # times (min/max aggregate, totals pass, final scan) — measured on
    # curate.py's gate→dedup→neardup chain feeding this scan.
    ds = ds.materialize()
    if domain is not None:
        lo, hi = domain
    else:
        mm = ds.aggregate(Min(order_col), Max(order_col))
        lo, hi = mm[f"min({order_col})"], mm[f"max({order_col})"]
    if lo is None or hi is None:
        # empty input → empty scan, but the out_col must still exist so
        # downstream t[out_col] reads don't KeyError on zero-row blocks
        return _append_null_col(ds, out_col,
                                _cumsum_dtype(ds, value_col))
    span = max(int(hi) - int(lo) + 1, 1)
    nb = min(num_buckets, span)

    def add_bucket(t: pa.Table) -> pa.Table:
        v = t[order_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = (v - int(lo)) * nb // span
        return _meta_free(t).append_column("_rbucket", pa.array(b, pa.int64()))

    withb = ds.map_batches(add_bucket, batch_format="pyarrow")

    def bucket_partial(t: pa.Table) -> pa.Table:
        b = pd.DataFrame({
            "_rbucket": t["_rbucket"].to_numpy(zero_copy_only=False),
            "s": t[value_col].to_numpy(zero_copy_only=False)})
        return arrow_out(b.groupby("_rbucket", as_index=False)
                         .agg(s=("s", "sum")))

    totals = (withb.map_batches(bucket_partial, batch_format="pyarrow")
              .groupby("_rbucket").aggregate(Sum("s", alias_name="s"))
              .to_pandas().sort_values("_rbucket"))
    csum = totals["s"].cumsum().shift(fill_value=0)
    offsets = dict(zip(totals["_rbucket"], csum))
    off_ref = ray.put(offsets)

    def scan_bucket(t: pa.Table):
        g = t.to_pandas().sort_values(order_col)
        base = ray.get(off_ref).get(g["_rbucket"].iloc[0], 0) \
            if len(g) else 0
        g[out_col] = g[value_col].cumsum() + base
        return arrow_out(g.drop(columns=["_rbucket"]))

    return withb.groupby("_rbucket").map_groups(scan_bucket,
                                                batch_format="pyarrow")


def ordered_prefix_max(ds, *, order_col: str, value_col: str,
                       out_col: str = "wm", num_buckets: int = 32):
    """Distributed EXCLUSIVE prefix max of ``value_col`` in
    ``order_col`` order — the streaming-watermark shape (watermark at
    row i = max over STRICTLY earlier rows). Same two-level scan as
    ``ordered_prefix_sum``; max is associative so bucket totals
    compose the same way. Rows with no earlier row get NULL."""
    import ray
    from ray.data.aggregate import Max, Min

    ds = ds.materialize()  # consumed three times (see prefix_sum note)
    mm = ds.aggregate(Min(order_col), Max(order_col))
    lo, hi = mm[f"min({order_col})"], mm[f"max({order_col})"]
    if lo is None or hi is None:
        # schema parity with the non-empty path (exc scan is float64)
        return _append_null_col(ds, out_col, pa.float64())
    span = max(int(hi) - int(lo) + 1, 1)
    nb = min(num_buckets, span)

    def add_bucket(t: pa.Table) -> pa.Table:
        v = t[order_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = (v - int(lo)) * nb // span
        return _meta_free(t).append_column("_rbucket", pa.array(b, pa.int64()))

    withb = ds.map_batches(add_bucket, batch_format="pyarrow")

    def bucket_partial(t: pa.Table) -> pa.Table:
        b = pd.DataFrame({
            "_rbucket": t["_rbucket"].to_numpy(zero_copy_only=False),
            "m": t[value_col].to_numpy(zero_copy_only=False)})
        return arrow_out(b.groupby("_rbucket", as_index=False)
                         .agg(m=("m", "max")))

    totals = (withb.map_batches(bucket_partial, batch_format="pyarrow")
              .groupby("_rbucket").aggregate(Max("m", alias_name="m"))
              .to_pandas().sort_values("_rbucket"))
    # exclusive running max over the B bucket maxima (None before any)
    offsets: dict = {}
    running = None
    for _, row in totals.iterrows():
        offsets[int(row["_rbucket"])] = running
        running = row["m"] if running is None else max(running, row["m"])
    off_ref = ray.put(offsets)

    def scan_bucket(t: pa.Table):
        g = t.to_pandas().sort_values(order_col)
        base = ray.get(off_ref).get(int(g["_rbucket"].iloc[0])) \
            if len(g) else None
        v = g[value_col].to_numpy()
        # exclusive cummax: shift the inclusive cummax right by one
        inc = np.maximum.accumulate(v)
        exc = np.empty(len(v), dtype="float64")
        exc[0] = np.nan
        if len(v) > 1:
            exc[1:] = inc[:-1]
        if base is not None:
            exc = np.where(np.isnan(exc), float(base),
                           np.maximum(exc, float(base)))
        g[out_col] = exc
        return arrow_out(g.drop(columns=["_rbucket"]))

    return withb.groupby("_rbucket").map_groups(scan_bucket,
                                                batch_format="pyarrow")
