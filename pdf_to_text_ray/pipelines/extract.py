"""The flagship pipeline: pages table → extracted text (+ blocks/records).

Ray-Data-native restatement of the reference's POST /upload flow
(src/main.ts:133-263) at corpus scale (SURVEY.md §3.4):

    winners ← pruned (url, warc_ts) scan        [broadcast semi-join]
    read_parquet(pages)
      → filter_latest(winners)                   [dedup BEFORE parse]
      → map_batches(sniff)  [+ gzip detection]   [stateless tasks]
      → map_batches(ExtractDispatch)             [PDF/HTML/text by row]
      → write_parquet per wave + manifest        [resume unit]

Design notes for 100 TB scale:
- The raw ``html`` payload column is projected away at the dispatch
  stage — nothing heavy ever enters the dedup shuffle (SURVEY.md §4.3).
- Extraction is one single-pass per-row dispatch (the reference's M8
  content-type switch, main.ts:277-280, generalized): one actor pool,
  mixed batches, small ``batch_size`` so a giant PDF cannot stall a
  256-row batch. Oversized payloads are still bounded by Ray block
  splitting + the dispatch ``batch_size``.
- Resume granularity is an input **wave** (a bounded group of input
  files): each wave is one streaming pipeline run whose output dir +
  manifest are finalized atomically; a restarted job skips completed
  waves (state/manifest.py). Cross-wave global dedup, when input spans
  crawls, is ``dedup_pages_latest`` over the extracted output.
"""

from __future__ import annotations

import os
import time
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc

from ..schemas import DOC_TYPE_HTML, DOC_TYPE_PDF
from ..stages.charset import decode_payload as decode_html_payload
from ..stages.html_extract import extract_html_text
from ..stages.pdf_extract import extract_pdf_text
from ..stages.sniff import sniff_batch
from ..state import manifest as mstate

DEFAULT_BATCH_SIZE = 64


def _file_sig(path: str) -> str:
    """Lineage signature for a resume unit's input file: basename plus
    size and mtime, so two different files sharing a basename (a run
    re-pointed at another in_dir) can't false-match a manifest."""
    st = os.stat(path)
    return f"{os.path.basename(path)}:{st.st_size}:{st.st_mtime_ns}"


class ExtractDispatch:
    """Single-pass router+extractor actor: per row, dispatch on doc_type.

    Parser tables are module-level; the actor form reserves CPUs for
    this CPU-bound stage and gives heavier per-worker state (font maps,
    learned scorers) a home. Output drops the payload column.
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        import gzip as _gzip

        from ..stages.zerocopy import binary_views

        doc_types = batch["doc_type"].to_pylist()
        # zero-copy memoryviews into the Arrow buffer — to_pylist here
        # memcpy'd every payload byte into Python heap per batch, the
        # single biggest memory-traffic line on the hot path (VERDICT
        # r02 #1); parsers take bytes-like, the PDF lexer owns the one
        # remaining copy at its boundary
        payloads = binary_views(batch["html"])
        text_col = batch["text"] if "text" in batch.column_names else None
        gzips = (batch["is_gzip"].to_pylist() if "is_gzip" in batch.column_names
                 else [False] * len(doc_types))
        https = (batch["is_http"].to_pylist() if "is_http" in batch.column_names
                 else [False] * len(doc_types))

        out_text: list[str] = []
        out_pages: list[int] = []
        out_fail: list[bool] = []
        out_fb: list[bool] = []
        out_err: list[str | None] = []
        from ..stages.sniff import http_charset, strip_http_envelope

        for i, (dt, payload, gz, ht) in enumerate(
                zip(doc_types, payloads, gzips, https)):
            charset_hint = None
            try:
                if gz and payload:
                    payload = _gzip.decompress(payload)
                if ht and payload:
                    # WARC response record: strip the HTTP status line
                    # + headers, undo chunked/content codings; keep the
                    # header charset as the transport-layer decode hint.
                    # Both helpers are memoryview-native — only the
                    # header region is copied, the body stays a
                    # zero-copy Arrow-buffer view.
                    charset_hint = http_charset(payload)
                    payload = strip_http_envelope(payload)
                if dt == DOC_TYPE_PDF:
                    r = extract_pdf_text(payload)
                    out_text.append(r.text)
                    out_pages.append(r.n_pages)
                    out_fail.append(False)
                    out_fb.append(r.fallback)
                elif dt == DOC_TYPE_HTML:
                    out_text.append(extract_html_text(
                        decode_html_payload(payload, charset_hint)))
                    out_pages.append(1)
                    out_fail.append(False)
                    out_fb.append(False)
                else:  # passthrough (FIXTURES.md row kind 3)
                    text = (text_col[i].as_py()
                            if text_col is not None else None)
                    if text is not None:
                        out_text.append(text)
                    else:
                        out_text.append(
                            decode_html_payload(payload, charset_hint)
                            if payload else "")
                    out_pages.append(1)
                    out_fail.append(False)
                    out_fb.append(False)
                out_err.append(None)
            except Exception as e:
                out_text.append("")
                out_pages.append(0)
                out_fail.append(True)
                out_fb.append(False)
                # exception CLASS, not message: deterministic across
                # runs/workers, and enough to route reprocessing
                out_err.append(type(e).__name__)
        keep = [c for c in ("url", "warc_ts", "lang", "doc_type") if c in batch.column_names]
        result = batch.select(keep)
        return (
            result.append_column("text_extracted", pa.array(out_text, pa.string()))
            .append_column("n_pages", pa.array(out_pages, pa.int32()))
            .append_column("parse_failure", pa.array(out_fail, pa.bool_()))
            .append_column("fallback", pa.array(out_fb, pa.bool_()))
            .append_column("error_kind", pa.array(out_err, pa.string()))
        )


def extract_pages(ds, *, concurrency=None, batch_size: int = DEFAULT_BATCH_SIZE,
                  num_cpus: float = 1.0, compute: str = "tasks"):
    """pages Dataset → extracted-text Dataset (TEXT_SCHEMA + lang).

    ``compute="tasks"`` (default): stateless ``map_batches`` tasks — the
    extractor's state (compiled regexes, tag/operator tables) is
    module-level, amortized per worker process at import, so Ray's
    pre-started worker pool runs batches immediately with no pool
    ramp-up. ``compute="actors"``: an explicit ``ExtractDispatch`` actor
    pool — the shape to use when per-worker state must be constructed
    (a learned boilerplate scorer, font caches); costs ~seconds of
    actor startup per run.
    """
    ds = ds.map_batches(sniff_batch, batch_format="pyarrow")
    if compute == "tasks":
        dispatch = ExtractDispatch()
        return ds.map_batches(
            dispatch.__call__,
            batch_format="pyarrow",
            batch_size=batch_size,
            num_cpus=num_cpus,
        )
    if compute == "split-oversized":
        # explicit size routing (SURVEY §4.2), SINGLE-PASS: each batch
        # splits into its small and oversized rows inside ONE stage —
        # small rows extract as the usual vector, oversized rows are
        # sliced out and dispatched one row at a time so a giant
        # document's transient parser state never multiplies across a
        # multi-row batch. (The round-2 form ran two filter branches
        # off the same upstream, which re-executed ReadParquet + sniff
        # once PER BRANCH.) Isolating giants into their own BLOCKS
        # stays Ray's job via target_max_block_size; this mode bounds
        # per-task parse state only.
        threshold = 4 * 1024 * 1024
        dispatch = ExtractDispatch()

        def split_dispatch(t: pa.Table) -> pa.Table:
            big_mask = pc.greater_equal(pc.binary_length(t["html"]),
                                        threshold)
            if not pc.any(big_mask).as_py():
                return dispatch(t)
            parts = []
            small_t = t.filter(pc.invert(big_mask))
            if small_t.num_rows:
                parts.append(dispatch(small_t))
            big_t = t.filter(big_mask)
            for i in range(big_t.num_rows):  # one giant row at a time
                parts.append(dispatch(big_t.slice(i, 1)))
            return pa.concat_tables(parts)

        return ds.map_batches(split_dispatch, batch_format="pyarrow",
                              batch_size=batch_size, num_cpus=num_cpus)
    if concurrency is None:
        import ray

        # fixed pool sized to the cluster MINUS headroom for the read/
        # sniff/write stages: a pool that reserves every CPU starves the
        # producer and the pipeline deadlocks (observed: 8 actors on an
        # 8-CPU cluster left ReadParquet permanently backpressured).
        # Fixed rather than autoscaling so all actors start in parallel
        # and a short job saturates immediately.
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        concurrency = max(2, int((ncpu - 2) / max(num_cpus, 0.25)))
    return ds.map_batches(
        ExtractDispatch,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
    )


def dedup_pages_latest(ds, num_buckets: int = 64):
    """Exact dedup by url, last-write-wins by warc_ts (SURVEY.md §2.6).

    Implementation: explicit hash-partitioned dedup — add
    ``bucket = stable_hash(url) % B``, shuffle on the bucket, then ONE
    vectorized pandas dedup per bucket. (A naive
    ``groupby("url").map_groups`` invokes Python once per url — a serial
    floor that capped scaling efficiency at ~0.3 on 40k docs; bucketing
    makes the per-group work O(B) vectorized calls.) Runs AFTER
    extraction so only extracted text, never raw payloads, enters the
    shuffle. Deterministic: max warc_ts per url, stable-sort tiebreak.
    At cluster scale, size B ≳ 4× total cores."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from ..stages.groups import arrow_out

    # arrow-declared boundary maps: the declared format of the map
    # fused into the bucket exchange decides the exchange's block type
    # (groups.arrow_out rationale) — with text payloads in the shuffle
    # the pandas per-row path is the difference that matters
    def add_bucket(t: pa.Table) -> pa.Table:
        h = (pd.util.hash_array(
            np.asarray(t["url"].to_pylist(), dtype=object)) % num_buckets
        ).astype("int64")
        return t.append_column("_bucket", pa.array(h, pa.int64()))

    def dedup_bucket(t: pa.Table):
        g = t.to_pandas()
        # Secondary tiebreak: a content hash over the full row — for
        # equal (url, warc_ts) the winner must not depend on block
        # arrival order, which varies across runs.
        row_hash = pd.util.hash_pandas_object(
            g.drop(columns=["_bucket"]), index=False
        ).astype("uint64")
        g = g.assign(_rh=row_hash).sort_values(
            ["url", "warc_ts", "_rh"], kind="stable")
        return arrow_out(g.drop_duplicates("url", keep="last")
                         .drop(columns=["_bucket", "_rh"]))

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(dedup_bucket, batch_format="pyarrow")
    )


def compute_latest_winners(pages_paths):
    """(sorted urls, ts) winner arrays — url → max warc_ts — from a
    PROJECTION-ONLY read of the input (columns pruned at the scan:
    ~50 bytes/row instead of payloads).

    Per-batch partial max (vectorized pandas groupby) → tiny partials →
    final merge. Returned as two parallel numpy arrays SORTED BY URL so
    the semi-join probe is one ``np.searchsorted`` per batch (no Python
    dict, no per-row probing). Winner arrays for ~10^8 urls fit a
    broadcast; beyond that use ``compute_latest_winners_bucketed`` +
    ``filter_latest_bucketed`` (same math, hash-partitioned)."""
    import pandas as pd
    import ray

    import ray.data as rd

    # the pruned 2-column scan is tiny per file — cap task count at the
    # CPU count so many-small-file inputs don't pay per-task overhead
    # 156× over (measured: 156 files → 6-9 s as 156 tasks, 0.6 s capped;
    # capping below the file count groups files per task, it never
    # splits row groups)
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    proj = rd.read_parquet(pages_paths, columns=["url", "warc_ts"],
                           override_num_blocks=max(2, ncpu))

    def partial_max(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("url", sort=False, as_index=False)["warc_ts"].max()

    partials = proj.map_batches(partial_max, batch_format="pandas").to_pandas()
    winners = (
        partials.groupby("url", sort=False, as_index=False)["warc_ts"].max()
        .sort_values("url", kind="stable")
    )
    urls = winners["url"].to_numpy(dtype=object)
    ts = winners["warc_ts"].to_numpy().astype("datetime64[us]").view("int64")
    return urls, ts


# Per-worker-process memo for deserialized broadcast state: ray.get of
# a plain-Python object deserializes it ON EVERY CALL (numpy arrays are
# zero-copy but the object-dtype url array is not), so the hot path
# caches by ObjectRef. Worker processes are reused across tasks, making
# this a once-per-worker cost — the actor-__init__ pattern, available
# to stateless tasks too.
_BROADCAST_CACHE: dict = {}


def _cached_get(ref):
    import ray

    if not isinstance(ref, ray.ObjectRef):
        return ref
    key = ref.hex()
    if key not in _BROADCAST_CACHE:
        _BROADCAST_CACHE.clear()  # one live broadcast per stage; avoid growth
        _BROADCAST_CACHE[key] = ray.get(ref)
    return _BROADCAST_CACHE[key]


def _winner_mask(b: pa.Table, urls: "Any", ts: "Any") -> pa.Array:
    import numpy as np

    burls = np.asarray(b["url"].to_pylist(), dtype=object)
    bts = b["warc_ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view("int64")
    idx = np.searchsorted(urls, burls)
    idx_c = np.minimum(idx, len(urls) - 1) if len(urls) else idx
    hit = (
        (urls[idx_c] == burls) & (ts[idx_c] == bts)
        if len(urls)
        else np.zeros(len(burls), dtype=bool)
    )
    return pa.array(hit)


def filter_latest(ds, winners_ref):
    """Broadcast semi-join: keep a row iff its (url, warc_ts) is the
    winner. Runs BEFORE extraction so stale duplicates are never parsed
    — dedup costs a pruned scan + a vectorized per-batch searchsorted
    probe instead of an all-to-all shuffle of extracted text (which cost
    more than the extraction itself at 80k docs). The winner arrays are
    deserialized once per worker process (``_cached_get``), not per
    batch."""
    def keep(b: pa.Table) -> pa.Table:
        urls, ts = _cached_get(winners_ref)
        # arrow-native filter: the payload column never leaves Arrow
        # (a pandas filter here copied the full payload bytes per batch)
        return b.filter(_winner_mask(b, urls, ts))

    return ds.map_batches(keep, batch_format="pyarrow")


def compute_latest_winners_bucketed(pages_paths, winners_dir: str,
                                    num_buckets: int = 64) -> str:
    """Winner computation for url sets beyond the broadcast budget:
    partial maxes (as above) → hash-bucket shuffle of the SMALL
    (url, warc_ts) pairs → per-bucket final max → winner parquet
    partitioned by bucket, written distributed (the full winner set
    never materializes on any single node). Returns ``winners_dir``."""
    import pandas as pd
    import ray

    import ray.data as rd
    import shutil as _shutil

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    proj = rd.read_parquet(pages_paths, columns=["url", "warc_ts"],
                           override_num_blocks=max(2, ncpu))

    def partial_max(t):
        from ..stages.groups import arrow_out

        b = t.to_pandas()
        out = b.groupby("url", sort=False, as_index=False)["warc_ts"].max()
        out["bucket"] = (
            pd.util.hash_array(out["url"].to_numpy(dtype=object)) % num_buckets
        ).astype("int64")
        return arrow_out(out)

    def bucket_max(t):
        from ..stages.groups import arrow_out

        g = t.to_pandas()
        out = g.groupby("url", sort=False, as_index=False)["warc_ts"].max()
        out["bucket"] = g["bucket"].iloc[0]
        return arrow_out(out.sort_values("url", kind="stable"))

    _shutil.rmtree(winners_dir, ignore_errors=True)
    (
        proj.map_batches(partial_max, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_max, batch_format="pyarrow")
        .write_parquet(winners_dir, partition_cols=["bucket"])
    )
    return winners_dir


class _BucketedWinnerFilter:
    """Actor-pool semi-join against bucketed winner parquet: each batch
    hashes its urls to buckets and probes only the buckets present,
    loading each bucket's sorted winner arrays at most once per actor
    (LRU-capped). Winner state lives in shared storage, not in a
    broadcast — the ≥10^9-url path."""

    def __init__(self, winners_dir: str, num_buckets: int,
                 max_cached_buckets: int = 16):
        self.winners_dir = winners_dir
        self.num_buckets = num_buckets
        self.max_cached = max_cached_buckets
        self._cache: dict[int, tuple] = {}

    def _bucket_arrays(self, bucket: int):
        import numpy as np
        import pyarrow.parquet as pq

        if bucket in self._cache:
            # true LRU: refresh recency on hit (python dicts iterate in
            # insertion order, so pop+reinsert moves to the back)
            self._cache[bucket] = self._cache.pop(bucket)
        else:
            if len(self._cache) >= self.max_cached:
                self._cache.pop(next(iter(self._cache)))
            path = os.path.join(self.winners_dir, f"bucket={bucket}")
            if not os.path.isdir(path):
                self._cache[bucket] = (np.empty(0, object), np.empty(0, np.int64))
            else:
                t = pq.read_table(path, columns=["url", "warc_ts"])
                df = t.to_pandas().sort_values("url", kind="stable")
                self._cache[bucket] = (
                    df["url"].to_numpy(dtype=object),
                    df["warc_ts"].to_numpy().astype("datetime64[us]").view("int64"),
                )
        return self._cache[bucket]

    def __call__(self, b: pa.Table) -> pa.Table:
        import numpy as np
        import pandas as pd

        if b.num_rows == 0:
            return b
        burls = np.asarray(b["url"].to_pylist(), dtype=object)
        bts = b["warc_ts"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").view("int64")
        buckets = pd.util.hash_array(burls) % self.num_buckets
        hit = np.zeros(len(burls), dtype=bool)
        for bk in np.unique(buckets):
            urls, ts = self._bucket_arrays(int(bk))
            sel = buckets == bk
            if len(urls) == 0:
                continue
            idx = np.minimum(np.searchsorted(urls, burls[sel]), len(urls) - 1)
            hit[sel] = (urls[idx] == burls[sel]) & (ts[idx] == bts[sel])
        return b.filter(pa.array(hit))


def filter_latest_bucketed(ds, winners_dir: str, num_buckets: int = 64,
                           concurrency=(2, 8)):
    return ds.map_batches(
        _BucketedWinnerFilter,
        fn_constructor_kwargs={"winners_dir": winners_dir,
                               "num_buckets": num_buckets},
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def quarantine_failures(extracted, out_dir: str):
    """Dead-letter sink: the parse-failure rows of an extraction
    output, reduced to (url, warc_ts, doc_type, error_kind), written
    to their own parquet. The payload is NOT copied — the url keys
    back into the source corpus, so reprocessing is a semi-join read
    of exactly the quarantined pages (the same broadcast-winners
    machinery the dedup path uses) after the parser fix ships.
    Returns the quarantined row count."""

    def failed(t: pa.Table) -> pa.Table:
        t = t.filter(t["parse_failure"])
        keep = [c for c in ("url", "warc_ts", "doc_type", "error_kind")
                if c in t.column_names]
        return t.select(keep)

    q = extracted.map_batches(failed, batch_format="pyarrow")
    q.write_parquet(out_dir)
    import pyarrow.parquet as pq

    return sum(
        pq.ParquetFile(os.path.join(out_dir, f)).metadata.num_rows
        for f in os.listdir(out_dir) if f.endswith(".parquet"))


def extract_corpus_pipeline(pages_dir: str, *, override_num_blocks: int | None = None,
                            batch_size: int = DEFAULT_BATCH_SIZE):
    """The headline composition: prededup winners (broadcast semi-join)
    → sniff → extract. No all-to-all anywhere."""
    import ray
    import ray.data as rd

    winners_ref = ray.put(compute_latest_winners(pages_dir))
    kwargs = {"override_num_blocks": override_num_blocks} if override_num_blocks else {}
    ds = rd.read_parquet(pages_dir, **kwargs)
    return extract_pages(filter_latest(ds, winners_ref), batch_size=batch_size)


def _wave_metrics(wave_out_dir: str) -> dict[str, Any]:
    """Post-write metrics from the (small) flag/count columns only."""
    import ray.data as rd

    cols = rd.read_parquet(
        wave_out_dir, columns=["doc_type", "n_pages", "parse_failure", "fallback"]
    )

    def agg(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "rows": [batch.num_rows],
                "pdf_docs": [pc.sum(pc.equal(batch["doc_type"], "pdf")).as_py() or 0],
                "html_docs": [pc.sum(pc.equal(batch["doc_type"], "html")).as_py() or 0],
                "text_docs": [pc.sum(pc.equal(batch["doc_type"], "text")).as_py() or 0],
                "pages": [pc.sum(batch["n_pages"]).as_py() or 0],
                "parse_failures": [pc.sum(pc.cast(batch["parse_failure"], pa.int64())).as_py() or 0],
                "fallbacks": [pc.sum(pc.cast(batch["fallback"], pa.int64())).as_py() or 0],
            }
        )

    partials = cols.map_batches(agg, batch_format="pyarrow").to_pandas()
    return {k: int(partials[k].sum()) for k in partials.columns}


def run_extract(
    in_dir: str,
    out_dir: str,
    *,
    files_per_wave: int = 8,
    dedup: bool = True,
    concurrency=None,
    batch_size: int = DEFAULT_BATCH_SIZE,
    fault_inject_after: int | None = None,
    partition_output: int | None = None,
    winners_mode: str = "broadcast",
    file_granular_resume: bool = False,
    fault_inject_after_files: int | None = None,
    sort_output: bool = False,
) -> dict[str, Any]:
    """Resumable wave-based run over every parquet file in ``in_dir``.

    Completed waves are skipped on restart — a wave counts as complete
    only if its manifest's recorded ``input_files`` match the wave's
    current composition, so INCREMENTAL CORPUS GROWTH (new input files
    appearing between runs, wherever they sort) self-heals by
    reprocessing exactly the shifted waves. Corpus SHRINK is not
    reconciled: orphan wave dirs beyond the new wave count are left in
    place — use a fresh out_dir when removing inputs. Returns the run
    summary (state/manifest.summarize).

    ``winners_mode``: "broadcast" (default — winner arrays via ray.put,
    right up to ~10^8 urls) or "bucketed" (winner parquet partitioned by
    hash(url) bucket + actor-pool probe — the ≥10^9-url path; the full
    winner set never materializes on one node).

    ``file_granular_resume``: make the resume unit an input FILE inside
    the wave — each file extracts into ``wave=W/file=NNN/`` with its own
    atomically-written sub-manifest, so a mid-wave kill redoes only the
    interrupted file instead of the whole wave. The wave manifest (the
    aggregation of its sub-manifests) is still written last and remains
    the wave-done marker."""
    import ray.data as rd

    files = sorted(
        os.path.join(in_dir, f) for f in os.listdir(in_dir) if f.endswith(".parquet")
    )
    if not files:
        raise ValueError(f"no parquet files in {in_dir}")
    waves = [files[i : i + files_per_wave] for i in range(0, len(files), files_per_wave)]
    manifests = mstate.load_manifests(out_dir)
    winners_ref = None
    winners_dir = None
    if dedup:
        # GLOBAL prededup: winners from a pruned (url, warc_ts) scan of
        # ALL input files (not per wave — a per-wave map would let
        # duplicate urls spanning wave boundaries survive). The scan
        # touches two small columns; the winner arrays broadcast once
        # and every wave's semi-join filter reuses them.
        if winners_mode == "bucketed":
            winners_dir = compute_latest_winners_bucketed(
                files, os.path.join(out_dir, "_winners"))
        else:
            import ray

            winners_ref = ray.put(compute_latest_winners(files))

    def unit_digest(unit_files: list[str]) -> str | None:
        """Order-free digest of the unit's SURVIVING (url, warc_ts)
        pairs — exactly what the unit's output depends on. Pruned
        2-column scan through the same winner filter the unit itself
        uses; per-batch partial = wrapping uint64 sum of mixed hashes,
        so the digest is scheduling- and partitioning-independent."""
        if not dedup:
            return None
        import numpy as np
        import pandas as pd

        proj = rd.read_parquet(unit_files, columns=["url", "warc_ts"])
        if winners_dir is not None:
            proj = filter_latest_bucketed(proj, winners_dir)
        elif winners_ref is not None:
            proj = filter_latest(proj, winners_ref)

        def partial(t: pa.Table) -> pa.Table:
            uh = pd.util.hash_array(
                np.asarray(t["url"].to_pylist(), dtype=object))
            ts = t["warc_ts"].to_numpy(zero_copy_only=False)\
                .astype("datetime64[us]").view("uint64")
            z = uh ^ ts
            z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            z = z ^ (z >> np.uint64(31))
            acc = np.bitwise_xor.reduce(z) if len(z) else np.uint64(0)
            n = np.uint64(len(z))
            return pa.table({"x": pa.array([int(acc)], pa.uint64()),
                             "n": pa.array([int(n)], pa.uint64())})

        parts = proj.map_batches(partial, batch_format="pyarrow").to_pandas()
        acc = np.uint64(0)
        n = np.uint64(0)
        if len(parts):  # a fully-deduped unit yields an empty frame
            for x, m in zip(parts["x"], parts["n"]):
                acc ^= np.uint64(x)
                n += np.uint64(m)
        return f"{int(acc):016x}:{int(n)}"

    # Lineage-validated resume: a wave counts as done ONLY if (a) its
    # manifest's recorded input_files equal the wave's CURRENT
    # composition — appending input files that sort before existing
    # ones shifts every later wave's membership; blind index-based
    # skipping would silently drop some files and double-process
    # others — AND (b) under dedup, its recorded survivor digest still
    # matches: a newer duplicate arriving in ANOTHER file demotes this
    # wave's row from winner to loser, so the wave must re-run even
    # though its own files are unchanged. Mismatched waves reprocess
    # (run_unit clears their dir first) — incremental corpus growth
    # self-heals whatever the sort order.
    done = set()
    wave_digests: dict[int, str | None] = {}
    for i, wf in enumerate(waves):
        m = manifests.get(i)
        # Basenames alone can false-match when the run is re-pointed at
        # a DIFFERENT in_dir whose files share names — the signature
        # (basename:size:mtime) catches changed content too.
        if m is None or m.get("input_sigs") != [_file_sig(f) for f in wf]:
            continue
        if dedup:
            dig = unit_digest(wf)
            wave_digests[i] = dig
            if m.get("survivor_digest") != dig:
                continue
        done.add(i)
    import shutil as _shutil

    _ZERO = {"rows": 0, "pdf_docs": 0, "html_docs": 0, "text_docs": 0,
             "pages": 0, "parse_failures": 0, "fallbacks": 0}

    def run_unit(unit_files: list[str], unit_dir: str) -> dict[str, Any]:
        """One resume unit (a wave, or a single file in granular mode):
        extract → write to a temp dir → atomic rename. Ray write_parquet
        file names are unique per execution, so re-running a crashed
        unit into the same dir would silently ADD rows alongside the
        partial output of the failed attempt — stale partial (or
        renamed-but-unmanifested) dirs are removed first; the manifest,
        written last, is the only completion marker."""
        t0 = time.perf_counter()
        ds = rd.read_parquet(unit_files)
        if winners_dir is not None:
            ds = filter_latest_bucketed(ds, winners_dir)
        elif winners_ref is not None:
            ds = filter_latest(ds, winners_ref)
        ds = extract_pages(ds, concurrency=concurrency, batch_size=batch_size)
        if sort_output:
            # deterministic row ordering across the unit's files
            # (SURVEY §2.6: sort key = url, stable diffable output);
            # one range-partitioned shuffle per unit, applied after
            # extraction so only extracted text moves
            ds = ds.sort("url")
        utmp = unit_dir + ".__tmp__"
        _shutil.rmtree(utmp, ignore_errors=True)
        _shutil.rmtree(unit_dir, ignore_errors=True)
        os.makedirs(utmp, exist_ok=True)  # a fully-deduped unit is empty
        if partition_output:
            import pandas as pd

            def add_part(b: pd.DataFrame, n=partition_output) -> pd.DataFrame:
                b = b.copy()
                b["part_id"] = (
                    pd.util.hash_array(b["url"].to_numpy(dtype=object)) % n
                ).astype("int64")
                return b

            # stable output layout: part_id = hash(url) % P (SURVEY §4.2)
            ds.map_batches(add_part, batch_format="pandas").write_parquet(
                utmp, partition_cols=["part_id"])
        else:
            ds.write_parquet(utmp)
        os.replace(utmp, unit_dir)
        has_rows = any(
            f.endswith(".parquet") or f.startswith("part_id=")
            for f in os.listdir(unit_dir)
        )
        metrics = _wave_metrics(unit_dir) if has_rows else dict(_ZERO)
        elapsed = time.perf_counter() - t0
        metrics["wall_sec"] = round(elapsed, 3)
        metrics["docs_per_sec"] = round(metrics["rows"] / elapsed, 2) if elapsed else 0.0
        return metrics

    ran = 0
    files_ran = 0
    for wave_idx, wave_files in enumerate(waves):
        if wave_idx in done:
            continue
        if fault_inject_after is not None and ran >= fault_inject_after:
            raise RuntimeError(f"fault injection: stopping before wave {wave_idx}")
        wdir = mstate.wave_dir(out_dir, wave_idx)
        if file_granular_resume:
            done_subs = mstate.completed_subunits(out_dir, wave_idx)
            os.makedirs(wdir, exist_ok=True)
            sub_metrics: list[dict[str, Any]] = []
            kept_sub_dirs: set[str] = set()
            sub_plan: list[tuple[int, str, str | None, bool]] = []
            for sub_idx, f in enumerate(wave_files):
                # mid-wave resume: skip done files — with the same
                # lineage checks as waves (the recorded file must be
                # THIS file AND, under dedup, its survivor digest must
                # be unchanged — a newer duplicate in another file
                # demotes this file's row)
                sub = done_subs.get(sub_idx)
                sdig = unit_digest([f])
                ok = (sub is not None
                      and sub.get("input_sigs") == [_file_sig(f)]
                      and (not dedup or sub.get("survivor_digest") == sdig))
                sub_plan.append((sub_idx, f, sdig, ok))
                if ok:
                    kept_sub_dirs.add(os.path.basename(
                        mstate.sub_dir(out_dir, wave_idx, sub_idx)))
            # purge stale wave-dir content a previous run/mode left
            # behind (flat parquet from a non-granular attempt, or
            # file=NNN dirs of an old composition) — run_unit only
            # clears the sub dirs it is about to rewrite, so without
            # this the old rows would merge into the re-run's output
            for entry in os.listdir(wdir):
                if entry not in kept_sub_dirs:
                    p = os.path.join(wdir, entry)
                    (_shutil.rmtree(p, ignore_errors=True)
                     if os.path.isdir(p) else os.unlink(p))
            for sub_idx, f, sdig, ok in sub_plan:
                if ok:
                    sub_metrics.append(done_subs[sub_idx]["metrics"])
                    continue
                if (fault_inject_after_files is not None
                        and files_ran >= fault_inject_after_files):
                    raise RuntimeError(
                        f"fault injection: stopping before wave {wave_idx} "
                        f"file {sub_idx}")
                m = run_unit([f], mstate.sub_dir(out_dir, wave_idx, sub_idx))
                mstate.write_sub_manifest(out_dir, wave_idx, sub_idx, {
                    "wave": wave_idx, "file_idx": sub_idx,
                    "input_files": [os.path.basename(f)],
                    "input_sigs": [_file_sig(f)], "metrics": m,
                    "survivor_digest": sdig,
                })
                sub_metrics.append(m)
                files_ran += 1
            metrics = dict(_ZERO)
            metrics["wall_sec"] = 0.0
            for m in sub_metrics:
                for k in metrics:
                    metrics[k] = round(metrics[k] + m.get(k, 0), 3)
            ws = metrics["wall_sec"]
            metrics["docs_per_sec"] = round(metrics["rows"] / ws, 2) if ws else 0.0
        else:
            metrics = run_unit(wave_files, wdir)
        dig = wave_digests.get(wave_idx)
        if dig is None and dedup:
            dig = unit_digest(wave_files)
        payload: dict[str, Any] = {
            "wave": wave_idx,
            "input_files": [os.path.basename(f) for f in wave_files],
            "input_sigs": [_file_sig(f) for f in wave_files],
            "metrics": metrics,
        }
        if dedup:
            payload["survivor_digest"] = dig
        mstate.write_manifest(out_dir, wave_idx, payload)
        ran += 1
    return mstate.summarize(out_dir)
