"""Sources: the pages table reader (reference S1, main.ts:136-148).

The reference reads one multipart PDF per HTTP request; here the input
is a Parquet table of Common-Crawl-style pages. Column pruning happens
AT THE READ (only requested columns leave storage — SURVEY.md's "prune
at the read" rule), and loose fixture PDFs can be read via
``read_binary_files`` for parity with the reference's single-file flow.
"""

from __future__ import annotations

from ..schemas import PAGES_SCHEMA


def read_pages(path: str, *, columns: list[str] | None = None,
               override_num_blocks: int | None = None):
    """read_parquet over the pages table with explicit pruning.

    ``columns=None`` reads the full PAGES_SCHEMA; pass the subset a
    downstream stage needs (e.g. ["url", "html"]) to keep the scan
    payload-only."""
    import ray.data as rd

    kwargs = {}
    if columns is not None:
        unknown = set(columns) - set(PAGES_SCHEMA.names)
        if unknown:
            raise ValueError(f"unknown pages columns: {sorted(unknown)}")
        kwargs["columns"] = columns
    if override_num_blocks is not None:
        kwargs["override_num_blocks"] = override_num_blocks
    return rd.read_parquet(path, **kwargs)


def read_loose_documents(path_or_paths):
    """Loose files on disk → rows of (url=path, html=bytes): the direct
    analogue of the reference's one-PDF-per-request input."""
    import pyarrow as pa
    import ray.data as rd

    ds = rd.read_binary_files(path_or_paths, include_paths=True)

    def to_pages(batch: pa.Table) -> pa.Table:
        return pa.table({
            "url": batch["path"],
            "html": batch["bytes"],
        })

    return ds.map_batches(to_pages, batch_format="pyarrow")
