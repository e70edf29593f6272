"""Content sniffing / routing stage.

Generalizes the reference's extension→MIME switch (src/main.ts:277-280)
into the router the north rule requires: classify each row's payload
bytes as PDF (``%PDF-`` magic prefix), HTML (doctype / common tag within
the first 1 KiB), or plain text, and attach a ``doc_type`` column plus a
``size_bucket`` (log2 of payload size) used for size-bucketed batching /
oversized-row routing (SURVEY.md §4.2).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..schemas import DOC_TYPE_HTML, DOC_TYPE_PDF, DOC_TYPE_TEXT

_HTML_HINT = re.compile(
    rb"<!doctype\s+html|<html[\s>]|<head[\s>]|<body[\s>]|<article[\s>]|"
    rb"<div[\s>]|<p[\s>]|<meta[\s>]|<title[\s>]|<h1[\s>]"
)


GZIP_MAGIC = b"\x1f\x8b"


def _gunzip_head(payload: bytes, n: int = 2048) -> bytes:
    """Decompress just enough of a gzip payload to sniff it."""
    import zlib

    try:
        d = zlib.decompressobj(wbits=31)
        return d.decompress(payload[: n * 4], n)
    except zlib.error:
        return b""


def sniff_doc_type(payload: bytes | None) -> tuple[str, bool]:
    """→ (doc_type, is_gzip). Gzipped payloads (Common-Crawl WARC
    bodies are often stored compressed) are sniffed on a decompressed
    prefix; the dispatch stage decompresses the full payload."""
    if not payload:
        return DOC_TYPE_TEXT, False
    is_gzip = payload[:2] == GZIP_MAGIC
    if is_gzip:
        payload = _gunzip_head(payload)
        if not payload:
            return DOC_TYPE_TEXT, True
    if payload[:5] == b"%PDF-":
        return DOC_TYPE_PDF, is_gzip
    head = payload[:1024].lower()
    # BOM'd UTF-16 bodies interleave NULs with the ASCII tag bytes —
    # transcode the prefix so the tag hints still match (the extractor
    # decodes the full payload via stages/charset BOM sniffing)
    if payload[:2] in (b"\xff\xfe", b"\xfe\xff"):
        enc = "utf-16-le" if payload[:2] == b"\xff\xfe" else "utf-16-be"
        head = (payload[2:1026].decode(enc, errors="replace")
                .encode("utf-8", errors="replace").lower())
    if _HTML_HINT.search(head):
        return DOC_TYPE_HTML, is_gzip
    return DOC_TYPE_TEXT, is_gzip


def sniff_batch(batch: pa.Table, payload_col: str = "html") -> pa.Table:
    """Append doc_type + size_bucket. The per-row work touches only a
    1 KiB prefix slice (cheap vs payload size); payload bytes stay
    zero-copy in Arrow."""
    prefixes = pc.binary_slice(batch[payload_col], 0, 8192).to_pylist()
    sniffed = [sniff_doc_type(p) for p in prefixes]
    doc_type = pa.array([s_[0] for s_ in sniffed], pa.string())
    is_gzip = pa.array([s_[1] for s_ in sniffed], pa.bool_())
    sizes = pc.binary_length(batch[payload_col]).to_numpy(zero_copy_only=False)
    sizes = np.where(np.isnan(sizes.astype("float64")), 0, sizes).astype("int64")
    bucket = np.where(sizes > 0, np.log2(np.maximum(sizes, 1)).astype("int32"), 0)
    return (
        batch.append_column("doc_type", doc_type)
        .append_column("is_gzip", is_gzip)
        .append_column("size_bucket", pa.array(bucket.astype("int32"), pa.int32()))
    )
