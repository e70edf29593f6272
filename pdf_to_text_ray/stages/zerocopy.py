"""Zero-copy per-row views over Arrow binary columns.

The extraction hot path used ``batch[col].to_pylist()``, which
materializes one Python ``bytes`` COPY per row — at web-page payload
sizes that memcpy's the whole column a second time per batch and is
pure memory-bandwidth tax on a busy host (the single-box scaling
bottleneck measured in BENCH/BASELINE.md). A ``memoryview`` sliced
straight out of the Arrow data buffer hands the parser the same bytes
with zero traffic; the payload is copied at most once, inside the one
consumer that genuinely needs an owned buffer (the PDF lexer).

Consumers must treat views as READ-ONLY and must not retain them past
the batch — the underlying buffer belongs to Ray's object store and is
unpinned when the batch is dropped.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def binary_views(col) -> list:
    """Per-row zero-copy ``memoryview`` slices of a (large_)binary or
    (large_)string column; ``None`` for null rows."""
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    out: list = []
    for ch in chunks:
        n = len(ch)
        if n == 0:
            continue
        t = ch.type
        width = 8 if (pa.types.is_large_binary(t)
                      or pa.types.is_large_string(t)) else 4
        odt = np.int64 if width == 8 else np.int32
        validity, offbuf, databuf = ch.buffers()
        # a sliced array reads offsets [ch.offset, ch.offset + n]
        offs = np.frombuffer(offbuf, odt, n + 1, ch.offset * width)
        # Arrow buffers expose format 'b' (signed char); equality against
        # bytes literals then compares VALUES under the signed
        # interpretation and fails for any byte > 0x7f (e.g. a UTF-16
        # BOM). Cast to unsigned 'B' so views behave like bytes.
        data = (memoryview(databuf).cast("B") if databuf is not None
                else memoryview(b""))
        if validity is None:
            nulls = None
        else:
            bits = np.unpackbits(
                np.frombuffer(validity, np.uint8, (ch.offset + n + 7) // 8),
                bitorder="little")
            nulls = bits[ch.offset:ch.offset + n] == 0
        for i in range(n):
            if nulls is not None and nulls[i]:
                out.append(None)
            else:
                out.append(data[offs[i]:offs[i + 1]])
    return out
