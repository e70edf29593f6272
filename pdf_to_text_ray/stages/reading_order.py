"""Reading-order reconstruction: positioned text runs → page text.

This is the frozen half of the pinned extraction spec (FIXTURES.md §2):
given the set of positioned text runs a PDF page's content stream
produced, emit the page's text as

- **columns** split at the largest gap (≥ ``COLUMN_GAP`` points) between
  distinct run start-x values, when both sides span ≥ 2 distinct lines —
  left column first (one split; two-column layouts, the common case);
- within a column, **lines** clustered by y (tolerance ``LINE_TOL``),
  ordered top→bottom (descending PDF y);
- within a line, runs ordered by x (stable: emission order breaks ties),
  joined by single spaces;
- lines joined by "\n".

Fidelity note vs the reference: pdf.js text items rarely contain
newlines, so the reference's "lines" (main.ts:73) are effectively
page-granularity; explicit layout reconstruction strictly dominates
that degenerate case (SURVEY.md §5.1).

Both the from-scratch parser (pdf_extract.py) and the fixture generator
(fixtures/pdfgen.py) use this module, so golden text is derived from the
same frozen spec; the spec itself is pinned by hand-written unit tests.
"""

from __future__ import annotations

from typing import NamedTuple


class Run(NamedTuple):
    x: float
    y: float
    text: str


COLUMN_GAP = 150.0
LINE_TOL = 2.0


def _split_columns(runs: list[Run]) -> list[list[Run]]:
    xs = sorted({r.x for r in runs})
    if len(xs) < 2:
        return [runs]
    best_gap, split_at = 0.0, None
    for a, b in zip(xs, xs[1:]):
        if b - a > best_gap:
            best_gap, split_at = b - a, (a + b) / 2.0
    if best_gap < COLUMN_GAP or split_at is None:
        return [runs]
    left = [r for r in runs if r.x < split_at]
    right = [r for r in runs if r.x >= split_at]

    def n_lines(col: list[Run]) -> int:
        ys = sorted({r.y for r in col}, reverse=True)
        count, prev = 0, None
        for y in ys:
            if prev is None or prev - y > LINE_TOL:
                count += 1
            prev = y
        return count

    if n_lines(left) >= 2 and n_lines(right) >= 2:
        return [left, right]
    return [runs]


def _cluster_lines(runs: list[Run]) -> list[list[Run]]:
    # stable sort by descending y only — x order within a line is resolved
    # by a separate stable sort so equal (x, y) keep emission order
    by_y = sorted(runs, key=lambda r: -r.y)
    lines: list[list[Run]] = []
    current: list[Run] = []
    prev_y: float | None = None
    for r in by_y:
        if prev_y is None or prev_y - r.y <= LINE_TOL:
            current.append(r)
        else:
            lines.append(current)
            current = [r]
        prev_y = r.y
    if current:
        lines.append(current)
    return [sorted(line, key=lambda r: r.x) for line in lines]


def page_text(runs: list[Run]) -> str:
    """Assemble one page's text from its positioned runs (frozen spec).
    Runs with non-finite coordinates (degenerate matrices in malformed
    content streams) are dropped — they cannot be ordered."""
    import math

    runs = [r for r in runs
            if r.text and math.isfinite(r.x) and math.isfinite(r.y)]
    if not runs:
        return ""
    parts: list[str] = []
    for col in _split_columns(runs):
        for line in _cluster_lines(col):
            parts.append(" ".join(r.text for r in line))
    return "\n".join(parts)


def document_text(pages: list[list[Run]]) -> str:
    """Pages joined with "\n" — parity with main.ts:152-154."""
    return "\n".join(page_text(p) for p in pages)
