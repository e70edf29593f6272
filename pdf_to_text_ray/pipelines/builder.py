"""User-extension surface: a small Stage protocol + pipeline builder.

The reference hardcodes its block markers (main.ts:79,94), prompt schema
(main.ts:183-198), CSV header (main.ts:40) and chunk size (main.ts:166).
Here those become injectable configuration (SURVEY.md §2.9): a pipeline
is a list of ``Stage``s chained as ``map_batches`` calls, and the
segmentation markers / record pattern are a ``SegmentConfig``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any


@dataclass(frozen=True)
class Stage:
    """One map_batches hop. ``fn_or_cls`` is a callable (stateless tasks)
    or a class (actor pool — ``concurrency`` required)."""

    name: str
    fn_or_cls: Any
    batch_format: str = "pyarrow"
    batch_size: int | None = None
    concurrency: Any = None
    num_cpus: float = 1.0
    fn_kwargs: dict = field(default_factory=dict)

    def apply(self, ds):
        kwargs: dict[str, Any] = {
            "batch_format": self.batch_format,
            "num_cpus": self.num_cpus,
        }
        if self.batch_size is not None:
            kwargs["batch_size"] = self.batch_size
        if isinstance(self.fn_or_cls, type):
            if self.concurrency is None:
                raise ValueError(f"stage {self.name}: actor stage needs concurrency")
            kwargs["concurrency"] = self.concurrency
        if self.fn_kwargs:
            kwargs["fn_kwargs"] = self.fn_kwargs
        return ds.map_batches(self.fn_or_cls, **kwargs)


def build_pipeline(ds, stages: list[Stage]):
    """Chain stages left-to-right over a Dataset (lazy; the streaming
    executor schedules them with backpressure)."""
    for stage in stages:
        ds = stage.apply(ds)
    return ds


@dataclass(frozen=True)
class SegmentConfig:
    """Injectable segmentation/record config (reference defaults).

    - ``start_marker``: case-insensitive line PREFIX opening a block
      (main.ts:79 semantics)
    - ``end_pattern``: regex closing a block when it matches anywhere in
      the line (main.ts:94 semantics)
    - ``record_pattern``: regex with 3 groups (id, qty, amount) for sale
      lines
    - ``max_blocks_per_chunk``: chunking parity (main.ts:166)
    """

    start_marker: str = "sucursal"
    end_pattern: str = r"\* total importe en la sucursal:\s*\d+(\.\d+)?"
    record_pattern: str = r"^\s*(\d{8,14})\s+([+-]?\d+)\s+([+-]?\d+(?:\.\d+)?)\s*$"
    max_blocks_per_chunk: int = 10

    def compile(self) -> "CompiledSegmenter":
        return CompiledSegmenter(self)


class CompiledSegmenter:
    """Config-driven generalization of stages/segment.py (which keeps
    the exact-reference fast path)."""

    def __init__(self, cfg: SegmentConfig):
        self.cfg = cfg
        self.start = cfg.start_marker.lower()
        self.end_re = re.compile(cfg.end_pattern, re.IGNORECASE)
        self.record_re = re.compile(cfg.record_pattern)
        self.strip_re = re.compile(
            rf"^{re.escape(cfg.start_marker)}\s*", re.IGNORECASE)

    def extract_blocks(self, full_text: str) -> list[str]:
        blocks: list[str] = []
        current: list[str] = []
        capturing = False
        for line in full_text.split("\n"):
            if line.lower().startswith(self.start):
                if current:
                    blocks.append("\n".join(current))
                current = [line]
                capturing = True
                continue
            if capturing:
                current.append(line)
                if self.end_re.search(line):
                    blocks.append("\n".join(current))
                    current = []
                    capturing = False
        if capturing and current:
            blocks.append("\n".join(current))
        return blocks

    def parse_records(self, block_text: str) -> list[tuple[str, str, int, float]]:
        from ..functions.scalars import parse_float_or_zero, parse_int_or_zero

        lines = block_text.split("\n")
        if not lines:
            return []
        name = self.strip_re.sub("", lines[0], count=1).strip()
        out = []
        for line in lines[1:]:
            m = self.record_re.match(line)
            if m:
                out.append((name, m.group(1),
                            parse_int_or_zero(m.group(2)),
                            parse_float_or_zero(m.group(3))))
        return out
