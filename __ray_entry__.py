"""Driver contract for the graft builder (Ray Data target).

The driver initializes Ray BEFORE importing this module; nothing here
(or in the library) calls ``ray.init()`` / ``ray.shutdown()``.

- ``entry()``       — flagship extraction pipeline on sf0.001
- ``queries()``     — one callable per implemented operator (SURVEY.md §2)
- ``oracle_sql()``  — DuckDB-equivalent SQL for the SQL-expressible subset
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: synthesize a pages corpus scaled to sf0.001,
    run sniff → route → extract (PDF/HTML/text) → dedup; return the
    extracted-text Dataset."""
    from pdf_to_text_ray.fixtures.corpus import ensure_pages_parquet
    from pdf_to_text_ray.pipelines.extract import extract_corpus_pipeline

    pages_dir, _ = ensure_pages_parquet(n_rows=200, seed=42)
    return extract_corpus_pipeline(pages_dir)


def queries() -> dict[str, Callable[[str], Any]]:
    from pdf_to_text_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from pdf_to_text_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
