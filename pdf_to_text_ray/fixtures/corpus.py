"""Synthetic Common-Crawl-style pages corpus (FIXTURES.md §1).

Deterministic (seeded) mix of row kinds:
  ~20% synthetic PDFs (all xref/stream variants, incl. broken-xref),
  ~70% synthetic HTML (boilerplate + main content, malformed subset),
  ~5%  plain-text passthrough rows,
  ~5%  duplicate urls (same url, older warc_ts, different payload —
       dedup must keep the max-warc_ts row).

Golden extracted text is known by construction for every row. The
corpus scales with the driver's sf via the `documents` table row count
(TESTDATA.md) so bench sizes track sf without external data.

Generation itself runs as a Ray Data pipeline (range → map_batches)
so big corpora build in parallel; the parquet cache under /tmp is keyed
by (n_rows, seed, generator version).
"""

from __future__ import annotations

import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

from ..schemas import DOC_TYPE_HTML, DOC_TYPE_PDF, DOC_TYPE_TEXT
from .htmlgen import _WORDS, make_html_page, _sentence
from .pdfgen import make_pdf

GENERATOR_VERSION = 20  # bump to invalidate /tmp caches

# HTML body charsets, weighted like a crawl's long tail: mostly utf-8,
# a real minority of legacy single/multi-byte encodings + BOM'd bodies
# (fixtures/htmlgen._CHARSETS carries label/codec/marker per entry)
_HTML_CHARSETS = (
    ["utf-8"] * 20
    + ["cp1252", "iso8859-15", "shift_jis", "gbk", "utf-16-le", "utf-8-bom"]
)
_EPOCH_US = 1_600_000_000_000_000  # fixed base timestamp (µs)

_LANGS = ["en", "es", "de", "zh", "fr"]


def make_page_row(i: int, seed: int, heavy: bool = False) -> tuple[dict, dict | None]:
    """Deterministic row i → (page_row, golden_row). golden_row is None
    for stale-duplicate rows (they must lose dedup). ``heavy`` rows are
    ~10x larger (bench/scaling corpora)."""
    rng = random.Random(seed * 1_000_003 + i)
    url = f"https://ex{i // 7}.test/p{i}"
    warc_ts = _EPOCH_US + i * 3_600_000_000
    lang = rng.choice(_LANGS)
    kind_roll = rng.random()
    if kind_roll < 0.20:
        style = rng.choice(["table", "table", "stream", "stream_pred",
                            "hybrid"])
        broken = rng.random() < 0.05
        pdf, expected, n_pages = make_pdf(
            rng,
            n_pages=rng.randrange(4, 10) if heavy else rng.randrange(1, 6),
            xref_style=style,
            use_objstm=rng.random() < 0.25,
            two_column=rng.random() < 0.15,
            with_sucursal=rng.random() < 0.35,
            broken=broken,
            lines_per_page=rng.randrange(25, 45) if heavy else None,
            font_variant=rng.choice(
                ["standard"] * 7
                + ["differences", "winansi", "macroman", "tounicode",
                   "cid", "cid_cmap", "ucs2_cmap", "type3", "rksj_cmap",
                   "vertical_cid"]),
            # the Common-Crawl reality: a tail of empty-user-password
            # encrypted PDFs (pdf.js reads them transparently; so do
            # we), including owner-password-only locks (spec §7.6.3:
            # empty user password still decrypts)
            encrypt=rng.choice(
                [None] * 9 + ["rc4-128", "aes-128", "rc4-40",
                              "rc4-128+owner", "aes-128+owner"])
            if not broken else None,
            compress=rng.choice([True] * 8 + ["lzw", False]),
        )
        page = {"url": url, "warc_ts": warc_ts, "html": pdf,
                "text": None, "lang": lang}
        golden = {"url": url, "text_extracted": expected,
                  "doc_type": DOC_TYPE_PDF, "n_pages": n_pages}
    elif kind_roll < 0.90:
        html, expected = make_html_page(
            rng, lang=lang,
            with_sucursal=rng.random() < 0.30,
            malformed=rng.random() < 0.15,
            heavy=heavy,
            charset=rng.choice(_HTML_CHARSETS),
        )
        page = {"url": url, "warc_ts": warc_ts, "html": html,
                "text": None, "lang": lang}
        golden = {"url": url, "text_extracted": expected,
                  "doc_type": DOC_TYPE_HTML, "n_pages": 1}
    else:
        body = "\n".join(
            _sentence(rng, _WORDS, rng.randrange(4, 10))
            for _ in range(rng.randrange(2, 6))
        )
        page = {"url": url, "warc_ts": warc_ts,
                "html": body.encode("utf-8"), "text": body, "lang": lang}
        golden = {"url": url, "text_extracted": body,
                  "doc_type": DOC_TYPE_TEXT, "n_pages": 1}
    return page, golden


def make_dup_row(i: int, seed: int) -> dict:
    """A stale duplicate of row i's url: older warc_ts, different payload."""
    rng = random.Random(seed * 7_000_037 + i)
    url = f"https://ex{i // 7}.test/p{i}"
    html, _ = make_html_page(rng, lang="en")
    return {"url": url, "warc_ts": _EPOCH_US + i * 3_600_000_000 - 86_400_000_000,
            "html": html, "text": None, "lang": "en"}


def _rows_to_tables(rows: list[dict], goldens: list[dict]):
    pages = pa.table(
        {
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us")),
            "html": pa.array([r["html"] for r in rows], pa.binary()),
            "text": pa.array([r["text"] for r in rows], pa.string()),
            "lang": pa.array([r["lang"] for r in rows], pa.string()),
        }
    )
    golden = pa.table(
        {
            "url": pa.array([g["url"] for g in goldens], pa.string()),
            "text_extracted": pa.array([g["text_extracted"] for g in goldens], pa.string()),
            "doc_type": pa.array([g["doc_type"] for g in goldens], pa.string()),
            "n_pages": pa.array([g["n_pages"] for g in goldens], pa.int32()),
        }
    )
    return pages, golden


def make_pages_table(n_rows: int, seed: int = 42, dup_fraction: float = 0.05):
    """Small-scale in-memory corpus → (pages Table, golden Table)."""
    rows, goldens = [], []
    for i in range(n_rows):
        page, golden = make_page_row(i, seed)
        rows.append(page)
        goldens.append(golden)
        if random.Random(seed * 13 + i).random() < dup_fraction:
            rows.append(make_dup_row(i, seed))
    return _rows_to_tables(rows, goldens)


def ensure_pages_parquet(n_rows: int, seed: int = 42, base_dir: str = "/tmp/ptt_corpus",
                         num_shards: int | None = None,
                         heavy: bool = False) -> tuple[str, str]:
    """Build (once, cached) a sharded pages corpus + golden table on disk
    via parallel Ray tasks. Returns (pages_dir, golden_dir)."""
    import ray

    key = f"v{GENERATOR_VERSION}_n{n_rows}_s{seed}" + ("_heavy" if heavy else "")
    pages_dir = os.path.join(base_dir, key, "pages")
    golden_dir = os.path.join(base_dir, key, "golden")
    done_marker = os.path.join(base_dir, key, "_DONE")
    if os.path.exists(done_marker):
        return pages_dir, golden_dir
    os.makedirs(pages_dir, exist_ok=True)
    os.makedirs(golden_dir, exist_ok=True)
    if num_shards is None:
        # enough shards that a 32-way pool (and its 4N scaling partner)
        # always has parallel bundles: ~128 rows per shard, capped at 256
        num_shards = max(1, min(256, n_rows // 128))
    bounds = [
        (s * n_rows // num_shards, (s + 1) * n_rows // num_shards)
        for s in range(num_shards)
    ]

    @ray.remote
    def build_shard(shard_idx: int, lo: int, hi: int) -> int:
        rows, goldens = [], []
        for i in range(lo, hi):
            page, golden = make_page_row(i, seed, heavy=heavy)
            rows.append(page)
            goldens.append(golden)
            if random.Random(seed * 13 + i).random() < 0.05:
                rows.append(make_dup_row(i, seed))
        pages, golden_t = _rows_to_tables(rows, goldens)
        pq.write_table(pages, os.path.join(pages_dir, f"part-{shard_idx:05d}.parquet"))
        pq.write_table(golden_t, os.path.join(golden_dir, f"part-{shard_idx:05d}.parquet"))
        return len(rows)

    ray.get([build_shard.remote(s, lo, hi) for s, (lo, hi) in enumerate(bounds)])
    with open(done_marker, "w") as f:
        f.write("ok")
    return pages_dir, golden_dir
