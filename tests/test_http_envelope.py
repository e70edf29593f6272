"""HTTP response framing (WARC `response` records): status line +
headers + chunked transfer coding + gzip/deflate content codings must
unwrap before routing/extraction — the Common-Crawl payload shape the
reference never sees (its input is a bare uploaded PDF)."""
import gzip
import zlib

import pyarrow as pa
import pytest

from pdf_to_text_ray.schemas import (
    DOC_TYPE_HTML,
    DOC_TYPE_PDF,
    DOC_TYPE_TEXT,
)
from pdf_to_text_ray.stages.sniff import (
    _dechunk,
    sniff_doc_type,
    strip_http_envelope,
)

HTML = (b"<!doctype html><html><body><article><p>Hello crawl world. "
        b"This paragraph carries the boilerplate-beating payload text "
        b"of the fixture document.</p></article></body></html>")


def _frame(body: bytes, headers: bytes = b"Content-Type: text/html"
           ) -> bytes:
    return (b"HTTP/1.1 200 OK\r\n" + headers + b"\r\n\r\n" + body)


def _chunked(body: bytes, size: int = 37) -> bytes:
    out = bytearray()
    for i in range(0, len(body), size):
        c = body[i:i + size]
        out += f"{len(c):x}".encode() + b"\r\n" + c + b"\r\n"
    out += b"0\r\n\r\n"
    return bytes(out)


# ── unit: dechunk / strip ────────────────────────────────────────────

def test_dechunk_roundtrip_with_extensions():
    body = (b"5;ext=1\r\nhello\r\n6\r\n world\r\n0\r\n\r\n")
    assert _dechunk(body) == b"hello world"


def test_dechunk_truncated_is_tolerant():
    # truncation mid-chunk keeps what arrived
    body = b"a\r\n0123456789\r\nff\r\nonly-this-much"
    assert _dechunk(body) == b"0123456789only-this-much"


def test_strip_plain_crlf_and_bare_lf():
    assert strip_http_envelope(_frame(HTML)) == HTML
    assert strip_http_envelope(
        b"HTTP/1.0 200 OK\nContent-Type: text/html\n\n" + HTML) == HTML


def test_strip_chunked_and_content_encodings():
    framed = _frame(_chunked(HTML),
                    b"Transfer-Encoding: chunked\r\n"
                    b"Content-Type: text/html")
    assert strip_http_envelope(framed) == HTML

    gz = _frame(gzip.compress(HTML, mtime=0),
                b"Content-Encoding: gzip\r\nContent-Type: text/html")
    assert strip_http_envelope(gz) == HTML

    # chunked OVER gzip (coding order per RFC 9110: TE applied last)
    both = _frame(_chunked(gzip.compress(HTML, mtime=0)),
                  b"Transfer-Encoding: chunked\r\n"
                  b"Content-Encoding: gzip")
    assert strip_http_envelope(both) == HTML

    # zlib-wrapped AND raw deflate variants
    co = zlib.compressobj(wbits=-15)
    raw_deflate = co.compress(HTML) + co.flush()
    for blob in (zlib.compress(HTML), raw_deflate):
        framed = _frame(blob, b"Content-Encoding: deflate")
        assert strip_http_envelope(framed) == HTML


def test_strip_header_only_record_is_empty():
    assert strip_http_envelope(b"HTTP/1.1 304 Not Modified\r\n"
                               b"ETag: xyz\r\n") == b""


# ── sniff routing ────────────────────────────────────────────────────

def test_sniff_routes_framed_payloads():
    dt, gz, ht = sniff_doc_type(_frame(HTML))
    assert (dt, gz, ht) == (DOC_TYPE_HTML, False, True)
    dt, gz, ht = sniff_doc_type(_frame(b"%PDF-1.7\nxx"))
    assert (dt, gz, ht) == (DOC_TYPE_PDF, False, True)
    dt, gz, ht = sniff_doc_type(_frame(_chunked(HTML),
                                       b"Transfer-Encoding: chunked"))
    assert (dt, gz, ht) == (DOC_TYPE_HTML, False, True)
    # outer gzip (stored-compressed record) around the HTTP frame
    dt, gz, ht = sniff_doc_type(gzip.compress(_frame(HTML), mtime=0))
    assert (dt, gz, ht) == (DOC_TYPE_HTML, True, True)
    # bare text must not regress
    dt, gz, ht = sniff_doc_type(b"just some plain text")
    assert (dt, gz, ht) == (DOC_TYPE_TEXT, False, False)


def test_sniff_gzip_content_encoding_body():
    framed = _frame(gzip.compress(HTML, mtime=0),
                    b"Content-Encoding: gzip")
    assert sniff_doc_type(framed)[0] == DOC_TYPE_HTML


# ── e2e through the real pipeline ────────────────────────────────────

def test_framed_rows_extract_byte_identical(ray_session):
    import random

    import pandas as pd
    import ray.data as rd

    from pdf_to_text_ray.fixtures.pdfgen import make_pdf
    from pdf_to_text_ray.pipelines.extract import extract_pages

    pdf_bytes, pdf_want, _ = make_pdf(random.Random(7), n_pages=1)
    rows = [
        ("http://a.example/bare", HTML),
        ("http://a.example/framed", _frame(HTML)),
        ("http://a.example/chunked",
         _frame(_chunked(HTML), b"Transfer-Encoding: chunked\r\n"
                b"Content-Type: text/html")),
        ("http://a.example/ce-gzip",
         _frame(gzip.compress(HTML, mtime=0),
                b"Content-Encoding: gzip")),
        ("http://a.example/outer-gzip",
         gzip.compress(_frame(HTML), mtime=0)),
        ("http://a.example/pdf", _frame(pdf_bytes)),
        ("http://a.example/header-only",
         b"HTTP/1.1 304 Not Modified\r\nETag: q\r\n\r\n"),
    ]
    pages = pa.table({
        "url": pa.array([u for u, _ in rows], pa.string()),
        "warc_ts": pa.array(
            pd.to_datetime(["2024-01-01"] * len(rows)),
            pa.timestamp("us")),
        "html": pa.array([p for _, p in rows], pa.binary()),
        "text": pa.array([None] * len(rows), pa.string()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
    })
    out = (extract_pages(rd.from_arrow(pages))
           .to_pandas().set_index("url"))
    assert not out["parse_failure"].any()
    bare = out.loc["http://a.example/bare", "text_extracted"]
    assert bare  # the fixture really extracts something
    for u in ("framed", "chunked", "ce-gzip", "outer-gzip"):
        assert out.loc[f"http://a.example/{u}",
                       "text_extracted"] == bare, u
    assert out.loc["http://a.example/pdf",
                   "text_extracted"] == pdf_want
    assert out.loc["http://a.example/header-only",
                   "text_extracted"] == ""


def test_page_links_sees_through_framing(ray_session):
    from pdf_to_text_ray.stages.html_links import _decode_html

    doc = (b"<html><body><a href='http://x.example/y'>link</a>"
           b"<p>padding paragraph</p></body></html>")
    assert _decode_html(_frame(doc)) == _decode_html(doc)
    assert _decode_html(_frame(doc)) is not None


@pytest.mark.parametrize("garbage", [
    b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\nZZZ\r\nboom",
    b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\nnot-gzip-at-all",
])
def test_malformed_codings_never_raise(garbage):
    assert isinstance(strip_http_envelope(garbage), bytes)


def test_header_charset_hint_beats_meta_and_loses_to_bom():
    from pdf_to_text_ray.stages.charset import decode_payload
    from pdf_to_text_ray.stages.sniff import http_charset

    body = "<html><body><p>ünïcödé tëxt</p></body></html>".encode(
        "cp1252")
    framed = _frame(body, b"Content-Type: text/html; charset=windows-1252")
    hint = http_charset(framed)
    assert hint == "windows-1252"
    got = decode_payload(strip_http_envelope(framed), hint)
    assert "ünïcödé tëxt" in got
    # BOM wins over the header label (WHATWG precedence)
    bom_body = "﻿BOM text".encode("utf-8")
    assert decode_payload(bom_body, "windows-1252") == "BOM text"


def test_header_charset_e2e_shift_jis(ray_session):
    import pandas as pd
    import ray.data as rd

    from pdf_to_text_ray.pipelines.extract import extract_pages

    txt = "日本語のテキストです。これは充分に長い本文の段落。"
    body = (f"<html><body><p>{txt}</p></body></html>").encode("shift_jis")
    rows = [("http://jp.example/sjis",
             _frame(body, b"Content-Type: text/html; charset=Shift_JIS"))]
    pages = pa.table({
        "url": pa.array([u for u, _ in rows], pa.string()),
        "warc_ts": pa.array(pd.to_datetime(["2024-01-01"]),
                            pa.timestamp("us")),
        "html": pa.array([p for _, p in rows], pa.binary()),
        "text": pa.array([None], pa.string()),
        "lang": pa.array(["ja"], pa.string()),
    })
    out = extract_pages(rd.from_arrow(pages)).to_pandas()
    assert txt in out["text_extracted"].iloc[0]
