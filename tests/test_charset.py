"""WHATWG-ordered charset resolution (stages/charset.py) + fixture
round-trips: every generated legacy-charset page must extract
byte-identical golden text through the full sniff→extract path."""

import random

import pytest

from pdf_to_text_ray.fixtures.htmlgen import _CHARSETS, make_html_page
from pdf_to_text_ray.stages.charset import (
    decode_payload,
    declared_charset,
    detect_bom,
    resolve_charset,
)
from pdf_to_text_ray.stages.html_extract import extract_html_text
from pdf_to_text_ray.stages.sniff import sniff_doc_type


def test_bom_detection():
    assert detect_bom(b"\xef\xbb\xbfhi") == ("utf-8", 3)
    assert detect_bom(b"\xff\xfeh\x00") == ("utf-16-le", 2)
    assert detect_bom(b"\xfe\xff\x00h") == ("utf-16-be", 2)
    assert detect_bom(b"hello") == (None, 0)


def test_declared_charset_labels():
    assert declared_charset(b'<meta charset="windows-1252">') == "cp1252"
    # WHATWG: the latin-1 family of labels means windows-1252
    assert declared_charset(b"<meta charset=iso-8859-1>") == "cp1252"
    assert declared_charset(b"<meta charset='Shift_JIS'>") == "shift_jis"
    # WHATWG: gb2312 label decodes as GBK
    assert declared_charset(b'<meta charset="GB2312">') == "gbk"
    assert declared_charset(
        b'<meta http-equiv="Content-Type" '
        b'content="text/html; charset=EUC-JP">') == "euc_jp"
    # a utf-16 label on a byte stream the ASCII scan could read ⇒ utf-8
    assert declared_charset(b'<meta charset="utf-16">') == "utf-8"
    assert declared_charset(b"<p>no declaration</p>") is None
    assert declared_charset(b'<meta charset="no-such-charset">') is None


def test_resolution_order_bom_beats_meta():
    body = '<meta charset="shift_jis"><p>caf\xe9</p>'
    payload = b"\xef\xbb\xbf" + body.encode("utf-8")
    assert resolve_charset(payload) == ("utf-8", 3)
    assert "caf\xe9" in decode_payload(payload)
    assert "﻿" not in decode_payload(payload)


def test_meta_beats_utf8_validation():
    # valid UTF-8 bytes, but the document says windows-1252: the
    # declaration wins (a browser would render 1252 here)
    payload = '<meta charset="windows-1252"><p>caf\xc3\xa9</p>'.encode("latin-1")
    enc, _ = resolve_charset(payload)
    assert enc == "cp1252"
    assert "caf\xc3\xa9" in decode_payload(payload)


def test_undeclared_utf8_and_1252_fallback():
    assert decode_payload("caf\xe9 中文".encode("utf-8")) == "caf\xe9 中文"
    # invalid UTF-8, no declaration ⇒ windows-1252 (total: every byte maps)
    raw = b"caf\xe9 \x93quoted\x94"
    assert decode_payload(raw) == "caf\xe9 “quoted”"
    assert "�" not in decode_payload(raw)


def test_decode_total_on_garbage():
    assert decode_payload(None) == ""
    assert decode_payload(b"") == ""
    assert decode_payload(bytes(range(256)))  # never raises
    assert decode_payload("already str") == "already str"


def test_utf16_page_sniffs_as_html():
    html, _ = make_html_page(random.Random(7), charset="utf-16-le")
    doc_type, is_gzip, _is_http = sniff_doc_type(html)
    assert doc_type == "html" and not is_gzip


@pytest.mark.parametrize("charset", sorted(_CHARSETS))
def test_fixture_roundtrip_byte_identical(charset):
    for seed in range(12):
        rng = random.Random(31_000 + seed)
        html, golden = make_html_page(
            rng, with_sucursal=seed % 3 == 0, malformed=seed % 4 == 0,
            charset=charset)
        assert extract_html_text(decode_payload(html)) == golden


def test_charset_marker_survives_not_mojibake():
    html, golden = make_html_page(random.Random(3), charset="shift_jis")
    text = extract_html_text(decode_payload(html))
    assert "日本語" in text  # 日本語 decoded, not mojibake
    assert text == golden
