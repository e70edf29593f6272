"""Web-payload character-set resolution (WHATWG Encoding-style).

The reference converts one uploaded file per request and never sees
legacy charsets; a Common-Crawl-style pages table is a long tail of
windows-1252 / Shift_JIS / GBK / EUC-KR / UTF-16 bodies, so the north
rule's "byte-identical extracted text per url" hinges on decoding the
payload the way a browser would. Resolution order follows the WHATWG
Encoding standard's sniffing algorithm (the published spec pdf.js-era
browsers implement; public knowledge, implemented from the spec text):

1. **BOM** — UTF-8 / UTF-16LE / UTF-16BE byte-order marks win over
   everything (spec: "BOM sniffing takes precedence").
2. **In-document declaration** — ``<meta charset=...>`` or
   ``<meta http-equiv="content-type" content="...charset=...">``
   within the first 2 KiB, label-normalized per the spec's label
   table (``latin1``/``iso-8859-1``/``us-ascii`` → windows-1252,
   ``gb2312`` → GBK, a ``utf-16*`` label in a meta → UTF-8).
3. **UTF-8 strict validation** of the full payload.
4. **windows-1252 fallback** — the spec's default for the dominant
   locale group; every byte decodes, so extraction is total.

Pure function of the payload bytes — safe inside stateless
``map_batches`` tasks; the codec lookup table is module-level.
"""

from __future__ import annotations

import codecs
import re

# WHATWG label → Python codec (the subset covering the web's measured
# long tail; unknown labels fall through to validation/fallback).
_LABELS: dict[str, str] = {
    "utf-8": "utf-8", "utf8": "utf-8", "unicode-1-1-utf-8": "utf-8",
    # WHATWG maps the latin-1 family of labels to windows-1252
    "iso-8859-1": "cp1252", "iso8859-1": "cp1252", "latin1": "cp1252",
    "latin-1": "cp1252", "us-ascii": "cp1252", "ascii": "cp1252",
    "windows-1252": "cp1252", "cp1252": "cp1252", "x-cp1252": "cp1252",
    "iso-8859-2": "iso8859-2", "latin2": "iso8859-2",
    "iso-8859-15": "iso8859-15", "latin9": "iso8859-15",
    "windows-1250": "cp1250", "windows-1251": "cp1251",
    "cp1251": "cp1251", "koi8-r": "koi8-r", "koi8": "koi8-r",
    "windows-1254": "cp1254", "iso-8859-9": "cp1254",
    "shift_jis": "shift_jis", "shift-jis": "shift_jis",
    "sjis": "shift_jis", "x-sjis": "shift_jis", "ms_kanji": "shift_jis",
    "euc-jp": "euc_jp", "x-euc-jp": "euc_jp",
    "iso-2022-jp": "iso2022_jp",
    # WHATWG: the gb2312 label decodes as GBK
    "gb2312": "gbk", "gbk": "gbk", "x-gbk": "gbk", "gb_2312": "gbk",
    "gb18030": "gb18030",
    "big5": "big5", "big5-hkscs": "big5hkscs",
    "euc-kr": "euc_kr", "korean": "euc_kr", "ks_c_5601-1987": "euc_kr",
    "windows-874": "cp874", "tis-620": "cp874",
}

# meta charset / http-equiv content-type, scanned over raw bytes (every
# supported declared encoding is ASCII-compatible in its first KiB)
_DECL_RE = re.compile(
    rb"""<meta[^>]{0,512}?charset\s*=\s*["']?\s*([A-Za-z0-9._:\-]+)""",
    re.IGNORECASE | re.DOTALL,
)

_HEAD_SCAN = 2048


def normalize_label(label: str) -> str | None:
    """WHATWG label → Python codec name (None if unrecognized)."""
    enc = _LABELS.get(label.strip().lower())
    if enc is not None:
        return enc
    # any other label Python happens to know (ASCII-compatible only —
    # a bogus utf-16 meta on a byte stream must not win)
    try:
        name = codecs.lookup(label).name
    except (LookupError, TypeError):
        return None
    return None if name.startswith("utf-16") or name.startswith("utf-32") else name


def detect_bom(payload: bytes) -> tuple[str | None, int]:
    """→ (codec, bom_length). UTF-8 / UTF-16 byte-order marks only
    (UTF-32 is not a web encoding per the spec)."""
    if payload[:3] == b"\xef\xbb\xbf":
        return "utf-8", 3
    if payload[:2] == b"\xff\xfe":
        return "utf-16-le", 2
    if payload[:2] == b"\xfe\xff":
        return "utf-16-be", 2
    return None, 0


def declared_charset(head: bytes) -> str | None:
    """First in-document charset declaration in ``head`` → codec.
    A utf-16 label is treated as utf-8 (WHATWG: the document is
    evidently not utf-16 if the ASCII scan found the meta)."""
    m = _DECL_RE.search(head)
    if not m:
        return None
    label = m.group(1).decode("ascii", "ignore").lower()
    if label.startswith("utf-16") or label.startswith("utf16"):
        return "utf-8"
    return normalize_label(label)


def resolve_charset(payload: bytes,
                    hint: str | None = None) -> tuple[str, int]:
    """Full sniff → (codec, bom_length_to_strip). ``hint`` is a
    transport-layer charset label (the HTTP Content-Type header's
    charset= parameter): per WHATWG precedence it loses to a BOM but
    beats the in-document meta declaration."""
    bom, blen = detect_bom(payload)
    if bom is not None:
        return bom, blen
    if hint:
        enc = normalize_label(hint.lower())
        if enc is not None and not enc.startswith("utf-16"):
            return enc, 0
    enc = declared_charset(payload[:_HEAD_SCAN])
    if enc is not None:
        return enc, 0
    try:
        # str(buf, enc, errors) accepts any bytes-like object — the
        # zero-copy memoryview path must not force a bytes copy here
        str(payload, "utf-8", "strict")
        return "utf-8", 0
    except (UnicodeDecodeError, TypeError, AttributeError):
        return "cp1252", 0


def decode_payload(payload: bytes | memoryview | str | None,
                   hint: str | None = None) -> str:
    """Payload bytes → text via the resolution order above. Total:
    never raises on byte content (errors="replace" after resolution —
    a replacement character here means genuinely corrupt bytes, not a
    missed charset). Accepts any bytes-like object (the extract hot
    path hands zero-copy Arrow-buffer memoryviews)."""
    if payload is None:
        return ""
    if isinstance(payload, str):
        return payload
    enc, blen = resolve_charset(payload, hint)
    return str(payload[blen:] if blen else payload, enc, "replace")
