"""Deterministic synthetic-PDF generator with golden text by construction.

Builds minimal-but-real PDF 1.4/1.7 documents from a grammar (PDF 1.7
spec, ISO 32000-1: §7.5 file structure, §7.5.4 xref tables, §7.5.8 xref
streams, §7.5.7 object streams, §9.4 text objects):

- classic xref tables AND cross-reference streams (/Type/XRef, /W,
  optional PNG up-predictor /DecodeParms)
- object streams (/Type/ObjStm) holding the catalog/pages/font dicts
- uncompressed and FlateDecode content streams; /Contents arrays
- text operators: BT/ET, Tf, Td, TD, TL, T*, Tm, Tj, TJ (with kerning
  numbers), ', ", string escapes (\\( \\) \\\\ octal \\101)
- multi-page documents, a two-column-layout subset, and an
  intentionally-broken-xref subset (salvage-scan + fallback test)

The generator records every emitted run's (x, y, text) and derives the
golden text through the same frozen reading-order spec the extractor
uses (stages/reading_order.py, itself pinned by hand-written tests), so
expected text is known by construction.
"""

from __future__ import annotations

import random
import zlib

from ..stages.reading_order import Run, document_text
from .htmlgen import _WORDS, make_sucursal_block_lines, _sentence

FONT_SIZE = 12.0
LEADING = 14.0
PAGE_TOP = 742.0
LEFT_X = 50.0
RIGHT_X = 340.0

# Fixture recipient RSA keypair for the public-key (certificate)
# security handler (spec §7.6.4) — 512-bit, deterministic, generated
# once offline (Miller-Rabin over a seeded PRNG). Fixture-scale only:
# the point is the PKCS#7/RSA parse+unwrap logic, not key strength.
FIXTURE_RSA_N = int(
    "9d906a212c57477ac38e784b3c36fd34def87c130fdb5572fb867c429f380352"
    "391e2a1f2e94490d7fdd950ba301cdc95a2af3ea91fe44f874d6156075056d21",
    16)
FIXTURE_RSA_E = 65537
FIXTURE_RSA_D = int(
    "877b45c6807a0bdc638a7da5338194f78141e86dfb947d4501420256c6d14308"
    "72e95502e40af5d934df410dc047121810ace5774e70171ef42876367cf2e081",
    16)


def _esc(s: str) -> bytes:
    out = []
    for ch in s:
        if ch in "()\\":
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "".join(out).encode("latin-1")


class _PageCompose:
    """Accumulates content-stream ops + the ground-truth runs."""

    def __init__(self):
        self.ops: list[bytes] = [b"BT", b"/F1 12 Tf"]
        self.runs: list[Run] = []

    def _show(self, x: float, y: float, text: str):
        self.runs.append(Run(x, y, text))

    def lines_td(self, x: float, lines: list[str], y0: float = PAGE_TOP):
        self.ops.append(f"{x:.1f} {y0:.1f} Td".encode())
        y = y0
        for i, ln in enumerate(lines):
            if i > 0:
                self.ops.append(f"0 -{LEADING:.0f} Td".encode())
                y -= LEADING
            self.ops.append(b"(" + _esc(ln) + b") Tj")
            self._show(x, y, ln)

    def lines_tstar(self, x: float, lines: list[str], y0: float = PAGE_TOP):
        self.ops.append(f"{LEADING:.0f} TL".encode())
        self.ops.append(f"{x:.1f} {y0:.1f} Td".encode())
        y = y0
        for i, ln in enumerate(lines):
            if i == 0:
                self.ops.append(b"(" + _esc(ln) + b") Tj")
            else:
                self.ops.append(b"(" + _esc(ln) + b") '")  # T* + show
                y -= LEADING
            self._show(x, y, ln)

    def lines_tm(self, x: float, lines: list[str], y0: float = PAGE_TOP):
        y = y0
        for ln in lines:
            self.ops.append(f"1 0 0 1 {x:.1f} {y:.1f} Tm".encode())
            self.ops.append(b"(" + _esc(ln) + b") Tj")
            self._show(x, y, ln)
            y -= LEADING

    def line_tj_kerned(self, x: float, y: float, pieces: list[str]):
        arr = b" ".join(
            b"(" + _esc(p) + b")" + (b" -18" if i + 1 < len(pieces) else b"")
            for i, p in enumerate(pieces)
        )
        self.ops.append(f"1 0 0 1 {x:.1f} {y:.1f} Tm".encode())
        self.ops.append(b"[" + arr + b"] TJ")
        self._show(x, y, "".join(pieces))

    def line_raw(self, x: float, y: float, raw_text: str, expected: str):
        """Show raw latin-1 bytes whose decoded (font-mapped) text differs."""
        self.ops.append(f"1 0 0 1 {x:.1f} {y:.1f} Tm".encode())
        self.ops.append(b"(" + _esc(raw_text) + b") Tj")
        self._show(x, y, expected)

    def line_hex(self, x: float, y: float, code_bytes: bytes, expected: str,
                 font: str = "F2"):
        """Show a hex string (2-byte CID codes for a Type0 font) —
        switches to ``font`` for the show, then back to /F1."""
        self.ops.append(f"/{font} 12 Tf".encode())
        self.ops.append(f"1 0 0 1 {x:.1f} {y:.1f} Tm".encode())
        self.ops.append(b"<" + code_bytes.hex().encode() + b"> Tj")
        self.ops.append(b"/F1 12 Tf")
        self._show(x, y, expected)

    def lines_hex_vertical(self, x: float, y: float,
                           code_texts: list[tuple[bytes, str]],
                           font: str = "F2", size: float = 12.0):
        """Consecutive vertical shows in ONE text object: writing mode
        1 advances the pen DOWN by n_glyphs × size (the /DW2 default of
        one em per glyph), so each subsequent show starts below the
        previous — the recorded run positions encode that advance."""
        self.ops.append(f"/{font} {size:g} Tf".encode())
        self.ops.append(f"1 0 0 1 {x:.1f} {y:.1f} Tm".encode())
        yy = y
        for codes, text in code_texts:
            self.ops.append(b"<" + codes.hex().encode() + b"> Tj")
            self._show(x, yy, text)
            yy -= size * len(text)
        self.ops.append(b"/F1 12 Tf")

    def line_quote(self, x: float, y: float, text: str):
        # aw ac (s) " — set word/char spacing, T*, show
        self.ops.append(f"{LEADING:.0f} TL".encode())
        self.ops.append(f"1 0 0 1 {x:.1f} {y + LEADING:.1f} Tm".encode())
        self.ops.append(b'0.5 0.1 (' + _esc(text) + b') "')
        self._show(x, y, text)

    def content(self) -> bytes:
        return b"\n".join(self.ops + [b"ET"]) + b"\n"


def _lzw_encode(data: bytes, early_change: int = 1) -> bytes:
    """PDF LZWDecode-compatible encoder (spec §7.4.4): MSB-first
    variable-width 9→12-bit codes, clear=256/EOD=257, EarlyChange=1.
    Mirrors the extractor's decoder width schedule; table reset at
    4095 entries."""
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(256, width)  # initial clear
    w = b""
    for byte in data:
        wc = w + bytes([byte])
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        table[wc] = next_code
        next_code += 1
        # decoder widens when len(table)+early >= 1<<width; its table
        # length equals next_code here
        if next_code + early_change - 1 >= (1 << width) and width < 12:
            width += 1
        if next_code >= 4095:
            emit(256, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = bytes([byte])
    if w:
        emit(table[w], width)
        # the decoder APPENDS an entry for this final code too and may
        # widen before reading the next code — mirror it, else EOD goes
        # out at a stale width when the final code lands exactly on a
        # 511/1023/2047-entry boundary (silent roundtrip corruption)
        next_code += 1
        if next_code + early_change - 1 >= (1 << width) and width < 12:
            width += 1
    emit(257, width)  # EOD
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _rand_lines(rng: random.Random, n: int) -> list[str]:
    return [_sentence(rng, _WORDS, rng.randrange(3, 9))[:-1] for _ in range(n)]


class _PdfBuilder:
    def __init__(self):
        self.objects: dict[int, bytes] = {}  # body bytes (without "N 0 obj")
        self.next_num = 1

    def add(self, body: bytes) -> int:
        n = self.next_num
        self.next_num += 1
        self.objects[n] = body
        return n

    def add_stream(self, extra: bytes, data: bytes, compress) -> int:
        """``compress``: False (raw), True (Flate), or "lzw"."""
        if compress == "lzw":
            data = _lzw_encode(data)
            filt = b"/Filter /LZWDecode "
        elif compress:
            data = zlib.compress(data)
            filt = b"/Filter /FlateDecode "
        else:
            filt = b""
        body = (
            b"<< " + filt + b"/Length " + str(len(data)).encode() + b" " + extra
            + b">>\nstream\n" + data + b"\nendstream"
        )
        return self.add(body)

    def serialize(self, xref_style: str, objstm_nums: list[int] | None = None,
                  broken: bool = False, encrypt: str | None = None) -> bytes:
        """Serialize with a classic xref table or an xref stream.

        objstm_nums: object numbers to pack into one /ObjStm (xref-stream
        style only). broken: corrupt the startxref offset.
        encrypt: None, "rc4-40", "rc4-128", "aes-128" (or "aes-256") —
        standard security handler with EMPTY user/owner passwords;
        "pubsec" emits a certificate-handler /Encrypt dict
        (/Adobe.PPKLite) with unencrypted bodies — extraction must
        raise PdfPubSecError before touching content
        (spec §7.6); every stream payload is encrypted with its
        per-object key (deterministic IVs for AES so fixtures are
        byte-reproducible). A "+owner" suffix (e.g. "rc4-128+owner")
        locks the document with a NON-EMPTY owner password while the
        user password stays empty — spec §7.6.3: such documents must
        still decrypt with the empty user password (pdf.js does; so
        must we).
        """
        out = bytearray(b"%PDF-1.7\n%\xe2\xe3\xcf\xd3\n")
        offsets: dict[int, int] = {}
        in_objstm: dict[int, int] = {}  # obj num -> index within objstm

        handler = None
        enc_num = None
        file_id = b""
        if encrypt == "pubsec":
            # certificate (public-key) security handler (spec §7.6.4):
            # a crawl pipeline has no recipient private key, so the
            # extractor must raise PdfPubSecError at the trailer —
            # bodies stay unencrypted (never reached) and handler stays
            # None so encrypt_body is skipped
            import hashlib

            file_id = hashlib.md5(b"fixture-id:pubsec").digest()
            enc_num = self.next_num
            self.next_num += 1
            self.objects[enc_num] = (
                b"<< /Filter /Adobe.PPKLite /SubFilter /adbe.pkcs7.s5 "
                b"/V 4 /Length 128 "
                b"/Recipients [ <deadbeefcafef00d> ] "
                b"/CF << /DefaultCryptFilter "
                b"<< /CFM /AESV2 /Length 16 >> >> "
                b"/StmF /DefaultCryptFilter /StrF /DefaultCryptFilter >>")
        elif encrypt == "pubsec-real":
            # the same certificate handler with a REAL PKCS#7
            # envelope: AESV2 bodies keyed by SHA-1(seed ‖ recipients)
            # per §7.6.4, recipient CEK RSA-wrapped to the fixture
            # keypair. Extraction succeeds iff FIXTURE_RSA (n, d) is
            # registered (pdf_crypto.RECIPIENT_KEYS); otherwise it
            # must raise PdfPubSecError exactly like "pubsec".
            import hashlib

            from ..stages import pdf_crypto, pkcs7

            file_id = hashlib.md5(b"fixture-id:pubsec-real").digest()
            seed20 = hashlib.sha1(b"fixture-pubsec-seed:"
                                  + file_id).digest()
            cek = hashlib.md5(b"fixture-pubsec-cek:" + file_id).digest()
            env_iv = hashlib.md5(b"fixture-pubsec-iv:"
                                 + file_id).digest()
            blob = pkcs7.build_enveloped(
                seed20 + b"\xff\xff\xff\xff",
                [(FIXTURE_RSA_N, FIXTURE_RSA_E)],
                iv=env_iv, cek=cek, seed=b"fixture-pubsec-ps:")
            enc_num = self.next_num
            self.next_num += 1
            self.objects[enc_num] = (
                b"<< /Filter /Adobe.PPKLite /SubFilter /adbe.pkcs7.s5 "
                b"/V 4 "
                b"/CF << /DefaultCryptFilter "
                b"<< /CFM /AESV2 /Length 16 /Recipients [ <"
                + blob.hex().encode() + b"> ] >> >> "
                b"/StmF /DefaultCryptFilter /StrF /DefaultCryptFilter >>")
            handler = object.__new__(pdf_crypto.StandardSecurityHandler)
            handler.v, handler.r, handler.length = 4, 4, 128
            handler.o = handler.u = b""
            handler.p = 0
            handler.encrypt_metadata = True
            handler.cfm_stm = handler.cfm_str = "AESV2"
            handler.file_id = file_id
            handler.key = pkcs7.pubsec_file_key(seed20, [blob], 16)
        elif encrypt:
            import hashlib

            from ..stages import pdf_crypto

            file_id = hashlib.md5(
                f"fixture-id:{encrypt}:{len(self.objects)}".encode()).digest()
            mode, _, owner_flag = encrypt.partition("+")
            opw = b"fixture-owner-secret" if owner_flag == "owner" else b""
            enc_dict, handler = pdf_crypto.make_encrypt_dict(
                file_id, mode=mode, owner_password=opw)
            body = (
                b"<< /Filter /Standard /V " + str(enc_dict["V"]).encode()
                + b" /R " + str(enc_dict["R"]).encode()
                + b" /Length " + str(enc_dict["Length"]).encode()
                + b" /P " + str(enc_dict["P"]).encode()
                + b" /O <" + enc_dict["O"].hex().encode() + b">"
                + b" /U <" + enc_dict["U"].hex().encode() + b">"
            )
            if enc_dict["V"] == 4:
                body += (b" /CF << /StdCF << /CFM /AESV2 /Length 16"
                         b" /AuthEvent /DocOpen >> >>"
                         b" /StmF /StdCF /StrF /StdCF")
            elif enc_dict["V"] == 5:
                body += (
                    b" /OE <" + enc_dict["OE"].hex().encode() + b">"
                    + b" /UE <" + enc_dict["UE"].hex().encode() + b">"
                    + b" /Perms <" + enc_dict["Perms"].hex().encode() + b">"
                    + b" /CF << /StdCF << /CFM /AESV3 /Length 32"
                    b" /AuthEvent /DocOpen >> >>"
                    b" /StmF /StdCF /StrF /StdCF"
                )
            body += b" >>"
            enc_num = self.next_num
            self.next_num += 1
            self.objects[enc_num] = body

        def encrypt_body(num: int, body: bytes) -> bytes:
            """Encrypt the stream payload of an object (non-stream
            fixture objects carry no strings, so streams are the only
            encrypted content here)."""
            i = body.find(b">>\nstream\n")
            if i == -1:
                return body
            import hashlib
            import re as _re

            head = body[:i]
            payload = body[i + len(b">>\nstream\n"):]
            payload = payload[: payload.rindex(b"\nendstream")]
            iv = hashlib.md5(b"iv" + file_id + str(num).encode()).digest()
            ct = handler.encrypt_stream(payload, num, 0, iv=iv)
            head = _re.sub(rb"/Length \d+", b"/Length " + str(len(ct)).encode(),
                           head, count=1)
            return head + b">>\nstream\n" + ct + b"\nendstream"

        objstm_num = None
        if objstm_nums:
            # build the object stream body
            parts = []
            offs = []
            pos = 0
            for num in objstm_nums:
                body = self.objects[num]
                offs.append((num, pos))
                parts.append(body)
                pos += len(body) + 1
            header = " ".join(f"{n} {o}" for n, o in offs).encode() + b" "
            payload = header + b" ".join(parts) + b" "
            first = len(header)
            data = zlib.compress(payload)
            objstm_num = self.next_num
            self.next_num += 1
            self.objects[objstm_num] = (
                b"<< /Type /ObjStm /N " + str(len(objstm_nums)).encode()
                + b" /First " + str(first).encode()
                + b" /Filter /FlateDecode /Length " + str(len(data)).encode()
                + b" >>\nstream\n" + data + b"\nendstream"
            )
            for i, num in enumerate(objstm_nums):
                in_objstm[num] = i

        emit_order = [n for n in sorted(self.objects) if n not in in_objstm]
        for num in emit_order:
            offsets[num] = len(out)
            body = self.objects[num]
            if handler is not None and num != enc_num:
                body = encrypt_body(num, body)
            out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"

        root = 1  # catalog is always object 1 by construction
        enc_trailer = b""
        if enc_num is not None:
            hexid = b"<" + file_id.hex().encode() + b">"
            enc_trailer = (b" /Encrypt " + str(enc_num).encode() + b" 0 R"
                           + b" /ID [" + hexid + hexid + b"]")
        if xref_style == "table":
            xref_off = len(out)
            size = self.next_num
            out += b"xref\n" + f"0 {size}\n".encode()
            out += b"0000000000 65535 f \n"
            for num in range(1, size):
                out += f"{offsets.get(num, 0):010d} 00000 n \n".encode()
            out += (
                b"trailer\n<< /Size " + str(size).encode()
                + b" /Root " + str(root).encode() + b" 0 R"
                + enc_trailer + b" >>\n"
            )
        elif xref_style == "hybrid":
            # hybrid-reference file (spec §7.5.8.4): a PDF-1.4-style
            # xref TABLE whose trailer points at an xref STREAM via
            # /XRefStm. ObjStm-compressed objects are marked FREE in
            # the table — only the stream's type-2 entries reach them,
            # so a reader ignoring /XRefStm loses the catalog.
            assert objstm_num is not None, "hybrid requires use_objstm"
            size = self.next_num + 1  # + the xref stream object
            xref_num = self.next_num
            rows = [(0, 0, 65535)]
            for num in range(1, size - 1):
                if num in in_objstm:
                    rows.append((2, objstm_num, in_objstm[num]))
                else:
                    rows.append((1, offsets.get(num, 0), 0))
            xrs_off = len(out)
            rows.append((1, xrs_off, 0))  # the xref stream itself
            raw = b"".join(
                bytes([t]) + f2.to_bytes(4, "big") + f3.to_bytes(2, "big")
                for t, f2, f3 in rows)
            data = zlib.compress(raw)
            out += f"{xref_num} 0 obj\n".encode()
            out += (b"<< /Type /XRef /Size " + str(size).encode()
                    + b" /W [1 4 2] /Root " + str(root).encode() + b" 0 R"
                    + enc_trailer
                    + b" /Filter /FlateDecode /Length "
                    + str(len(data)).encode()
                    + b" >>\nstream\n" + data + b"\nendstream\nendobj\n")
            xref_off = len(out)
            out += b"xref\n" + f"0 {size}\n".encode()
            out += b"0000000000 65535 f \n"
            for num in range(1, size):
                if num in in_objstm or num == xref_num:
                    out += b"0000000000 65535 f \n"
                else:
                    out += f"{offsets.get(num, 0):010d} 00000 n \n".encode()
            out += (
                b"trailer\n<< /Size " + str(size).encode()
                + b" /Root " + str(root).encode() + b" 0 R"
                + enc_trailer
                + b" /XRefStm " + str(xrs_off).encode() + b" >>\n"
            )
        else:  # xref stream (PDF 1.5+, spec §7.5.8)
            size = self.next_num + 1  # + the xref stream object itself
            xref_num = self.next_num
            rows = [(0, 0, 65535)]
            for num in range(1, size - 1):
                if num in in_objstm:
                    rows.append((2, objstm_num, in_objstm[num]))
                else:
                    rows.append((1, offsets.get(num, 0), 0))
            xref_off = len(out)
            rows.append((1, xref_off, 0))  # the xref stream itself
            raw = bytearray()
            use_pred = xref_style == "stream_pred"
            prev = bytes(7)
            for t, f2, f3 in rows:
                row = bytes([t]) + f2.to_bytes(4, "big") + f3.to_bytes(2, "big")
                if use_pred:  # PNG "up" predictor, filter type 2
                    enc = bytes([2]) + bytes(
                        (row[i] - prev[i]) & 0xFF for i in range(7))
                    raw += enc
                    prev = row
                else:
                    raw += row
            data = zlib.compress(bytes(raw))
            parms = (b" /DecodeParms << /Predictor 12 /Columns 7 >>"
                     if use_pred else b"")
            out += f"{xref_num} 0 obj\n".encode()
            out += (
                b"<< /Type /XRef /Size " + str(size).encode()
                + b" /W [1 4 2] /Root " + str(root).encode() + b" 0 R"
                + enc_trailer
                + b" /Filter /FlateDecode" + parms
                + b" /Length " + str(len(data)).encode()
                + b" >>\nstream\n" + data + b"\nendstream\nendobj\n"
            )
        out += b"startxref\n"
        out += str(xref_off + 999983 if broken else xref_off).encode()
        out += b"\n%%EOF\n"
        return bytes(out)


def _font_objects(b: "_PdfBuilder", variant: str) -> tuple[int, list[tuple[str, str]]]:
    """Build the /F1 font object for a variant. Returns (font_obj_num,
    [(raw_latin1_text, expected_decoded_text)] extra test lines)."""
    if variant == "differences":
        font = b.add(
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
            b"/Encoding << /Differences [ 128 /eacute /ntilde ] >> >>")
        return font, [("raw", "caf\x80 ma\x81ana", "caf\xe9 ma\xf1ana")], {}
    if variant == "winansi":
        font = b.add(
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
            b"/Encoding /WinAnsiEncoding >>")
        return font, [("raw", "\x93quoted\x94 dash \x97 here", "“quoted” dash — here")], {}
    if variant == "macroman":
        # MacRomanEncoding high range (spec Appendix D.2): 0x8E é,
        # 0xA5 bullet, 0xD0/0xD1 en/em dash
        font = b.add(
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
            b"/Encoding /MacRomanEncoding >>")
        return font, [("raw", "caf\x8e \xa5 \xd0\xd1 done",
                       "café • –— done")], {}
    if variant == "cid":
        # /F1 stays a simple font; /F2 is the composite Type0 font
        # (Identity-H, 2-byte codes via ToUnicode)
        cmap = (
            b"begincmap\n"
            b"1 beginbfrange\n<0020> <007e> <0020>\nendbfrange\n"
            b"2 beginbfchar\n<4e2d> <4e2d>\n<6587> <6587>\nendbfchar\n"
            b"endcmap\n"
        )
        tu = b.add_stream(b"", cmap, compress=True)
        cid_font = b.add(
            b"<< /Type /Font /Subtype /Type0 /BaseFont /FakeCID "
            b"/Encoding /Identity-H /ToUnicode " + str(tu).encode() + b" 0 R >>")
        font = b.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
        text = "Cid Text 中文"
        codes = b"".join(ord(c).to_bytes(2, "big") for c in text)
        return font, [("hex", codes, text)], {"F2": cid_font}
    if variant == "cid_cmap":
        # /F2 is a Type0 font whose /Encoding is an EMBEDDED CMap stream
        # (spec §9.7.5.3) with MIXED code lengths: 1-byte ASCII + 2-byte
        # CJK codes (GBK-EUC-like shape) — exercises variable-length
        # codespace segmentation, not just Identity-H
        enc_cmap = (
            b"%!PS-Adobe-3.0 Resource-CMap\n"
            b"begincmap\n"
            b"/CMapName /Fixture-GBK-like def\n"
            b"2 begincodespacerange\n<00> <7f>\n<8140> <fefe>\nendcodespacerange\n"
            b"1 begincidrange\n<20> <7e> 1\nendcidrange\n"
            b"2 begincidchar\n<8140> 100\n<8141> 101\n<8142> 102\nendcidchar\n"
            b"endcmap\n"
        )
        tu_cmap = (
            b"begincmap\n"
            b"2 begincodespacerange\n<00> <7f>\n<8140> <fefe>\nendcodespacerange\n"
            b"1 beginbfrange\n<20> <7e> <0020>\nendbfrange\n"
            b"3 beginbfchar\n<8140> <4e2d>\n<8141> <6587>\n<8142> <5b57>\n"
            b"endbfchar\nendcmap\n"
        )
        enc = b.add_stream(b"/Type /CMap ", enc_cmap, compress=True)
        tu = b.add_stream(b"", tu_cmap, compress=True)
        cid_font = b.add(
            b"<< /Type /Font /Subtype /Type0 /BaseFont /FakeGBK "
            b"/Encoding " + str(enc).encode() + b" 0 R "
            b"/ToUnicode " + str(tu).encode() + b" 0 R >>")
        font = b.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
        # "mix " in 1-byte codes, then CJK 中文字 in 2-byte codes, then "!"
        codes = b"mix " + b"\x81\x40\x81\x41\x81\x42" + b"!"
        return font, [("hex", codes, "mix 中文字!")], {"F2": cid_font}
    if variant == "ucs2_cmap":
        # /F2 names the PREDEFINED /UniJIS-UCS2-H CMap with NO
        # ToUnicode: codes are UCS-2 values by definition, so the
        # extractor's identity decode must recover the text exactly
        # (spec §9.7.5.2; pdf.js resolves these via its shipped
        # registry and lands on the same mapping)
        cid_font = b.add(
            b"<< /Type /Font /Subtype /Type0 /BaseFont /FakeUCS2 "
            b"/Encoding /UniJIS-UCS2-H >>")
        font = b.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
        text = "Ucs2 text 中文 here"
        codes = b"".join(ord(c).to_bytes(2, "big") for c in text)
        return font, [("hex", codes, text)], {"F2": cid_font}
    if variant == "vertical_cid":
        # /F2 is an Identity-V composite font (writing mode 1, spec
        # §9.7.4.1): two consecutive shows in one text object stack
        # DOWN the page by one em per glyph — reading order must put
        # the upper show first
        cmap = (
            b"begincmap\n"
            b"1 beginbfrange\n<0020> <007e> <0020>\nendbfrange\n"
            b"2 beginbfchar\n<7e05> <7e26>\n<7e06> <66f8>\nendbfchar\n"
            b"endcmap\n"
        )
        tu = b.add_stream(b"", cmap, compress=True)
        cid_font = b.add(
            b"<< /Type /Font /Subtype /Type0 /BaseFont /FakeV "
            b"/Encoding /Identity-V /ToUnicode " + str(tu).encode()
            + b" 0 R >>")
        font = b.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
        t1, t2 = "縦書 col", "second part"

        def _codes(t: str) -> bytes:
            rev = {"縦": 0x7E05, "書": 0x7E06}
            return b"".join(
                rev.get(c, ord(c)).to_bytes(2, "big") for c in t)
        return font, [("vhex", [(_codes(t1), t1), (_codes(t2), t2)],
                       None)], {"F2": cid_font}
    if variant == "rksj_cmap":
        # /F2 names the PREDEFINED /90ms-RKSJ-H CMap (Microsoft
        # Shift-JIS) with NO ToUnicode: codes are cp932 byte sequences,
        # decoded via the charset-backed predefined-CMap path — mixed
        # 1-byte ASCII, 1-byte halfwidth katakana and 2-byte kanji
        cid_font = b.add(
            b"<< /Type /Font /Subtype /Type0 /BaseFont /FakeRKSJ "
            b"/Encoding /90ms-RKSJ-H >>")
        font = b.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
        text = "Rksj 日本語 ｶﾀｶﾅ here"
        codes = text.encode("cp932")
        return font, [("hex", codes, text)], {"F2": cid_font}
    if variant == "rksj_msp_cmap":
        # /90msp-RKSJ-H print variant (proportional forms): same cp932
        # code assignments as 90ms — must decode byte-identically
        cid_font = b.add(
            b"<< /Type /Font /Subtype /Type0 /BaseFont /FakeRKSJp "
            b"/Encoding /90msp-RKSJ-H >>")
        font = b.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
        text = "Msp 変種 ﾌｫﾝﾄ text"
        codes = text.encode("cp932")
        return font, [("hex", codes, text)], {"F2": cid_font}
    if variant == "rksj_add_cmap":
        # /Add-RKSJ-H NEC print variant: JIS X 0208 + NEC Row-13
        # specials (①, ㈱, № — cp932 0x87xx), all inside cp932's
        # superset, so the charset-backed decode stays byte-exact
        cid_font = b.add(
            b"<< /Type /Font /Subtype /Type0 /BaseFont /FakeRKSJa "
            b"/Encoding /Add-RKSJ-H >>")
        font = b.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
        text = "Add ① ㈱ № 日本 ok"
        codes = text.encode("cp932")
        return font, [("hex", codes, text)], {"F2": cid_font}
    if variant == "type3":
        # /F2 is a Type3 glyph-procedure font (spec §9.6.5): no base
        # encoding exists — text comes ONLY from /Encoding/Differences
        # glyph names resolved by the AGL algorithm (including the
        # uniXXXX and uXXXX forms) — and /Widths are in GLYPH SPACE,
        # scaled to text space by /FontMatrix (here 0.01, width 50 →
        # 0.5 em; a /1000 assumption would misplace every glyph)
        text = "Type3 font works 中文 ok"
        _name_for = {" ": "space", "3": "three",
                     "中": "uni4E2D", "文": "u6587"}
        code_for: dict[str, int] = {}
        for ch in dict.fromkeys(text):
            code_for[ch] = ord(ch) if ord(ch) < 0x80 else 0x80 + len(
                [c for c in code_for.values() if c >= 0x80])
        glyph = b.add_stream(b"", b"50 0 d0\n", compress=False)
        names = {ch: _name_for.get(ch, ch) for ch in code_for}
        charprocs = b"<< " + b"".join(
            f"/{n} {glyph} 0 R ".encode() for n in sorted(set(names.values()))
        ) + b">>"
        diffs = b" ".join(
            f"{code} /{names[ch]}".encode()
            for ch, code in sorted(code_for.items(), key=lambda kv: kv[1]))
        first = min(code_for.values())
        last = max(code_for.values())
        widths = b" ".join(b"50" for _ in range(first, last + 1))
        t3 = b.add(
            b"<< /Type /Font /Subtype /Type3 /FontBBox [0 0 100 100] "
            b"/FontMatrix [0.01 0 0 0.01 0 0] "
            b"/CharProcs " + charprocs + b" "
            b"/Encoding << /Type /Encoding /Differences [ " + diffs + b" ] >> "
            + f"/FirstChar {first} /LastChar {last} ".encode()
            + b"/Widths [ " + widths + b" ] >>")
        font = b.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
        codes = bytes(code_for[ch] for ch in text)
        return font, [("hex", codes, text)], {"F2": t3}
    if variant == "tounicode":
        cmap = (
            b"/CIDInit /ProcSet findresource begin\n"
            b"begincmap\n"
            b"2 beginbfchar\n<a4> <2192>\n<a5> <00650301>\nendbfchar\n"
            b"1 beginbfrange\n<b0> <b2> <2460>\nendbfrange\n"
            b"endcmap\nend\n"
        )
        tu = b.add_stream(b"", cmap, compress=True)
        font = b.add(
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
            b"/ToUnicode " + str(tu).encode() + b" 0 R >>")
        return font, [("raw", "go \xa4 \xb0\xb1\xb2", "go → ①②③")], {}
    font = b.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    return font, [], {}


def make_pdf(rng: random.Random, n_pages: int = 1, *,
             xref_style: str = "table",      # "table" | "stream" | "stream_pred"
             use_objstm: bool = False,
             compress: bool = True,
             broken: bool = False,
             two_column: bool = False,
             with_sucursal: bool = False,
             lines_per_page: int | None = None,
             font_variant: str = "standard",
             with_form: bool = False,
             encrypt: str | None = None) -> tuple[bytes, str, int]:
    """Returns (pdf_bytes, expected_text, n_pages)."""
    b = _PdfBuilder()
    catalog = b.add(b"<< /Type /Catalog /Pages 2 0 R >>")
    assert catalog == 1
    pages_num = b.add(b"PLACEHOLDER")  # 2, patched below
    font, font_lines, extra_fonts = _font_objects(b, font_variant)

    page_nums: list[int] = []
    all_runs: list[list[Run]] = []
    for p in range(n_pages):
        pc = _PageCompose()
        style = rng.choice(["td", "tstar", "tm", "mixed"])
        npl = lines_per_page or rng.randrange(4, 12)
        if two_column and p == 0:
            left = _rand_lines(rng, max(3, npl // 2))
            right = _rand_lines(rng, max(3, npl // 2))
            # emit right column FIRST to prove order comes from layout,
            # not emission order
            pc.lines_tm(RIGHT_X, right)
            pc.lines_tm(LEFT_X, left)
        else:
            lines = _rand_lines(rng, npl)
            if with_sucursal and p == n_pages - 1:
                lines += make_sucursal_block_lines(
                    rng, terminated=rng.random() > 0.15,
                    mixed_case=rng.random() < 0.2)
            if style == "td":
                pc.lines_td(LEFT_X, lines)
            elif style == "tstar":
                pc.lines_tstar(LEFT_X, lines)
            elif style == "tm":
                pc.lines_tm(LEFT_X, lines)
            else:  # mixed: Td lines + a kerned TJ line + a quote line + escapes
                head, rest = lines[: max(1, len(lines) - 3)], lines[max(1, len(lines) - 3):]
                pc.lines_td(LEFT_X, head)
                y = PAGE_TOP - LEADING * len(head)
                if rest:
                    ln = rest[0]
                    third = max(1, len(ln) // 3)
                    pc.line_tj_kerned(LEFT_X, y, [ln[:third], ln[third: 2 * third], ln[2 * third:]])
                    y -= LEADING
                if len(rest) > 1:
                    pc.line_quote(LEFT_X, y - LEADING, rest[1])
                    y -= LEADING
                if len(rest) > 2:
                    # a literal string exercising \( \) \\ and octal \101
                    pc.ops.append(f"1 0 0 1 {LEFT_X:.1f} {y:.1f} Tm".encode())
                    raw = rest[2].encode("latin-1") + b" \\(paren\\) \\\\slash \\101"
                    pc.ops.append(b"(" + raw + b") Tj")
                    pc._show(LEFT_X, y, rest[2] + " (paren) \\slash A")
        if p == 0:
            # font-variant test lines (absolute Tm placement, appended
            # after the style block so Td-relative blocks start from the
            # identity text matrix)
            for k, (fkind, payload, expected) in enumerate(font_lines):
                if fkind == "hex":
                    pc.line_hex(LEFT_X, 770.0 - 14 * k, payload, expected)
                elif fkind == "vhex":
                    # vertical column, clear of the horizontal grid
                    pc.lines_hex_vertical(460.0, 690.0, payload)
                else:
                    pc.line_raw(LEFT_X, 770.0 - 14 * k, payload, expected)
        form_refs = b""
        if with_form and p == 0:
            # route three lines through a /Form XObject painted via Do
            # (spec §8.10) — placed LOW on the page so reading order is
            # deterministic; expected runs carry the Matrix translation
            pcf = _PageCompose()
            form_lines = _rand_lines(rng, 3)
            pcf.lines_tm(0.0, form_lines, y0=0.0)
            fx, fy = LEFT_X, 180.0
            fnum = b.add_stream(
                (b"/Type /XObject /Subtype /Form "
                 + f"/Matrix [1 0 0 1 {fx:.1f} {fy:.1f}] ".encode()
                 + b"/Resources << /Font << /F1 "
                 + str(font).encode() + b" 0 R >> >> "),
                pcf.content(), compress)
            pc.ops.append(b"ET")  # Do outside the text object
            pc.ops.append(f"q /FmA Do Q".encode())
            pc.ops.append(b"BT")  # content() appends the final ET
            pc.runs.extend(Run(r.x + fx, r.y + fy, r.text)
                           for r in pcf.runs)
            form_refs = b"/XObject << /FmA " + str(fnum).encode() + b" 0 R >> "
        all_runs.append(pc.runs)
        content = pc.content()
        if rng.random() < 0.25 and len(content) > 40:
            # /Contents array of two streams
            half = len(pc.ops) // 2
            c1 = b"\n".join(pc.ops[:half]) + b"\n"
            c2 = b"\n".join(pc.ops[half:] + [b"ET"]) + b"\n"
            s1 = b.add_stream(b"", c1, compress)
            s2 = b.add_stream(b"", c2, rng.random() < 0.5)
            contents_ref = b"[" + f"{s1} 0 R {s2} 0 R".encode() + b"]"
        else:
            s = b.add_stream(b"", content, compress if rng.random() < 0.8 else False)
            contents_ref = f"{s} 0 R".encode()
        fonts_dict = b"/F1 " + str(font).encode() + b" 0 R"
        for fname, fnum in extra_fonts.items():
            fonts_dict += f" /{fname} {fnum} 0 R".encode()
        pg = b.add(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << " + fonts_dict + b" >> " + form_refs
            + b">> /Contents " + contents_ref + b" >>"
        )
        page_nums.append(pg)

    kids = b"[" + b" ".join(f"{n} 0 R".encode() for n in page_nums) + b"]"
    b.objects[pages_num] = (
        b"<< /Type /Pages /Kids " + kids + b" /Count "
        + str(n_pages).encode() + b" >>"
    )

    if xref_style == "hybrid":
        use_objstm = True  # hybrid exists to hide ObjStm members
    objstm_nums = [catalog, pages_num, font] if use_objstm else None
    style = "table" if xref_style == "table" else xref_style
    if use_objstm and style == "table":
        style = "stream"  # ObjStm requires an xref stream
    data = b.serialize(style, objstm_nums, broken, encrypt=encrypt)
    return data, document_text(all_runs), n_pages


def make_incremental_pdf(rng: random.Random) -> tuple[bytes, str, int]:
    """An incrementally-updated PDF (spec §7.5.6): a base single-page
    document plus an appended update that REPLACES the page's content
    stream and extends the xref with a /Prev chain. A correct reader
    resolves the newest object (first xref section wins walking the
    chain) — golden text is the UPDATED content."""
    # the update mechanism replaces ONE content stream object, so keep
    # regenerating until the base page uses a single /Contents ref
    # (make_pdf sometimes emits a /Contents array) — deterministic given rng
    import re as _re

    for _ in range(20):
        base_pdf, _, _ = make_pdf(rng, n_pages=1, compress=False)
        m = _re.search(rb"/Contents (\d+) 0 R(?! \d)", base_pdf)
        if m and b"/Contents [" not in base_pdf:
            break
    assert m and b"/Contents [" not in base_pdf, "no single-ref base found"
    content_num = int(m.group(1))
    startxref_old = base_pdf.rfind(b"startxref")
    old_xref_off = int(base_pdf[startxref_old:].split()[1])

    pc = _PageCompose()
    new_lines = [_sentence(rng, _WORDS, rng.randrange(4, 8))[:-1] for _ in range(5)]
    pc.lines_tm(LEFT_X, new_lines)
    content = pc.content()

    update = bytearray()
    obj_off = len(base_pdf)
    update += (
        f"{content_num} 0 obj\n".encode()
        + b"<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
        + content + b"\nendstream\nendobj\n"
    )
    xref_off = len(base_pdf) + len(update)
    # size: reuse the base trailer's /Size
    msize = _re.search(rb"/Size (\d+)", base_pdf)
    size = int(msize.group(1)) if msize else content_num + 1
    update += b"xref\n" + f"{content_num} 1\n".encode()
    update += f"{obj_off:010d} 00000 n \n".encode()
    update += (
        b"trailer\n<< /Size " + str(size).encode()
        + b" /Root 1 0 R /Prev " + str(old_xref_off).encode() + b" >>\n"
        + b"startxref\n" + str(xref_off).encode() + b"\n%%EOF\n"
    )
    expected = document_text([pc.runs])
    return base_pdf + bytes(update), expected, 1
