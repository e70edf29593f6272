"""Minimal from-scratch PKCS#7 (CMS) EnvelopedData + RSA for the PDF
public-key (certificate) security handler, spec §7.6.4.

The reference inherits this path from pdf.js's crypto
(/root/reference/src/main.ts:149, package.json:8-9); here it is built
from the published structures only:

- DER TLV reader/writer (X.690): definite lengths, the five universal
  types the envelope needs (SEQUENCE/SET/OID/INTEGER/OCTET STRING)
  plus context tags.
- ContentInfo(envelopedData) → EnvelopedData { version,
  recipientInfos SET OF KeyTransRecipientInfo, encryptedContentInfo }
  (RFC 2315 §10 / RFC 5652 §6).
- RSA key-transport: PKCS#1 v1.5 (RFC 8017 §7.2) — schoolbook modpow;
  keys here are fixture-scale, the parser/unpadding logic is what the
  conformance matrix exercises.
- Content encryption: aes128-CBC (OID 2.16.840.1.101.3.4.1.2) with
  the IV in the AlgorithmIdentifier parameters, reusing this repo's
  from-scratch AES (pdf_crypto.aes_cbc_*).

The decrypted content for the PDF handler is 20-byte seed + 4-byte
permissions; the file key is SHA-1(seed ‖ every /Recipients blob
[‖ FFFFFFFF if !EncryptMetadata])[:keylen] (spec §7.6.4 Algorithm 3).
"""

from __future__ import annotations

import hashlib

OID_ENVELOPED = "1.2.840.113549.1.7.3"
OID_DATA = "1.2.840.113549.1.7.1"
OID_RSA = "1.2.840.113549.1.1.1"
OID_AES128_CBC = "2.16.840.1.101.3.4.1.2"


# ── DER reader ────────────────────────────────────────────────────────

def der_tlv(b: bytes, pos: int = 0) -> tuple[int, bytes, int]:
    """One TLV at ``pos`` → (tag, content, end). Definite lengths only
    (DER forbids indefinite)."""
    if pos + 2 > len(b):
        raise ValueError("DER: truncated TLV header")
    tag = b[pos]
    pos += 1
    length = b[pos]
    pos += 1
    if length & 0x80:
        nb = length & 0x7F
        if nb == 0 or pos + nb > len(b):
            raise ValueError("DER: bad long-form length")
        length = int.from_bytes(b[pos:pos + nb], "big")
        pos += nb
    if pos + length > len(b):
        raise ValueError("DER: content overruns buffer")
    return tag, b[pos:pos + length], pos + length


def der_children(content: bytes) -> list[tuple[int, bytes]]:
    """All TLVs directly inside a constructed value."""
    out = []
    pos = 0
    while pos < len(content):
        tag, val, pos = der_tlv(content, pos)
        out.append((tag, val))
    return out


def der_oid_decode(content: bytes) -> str:
    if not content:
        raise ValueError("DER: empty OID")
    first = content[0]
    parts = [first // 40, first % 40]
    v = 0
    for byte in content[1:]:
        v = (v << 7) | (byte & 0x7F)
        if not byte & 0x80:
            parts.append(v)
            v = 0
    return ".".join(str(p) for p in parts)


# ── DER writer (fixture side) ─────────────────────────────────────────

def _der_len(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    body = n.to_bytes((n.bit_length() + 7) // 8, "big")
    return bytes([0x80 | len(body)]) + body


def der(tag: int, content: bytes) -> bytes:
    return bytes([tag]) + _der_len(len(content)) + content


def der_seq(*parts: bytes) -> bytes:
    return der(0x30, b"".join(parts))


def der_set(*parts: bytes) -> bytes:
    return der(0x31, b"".join(parts))


def der_int(v: int) -> bytes:
    body = v.to_bytes(max(1, (v.bit_length() + 8) // 8), "big")
    return der(0x02, body)


def der_octets(b: bytes) -> bytes:
    return der(0x04, b)


def der_oid(s: str) -> bytes:
    parts = [int(p) for p in s.split(".")]
    body = bytearray([parts[0] * 40 + parts[1]])
    for v in parts[2:]:
        chunk = bytearray([v & 0x7F])
        v >>= 7
        while v:
            chunk.append(0x80 | (v & 0x7F))
            v >>= 7
        body += bytes(reversed(chunk))
    return der(0x06, bytes(body))


DER_NULL = bytes([0x05, 0x00])


# ── RSA / PKCS#1 v1.5 ────────────────────────────────────────────────

def rsa_pkcs1_decrypt(n: int, d: int, ciphertext: bytes) -> bytes:
    """RSAES-PKCS1-v1_5 decrypt (RFC 8017 §7.2.2). Raises ValueError
    on any padding defect — the 'not my recipient blob' signal."""
    k = (n.bit_length() + 7) // 8
    if len(ciphertext) != k:
        raise ValueError("RSA: ciphertext length != modulus length")
    c = int.from_bytes(ciphertext, "big")
    if c >= n:
        raise ValueError("RSA: ciphertext out of range")
    m = pow(c, d, n).to_bytes(k, "big")
    if m[0] != 0x00 or m[1] != 0x02:
        raise ValueError("RSA: bad PKCS#1 v1.5 header")
    sep = m.find(b"\x00", 2)
    if sep < 10:  # ≥ 8 nonzero PS bytes required
        raise ValueError("RSA: bad PKCS#1 v1.5 padding")
    return m[sep + 1:]


def rsa_pkcs1_encrypt(n: int, e: int, msg: bytes, *,
                      seed: bytes = b"") -> bytes:
    """Fixture-side RSAES-PKCS1-v1_5 encrypt with DETERMINISTIC
    nonzero padding derived from ``seed`` (fixtures must be
    byte-reproducible; real encryptors use random PS)."""
    k = (n.bit_length() + 7) // 8
    ps_len = k - 3 - len(msg)
    if ps_len < 8:
        raise ValueError("RSA: message too long for modulus")
    ps = bytearray()
    ctr = 0
    while len(ps) < ps_len:
        blk = hashlib.sha256(seed + ctr.to_bytes(4, "big")).digest()
        ps += bytes(x if x else 0x5A for x in blk)
        ctr += 1
    em = b"\x00\x02" + bytes(ps[:ps_len]) + b"\x00" + msg
    return pow(int.from_bytes(em, "big"), e, n).to_bytes(k, "big")


# ── EnvelopedData ─────────────────────────────────────────────────────

class EnvelopedData:
    """Parsed PKCS#7 envelope: recipient encrypted keys + the
    AES-CBC-encrypted content."""

    def __init__(self, encrypted_keys: list[bytes], enc_alg: str,
                 iv: bytes, ciphertext: bytes):
        self.encrypted_keys = encrypted_keys
        self.enc_alg = enc_alg
        self.iv = iv
        self.ciphertext = ciphertext

    def decrypt_content(self, rsa_keys: list[tuple[int, int]]) -> bytes:
        """Try every (n, d) key against every recipient; first PKCS#1
        unpad that succeeds yields the CEK."""
        from . import pdf_crypto

        if self.enc_alg != OID_AES128_CBC:
            raise ValueError(f"unsupported content cipher {self.enc_alg}")
        for ek in self.encrypted_keys:
            for n, d in rsa_keys:
                try:
                    cek = rsa_pkcs1_decrypt(n, d, ek)
                except ValueError:
                    continue
                if len(cek) != 16:
                    continue
                return pdf_crypto.aes_cbc_decrypt(cek,
                                                  self.iv + self.ciphertext)
        raise ValueError("no recipient key matched")


def parse_enveloped(blob: bytes) -> EnvelopedData:
    tag, ci, _ = der_tlv(blob)
    if tag != 0x30:
        raise ValueError("PKCS#7: ContentInfo is not a SEQUENCE")
    kids = der_children(ci)
    if len(kids) != 2 or kids[0][0] != 0x06 \
            or der_oid_decode(kids[0][1]) != OID_ENVELOPED:
        raise ValueError("PKCS#7: not envelopedData")
    if kids[1][0] != 0xA0:
        raise ValueError("PKCS#7: missing [0] EXPLICIT content")
    etag, env, _ = der_tlv(kids[1][1])
    if etag != 0x30:
        raise ValueError("PKCS#7: EnvelopedData is not a SEQUENCE")
    ekids = der_children(env)
    # EnvelopedData ::= SEQUENCE { version, originatorInfo [0] IMPLICIT
    # OPTIONAL, recipientInfos SET, encryptedContentInfo, ... } (RFC 5652
    # §6.1) — skip the optional context-tagged originatorInfo if present.
    ri = 1
    if len(ekids) > ri and ekids[ri][0] == 0xA0:
        ri += 1
    if len(ekids) < ri + 2 or ekids[ri][0] != 0x31:
        raise ValueError("PKCS#7: malformed EnvelopedData")
    enc_keys = []
    for rtag, r in der_children(ekids[ri][1]):
        if rtag != 0x30:
            raise ValueError("PKCS#7: RecipientInfo is not a SEQUENCE")
        rk = der_children(r)
        # { version, issuerAndSerialNumber, keyEncAlg, encryptedKey }
        if len(rk) != 4 or rk[3][0] != 0x04:
            raise ValueError("PKCS#7: malformed KeyTransRecipientInfo")
        alg = der_children(rk[2][1])
        if not alg or der_oid_decode(alg[0][1]) != OID_RSA:
            raise ValueError("PKCS#7: key transport is not rsaEncryption")
        enc_keys.append(rk[3][1])
    ctag, eci = ekids[ri + 1]
    if ctag != 0x30:
        raise ValueError("PKCS#7: malformed EncryptedContentInfo")
    ek = der_children(eci)
    if len(ek) != 3 or der_oid_decode(ek[0][1]) != OID_DATA:
        raise ValueError("PKCS#7: content is not pkcs7-data")
    alg = der_children(ek[1][1])
    if len(alg) != 2 or alg[1][0] != 0x04:
        raise ValueError("PKCS#7: content cipher has no IV")
    if ek[2][0] not in (0x80, 0xA0):
        raise ValueError("PKCS#7: missing encryptedContent")
    ct = ek[2][1]
    if ek[2][0] == 0xA0:  # BER variant: [0] constructed wrapping OCTETs
        ct = b"".join(v for _, v in der_children(ct))
    return EnvelopedData(enc_keys, der_oid_decode(alg[0][1]),
                         alg[1][1], ct)


def build_enveloped(content: bytes, recipients: list[tuple[int, int]], *,
                    iv: bytes, cek: bytes, seed: bytes = b"",
                    originator_info: bytes | None = None) -> bytes:
    """Fixture-side envelope: ``recipients`` are (n, e) public keys;
    the CEK and IV are caller-supplied so fixtures are deterministic.
    ``originator_info`` (raw inner DER, may be empty) exercises the
    optional [0] IMPLICIT OriginatorInfo field (RFC 5652 §6.1)."""
    from . import pdf_crypto

    rinfos = []
    for i, (n, e) in enumerate(recipients):
        ek = rsa_pkcs1_encrypt(n, e, cek,
                               seed=seed + i.to_bytes(2, "big"))
        rinfos.append(der_seq(
            der_int(0),
            der_seq(der_seq(), der_int(i + 1)),   # empty issuer + serial
            der_seq(der_oid(OID_RSA), DER_NULL),
            der_octets(ek)))
    ct = pdf_crypto.aes_cbc_encrypt(cek, iv, content)[16:]  # strip IV
    eci = der_seq(
        der_oid(OID_DATA),
        der_seq(der_oid(OID_AES128_CBC), der_octets(iv)),
        der(0x80, ct))
    if originator_info is not None:
        env = der_seq(der_int(0), der(0xA0, originator_info),
                      der_set(*rinfos), eci)
    else:
        env = der_seq(der_int(0), der_set(*rinfos), eci)
    return der_seq(der_oid(OID_ENVELOPED), der(0xA0, env))


def pubsec_file_key(seed: bytes, recipients: list[bytes], nbytes: int, *,
                    encrypt_metadata: bool = True) -> bytes:
    """Spec §7.6.4: SHA-1 over seed ‖ every Recipients blob
    [‖ FFFFFFFF when metadata is left in clear], truncated to the
    crypt filter's key length."""
    h = hashlib.sha1()
    h.update(seed)
    for r in recipients:
        h.update(r)
    if not encrypt_metadata:
        h.update(b"\xff\xff\xff\xff")
    return h.digest()[:nbytes]
