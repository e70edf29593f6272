"""Public-key (certificate) PDF security handler — spec §7.6.4.

From-scratch PKCS#7 EnvelopedData + RSA key transport
(stages/pkcs7.py): DER roundtrips, PKCS#1 v1.5 padding defects,
recipient matching, and e2e byte-identity of a pubsec-encrypted
fixture once the recipient private key is registered. The reference
inherits this path via pdf.js (/root/reference/src/main.ts:149)."""
import random

import pytest

from pdf_to_text_ray.fixtures.pdfgen import (
    FIXTURE_RSA_D,
    FIXTURE_RSA_E,
    FIXTURE_RSA_N,
    make_pdf,
)
from pdf_to_text_ray.stages import pdf_crypto, pkcs7
from pdf_to_text_ray.stages.pdf_extract import (
    PdfPubSecError,
    extract_pdf_text,
)

# independent second keypair (deterministic, generated offline)
OTHER_N = int(
    "8e2aa7b5e966fac999e5967b7a91dc3a6c9f2ed6b59a5c936c9cbcd9abb664ff"
    "a5168669073b3ea059267e7a233264f23205f35ed8543d2c437626c8bc715759",
    16)
OTHER_D = int(
    "1a88cb94a063a01b50a611582aa05ec268d3ad2255f2e1a482791ea661ee411b"
    "4e48c2cb882ab083b23cb3baca03dc4a8365e0ba00e19a7169b775e38e838c21",
    16)
OTHER_E = 65537


@pytest.fixture
def fixture_key():
    pdf_crypto.RECIPIENT_KEYS.append((FIXTURE_RSA_N, FIXTURE_RSA_D))
    yield
    pdf_crypto.RECIPIENT_KEYS.clear()


# ── RSA / DER units ──────────────────────────────────────────────────

def test_rsa_pkcs1_roundtrip_and_padding_defects():
    msg = b"\x01\x02sixteen-byte-key"[:16]
    ct = pkcs7.rsa_pkcs1_encrypt(FIXTURE_RSA_N, FIXTURE_RSA_E, msg,
                                 seed=b"t1")
    assert pkcs7.rsa_pkcs1_decrypt(FIXTURE_RSA_N, FIXTURE_RSA_D,
                                   ct) == msg
    # wrong private key → padding defect, never silent garbage
    with pytest.raises(ValueError):
        pkcs7.rsa_pkcs1_decrypt(OTHER_N, OTHER_D, ct.rjust(
            (OTHER_N.bit_length() + 7) // 8, b"\x00"))
    # tampered ciphertext
    bad = bytes([ct[0] ^ 1]) + ct[1:]
    with pytest.raises(ValueError):
        pkcs7.rsa_pkcs1_decrypt(FIXTURE_RSA_N, FIXTURE_RSA_D, bad)


def test_der_oid_roundtrip():
    for oid in (pkcs7.OID_ENVELOPED, pkcs7.OID_DATA, pkcs7.OID_RSA,
                pkcs7.OID_AES128_CBC):
        tag, content, _ = pkcs7.der_tlv(pkcs7.der_oid(oid))
        assert tag == 0x06 and pkcs7.der_oid_decode(content) == oid


def test_enveloped_roundtrip_single_and_multi_recipient():
    content = bytes(range(24))
    cek = bytes(range(16, 32))
    iv = bytes(range(32, 48))
    # our key is the SECOND recipient: matching must skip the first
    blob = pkcs7.build_enveloped(
        content, [(OTHER_N, OTHER_E), (FIXTURE_RSA_N, FIXTURE_RSA_E)],
        iv=iv, cek=cek, seed=b"t2")
    env = pkcs7.parse_enveloped(blob)
    assert len(env.encrypted_keys) == 2
    assert env.enc_alg == pkcs7.OID_AES128_CBC
    assert env.decrypt_content(
        [(FIXTURE_RSA_N, FIXTURE_RSA_D)]) == content
    assert env.decrypt_content([(OTHER_N, OTHER_D)]) == content
    with pytest.raises(ValueError):
        env.decrypt_content([(FIXTURE_RSA_N, OTHER_D)])  # mismatched


def test_enveloped_deterministic():
    a = pkcs7.build_enveloped(b"x" * 24,
                              [(FIXTURE_RSA_N, FIXTURE_RSA_E)],
                              iv=bytes(16), cek=bytes(range(16)),
                              seed=b"s")
    b = pkcs7.build_enveloped(b"x" * 24,
                              [(FIXTURE_RSA_N, FIXTURE_RSA_E)],
                              iv=bytes(16), cek=bytes(range(16)),
                              seed=b"s")
    assert a == b


# ── e2e through the extractor ────────────────────────────────────────

def test_pubsec_real_decrypts_byte_identical(fixture_key):
    pdf, want, _ = make_pdf(random.Random(41), n_pages=2,
                            encrypt="pubsec-real")
    assert extract_pdf_text(pdf).text == want


def test_pubsec_real_with_objstm_and_xref_stream(fixture_key):
    pdf, want, _ = make_pdf(random.Random(42), n_pages=1,
                            xref_style="stream", use_objstm=True,
                            encrypt="pubsec-real")
    assert extract_pdf_text(pdf).text == want


def test_pubsec_real_without_key_quarantines():
    pdf, _, _ = make_pdf(random.Random(43), n_pages=1,
                         encrypt="pubsec-real")
    with pytest.raises(PdfPubSecError):
        extract_pdf_text(pdf)


def test_pubsec_real_with_wrong_key_quarantines():
    pdf, _, _ = make_pdf(random.Random(44), n_pages=1,
                         encrypt="pubsec-real")
    pdf_crypto.RECIPIENT_KEYS.append((OTHER_N, OTHER_D))
    try:
        with pytest.raises(PdfPubSecError):
            extract_pdf_text(pdf)
    finally:
        pdf_crypto.RECIPIENT_KEYS.clear()


def test_legacy_pubsec_fixture_still_quarantines(fixture_key):
    # the opaque-recipients fixture carries a garbage envelope: with a
    # key registered the parse fails → still a TYPED pubsec error
    pdf, _, _ = make_pdf(random.Random(45), n_pages=1, encrypt="pubsec")
    with pytest.raises(PdfPubSecError):
        extract_pdf_text(pdf)


def test_pubsec_top_level_recipients_and_plain_metadata():
    """spec §7.6.4 both placements: /Recipients at the TOP level
    (adbe.pkcs7.s4 style) and EncryptMetadata false (the FFFFFFFF
    key-derivation suffix)."""
    import hashlib

    seed = hashlib.sha1(b"t3-seed").digest()
    cek = hashlib.md5(b"t3-cek").digest()
    iv = hashlib.md5(b"t3-iv").digest()
    blob = pkcs7.build_enveloped(seed + b"\x00\x00\x00\x00",
                                 [(FIXTURE_RSA_N, FIXTURE_RSA_E)],
                                 iv=iv, cek=cek, seed=b"t3")
    enc = {"Filter": "Adobe.PubSec", "SubFilter": "adbe.pkcs7.s4",
           "V": 4, "Length": 128,
           "Recipients": [blob],
           "CF": {"DefaultCryptFilter": {"CFM": "AESV2", "Length": 16,
                                         "EncryptMetadata": False}},
           "StmF": "DefaultCryptFilter", "StrF": "DefaultCryptFilter"}
    h = pdf_crypto.StandardSecurityHandler(
        enc, b"fid", recipient_keys=[(FIXTURE_RSA_N, FIXTURE_RSA_D)])
    assert h.key == pkcs7.pubsec_file_key(seed, [blob], 16,
                                          encrypt_metadata=False)
    assert h.key != pkcs7.pubsec_file_key(seed, [blob], 16)
    # the handler round-trips its own per-object encryption
    ct = h.encrypt_stream(b"secret stream payload", 7, 0, iv=bytes(16))
    assert h.decrypt_stream(ct, 7, 0) == b"secret stream payload"
    # and a V2 (RC4) crypt filter works through the same derivation
    enc_rc4 = dict(enc, CF={"DefaultCryptFilter": {
        "CFM": "V2", "Length": 16}})
    h2 = pdf_crypto.StandardSecurityHandler(
        enc_rc4, b"fid", recipient_keys=[(FIXTURE_RSA_N, FIXTURE_RSA_D)])
    ct2 = h2.encrypt_stream(b"rc4 payload", 3, 0)
    assert h2.decrypt_stream(ct2, 3, 0) == b"rc4 payload"
