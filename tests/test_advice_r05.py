"""Round-5 ADVICE regressions: CMS originatorInfo tolerance, V=1
pubsec /Length default, memoryview-native HTTP envelope helpers, and
the NaN / missing-half guards in the drift queries."""
import gzip

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from pdf_to_text_ray.fixtures.pdfgen import (
    FIXTURE_RSA_D,
    FIXTURE_RSA_E,
    FIXTURE_RSA_N,
)
from pdf_to_text_ray.stages import pdf_crypto, pkcs7
from pdf_to_text_ray.stages.sniff import (
    _bfind,
    http_charset,
    strip_http_envelope,
)

HTML = (b"<!doctype html><html><body><p>envelope body text payload "
        b"long enough to matter</p></body></html>")


# ── PKCS#7: optional [0] originatorInfo (RFC 5652 section 6.1) ──────

def _envelope(originator_info=None) -> bytes:
    return pkcs7.build_enveloped(
        bytes(range(24)), [(FIXTURE_RSA_N, FIXTURE_RSA_E)],
        iv=bytes(range(16)), cek=bytes(range(16, 32)), seed=b"oi",
        originator_info=originator_info)


def test_enveloped_with_originator_info_parses_and_decrypts():
    # empty OriginatorInfo ::= SEQUENCE {} and a non-empty stand-in
    for oi in (b"", pkcs7.der_seq()):
        env = pkcs7.parse_enveloped(_envelope(originator_info=oi))
        assert env.decrypt_content(
            [(FIXTURE_RSA_N, FIXTURE_RSA_D)]) == bytes(range(24))


def test_enveloped_without_originator_info_unchanged():
    env = pkcs7.parse_enveloped(_envelope())
    assert env.decrypt_content(
        [(FIXTURE_RSA_N, FIXTURE_RSA_D)]) == bytes(range(24))


# ── pubsec /Length default: 40 bits when V < 2 ──────────────────────

def _pubsec_enc(v: int, **extra) -> dict:
    import hashlib

    seed = b"s" * 20
    blob = pkcs7.build_enveloped(
        seed + b"\x00\x00\x00\x00", [(FIXTURE_RSA_N, FIXTURE_RSA_E)],
        iv=bytes(16), cek=bytes(range(16)), seed=b"vk")
    enc = {"Filter": "Adobe.PubSec", "SubFilter": "adbe.pkcs7.s3",
           "V": v, "Recipients": [blob]}
    enc.update(extra)
    return enc


def test_pubsec_v1_defaults_to_40_bit_key():
    h = pdf_crypto.StandardSecurityHandler(
        _pubsec_enc(1), b"id", [(FIXTURE_RSA_N, FIXTURE_RSA_D)])
    assert h.length == 40
    assert len(h.key) == 5  # RC4-40 file key, not 16 bytes


def test_pubsec_v2_still_defaults_to_128_bit_key():
    h = pdf_crypto.StandardSecurityHandler(
        _pubsec_enc(2), b"id", [(FIXTURE_RSA_N, FIXTURE_RSA_D)])
    assert h.length == 128
    assert len(h.key) == 16


def test_pubsec_explicit_length_wins_either_way():
    h = pdf_crypto.StandardSecurityHandler(
        _pubsec_enc(1, Length=128), b"id",
        [(FIXTURE_RSA_N, FIXTURE_RSA_D)])
    assert len(h.key) == 16


# ── memoryview-native envelope helpers (hot-path de-memcpy) ─────────

def _frame(body: bytes, headers: bytes = b"Content-Type: text/html"
           ) -> bytes:
    return b"HTTP/1.1 200 OK\r\n" + headers + b"\r\n\r\n" + body


def test_bfind_matches_bytes_find_across_window_boundaries():
    data = b"x" * 8190 + b"\r\n\r\n" + b"y" * 100
    for buf in (data, memoryview(data)):
        assert _bfind(buf, b"\r\n\r\n") == data.find(b"\r\n\r\n")
        assert _bfind(buf, b"zz") == -1
        assert _bfind(buf, b"y", 8194) == data.find(b"y", 8194)


def test_strip_http_envelope_memoryview_zero_copy_body():
    framed = _frame(HTML)
    body = strip_http_envelope(memoryview(framed))
    assert bytes(body) == HTML
    # the plain (unchunked, uncompressed) body must be a zero-copy
    # view of the input, not a fresh bytes object
    assert isinstance(body, memoryview)
    assert body.obj is framed


def test_strip_http_envelope_memoryview_chunked_and_gzip():
    chunked = (b"5\r\nhello\r\n6\r\n world\r\n0\r\n\r\n")
    framed = _frame(chunked, b"Transfer-Encoding: chunked")
    assert bytes(strip_http_envelope(memoryview(framed))) == b"hello world"
    gz = _frame(gzip.compress(HTML), b"Content-Encoding: gzip")
    assert bytes(strip_http_envelope(memoryview(gz))) == HTML


def test_http_charset_memoryview():
    framed = _frame(HTML, b"Content-Type: text/html; charset=shift_jis")
    assert http_charset(memoryview(framed)) == "shift_jis"
    assert http_charset(memoryview(_frame(HTML))) is None


def test_strip_http_envelope_bytes_unchanged():
    assert strip_http_envelope(_frame(HTML)) == HTML
    assert strip_http_envelope(b"HTTP/1.0 200\nA: b\n\n" + HTML) == HTML
    assert strip_http_envelope(b"HTTP/1.1 200 OK\r\nno-blank-line") == b""


# ── query guards: cusum NULL values, centroid drift missing half ────

def _write_events(tmp_path, values):
    t = pa.table({
        "event_id": pa.array(range(len(values)), pa.int64()),
        "user_id": pa.array([1] * len(values), pa.int64()),
        "event_type": pa.array(["a"] * len(values)),
        "ts": pa.array(
            pd.date_range("2024-01-01", periods=len(values), freq="min")),
        "value": pa.array(values, pa.float64()),
    })
    import pyarrow.parquet as pq

    pq.write_table(t, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_event_value_cusum_skips_null_values(ray_session, tmp_path):
    import duckdb

    from pdf_to_text_ray.pipelines.queries import (
        CUSUM_SQL,
        event_value_cusum,
    )

    vals = [1.0, None, 2.0, None, 3.0, 1.5, 2.5, 0.5, 1.0, 2.0]
    sf = _write_events(tmp_path, vals)
    got = event_value_cusum(sf)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")
    want = con.execute(CUSUM_SQL).fetch_df()
    got = got.reset_index(drop=True)
    want = want.reset_index(drop=True)
    assert list(got["n"]) == list(want["n"])  # NULLs not counted
    assert np.allclose(got["max_cusum"], want["max_cusum"])


def test_label_centroid_drift_label_with_one_half_only(
        ray_session, tmp_path):
    import pyarrow.parquet as pq

    from pdf_to_text_ray.pipelines.queries import label_centroid_drift

    # label 7 has ONLY odd vec_ids → pivot lacks column 0 entirely
    # when no label has an even-half vector
    t = pa.table({
        "vec_id": pa.array([1, 3, 5], pa.int64()),
        "embedding": pa.array([[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]],
                              pa.list_(pa.float64())),
        "label": pa.array([7, 7, 7], pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    out = label_centroid_drift(str(tmp_path))
    assert len(out) == 0  # empty, not KeyError
