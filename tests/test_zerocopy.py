"""Zero-copy Arrow binary views (stages/zerocopy.py): value parity with
to_pylist, null/slice/chunk handling, and the signed-format gotcha."""

import pyarrow as pa

from pdf_to_text_ray.stages.zerocopy import binary_views


def _as_bytes(views):
    return [None if v is None else bytes(v) for v in views]


def test_views_match_to_pylist():
    arr = pa.array([b"abc", None, b"", b"\xff\xfe\x00hi", b"x" * 1000],
                   pa.binary())
    assert _as_bytes(binary_views(arr)) == arr.to_pylist()


def test_views_handle_slices_and_chunks():
    arr = pa.array([b"a", b"bb", None, b"dddd"], pa.binary())
    sl = arr.slice(1, 3)
    assert _as_bytes(binary_views(sl)) == sl.to_pylist()
    ch = pa.chunked_array([arr, arr.slice(2)])
    assert _as_bytes(binary_views(ch)) == ch.to_pylist()


def test_views_large_binary_and_string():
    lb = pa.array([b"qq", None, b"\x80\x81"], pa.large_binary())
    assert _as_bytes(binary_views(lb)) == lb.to_pylist()
    s = pa.array(["héllo", None], pa.string())
    got = binary_views(s)
    assert bytes(got[0]) == "héllo".encode() and got[1] is None


def test_views_compare_unsigned():
    """Arrow buffers are format 'b' (signed); raw memoryview equality
    against bytes literals fails for any byte > 0x7f — the cast('B')
    keeps view == b"..." semantics (a UTF-16 BOM probe regressed on
    this: high bytes compared as negative ints and every BOM'd page
    fell through to the cp1252 fallback)."""
    arr = pa.array([b"\xff\xfe\x00a"], pa.binary())
    v = binary_views(arr)[0]
    assert v[:2] == b"\xff\xfe"
    # bytes-like consumers the hot path relies on
    import re

    assert re.search(rb"\x00a", v)
    assert str(v[2:], "utf-8", "strict") == "\x00a"
