"""MP4 / ISO BMFF (ISO/IEC 14496-12) muxer + demuxer, from the spec.

Container handling is REAL: full box walk (32/64-bit sizes, nested
containers), ``mvhd``/``tkhd``/``mdhd`` v0+v1, handler dispatch, and
the complete sample-table machinery (``stsd``/``stts``/``stsc``/
``stsz``/``stco``/``co64``) resolving every sample to its exact byte
range in ``mdat``. Video frames are Motion-JPEG sample entries
(fourcc ``jpeg``, the QuickTime/ISO MJPEG-in-MP4 layout), decoded by
the repo's own baseline JPEG codec (stages/jpeg_codec) — so the whole
video path runs without external libraries. Compressed codecs that
genuinely need external decoders (``avc1``/H.264 …) surface as
``UnsupportedSampleFormat`` so callers can fall back or inject a
decoder.

Reference behavioral parity: the reference repo has no video path at
all (pierotech/pdf-to-text main.ts handles PDFs only); this module is
part of the multimodal tier SURVEY.md adds for training-data
pipelines.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np


class Mp4Error(ValueError):
    """Malformed ISO BMFF structure."""


class UnsupportedSampleFormat(Mp4Error):
    """Sample entry needs an external codec (e.g. avc1/H.264)."""


# ── box writer ────────────────────────────────────────────────────────

def _box(kind: bytes, payload: bytes) -> bytes:
    return struct.pack(">I4s", 8 + len(payload), kind) + payload


def _full(kind: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(kind, struct.pack(">B3s", version,
                                  flags.to_bytes(3, "big")) + payload)


_MATRIX = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)


def encode_mp4_mjpeg(frames: list[bytes], *, width: int, height: int,
                     fps: int = 10, timescale: int = 1000) -> bytes:
    """Mux pre-encoded JPEG frames into a minimal valid MP4 (one video
    track, one chunk, constant frame duration)."""
    if not frames:
        raise Mp4Error("need at least one frame")
    ftyp = _box(b"ftyp", b"mp42" + struct.pack(">I", 0) + b"mp42isom")
    sample_dur = timescale // fps
    duration = sample_dur * len(frames)

    # stbl ---------------------------------------------------------------
    entry = _box(b"jpeg", (
        b"\x00" * 6 + struct.pack(">H", 1)            # reserved + data_ref
        + struct.pack(">HHII", 0, 0, 0, 0)            # predefined/reserved
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + struct.pack(">IH", 0, 1)                    # reserved, frame count
        + b"\x05mjpeg" + b"\x00" * 26                 # compressor name (32B)
        + struct.pack(">Hh", 24, -1)))                # depth, color table
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
    stts = _full(b"stts", 0, 0,
                 struct.pack(">III", 1, len(frames), sample_dur))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, len(frames), 1))
    stsz = _full(b"stsz", 0, 0,
                 struct.pack(">II", 0, len(frames))
                 + b"".join(struct.pack(">I", len(f)) for f in frames))
    # chunk offset is file-absolute; mdat payload starts at
    # len(ftyp) + len(moov) + 8 — compute moov with a placeholder, then
    # rewrite stco (moov size does not depend on the offset value).
    def build_moov(chunk_off: int) -> bytes:
        stco = _full(b"stco", 0, 0, struct.pack(">II", 1, chunk_off))
        stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
        vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
        dref = _full(b"dref", 0, 0,
                     struct.pack(">I", 1) + _full(b"url ", 0, 1, b""))
        dinf = _box(b"dinf", dref)
        minf = _box(b"minf", vmhd + dinf + stbl)
        mdhd = _full(b"mdhd", 0, 0, struct.pack(
            ">IIIIHH", 0, 0, timescale, duration, 0x55C4, 0))  # lang "und"
        hdlr = _full(b"hdlr", 0, 0,
                     struct.pack(">I4s", 0, b"vide") + b"\x00" * 12
                     + b"mjpeg\x00")
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        tkhd = _full(b"tkhd", 0, 7, struct.pack(
            ">IIIIII", 0, 0, 1, 0, duration, 0) + struct.pack(
            ">IHHHH", 0, 0, 0, 0, 0) + _MATRIX + struct.pack(
            ">II", width << 16, height << 16))
        trak = _box(b"trak", tkhd + mdia)
        mvhd = _full(b"mvhd", 0, 0, struct.pack(
            ">IIII", 0, 0, timescale, duration)
            + struct.pack(">IHH", 0x00010000, 0x0100, 0)
            + b"\x00" * 8 + _MATRIX + b"\x00" * 24
            + struct.pack(">I", 2))  # next track id
        return _box(b"moov", mvhd + trak)

    moov_len = len(build_moov(0))
    chunk_off = len(ftyp) + moov_len + 8
    moov = build_moov(chunk_off)
    mdat = _box(b"mdat", b"".join(frames))
    return ftyp + moov + mdat


# ── box parser ────────────────────────────────────────────────────────

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"dinf",
               b"edts", b"udta", b"mvex"}


def walk_boxes(buf: bytes, start: int = 0, end: int | None = None):
    """Yield (type, payload_start, payload_end) over one box level."""
    end = len(buf) if end is None else end
    off = start
    while off + 8 <= end:
        size, kind = struct.unpack_from(">I4s", buf, off)
        hdr = 8
        if size == 1:  # 64-bit largesize
            if off + 16 > end:
                raise Mp4Error("truncated largesize box")
            size = struct.unpack_from(">Q", buf, off + 8)[0]
            hdr = 16
        elif size == 0:  # to end of file
            size = end - off
        if size < hdr or off + size > end:
            raise Mp4Error(f"box {kind!r} overruns buffer")
        yield kind, off + hdr, off + size
        off += size


def _find(buf: bytes, path: list[bytes], start: int = 0,
          end: int | None = None):
    """All payload ranges matching a nested box path."""
    kind, rest = path[0], path[1:]
    for k, s, e in walk_boxes(buf, start, end):
        if k != kind:
            continue
        if not rest:
            yield s, e
        elif k in _CONTAINERS:
            yield from _find(buf, rest, s, e)


def _fullbox(buf: bytes, s: int) -> tuple[int, int]:
    version = buf[s]
    return version, s + 4


@dataclass
class Mp4Track:
    handler: str = ""
    codec: str = ""
    width: int = 0
    height: int = 0
    timescale: int = 1
    duration: int = 0
    sample_ranges: list[tuple[int, int]] = field(default_factory=list)


@dataclass
class Mp4Info:
    timescale: int
    duration: int
    tracks: list[Mp4Track]

    @property
    def duration_ms(self) -> int:
        return int(round(1000 * self.duration / max(self.timescale, 1)))


def _parse_mvhd(buf: bytes, s: int) -> tuple[int, int]:
    v, p = _fullbox(buf, s)
    if v == 1:
        ts, dur = struct.unpack_from(">IQ", buf, p + 16)
    else:
        ts, dur = struct.unpack_from(">II", buf, p + 8)
    return ts, dur


def _parse_track(buf: bytes, ts_: int, te: int) -> Mp4Track:
    t = Mp4Track()
    for s, e in _find(buf, [b"tkhd"], ts_, te):
        v, p = _fullbox(buf, s)
        p += (32 if v == 1 else 20) + 8 + 2 * 2 + 4 + 36
        w16, h16 = struct.unpack_from(">II", buf, p)
        t.width, t.height = w16 >> 16, h16 >> 16
    for s, e in _find(buf, [b"mdia"], ts_, te):
        for ks, ke in _find(buf, [b"mdhd"], s, e):
            v, p = _fullbox(buf, ks)
            if v == 1:
                t.timescale, t.duration = struct.unpack_from(
                    ">IQ", buf, p + 16)
            else:
                t.timescale, t.duration = struct.unpack_from(
                    ">II", buf, p + 8)
        for ks, ke in _find(buf, [b"hdlr"], s, e):
            _, p = _fullbox(buf, ks)
            t.handler = buf[p + 4:p + 8].decode("latin1")
        for ks, ke in _find(buf, [b"minf", b"stbl"], s, e):
            _parse_stbl(buf, ks, ke, t)
    return t


def _parse_stbl(buf: bytes, s: int, e: int, t: Mp4Track) -> None:
    sizes: np.ndarray | None = None
    chunk_offs: np.ndarray | None = None
    stsc_rows: list[tuple[int, int]] = []
    for k, bs, be in walk_boxes(buf, s, e):
        if k == b"stsd":
            _, p = _fullbox(buf, bs)
            (n_entries,) = struct.unpack_from(">I", buf, p)
            if n_entries >= 1:
                t.codec = buf[p + 8:p + 12].decode("latin1")
        elif k == b"stsz":
            _, p = _fullbox(buf, bs)
            uniform, count = struct.unpack_from(">II", buf, p)
            if uniform:
                sizes = np.full(count, uniform, dtype=np.int64)
            else:
                sizes = np.frombuffer(
                    buf, dtype=">u4", count=count, offset=p + 8
                ).astype(np.int64)
        elif k in (b"stco", b"co64"):
            _, p = _fullbox(buf, bs)
            (count,) = struct.unpack_from(">I", buf, p)
            dt = ">u8" if k == b"co64" else ">u4"
            chunk_offs = np.frombuffer(
                buf, dtype=dt, count=count, offset=p + 4).astype(np.int64)
        elif k == b"stsc":
            _, p = _fullbox(buf, bs)
            (count,) = struct.unpack_from(">I", buf, p)
            for i in range(count):
                first, per_chunk, _desc = struct.unpack_from(
                    ">III", buf, p + 4 + 12 * i)
                stsc_rows.append((first, per_chunk))
    if sizes is None or chunk_offs is None or not stsc_rows:
        return
    # expand sample-to-chunk runs → per-sample chunk index
    per_chunk = np.empty(len(chunk_offs), dtype=np.int64)
    for i, (first, n) in enumerate(stsc_rows):
        last = (stsc_rows[i + 1][0] - 1
                if i + 1 < len(stsc_rows) else len(chunk_offs))
        per_chunk[first - 1:last] = n
    ranges: list[tuple[int, int]] = []
    si = 0
    for ci, coff in enumerate(chunk_offs):
        off = int(coff)
        for _ in range(int(per_chunk[ci])):
            if si >= len(sizes):
                break
            ranges.append((off, off + int(sizes[si])))
            off += int(sizes[si])
            si += 1
    t.sample_ranges = ranges[:len(sizes)]


def parse_mp4(payload: bytes) -> Mp4Info:
    """Full structural parse: movie header + every track's handler,
    codec, dimensions and exact per-sample byte ranges."""
    buf = payload
    kinds = [k for k, _, _ in walk_boxes(buf)]
    if b"ftyp" not in kinds:
        raise Mp4Error("no ftyp box")
    ts, dur, tracks = 1, 0, []
    for ms, me in _find(buf, [b"moov"]):
        for hs, he in _find(buf, [b"mvhd"], ms, me):
            ts, dur = _parse_mvhd(buf, hs)
        for trs, tre in _find(buf, [b"trak"], ms, me):
            tracks.append(_parse_track(buf, trs, tre))
    return Mp4Info(timescale=ts, duration=dur, tracks=tracks)


def decode_mp4_frames(payload: bytes,
                      max_frames: int | None = None) -> list[np.ndarray]:
    """Demux + decode video frames. MJPEG samples decode through the
    repo's own JPEG codec; compressed codecs raise
    UnsupportedSampleFormat."""
    from .jpeg_codec import decode_jpeg

    info = parse_mp4(payload)
    video = [t for t in info.tracks if t.handler == "vide"]
    if not video:
        raise Mp4Error("no video track")
    t = video[0]
    if t.codec != "jpeg":
        raise UnsupportedSampleFormat(
            f"sample format {t.codec!r} needs an external decoder")
    ranges = t.sample_ranges[:max_frames] if max_frames else t.sample_ranges
    return [decode_jpeg(payload[a:b]) for a, b in ranges]


def video_features(payload: bytes, dim: int = 64) -> np.ndarray:
    """[log-duration-s, n-frames, fps] + mean per-frame image features
    over an evenly sampled subset (≤ 8 frames decoded regardless of
    video length — bounded work per row)."""
    from .media_codecs import image_features

    info = parse_mp4(payload)
    video = [t for t in info.tracks if t.handler == "vide"]
    if not video:
        raise Mp4Error("no video track")
    t = video[0]
    n = len(t.sample_ranges)
    idx = np.unique(np.linspace(0, max(n - 1, 0), num=min(n, 8),
                                dtype=np.int64))
    frames = decode_mp4_frames(payload)
    out = np.zeros(dim, dtype=np.float32)
    if len(idx):
        out = np.mean([image_features(frames[i], dim) for i in idx],
                      axis=0).astype(np.float32)
    dur_s = info.duration / max(info.timescale, 1)
    out[13] = np.log1p(dur_s)
    out[14] = float(n)
    out[15] = n / dur_s if dur_s > 0 else 0.0
    return out
