"""Real media codecs for formats decodable with stdlib + numpy only.

PIL/ffmpeg are not in this container, but that does NOT force the whole
multimodal path to be fake: BMP, PPM/PGM, PNG, GIF and baseline JPEG
images (jpeg_codec.py) and RIFF/WAVE PCM audio decode with numpy and
the stdlib. MJPEG-in-MP4 video demuxes through the
ISO BMFF parser (mp4_codec.py) with frames decoded by jpeg_codec.
These are the REAL decode paths for ``MediaFeatureExtractor``; only
compressed video codecs (avc1/H.264 …) still fall back to the
injected/fake decoder and are the documented stub.

Implemented from the public format specs:
- BMP: BITMAPFILEHEADER + BITMAPINFOHEADER, uncompressed 24-bit BGR
  (bottom-up or top-down, 4-byte row padding) and 8-bit paletted.
- PPM/PGM: binary P6/P5 with whitespace/comment-tolerant headers.
- WAV: canonical RIFF/WAVE fmt+data chunks, PCM 8/16-bit, via ``wave``.
- PNG: 8-bit gray/RGB/RGBA non-interlaced, zlib IDAT, all five row
  filters (spec §9), CRC-validated chunks.
- GIF: GIF87a/89a first frame — full variable-width LSB-first LZW
  (table growth + 4096 reset), global/local palettes, interlacing.
- JPEG: baseline sequential DCT (ITU-T T.81) — Huffman, arbitrary
  sampling factors, restart markers; see ``jpeg_codec.py``.

Encoders mirror the decoders so fixtures are roundtrip-by-construction.
Feature extraction is deterministic numpy: images → size/aspect,
channel stats, 32-bin luma histogram; audio → duration, RMS, zero
crossings, 16-band spectrum. Both land in the same FEATURE_DIM vector
layout the fake decoder uses, so downstream schemas are identical.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np


class UnsupportedMediaError(Exception):
    """Payload format needs an external decoder (MP4/video/...)."""


# ── BMP ──────────────────────────────────────────────────────────────

def encode_bmp(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → 24-bit uncompressed bottom-up BMP."""
    h, w, _ = arr.shape
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size,
                       2835, 2835, 0, 0)
    rows = bytearray()
    bgr = arr[:, :, ::-1]  # RGB → BGR
    pad = b"\x00" * (row_size - w * 3)
    for y in range(h - 1, -1, -1):  # bottom-up
        rows += bgr[y].tobytes() + pad
    return header + info + bytes(rows)


def decode_bmp(payload: bytes) -> np.ndarray:
    """BMP → (H, W, 3) uint8 RGB. 24-bit uncompressed + 8-bit paletted."""
    if payload[:2] != b"BM" or len(payload) < 54:
        raise UnsupportedMediaError("not a BMP")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise UnsupportedMediaError("pre-BITMAPINFOHEADER BMP")
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0:
        raise UnsupportedMediaError(f"compressed BMP (method {compression})")
    top_down = h < 0
    h = abs(h)
    if bpp == 24:
        row_size = (w * 3 + 3) & ~3
        rows = np.frombuffer(payload, np.uint8, row_size * h, data_off)
        rows = rows.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
        rgb = rows[:, :, ::-1]
    elif bpp == 8:
        pal_off = 14 + hdr_size
        pal = np.frombuffer(payload, np.uint8, 256 * 4, pal_off).reshape(256, 4)
        row_size = (w + 3) & ~3
        rows = np.frombuffer(payload, np.uint8, row_size * h, data_off)
        idx = rows.reshape(h, row_size)[:, :w]
        rgb = pal[idx][:, :, :3][:, :, ::-1]
    else:
        raise UnsupportedMediaError(f"{bpp}-bpp BMP")
    if not top_down:
        rgb = rgb[::-1]
    return np.ascontiguousarray(rgb)


# ── PPM / PGM ────────────────────────────────────────────────────────

def encode_ppm(arr: np.ndarray) -> bytes:
    h, w = arr.shape[:2]
    if arr.ndim == 2:
        return b"P5\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


def _pnm_tokens(payload: bytes, n: int):
    """First n whitespace-separated header tokens (comments skipped);
    returns (tokens, data offset)."""
    toks: list[bytes] = []
    i = 0
    while len(toks) < n and i < len(payload):
        c = payload[i:i + 1]
        if c == b"#":
            i = payload.find(b"\n", i)
            if i == -1:
                break
            i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(payload) and not payload[j:j + 1].isspace():
                j += 1
            toks.append(payload[i:j])
            i = j
    return toks, i + 1  # one whitespace byte after maxval


def decode_ppm(payload: bytes) -> np.ndarray:
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        raise UnsupportedMediaError("not a binary PGM/PPM")
    toks, off = _pnm_tokens(payload[2:], 3)
    if len(toks) < 3:
        raise UnsupportedMediaError("truncated PNM header")
    w, h, maxval = (int(t) for t in toks)
    if maxval > 255:
        raise UnsupportedMediaError("16-bit PNM")
    ch = 3 if magic == b"P6" else 1
    need = w * h * ch
    data = np.frombuffer(payload, np.uint8, need, 2 + off)
    arr = data.reshape(h, w, ch) if ch == 3 else data.reshape(h, w)
    return np.ascontiguousarray(arr)


# ── WAV ──────────────────────────────────────────────────────────────

def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """float samples in [-1, 1] → 16-bit PCM mono WAV."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes((np.clip(samples, -1, 1) * 32767).astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """WAV → (rate, float64 mono samples in [-1, 1])."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise UnsupportedMediaError("not a RIFF/WAVE payload")
    try:
        with wave.open(io.BytesIO(payload), "rb") as f:
            rate = f.getframerate()
            nch = f.getnchannels()
            width = f.getsampwidth()
            raw = f.readframes(f.getnframes())
    except wave.Error as e:
        raise UnsupportedMediaError(f"wave: {e}") from e
    if width == 2:
        x = np.frombuffer(raw, "<i2").astype(np.float64) / 32768.0
    elif width == 1:
        x = (np.frombuffer(raw, np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise UnsupportedMediaError(f"{width * 8}-bit WAV")
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return rate, x


# ── feature extraction (deterministic numpy) ─────────────────────────

def resize_nearest(arr: np.ndarray, w: int, h: int) -> np.ndarray:
    """Nearest-neighbor resize — the real ``resize`` op (no PIL)."""
    ys = (np.arange(h) * arr.shape[0] // h).clip(0, arr.shape[0] - 1)
    xs = (np.arange(w) * arr.shape[1] // w).clip(0, arr.shape[1] - 1)
    return arr[ys][:, xs]


def image_features(arr: np.ndarray, dim: int = 64) -> np.ndarray:
    """[log-w, log-h, aspect, mean/std per channel, 32-bin luma hist]
    padded to ``dim``."""
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    h, w = arr.shape[:2]
    f = arr.astype(np.float64) / 255.0
    luma = 0.2126 * f[:, :, 0] + 0.7152 * f[:, :, 1] + 0.0722 * f[:, :, 2]
    hist, _ = np.histogram(luma, bins=32, range=(0.0, 1.0))
    out = np.zeros(dim, dtype=np.float32)
    head = [np.log1p(w), np.log1p(h), w / max(h, 1),
            *f.mean(axis=(0, 1)), *f.std(axis=(0, 1))]
    out[: len(head)] = head
    out[16:48] = hist / max(luma.size, 1)
    return out


def audio_features(rate: int, x: np.ndarray, dim: int = 64) -> np.ndarray:
    """[log-duration, RMS, zero-crossing rate, peak, 16-band log
    spectrum] padded to ``dim``."""
    out = np.zeros(dim, dtype=np.float32)
    n = len(x)
    if n == 0:
        return out
    zcr = float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8)))))
    head = [np.log1p(n / max(rate, 1)), float(np.sqrt(np.mean(x * x))),
            zcr, float(np.abs(x).max())]
    out[: len(head)] = head
    spec = np.abs(np.fft.rfft(x[: min(n, 1 << 15)]))
    bands = np.array_split(spec, 16)
    out[16:32] = [np.log1p(b.mean()) if len(b) else 0.0 for b in bands]
    return out


# ── GIF (GIF89a spec: LSB-first variable-width LZW, palettes) ────────

def _gif_lzw_decode(data: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW: codes packed LSB-first, width starts at
    ``min_code_size + 1``, CLEAR = 2^mcs resets the table, END = CLEAR+1;
    width grows AFTER the table reaches 2^width entries, capped at 12."""
    clear = 1 << min_code_size
    end = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]

    acc = 0
    nbits = 0
    pos = 0
    width = min_code_size + 1
    table = list(base)
    prev: bytes | None = None
    out = bytearray()
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                return bytes(out)  # truncated stream: salvage
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            return bytes(out)
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"GIF LZW code {code} out of range")
        out += entry
        if len(table) >= (1 << width) and width < 12:
            width += 1
        prev = entry


def _gif_lzw_encode(data: bytes, min_code_size: int) -> bytes:
    """Real LZW compression mirroring ``_gif_lzw_decode`` (dictionary
    growth + width changes included, so decode exercises the full
    algorithm). Emits CLEAR first and END last per the spec."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0
    width = min_code_size + 1

    def emit(code: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    w = b""
    for byte in data:
        wk = w + bytes([byte])
        if wk in table:
            w = wk
            continue
        emit(table[w])
        table[wk] = next_code
        next_code += 1
        # decoder widens when ITS table (same size) reaches 2^width
        if next_code - 1 >= (1 << width) and width < 12:
            width += 1
        if next_code > 4095:
            emit(clear)
            # flush width back; decoder resets on CLEAR
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        w = bytes([byte])
    if w:
        emit(table[w])
        next_code += 1
        if next_code - 1 >= (1 << width) and width < 12:
            width += 1
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def encode_gif(arr: np.ndarray, interlace: bool = False) -> bytes:
    """(H, W, 3) uint8 RGB → GIF89a with a 256-entry global palette
    built from the image's distinct colors (quantized by masking the
    low bits if >256 distinct) and REAL LZW-compressed pixel data."""
    h, w, _ = arr.shape
    flat = arr.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    shift = 0
    while len(colors) > 256:
        shift += 1
        flat = (arr.reshape(-1, 3) >> shift) << shift
        colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    pal = np.zeros((256, 3), dtype=np.uint8)
    pal[: len(colors)] = colors
    idx = inverse.astype(np.uint8).reshape(h, w)
    if interlace:
        rows = [y for start, step in _GIF_INTERLACE_PASSES
                for y in range(start, h, step)]
        pix = idx[rows].tobytes()
    else:
        pix = idx.tobytes()
    mcs = 8
    lzw = _gif_lzw_encode(pix, mcs)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)  # global table, 256×3
    out += pal.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h,
                       0x40 if interlace else 0)
    out.append(mcs)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00;"
    return bytes(out)


def decode_gif(payload: bytes) -> np.ndarray:
    """GIF87a/89a first frame → (H, W, 3) uint8 RGB. Global/local
    palettes, interlacing, and full variable-width LZW."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise UnsupportedMediaError("not a GIF")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gpal = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gpal = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(payload):
        b = payload[pos]
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(payload) and payload[pos]:
                pos += payload[pos] + 1
            pos += 1
        elif b == 0x2C:  # image descriptor
            left, top, w, h, iflags = struct.unpack_from("<HHHHB", payload,
                                                         pos + 1)
            pos += 10
            pal = gpal
            if iflags & 0x80:
                n = 2 << (iflags & 7)
                pal = np.frombuffer(payload, np.uint8, n * 3,
                                    pos).reshape(n, 3)
                pos += n * 3
            if pal is None:
                raise ValueError("GIF image with no color table")
            mcs = payload[pos]
            pos += 1
            data = bytearray()
            while pos < len(payload) and payload[pos]:
                ln = payload[pos]
                data += payload[pos + 1:pos + 1 + ln]
                pos += ln + 1
            pix = np.frombuffer(
                _gif_lzw_decode(bytes(data), mcs), np.uint8)
            if len(pix) < w * h:
                raise ValueError("GIF pixel data truncated")
            pix = pix[: w * h].reshape(h, w)
            if iflags & 0x40:  # deinterlace
                rows = [y for start, step in _GIF_INTERLACE_PASSES
                        for y in range(start, h, step)]
                out = np.zeros((h, w), dtype=np.uint8)
                out[rows] = pix
                pix = out
            if (pix >= len(pal)).any():
                raise ValueError("GIF index outside color table")
            return np.ascontiguousarray(pal[pix])
        elif b == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"GIF unknown block 0x{b:02x}")
    raise ValueError("GIF contains no image block")


# ── PNG (ISO/IEC 15948 / RFC 2083: zlib IDAT + per-row filters) ──────

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type → samples per pixel (8-bit depth only)
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import zlib

    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data)))


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """(H,W) gray / (H,W,3) RGB / (H,W,4) RGBA uint8 → 8-bit
    non-interlaced PNG. ``filter_type`` 0-4 fixes the row filter;
    -1 cycles through all five so fixtures exercise every unfilter
    path. Filters computed per spec §9 on the ORIGINAL bytes (left /
    up / average / Paeth), so decode is roundtrip-by-construction."""
    import zlib

    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color = {1: 0, 3: 2, 4: 6}[ch]
    raw = bytearray()
    prev = np.zeros((w, ch), dtype=np.int16)
    for y in range(h):
        row = arr[y].astype(np.int16)
        ft = (y % 5) if filter_type == -1 else filter_type
        left = np.vstack([np.zeros((1, ch), np.int16), row[:-1]])
        ul = np.vstack([np.zeros((1, ch), np.int16), prev[:-1]])
        if ft == 0:
            out = row
        elif ft == 1:
            out = row - left
        elif ft == 2:
            out = row - prev
        elif ft == 3:
            out = row - (left + prev) // 2
        else:  # Paeth
            p = left + prev - ul
            pa_ = np.abs(p - left)
            pb = np.abs(p - prev)
            pc = np.abs(p - ul)
            pred = np.where((pa_ <= pb) & (pa_ <= pc), left,
                            np.where(pb <= pc, prev, ul))
            out = row - pred
        raw.append(ft)
        raw += (out & 0xFF).astype(np.uint8).tobytes()
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
            + _png_chunk(b"IEND", b""))


def decode_png(payload: bytes) -> np.ndarray:
    """PNG → (H, W, C) uint8 (C = 1/3/4). 8-bit depth, color types
    0/2/6, non-interlaced; CRC-validated chunks. Filters unfiltered
    per spec §9: None/Up vectorized, Sub via per-lane cumsum, Average/
    Paeth per-pixel (sequential by definition)."""
    import zlib

    if payload[:8] != _PNG_SIG:
        raise UnsupportedMediaError("not a PNG")
    pos, n = 8, len(payload)
    ihdr = None
    idat = bytearray()
    while pos + 8 <= n:
        (ln,) = struct.unpack_from(">I", payload, pos)
        typ = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + ln]
        if len(data) != ln or pos + 12 + ln > n:
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + ln)
        if crc != zlib.crc32(typ + data):
            raise ValueError(f"PNG chunk {typ!r} CRC mismatch")
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or color not in _PNG_CHANNELS or interlace or comp or filt:
        raise UnsupportedMediaError(
            f"PNG variant unsupported (depth={depth} color={color} "
            f"interlace={interlace})")
    ch = _PNG_CHANNELS[color]
    stride = w * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != (stride + 1) * h:
        raise ValueError("PNG IDAT size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        row = np.frombuffer(
            raw, np.uint8, stride, y * (stride + 1) + 1).copy()
        if ft == 0:
            rec = row
        elif ft == 1:  # Sub: cumsum per byte lane (stride = bpp)
            rec = row.reshape(w, ch).astype(np.uint64).cumsum(
                axis=0).astype(np.uint8).reshape(stride)
        elif ft == 2:  # Up
            rec = row + prev
        elif ft == 3:  # Average
            rec = np.zeros(stride, dtype=np.uint8)
            for x in range(stride):
                left = int(rec[x - ch]) if x >= ch else 0
                rec[x] = (int(row[x]) + (left + int(prev[x])) // 2) & 0xFF
        elif ft == 4:  # Paeth
            rec = np.zeros(stride, dtype=np.uint8)
            for x in range(stride):
                a = int(rec[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else c)
                rec[x] = (int(row[x]) + pred) & 0xFF
        else:
            raise ValueError(f"PNG filter {ft} invalid")
        out[y] = rec
        prev = rec
    return out.reshape(h, w, ch)


def decode_image(payload: bytes) -> np.ndarray:
    """Magic-byte dispatch → (H, W, 3) uint8 RGB for the stdlib image
    codecs (BMP/PNM/PNG/GIF/baseline-JPEG); UnsupportedMediaError for
    non-image or external-codec payloads."""
    p = payload or b""
    if p[:2] == b"BM":
        img = decode_bmp(p)
    elif p[:2] in (b"P5", b"P6"):
        img = decode_ppm(p)
    elif p[:8] == _PNG_SIG:
        img = decode_png(p)
        if img.shape[2] == 4:
            img = img[:, :, :3]
    elif p[:6] in (b"GIF87a", b"GIF89a"):
        img = decode_gif(p)
    elif p[:2] == b"\xff\xd8":
        from .jpeg_codec import UnsupportedJpegError, decode_jpeg

        try:
            img = decode_jpeg(p)
        except UnsupportedJpegError as e:
            raise UnsupportedMediaError(str(e)) from e
    else:
        raise UnsupportedMediaError(
            f"no stdlib image decoder for magic {p[:4]!r}")
    if img.ndim == 2:
        img = img[:, :, None]
    if img.shape[2] == 1:
        img = np.repeat(img, 3, axis=2)
    return img


def decode_features(payload: bytes, dim: int = 64) -> np.ndarray:
    """Magic-byte dispatch → REAL features for BMP/PNM/PNG/WAV
    payloads; raises UnsupportedMediaError for formats needing
    external codecs."""
    p = payload or b""
    if p[:2] == b"BM":
        return image_features(decode_bmp(p), dim)
    if p[:2] in (b"P5", b"P6"):
        return image_features(decode_ppm(p), dim)
    if p[:8] == _PNG_SIG:
        img = decode_png(p)
        if img.shape[2] == 4:
            img = img[:, :, :3]  # drop alpha for feature parity
        return image_features(img.squeeze(-1) if img.shape[2] == 1 else img,
                              dim)
    if p[:6] in (b"GIF87a", b"GIF89a"):
        return image_features(decode_gif(p), dim)
    if p[:4] == b"RIFF" and p[8:12] == b"WAVE":
        rate, x = decode_wav(p)
        return audio_features(rate, x, dim)
    if p[:2] == b"\xff\xd8":
        from .jpeg_codec import UnsupportedJpegError, decode_jpeg

        try:
            img = decode_jpeg(p)
        except UnsupportedJpegError as e:
            raise UnsupportedMediaError(str(e)) from e
        return image_features(
            img.squeeze(-1) if img.shape[2] == 1 else img, dim)
    if len(p) >= 12 and p[4:8] == b"ftyp":
        from .mp4_codec import Mp4Error, UnsupportedSampleFormat, video_features

        try:
            return video_features(p, dim)
        except (UnsupportedSampleFormat, Mp4Error) as e:
            raise UnsupportedMediaError(str(e)) from e
    raise UnsupportedMediaError(
        f"no stdlib decoder for magic {p[:4]!r} (compressed video codecs "
        "like avc1/H.264 need an injected decode_fn)")
