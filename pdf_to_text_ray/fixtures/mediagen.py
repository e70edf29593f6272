"""Deterministic synthetic media corpus (MEDIA_SCHEMA rows).

Payloads are REAL encoded files the engine's codecs decode: BMP, PPM,
PNG, GIF and baseline JPEG images (gradient + noise patterns; JPEG
mixes 444/420 subsampling and restart intervals), WAV tones, and REAL
MJPEG-in-MP4 videos (muxed + demuxed by stages/mp4_codec) — plus an
avc1-stub tail exercising the external-codec fallback path. Seeded
and cached under /tmp like fixtures/corpus.py.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..stages.jpeg_codec import encode_jpeg
from ..stages.media_codecs import (
    encode_bmp, encode_gif, encode_png, encode_ppm, encode_wav)
from ..stages.multimodal import MEDIA_SCHEMA

MEDIA_GENERATOR_VERSION = 5  # v4: real JPEGs; v5: real MJPEG-MP4s


def make_media_row(i: int, seed: int) -> dict:
    rng = np.random.RandomState(seed * 911_383 + i)
    kind = i % 5
    if kind in (0, 1):  # BMP / PPM / PNG image
        h, w = int(rng.randint(8, 48)), int(rng.randint(8, 48))
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack([
            (xx * 255 // max(w - 1, 1)),
            (yy * 255 // max(h - 1, 1)),
            rng.randint(0, 256, size=(h, w)),
        ], axis=2).astype(np.uint8)
        if kind == 0:
            # alternate BMP / PNG-with-cycling-filters on the even slot
            payload = encode_bmp(img) if i % 2 else encode_png(img, -1)
        else:
            # alternate PPM / interlaced GIF (≤256-color gradient+noise
            # quantizes; decode path is what matters, not fidelity)
            payload = encode_ppm(img) if i % 2 else encode_gif(
                img, interlace=True)
        return {"media_id": i, "media_type": "image", "payload": payload,
                "meta_width": w, "meta_height": h, "meta_duration_ms": 0}
    if kind == 2:  # WAV tone
        dur_ms = int(rng.randint(100, 1500))
        n = 8000 * dur_ms // 1000
        t = np.arange(n) / 8000.0
        freq = float(rng.randint(100, 2000))
        payload = encode_wav(0.4 * np.sin(2 * np.pi * freq * t), 8000)
        return {"media_id": i, "media_type": "audio", "payload": payload,
                "meta_width": 0, "meta_height": 0, "meta_duration_ms": dur_ms}
    if kind == 3:  # grayscale PGM
        h, w = int(rng.randint(8, 32)), int(rng.randint(8, 32))
        payload = encode_ppm(rng.randint(0, 256, size=(h, w)).astype(np.uint8))
        return {"media_id": i, "media_type": "image", "payload": payload,
                "meta_width": w, "meta_height": h, "meta_duration_ms": 0}
    if i % 2:  # REAL baseline JPEG (444/420 alternating, lossy)
        h, w = int(rng.randint(9, 40)), int(rng.randint(9, 40))
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack([
            (xx * 255 // max(w - 1, 1)),
            (yy * 255 // max(h - 1, 1)),
            np.full((h, w), int(rng.randint(0, 256))),
        ], axis=2).astype(np.uint8)
        payload = encode_jpeg(img, quality=int(rng.choice([60, 85, 95])),
                              subsample="420" if i % 4 == 1 else "444",
                              restart_interval=3 if i % 8 == 1 else 0)
        return {"media_id": i, "media_type": "image", "payload": payload,
                "meta_width": w, "meta_height": h, "meta_duration_ms": 0}
    if i % 4 == 2:
        # avc1-stub tail: compressed video (H.264) genuinely needs an
        # external decoder — exercises the fallback / strict path. A
        # structurally VALID container (parse_mp4 walks it fine), only
        # the sample format is undecodable here.
        from ..stages.mp4_codec import encode_mp4_mjpeg

        real = encode_mp4_mjpeg(
            [encode_jpeg(np.zeros((8, 8, 3), np.uint8))], width=8, height=8)
        # patch the stsd sample-entry fourcc (stsd hdr 4 + verflags 4 +
        # entry count 4 + entry size 4 → fourcc) — NOT a blind replace,
        # which would hit the "mjpeg" handler-name string first
        fcc = real.index(b"stsd") + 16
        assert real[fcc:fcc + 4] == b"jpeg"
        payload = real[:fcc] + b"avc1" + real[fcc + 4:]
        return {"media_id": i, "media_type": "video",
                "payload": payload, "meta_width": 8, "meta_height": 8,
                "meta_duration_ms": 100}
    # REAL MJPEG-in-MP4: muxed by the repo's ISO BMFF writer, frames
    # by its baseline JPEG encoder — decoded end-to-end without any
    # external library.
    from ..stages.mp4_codec import encode_mp4_mjpeg

    h, w = int(rng.randint(9, 33)), int(rng.randint(9, 33))
    fps = int(rng.choice([5, 10]))
    n_frames = int(rng.randint(2, 7))
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for f in range(n_frames):
        img = np.stack([
            (xx * 255 // max(w - 1, 1)),
            (yy * 255 // max(h - 1, 1)),
            np.full((h, w), (f * 251 + i * 17) % 256),
        ], axis=2).astype(np.uint8)
        frames.append(encode_jpeg(img, quality=85))
    payload = encode_mp4_mjpeg(frames, width=w, height=h, fps=fps)
    return {"media_id": i, "media_type": "video", "payload": payload,
            "meta_width": w, "meta_height": h,
            "meta_duration_ms": 1000 * n_frames // fps}


def ensure_media_parquet(n_rows: int, seed: int = 42,
                         base_dir: str = "/tmp/ptt_media") -> str:
    key = f"v{MEDIA_GENERATOR_VERSION}_n{n_rows}_s{seed}"
    out = os.path.join(base_dir, key)
    marker = os.path.join(out, "_DONE")
    if not os.path.exists(marker):
        import shutil

        shutil.rmtree(out, ignore_errors=True)
        os.makedirs(out, exist_ok=True)
        rows = [make_media_row(i, seed) for i in range(n_rows)]
        table = pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)
        pq.write_table(table, os.path.join(out, "media-0.parquet"))
        with open(marker, "w") as f:
            f.write("ok")
    return out


def _texture(seed: int, h: int, w: int) -> np.ndarray:
    """Band-limited texture: an 8×8 random field bilinearly upsampled —
    the spectrum class pHash is specified over (a pure gradient's AC
    coefficients are ~0 and their median-threshold bits degenerate)."""
    rng = np.random.RandomState(seed)
    f = rng.randint(0, 256, (8, 8)).astype(np.float64)
    yi = np.linspace(0, 7, h)
    xi = np.linspace(0, 7, w)
    y0 = np.floor(yi).astype(int)
    x0 = np.floor(xi).astype(int)
    y1 = np.minimum(y0 + 1, 7)
    x1 = np.minimum(x0 + 1, 7)
    fy = (yi - y0)[:, None]
    fx = (xi - x0)[None, :]
    g = (f[np.ix_(y0, x0)] * (1 - fy) * (1 - fx)
         + f[np.ix_(y1, x0)] * fy * (1 - fx)
         + f[np.ix_(y0, x1)] * (1 - fy) * fx
         + f[np.ix_(y1, x1)] * fy * fx)
    return np.stack([g, g, g], axis=2).astype(np.uint8)


def make_phash_media_row(i: int, seed: int) -> dict:
    """Row i belongs to cluster i // 3; the three variants are (0) the
    base render, (1) a resized render, (2) a noised render — each a
    REAL encoded image, so the pHash near-dup profile has known
    structure: every image has ≥ 2 in-cluster neighbors."""
    from ..stages.media_codecs import encode_bmp, encode_ppm

    base = i // 3
    variant = i % 3
    pat_seed = seed * 604_171 + base
    if variant == 0:
        img = _texture(pat_seed, 32, 32)
        payload, w, h = encode_bmp(img), 32, 32
    elif variant == 1:
        img = _texture(pat_seed, 40, 36)
        payload, w, h = encode_ppm(img), 36, 40
    else:
        rng = np.random.RandomState(seed * 911_383 + i)
        img = np.clip(_texture(pat_seed, 32, 32).astype(int)
                      + rng.randint(-10, 11, (32, 32, 3)),
                      0, 255).astype(np.uint8)
        payload, w, h = encode_bmp(img), 32, 32
    return {"media_id": i, "media_type": "image", "payload": payload,
            "meta_width": w, "meta_height": h, "meta_duration_ms": 0}


def ensure_phash_media_parquet(n_rows: int, seed: int = 42,
                               base_dir: str = "/tmp/ptt_media_ph") -> str:
    key = f"v{MEDIA_GENERATOR_VERSION}_n{n_rows}_s{seed}"
    out = os.path.join(base_dir, key)
    marker = os.path.join(out, "_DONE")
    if not os.path.exists(marker):
        import shutil

        shutil.rmtree(out, ignore_errors=True)
        os.makedirs(out, exist_ok=True)
        rows = [make_phash_media_row(i, seed) for i in range(n_rows)]
        table = pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)
        pq.write_table(table, os.path.join(out, "media-0.parquet"))
        with open(marker, "w") as f:
            f.write("ok")
    return out
