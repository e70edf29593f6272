"""Deterministic synthetic media corpus (MEDIA_SCHEMA rows).

Payloads are REAL encoded files the engine's codecs decode: BMP, PPM,
PNG, GIF and baseline JPEG images (gradient + noise patterns; JPEG
mixes 444/420 subsampling and restart intervals), WAV tones — plus a
tail of fake MP4 payloads exercising the fallback path (the one
remaining stub format). Seeded and cached under /tmp like
fixtures/corpus.py.
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

MEDIA_GENERATOR_VERSION = 4  # v3: +GIF; v4: real baseline JPEGs


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
    # fake-compressed tail: MP4 video is the one remaining stub format
    payload = b"\x00\x00\x00\x18ftypmp42" + rng.bytes(64)
    return {"media_id": i, "media_type": "video",
            "payload": payload, "meta_width": 0, "meta_height": 0,
            "meta_duration_ms": int(rng.randint(0, 10_000))}


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
