"""Multimodal column plumbing: image/audio/video as opaque binary.

Decode libraries (PIL/ffmpeg/torchaudio) are NOT in this container, so
the codec step is STUBBED — ``decode_fn`` defaults to a deterministic
fake (seeded from the payload bytes) and a real decoder can be injected
per deployment. Everything Ray-side is real and tested: schemas, actor
signatures, batch sizing for large binary rows, and output layout.

Pattern: large binary payloads ⇒ SMALL ``batch_size`` and
``batch_format="pyarrow"`` so payload bytes stay zero-copy in the
object store; feature outputs are fixed-size list<float> columns.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),   # "image" | "audio" | "video"
        ("payload", pa.binary()),      # opaque encoded bytes
        ("meta_width", pa.int32()),    # typed metadata travels beside payload
        ("meta_height", pa.int32()),
        ("meta_duration_ms", pa.int32()),
    ]
)

FEATURE_DIM = 64


def _fake_decode(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a real decoder: features derived from a
    payload digest. Replace via ``decode_fn`` injection."""
    digest = hashlib.blake2b(payload or b"", digest_size=8).digest()
    rng = np.random.RandomState(int.from_bytes(digest[:4], "big"))
    return rng.normal(size=dim).astype(np.float32)


class MediaFeatureExtractor:
    """Actor-pool stage: ``map_batches(MediaFeatureExtractor,
    concurrency=(a,b), batch_size=SMALL, num_cpus=1)``.

    __init__ loads the (stubbed) model once per actor; __call__ decodes
    + featurizes per batch. ``strict=True`` raises NotImplementedError
    for the codec step — the marker that a real decoder must be
    injected in deployments with media libraries installed."""

    def __init__(self, decode_fn=None, strict: bool = False, dim: int = FEATURE_DIM):
        if strict and decode_fn is None:
            raise NotImplementedError(
                "real media decoding requires an injected decode_fn "
                "(image/audio libs are not available in this environment)"
            )
        self.decode_fn = decode_fn or (lambda payload: _fake_decode(payload, dim))
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        feats = np.stack([self.decode_fn(p) for p in payloads]) if payloads else \
            np.zeros((0, self.dim), dtype=np.float32)
        feat_col = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.ravel(), pa.float32()), self.dim
        )
        keep = [c for c in batch.column_names if c != "payload"]
        return batch.select(keep).append_column("features", feat_col)


def frame_sample_plan(duration_ms: int, every_ms: int = 1000) -> list[int]:
    """Deterministic frame-sampling timestamps for a video payload —
    the plumbing half of frame extraction (decode itself is stubbed)."""
    if duration_ms <= 0:
        return []
    return list(range(0, duration_ms, every_ms))


def extract_media_features(ds, *, concurrency=(1, 8), batch_size: int = 16):
    """Dataset[MEDIA_SCHEMA] → features dataset. Small batches: payload
    bytes × batch_size × concurrency must fit worker heaps."""
    return ds.map_batches(
        MediaFeatureExtractor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
