"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode kernels themselves are STUBBED (the image/audio libraries are
not in this environment — ``NotImplementedError`` behind an import-try,
plus a deterministic fake used by tests); everything Ray-side is real:
schemas, actor-pool stages with per-actor "model" setup, small batch sizes
for large payloads, and the output layout.

Pattern notes for 100 TB:
* binary payloads ride ``large_binary`` columns; ``batch_size`` for these
  stages must be sized by bytes not rows (``media_batch_size``);
* decode/feature-extract are CPU-heavy stateful stages → callable classes
  via ``map_batches(..., concurrency=N)`` with setup in ``__init__``;
* outputs are fixed-width feature vectors (``list<float>``) + metadata —
  the payload column is dropped immediately after decode (project early).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),            # image | audio | video
    ("payload", pa.large_binary()),
    ("mime", pa.string()),
    ("width", pa.int32()),            # -1 when unknown / n.a.
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])

FEATURE_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),
    ("feature", pa.list_(pa.float32())),
    ("n_frames", pa.int32()),
])


def _fake_feature(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in decoder: hash-seeded feature vector (stable
    across actors/retries, like every fallback in this engine)."""
    h = hashlib.blake2b(payload, digest_size=8).digest()
    rng = np.random.default_rng(int.from_bytes(h, "little"))
    return rng.uniform(-1, 1, dim).astype(np.float32)


class MediaFeatureExtractor:
    """Actor-pool stage: decode + featurize media payloads.

    ``__init__`` is where a real model would load (once per actor);
    ``use_fake=True`` (default in this container) uses the deterministic
    fake so tests exercise the full Ray plumbing.
    """

    def __init__(self, dim: int = 64, use_fake: bool = True,
                 frame_stride_ms: int = 1000):
        self.dim = dim
        self.use_fake = use_fake
        self.frame_stride_ms = frame_stride_ms
        if not use_fake:
            try:  # pragma: no cover - libs absent in this container
                import PIL.Image  # noqa: F401
            except ImportError as e:
                raise NotImplementedError(
                    "real media decode requires pillow/librosa/pyav; "
                    "not available in this environment — use use_fake=True"
                ) from e

    def _decode(self, kind: str, payload: bytes, duration_ms: int) -> tuple[np.ndarray, int]:
        if not self.use_fake:  # pragma: no cover
            raise NotImplementedError("real decode path is stubbed")
        if kind == "video":
            # frame-sample: one feature per stride, mean-pooled
            n = max(1, duration_ms // self.frame_stride_ms)
            frames = [_fake_feature(payload + bytes([i % 256]), self.dim)
                      for i in range(min(n, 32))]
            return np.mean(frames, axis=0), n
        return _fake_feature(payload, self.dim), 1

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        kinds = batch.column("kind").to_pylist()
        payloads = batch.column("payload").to_pylist()
        durs = batch.column("duration_ms").to_pylist()
        feats, nframes = [], []
        for kind, payload, dur in zip(kinds, payloads, durs):
            f, n = self._decode(kind, payload or b"", dur or 0)
            feats.append(f.tolist())
            nframes.append(n)
        return pa.Table.from_pydict({
            "media_id": ids, "kind": kinds, "feature": feats,
            "n_frames": nframes,
        }, schema=FEATURE_SCHEMA)


def extract_media_features(ds, dim: int = 64, concurrency: int = 4,
                           media_batch_size: int = 32):
    """media table → feature table (payload column projected away)."""
    return ds.map_batches(MediaFeatureExtractor,
                          fn_constructor_kwargs={"dim": dim},
                          batch_format="pyarrow",
                          batch_size=media_batch_size,
                          concurrency=(1, concurrency))


def synthetic_media_table(n: int, seed: int = 5) -> pa.Table:
    """Deterministic media fixture (opaque bytes; no real codecs)."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=int(rng.integers(64, 512)),
                               dtype=np.uint8).tobytes()
        rows.append({
            "media_id": i, "kind": kind, "payload": payload,
            "mime": {"image": "image/png", "audio": "audio/wav",
                     "video": "video/mp4"}[kind],
            "width": 64 if kind == "image" else -1,
            "height": 64 if kind == "image" else -1,
            "duration_ms": int(rng.integers(1000, 10000)) if kind != "image" else -1,
        })
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)
