"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

Container/header decode is REAL for PNG and WAV — pure-stdlib ``struct``
parsing of the PNG IHDR chunk (width/height) and the WAV RIFF fmt/data
chunks (sample rate/channels/bit depth/duration), run over genuine bytes
(the synthetic fixture emits valid PNG/WAV containers). Only the LEARNED
feature kernels are stubbed (the image/audio model libraries are not in
this environment — ``NotImplementedError`` behind an import-try, plus a
deterministic fake used by tests); everything Ray-side is real: schemas,
actor-pool stages with per-actor "model" setup, small batch sizes for
large payloads, and the output layout.

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
import struct
import zlib

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


# ---------------------------------------------------------------------------
# REAL container decode (pure stdlib): PNG IHDR + WAV RIFF headers
# ---------------------------------------------------------------------------

PNG_SIG = b"\x89PNG\r\n\x1a\n"

MEDIA_HEADER_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),
    ("mime", pa.string()),
    ("width", pa.int32()),            # -1 when n.a. / unparsable
    ("height", pa.int32()),
    ("sample_rate", pa.int32()),
    ("n_channels", pa.int32()),
    ("bits_per_sample", pa.int32()),
    ("duration_ms", pa.int32()),
    ("header_ok", pa.bool_()),
])


def parse_png_header(payload: bytes) -> tuple[int, int] | None:
    """PNG signature + IHDR chunk → (width, height); None when not PNG.
    Layout: 8-byte signature, 4-byte chunk length, b'IHDR', then
    width/height as big-endian uint32 (PNG spec §5.2/11.2.2)."""
    if (len(payload) < 24 or not payload.startswith(PNG_SIG)
            or payload[12:16] != b"IHDR"):
        return None
    w, h = struct.unpack(">II", payload[16:24])
    return int(w), int(h)


def parse_gif_header(payload: bytes) -> tuple[int, int] | None:
    """GIF87a/GIF89a logical-screen descriptor → (width, height);
    little-endian uint16 at bytes 6..10 (GIF spec §17-18)."""
    if len(payload) < 10 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    w, h = struct.unpack("<HH", payload[6:10])
    return int(w), int(h)


def make_gif(width: int, height: int, seed: int = 0,
             body_bytes: int = 64) -> bytes:
    """A structurally valid GIF89a prefix (header + logical screen
    descriptor) over noise body — real header, fake pixel data."""
    rng = np.random.default_rng(seed)
    body = rng.integers(0, 256, size=body_bytes, dtype=np.uint8).tobytes()
    return (b"GIF89a" + struct.pack("<HH", width, height)
            + b"\xf7\x00\x00" + body + b"\x3b")


def parse_wav_header(payload: bytes) -> dict | None:
    """RIFF/WAVE chunk walk → sample_rate / channels / bit depth /
    duration_ms (data bytes ÷ byte rate); None when not a WAV."""
    if (len(payload) < 28 or payload[:4] != b"RIFF"
            or payload[8:12] != b"WAVE"):
        return None
    off, fmt, data_size = 12, None, None
    while off + 8 <= len(payload):
        cid = payload[off:off + 4]
        size = struct.unpack("<I", payload[off + 4:off + 8])[0]
        if cid == b"fmt " and off + 24 <= len(payload):
            _afmt, ch, sr, br, _ba, bits = struct.unpack(
                "<HHIIHH", payload[off + 8:off + 24])
            fmt = (int(ch), int(sr), int(br), int(bits))
        elif cid == b"data":
            data_size = size
        off += 8 + size + (size & 1)   # chunks are word-aligned
    if fmt is None:
        return None
    ch, sr, br, bits = fmt
    # data_size == 0 is a VALID empty data chunk (0 ms), distinct from a
    # missing data chunk (data_size is None → unknown duration)
    dur = (int(data_size * 1000 // br)
           if (data_size is not None and br) else -1)
    return {"sample_rate": sr, "n_channels": ch,
            "bits_per_sample": bits, "duration_ms": dur}


def probe_media_headers(batch: pa.Table) -> pa.Table:
    """Stateless ``map_batches`` stage: real header metadata from the
    payload bytes (no codec libraries involved — container headers only).
    Unknown/unparsable containers get -1 fields and ``header_ok=False``
    rather than an error (quarantine-style, M12)."""
    out = {n: [] for n in MEDIA_HEADER_SCHEMA.names}
    ids = batch.column("media_id").to_pylist()
    kinds = batch.column("kind").to_pylist()
    mimes = batch.column("mime").to_pylist()
    payloads = batch.column("payload").to_pylist()
    for i, kind, mime, payload in zip(ids, kinds, mimes, payloads):
        payload = payload or b""
        w = h = sr = ch = bits = dur = -1
        ok = False
        img = parse_png_header(payload) or parse_gif_header(payload)
        if img is not None:
            w, h = img
            ok = True
        else:
            wav = parse_wav_header(payload)
            if wav is not None:
                sr, ch = wav["sample_rate"], wav["n_channels"]
                bits, dur = wav["bits_per_sample"], wav["duration_ms"]
                ok = True
        for k, v in (("media_id", i), ("kind", kind), ("mime", mime),
                     ("width", w), ("height", h), ("sample_rate", sr),
                     ("n_channels", ch), ("bits_per_sample", bits),
                     ("duration_ms", dur), ("header_ok", ok)):
            out[k].append(v)
    return pa.Table.from_pydict(out, schema=MEDIA_HEADER_SCHEMA)


def extract_media_headers(ds, media_batch_size: int = 64):
    """media table → real header-metadata table (stateless, streaming)."""
    return ds.map_batches(probe_media_headers, batch_format="pyarrow",
                          batch_size=media_batch_size)


def make_png(width: int, height: int, seed: int = 0,
             body_bytes: int = 128) -> bytes:
    """A structurally valid PNG container (signature + IHDR + one junk
    ancillary chunk + IEND) — real header, fake pixels."""
    rng = np.random.default_rng(seed)

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    body = rng.integers(0, 256, size=body_bytes, dtype=np.uint8).tobytes()
    return (PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", body)
            + chunk(b"IEND", b""))


def make_wav(sample_rate: int = 8000, n_channels: int = 1,
             bits: int = 16, n_data_bytes: int = 8000,
             seed: int = 0) -> bytes:
    """A structurally valid PCM WAV container — real RIFF/fmt/data
    headers, noise samples."""
    rng = np.random.default_rng(seed)
    block_align = n_channels * bits // 8
    byte_rate = sample_rate * block_align
    fmt = struct.pack("<HHIIHH", 1, n_channels, sample_rate, byte_rate,
                      block_align, bits)
    data = rng.integers(0, 256, size=n_data_bytes, dtype=np.uint8).tobytes()
    riff_size = 4 + (8 + len(fmt)) + (8 + len(data))
    return (b"RIFF" + struct.pack("<I", riff_size) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


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
    """Deterministic media fixture. Image/audio payloads are REAL PNG/WAV
    containers (parseable headers, noise bodies) so the header-probe stage
    exercises genuine byte parsing; video stays an opaque stand-in (no
    stdlib MP4 writer — that decode remains honestly stubbed)."""
    rows = []
    for p in _media_params(n, seed):
        if p["kind"] == "image":
            payload = (make_gif(p["width"], p["height"], seed=p["payload_seed"])
                       if p["mime"] == "image/gif" else
                       make_png(p["width"], p["height"], seed=p["payload_seed"]))
        elif p["kind"] == "audio":
            payload = make_wav(p["sample_rate"], 1, 16, p["n_data_bytes"],
                               seed=p["payload_seed"])
        else:
            payload = p["video_body"]
        rows.append({
            "media_id": p["media_id"], "kind": p["kind"], "payload": payload,
            "mime": p["mime"], "width": p["width"], "height": p["height"],
            "duration_ms": p["duration_ms"],
        })
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


def _media_params(n: int, seed: int) -> list[dict]:
    """The fixture's parameter draws, separated from container encoding so
    ``expected_media_headers`` can state what the byte parsers MUST recover
    without ever touching the payloads."""
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        p = {"media_id": i, "kind": kind, "payload_seed": seed * 100003 + i,
             "mime": {"image": "image/png", "audio": "audio/wav",
                      "video": "video/mp4"}[kind],
             "width": -1, "height": -1, "sample_rate": -1,
             "n_data_bytes": -1, "duration_ms": -1, "video_body": b""}
        if kind == "image":
            p["width"] = int(rng.integers(8, 256))
            p["height"] = int(rng.integers(8, 256))
            if (i // 3) % 2:               # alternate PNG / GIF containers
                p["mime"] = "image/gif"
        elif kind == "audio":
            sr = int(rng.choice([8000, 16000, 44100]))
            nb = int(rng.integers(2000, 32000)) * 2
            p.update(sample_rate=sr, n_data_bytes=nb,
                     duration_ms=nb * 1000 // (sr * 2))
        else:
            p["video_body"] = rng.integers(
                0, 256, size=int(rng.integers(64, 512)),
                dtype=np.uint8).tobytes()
            p["duration_ms"] = int(rng.integers(1000, 10000))
        out.append(p)
    return out


def expected_media_headers(n: int, seed: int = 5) -> pa.Table:
    """The header table ``probe_media_headers`` MUST produce for
    ``synthetic_media_table(n, seed)``, derived from the generator's
    *parameter draws* only — never from the payload bytes. The probe, by
    contrast, reads ONLY the bytes, so comparing the two verifies the full
    encode→binary→parse roundtrip. This is what backs the driver-checkable
    literal-VALUES SQL oracle for the ``media_headers`` query."""
    rows = []
    for p in _media_params(n, seed):
        audio = p["kind"] == "audio"
        rows.append({
            "media_id": p["media_id"], "kind": p["kind"], "mime": p["mime"],
            "width": p["width"], "height": p["height"],
            # WAV fixture is always mono 16-bit PCM; the parser's duration
            # (data bytes*1000 // byte rate) equals the drawn duration_ms
            "sample_rate": p["sample_rate"] if audio else -1,
            "n_channels": 1 if audio else -1,
            "bits_per_sample": 16 if audio else -1,
            "duration_ms": p["duration_ms"] if audio else -1,
            # video payloads are opaque noise → header probe must refuse
            "header_ok": p["kind"] in ("image", "audio"),
        })
    return pa.Table.from_pylist(rows, schema=MEDIA_HEADER_SCHEMA)
