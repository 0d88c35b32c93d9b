"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by actor-pool ``map_batches`` stages.

The decode kernels themselves are STUBBED (no image/audio libraries in
this environment): real codecs are gated behind import-try and raise
``NotImplementedError`` when absent, while a deterministic fake format
("KMM1") keeps the Ray-side plumbing — schema, batch sizing, actor
signature, output layout — real and testable.  The fake payload is::

    b"KMM1" | kind:u8 (0=image 1=audio 2=video) | width:u16 | height:u16 |
    channels:u8 | n_frames:u16 | payload bytes (blake2-derived)

At 100 TB scale these payloads dominate block size, so the stages use
small ``batch_size`` defaults and drop the binary column as soon as the
features are extracted (same policy as the flagship pipeline's ``html``
column, SURVEY.md §7.6 "wide records").
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

MAGIC = b"KMM1"
KIND_IMAGE, KIND_AUDIO, KIND_VIDEO = 0, 1, 2
KIND_NAMES = {KIND_IMAGE: "image", KIND_AUDIO: "audio", KIND_VIDEO: "video"}
N_FEATURES = 8

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),
        ("payload", pa.binary()),
    ]
)

FEATURE_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("channels", pa.int32()),
        ("n_frames", pa.int32()),
        ("n_bytes", pa.int64()),
        ("features", pa.list_(pa.float32(), N_FEATURES)),
    ]
)


def fake_media_payload(media_id: int, kind: int) -> bytes:
    """Deterministic fake payload; header fields derive from the low 8
    md5 bytes (little-endian == DuckDB ``md5_number_lower``) so the
    media-census queries carry exact SQL oracles."""
    v = struct.unpack(
        "<Q", hashlib.md5(f"media:{media_id}:{kind}".encode()).digest()[8:]
    )[0]
    b = [(v >> (8 * i)) & 0xFF for i in range(5)]
    width = 16 + b[0] % 240
    height = 16 + b[1] % 240
    channels = 1 + b[2] % 3 if kind == KIND_IMAGE else (1 if kind == KIND_AUDIO else 3)
    n_frames = 1 if kind == KIND_IMAGE else 2 + b[3] % 30
    body_len = 64 + b[4] % 192
    seed = hashlib.blake2b(f"mediabody:{media_id}:{kind}".encode(), digest_size=32).digest()
    body = (seed * ((body_len // 32) + 1))[:body_len]
    return MAGIC + struct.pack("<BHHBH", kind, width, height, channels, n_frames) + body


def synth_media_table(doc_ids: list[int]) -> pa.Table:
    """documents -> media rows (one per doc, kind cycles by id)."""
    kinds = [d % 3 for d in doc_ids]
    return pa.table(
        {
            "media_id": pa.array(doc_ids, pa.int64()),
            "media_type": pa.array([KIND_NAMES[k] for k in kinds], pa.string()),
            "payload": pa.array(
                [fake_media_payload(d, k) for d, k in zip(doc_ids, kinds)], pa.binary()
            ),
        }
    )


def _decode_fake(payload: bytes) -> tuple[int, int, int, int, bytes]:
    kind, width, height, channels, n_frames = struct.unpack("<BHHBH", payload[4:12])
    return kind, width, height, channels, n_frames, payload[12:]


class MediaFeatureExtractor:
    """Actor-pool stage: decode + fixed-size feature vector per item.

    Real decoders load once per actor in ``__init__`` (the actor-pool
    contract); absent libraries leave ``self.real_codecs = None`` and any
    non-fake payload raises ``NotImplementedError`` — a clearly-marked
    stub, not silent garbage.
    """

    def __init__(self, frame_stride: int = 4):
        self.frame_stride = frame_stride
        try:  # pragma: no cover - not installed in this environment
            import PIL.Image  # noqa: F401

            self.real_codecs = {"image": PIL.Image}
        except ImportError:
            self.real_codecs = None

    def _features(self, body: bytes) -> list[float]:
        arr = np.frombuffer(body, dtype=np.uint8).astype(np.float32)
        pad = (-len(arr)) % N_FEATURES
        if pad:
            arr = np.pad(arr, (0, pad))
        return (arr.reshape(-1, N_FEATURES).mean(axis=0) / 255.0).tolist()

    def _decode_real_image(self, payload: bytes):
        """PIL decode for real image payloads (activates on any host with
        Pillow installed; exercised in CI through a stub-PIL module,
        tests/test_import_try_branches.py).  Features = an
        ``N_FEATURES``-cell mean-luma strip — a coarse perceptual
        fingerprint that is deterministic for a given decoder."""
        import io

        Image = self.real_codecs["image"]
        img = Image.open(io.BytesIO(payload))
        width, height = img.size
        channels = len(img.getbands())
        n_frames = int(getattr(img, "n_frames", 1))
        strip = np.asarray(img.convert("L").resize((N_FEATURES, 1)),
                           dtype=np.float32).reshape(-1)
        feats = (strip[:N_FEATURES] / 255.0).tolist()
        return int(width), int(height), int(channels), n_frames, feats

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {k: [] for k in FEATURE_SCHEMA.names}
        for row in batch.to_pylist():
            payload = row["payload"]
            if not payload.startswith(MAGIC):
                if self.real_codecs is not None and row["media_type"] == "image":
                    width, height, channels, n_frames, feats = \
                        self._decode_real_image(payload)
                    out["media_id"].append(row["media_id"])
                    out["media_type"].append(row["media_type"])
                    out["width"].append(width)
                    out["height"].append(height)
                    out["channels"].append(channels)
                    out["n_frames"].append(n_frames)
                    out["n_bytes"].append(len(payload))
                    out["features"].append(feats)
                    continue
                raise NotImplementedError(
                    "real media decode for this payload requires an "
                    "image/audio library not present in this environment "
                    "(only the KMM1 fake format — and, with Pillow "
                    "installed, real images — are decodable)"
                )
            kind, width, height, channels, n_frames, body = _decode_fake(payload)
            if kind == KIND_VIDEO:
                # frame sampling: keep every ``frame_stride``-th frame
                n_frames = (n_frames + self.frame_stride - 1) // self.frame_stride
            out["media_id"].append(row["media_id"])
            out["media_type"].append(row["media_type"])
            out["width"].append(width)
            out["height"].append(height)
            out["channels"].append(channels)
            out["n_frames"].append(n_frames)
            out["n_bytes"].append(len(payload))
            out["features"].append(self._features(body))
        return pa.Table.from_pydict(out, schema=FEATURE_SCHEMA)


class MediaResizePlan:
    """Stateless resize planner: target dims preserving aspect ratio,
    longest side clamped to ``max_side`` (the shape of a thumbnailing
    stage; the pixel resample itself is part of the stubbed codec)."""

    def __init__(self, max_side: int = 64):
        self.max_side = max_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = batch.column("width").to_numpy()
        h = batch.column("height").to_numpy()
        scale = np.minimum(1.0, self.max_side / np.maximum(w, h))
        return batch.append_column(
            "target_width", pa.array(np.maximum(1, np.round(w * scale)).astype(np.int32))
        ).append_column(
            "target_height", pa.array(np.maximum(1, np.round(h * scale)).astype(np.int32))
        )


def media_feature_stage(ds, batch_size: int = 64, concurrency: int = 4,
                        frame_stride: int = 4):
    """Attach the decode/feature stage (small batches: binary payloads)."""
    return ds.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={"frame_stride": frame_stride},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
