"""Multimodal column processing: images/audio/video as opaque binary + metadata.

The Ray-side plumbing (schemas, actor-pool signatures, small batch sizes for
large payloads, typed metadata columns) is real and tested; the codec work is
STUBBED because no image/audio libraries ship in this container:

- ``DecodeImage.decode_impl`` raises ``NotImplementedError`` unless
  ``fake=True``, in which case a deterministic fake decoder (seeded from the
  payload hash) produces (height, width, channels) + a feature vector so the
  pipeline shape can be exercised end to end.

Design notes for 100 TB: binary payloads dominate block size -> use small
``batch_size`` (default 8) so batch x concurrency fits worker heaps; decode
state (codec contexts, models) loads once per actor in ``__init__``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..ray_utils import register_for_ray

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),       # "image" | "audio" | "video"
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("meta", pa.string()),       # JSON metadata
    ]
)

IMAGE_FEATURES_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("height", pa.int32()),
        ("width", pa.int32()),
        ("channels", pa.int32()),
        ("features", pa.list_(pa.float32())),
    ]
)


class DecodeImage:
    """Actor-pool stage: binary payload -> dims + feature vector.

    Real decoders (PIL/opencv) plug into ``decode_impl``; the deterministic
    fake keeps schema/plumbing testable in this container.
    """

    def __init__(self, feature_dim: int = 16, fake: bool = False):
        # actor init: in production this loads codec + feature model ONCE
        self.feature_dim = feature_dim
        self.fake = fake

    def decode_impl(self, payload: bytes) -> tuple[int, int, int, np.ndarray]:
        if not self.fake:
            raise NotImplementedError(
                "image decoding requires an image library not present in this "
                "container; construct DecodeImage(fake=True) for the "
                "deterministic stand-in"
            )
        h = hashlib.blake2b(payload, digest_size=16).digest()
        rng = np.random.RandomState(int.from_bytes(h[:4], "big"))
        height = 64 + int.from_bytes(h[4:6], "big") % 1024
        width = 64 + int.from_bytes(h[6:8], "big") % 1024
        feats = rng.randn(self.feature_dim).astype(np.float32)
        return height, width, 3, feats

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        hs, ws, cs, fs = [], [], [], []
        for p in payloads:
            h, w, c, f = self.decode_impl(p or b"")
            hs.append(h); ws.append(w); cs.append(c); fs.append(f.tolist())
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "height": pa.array(hs, pa.int32()),
                "width": pa.array(ws, pa.int32()),
                "channels": pa.array(cs, pa.int32()),
                "features": pa.array(fs, pa.list_(pa.float32())),
            }
        )


def decode_images(
    ds, *, concurrency=(1, 4), batch_size: int = 8, fake: bool = False
):
    """media Dataset -> image feature Dataset (actor pool, small batches)."""
    register_for_ray()
    return ds.map_batches(
        DecodeImage,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class SampleFrames:
    """Video frame-sampling stage (stub): emits every Nth frame offset from
    the metadata; real impl would demux the container."""

    def __init__(self, every_n: int = 30, fake: bool = False):
        self.every_n = every_n
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        import json

        ids = batch.column("media_id").to_pylist()
        metas = batch.column("meta").to_pylist()
        out_id, out_frame = [], []
        for mid, meta in zip(ids, metas):
            if not self.fake:
                raise NotImplementedError(
                    "video demuxing requires a media library; use fake=True"
                )
            n_frames = int(json.loads(meta or "{}").get("n_frames", 0))
            for f in range(0, n_frames, self.every_n):
                out_id.append(mid)
                out_frame.append(f)
        return pa.table(
            {
                "media_id": pa.array(out_id, pa.int64()),
                "frame_idx": pa.array(out_frame, pa.int64()),
            }
        )


def sample_frames(ds, *, every_n: int = 30, concurrency=(1, 4), fake: bool = False):
    register_for_ray()
    return ds.map_batches(
        SampleFrames,
        fn_constructor_kwargs={"every_n": every_n, "fake": fake},
        batch_format="pyarrow",
        batch_size=4,
        concurrency=concurrency,
    )


def synthetic_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media rows for tests/benches."""
    import json

    rng = np.random.RandomState(seed)
    rows = {
        "media_id": list(range(n)),
        "kind": ["image" if i % 3 else "video" for i in range(n)],
        "payload": [rng.bytes(256) for _ in range(n)],
        "mime": ["image/fake" if i % 3 else "video/fake" for i in range(n)],
        "meta": [json.dumps({"n_frames": int(rng.randint(30, 300))}) for _ in range(n)],
    }
    return pa.table(
        {name: pa.array(rows[name], MEDIA_SCHEMA.field(name).type) for name in MEDIA_SCHEMA.names}
    )


class ResizeImage:
    """Image resize stage (actor pool): payload -> resized payload + dims.

    Real impl plugs PIL/opencv into ``resize_impl`` (loaded once per actor);
    the deterministic fake preserves aspect ratio against the fake-decoded
    dims and emits a payload-hash-derived stand-in payload so downstream
    schema/size behavior is exercised."""

    def __init__(self, max_side: int = 256, fake: bool = False):
        self.max_side = max_side
        self.fake = fake
        self._decoder = DecodeImage(fake=fake)

    def resize_impl(self, payload: bytes) -> tuple[int, int, bytes]:
        if not self.fake:
            raise NotImplementedError(
                "image resizing requires an image library not present in "
                "this container; construct ResizeImage(fake=True)"
            )
        h, w, _c, _f = self._decoder.decode_impl(payload)
        scale = min(1.0, self.max_side / max(h, w))
        nh, nw = max(1, int(h * scale)), max(1, int(w * scale))
        out = hashlib.blake2b(
            payload + f"{nh}x{nw}".encode(), digest_size=32
        ).digest()
        return nh, nw, out

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        hs, ws, outs = [], [], []
        for p in payloads:
            nh, nw, out = self.resize_impl(p or b"")
            hs.append(nh); ws.append(nw); outs.append(out)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "height": pa.array(hs, pa.int32()),
                "width": pa.array(ws, pa.int32()),
                "payload": pa.array(outs, pa.binary()),
            }
        )


def resize_images(
    ds, *, max_side: int = 256, concurrency=(1, 4), batch_size: int = 8,
    fake: bool = False,
):
    register_for_ray()
    return ds.map_batches(
        ResizeImage,
        fn_constructor_kwargs={"max_side": max_side, "fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class AudioFeatures:
    """Audio feature-extraction stage (actor pool): payload -> frame-level
    MFCC-like vectors. Real impl loads the codec + feature extractor once per
    actor; the deterministic fake derives duration from metadata and seeds
    per-frame vectors from the payload hash."""

    def __init__(self, n_mfcc: int = 13, hop_sec: float = 0.5, fake: bool = False):
        self.n_mfcc = n_mfcc
        self.hop_sec = hop_sec
        self.fake = fake

    def features_impl(self, payload: bytes, meta: str) -> list[np.ndarray]:
        if not self.fake:
            raise NotImplementedError(
                "audio decoding requires an audio library not present in "
                "this container; construct AudioFeatures(fake=True)"
            )
        import json

        duration = float(json.loads(meta or "{}").get("duration_sec", 1.0))
        n_frames = max(1, int(duration / self.hop_sec))
        h = hashlib.blake2b(payload, digest_size=8).digest()
        rng = np.random.RandomState(int.from_bytes(h[:4], "big"))
        return [rng.randn(self.n_mfcc).astype(np.float32) for _ in range(n_frames)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        metas = (
            batch.column("meta").to_pylist()
            if "meta" in batch.column_names
            else [""] * len(ids)
        )
        out_id, out_frame, out_feat = [], [], []
        for mid, p, meta in zip(ids, payloads, metas):
            for k, feat in enumerate(self.features_impl(p or b"", meta)):
                out_id.append(mid)
                out_frame.append(k)
                out_feat.append(feat.tolist())
        return pa.table(
            {
                "media_id": pa.array(out_id, pa.int64()),
                "frame_idx": pa.array(out_frame, pa.int64()),
                "mfcc": pa.array(out_feat, pa.list_(pa.float32())),
            }
        )


def audio_features(
    ds, *, n_mfcc: int = 13, hop_sec: float = 0.5, concurrency=(1, 4),
    batch_size: int = 8, fake: bool = False,
):
    register_for_ray()
    return ds.map_batches(
        AudioFeatures,
        fn_constructor_kwargs={
            "n_mfcc": n_mfcc, "hop_sec": hop_sec, "fake": fake,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
