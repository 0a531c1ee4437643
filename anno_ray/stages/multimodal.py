"""Multimodal column processing: images/audio/video as opaque binary + metadata.

The Ray-side plumbing (schemas, actor-pool signatures, small batch sizes for
large payloads, typed metadata columns) is real and tested. Codecs come in
two tiers:

- REAL (``core/media_codecs.py``, pure numpy/stdlib): binary PPM (P6) and
  uncompressed 24/32-bit BMP decode, bilinear resize + PPM re-encode, real
  image features (channel stats + 3x3 layout grid + gradient energy),
  RIFF/WAVE PCM decode via stdlib ``wave``, and a standard numpy MFCC chain
  (Hann -> power spectrum -> mel filterbank -> log -> DCT-II). Any payload
  that sniffs as one of these formats decodes for real with ``fake=False``.
- GATED: compressed formats (JPEG/PNG/MP3/MP4...) need codec libraries not
  present in this container and raise ``NotImplementedError`` unless
  ``fake=True``, in which case a deterministic payload-hash fake keeps the
  pipeline shape exercisable end to end (and keeps goldens stable).

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

    PPM/BMP payloads decode for real (core/media_codecs.py); compressed
    formats need a codec library (PIL/opencv) plugged into ``decode_impl``
    and are gated behind ``fake=True`` in this container.
    """

    def __init__(self, feature_dim: int = 16, fake: bool = False):
        # actor init: in production this loads codec + feature model ONCE
        self.feature_dim = feature_dim
        self.fake = fake

    def decode_impl(self, payload: bytes) -> tuple[int, int, int, np.ndarray]:
        # fake=True always takes the stand-in (bit-stable goldens); the real
        # path decodes ppm/bmp and gates everything else.
        if self.fake:
            h = hashlib.blake2b(payload, digest_size=16).digest()
            rng = np.random.RandomState(int.from_bytes(h[:4], "big"))
            height = 64 + int.from_bytes(h[4:6], "big") % 1024
            width = 64 + int.from_bytes(h[6:8], "big") % 1024
            feats = rng.randn(self.feature_dim).astype(np.float32)
            return height, width, 3, feats
        from ..core import media_codecs as mc

        fmt = mc.sniff_format(payload)
        if fmt == "ppm":
            img = mc.decode_ppm(payload)
        elif fmt == "bmp":
            img = mc.decode_bmp(payload)
        else:
            raise NotImplementedError(
                "compressed-image decoding requires an image library not "
                "present in this container (PPM/BMP decode for real); "
                "construct DecodeImage(fake=True) for the deterministic "
                "stand-in"
            )
        feats = mc.image_features(img, self.feature_dim)
        return img.shape[0], img.shape[1], img.shape[2], feats

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


def synthetic_real_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic media rows whose payloads are REAL decodable formats:
    PPM (i % 3 == 1), BMP (i % 3 == 2), 16-bit PCM WAV (i % 3 == 0)."""
    import json

    from ..core import media_codecs as mc

    rng = np.random.RandomState(seed)
    kinds, payloads, mimes, metas = [], [], [], []
    for i in range(n):
        m = i % 3
        if m == 0:
            sr = 8000
            dur = 0.25 + float(rng.randint(1, 8)) / 4.0
            t = np.arange(int(sr * dur)) / sr
            freq = float(rng.randint(100, 2000))
            sig = (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
            kinds.append("audio")
            payloads.append(mc.encode_wav(sig, sr))
            mimes.append("audio/wav")
            metas.append(json.dumps({"duration_sec": dur, "freq_hz": freq}))
        else:
            h = int(rng.randint(8, 96))
            w = int(rng.randint(8, 96))
            img = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
            kinds.append("image")
            payloads.append(mc.encode_ppm(img) if m == 1 else mc.encode_bmp(img))
            mimes.append("image/x-portable-pixmap" if m == 1 else "image/bmp")
            metas.append(json.dumps({"height": h, "width": w}))
    return pa.table(
        {
            "media_id": pa.array(list(range(n)), pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(mimes, pa.string()),
            "meta": pa.array(metas, pa.string()),
        }
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
        if self.fake:
            h, w, _c, _f = self._decoder.decode_impl(payload)
            scale = min(1.0, self.max_side / max(h, w))
            nh, nw = max(1, int(h * scale)), max(1, int(w * scale))
            out = hashlib.blake2b(
                payload + f"{nh}x{nw}".encode(), digest_size=32
            ).digest()
            return nh, nw, out
        from ..core import media_codecs as mc

        fmt = mc.sniff_format(payload)
        if fmt == "ppm":
            img = mc.decode_ppm(payload)
        elif fmt == "bmp":
            img = mc.decode_bmp(payload)
        else:
            raise NotImplementedError(
                "compressed-image resizing requires an image library not "
                "present in this container (PPM/BMP resize for real); "
                "construct ResizeImage(fake=True)"
            )
        h, w = img.shape[:2]
        scale = min(1.0, self.max_side / max(h, w))
        nh, nw = max(1, int(h * scale)), max(1, int(w * scale))
        resized = mc.resize_bilinear(img, nh, nw)
        return nh, nw, mc.encode_ppm(resized)

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
        if self.fake:
            import json

            duration = float(json.loads(meta or "{}").get("duration_sec", 1.0))
            n_frames = max(1, int(duration / self.hop_sec))
            h = hashlib.blake2b(payload, digest_size=8).digest()
            rng = np.random.RandomState(int.from_bytes(h[:4], "big"))
            return [
                rng.randn(self.n_mfcc).astype(np.float32) for _ in range(n_frames)
            ]
        from ..core import media_codecs as mc

        if mc.sniff_format(payload) != "wav":
            raise NotImplementedError(
                "compressed-audio decoding requires an audio library not "
                "present in this container (RIFF/WAVE PCM decodes for real "
                "via stdlib wave); construct AudioFeatures(fake=True)"
            )
        signal, sr = mc.decode_wav(payload)
        coeffs = mc.mfcc(
            signal, sr, n_mfcc=self.n_mfcc, hop_sec=self.hop_sec
        )
        return list(coeffs)

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
