"""Real media codecs (core/media_codecs.py) + the fake=False decode paths of
the multimodal stages. PPM/BMP/WAV are real formats decoded with pure
numpy/stdlib; compressed formats stay container-gated."""

from __future__ import annotations

import numpy as np
import pytest

from anno_ray.core import media_codecs as mc


def _img(h=5, w=7, seed=0):
    return np.random.RandomState(seed).randint(0, 256, (h, w, 3)).astype(np.uint8)


# --- sniff -------------------------------------------------------------------

def test_sniff_format():
    assert mc.sniff_format(mc.encode_ppm(_img())) == "ppm"
    assert mc.sniff_format(mc.encode_bmp(_img())) == "bmp"
    assert mc.sniff_format(mc.encode_wav(np.zeros(10, np.float32), 8000)) == "wav"
    assert mc.sniff_format(b"\xff\xd8\xff\xe0 jpeg") is None
    assert mc.sniff_format(b"") is None
    # RIFF but not WAVE (e.g. AVI) must not sniff as wav
    assert mc.sniff_format(b"RIFF\x00\x00\x00\x00AVI ") is None


# --- PPM ---------------------------------------------------------------------

def test_ppm_round_trip():
    img = _img(11, 3)
    assert np.array_equal(mc.decode_ppm(mc.encode_ppm(img)), img)


def test_ppm_comments_and_whitespace():
    img = _img(2, 2, seed=1)
    raw = b"P6 # trailing comment\n# full line comment\n 2\t2\n255\n" + img.tobytes()
    assert np.array_equal(mc.decode_ppm(raw), img)


def test_ppm_truncated_raises():
    raw = mc.encode_ppm(_img(4, 4))[:-5]
    with pytest.raises(ValueError, match="truncated"):
        mc.decode_ppm(raw)


# --- BMP ---------------------------------------------------------------------

def test_bmp_round_trip():
    img = _img(6, 5, seed=2)  # width 5 -> 15-byte rows, 1 pad byte: exercises stride
    assert np.array_equal(mc.decode_bmp(mc.encode_bmp(img)), img)


def test_bmp_known_pixels():
    # 1x2 image: red then blue; BMP stores bottom-up BGR
    img = np.array([[[255, 0, 0], [0, 0, 255]]], np.uint8)
    out = mc.decode_bmp(mc.encode_bmp(img))
    assert out[0, 0].tolist() == [255, 0, 0]
    assert out[0, 1].tolist() == [0, 0, 255]


def test_bmp_compressed_rejected():
    payload = bytearray(mc.encode_bmp(_img()))
    payload[30] = 1  # compression = BI_RLE8
    with pytest.raises(ValueError, match="uncompressed"):
        mc.decode_bmp(bytes(payload))


# --- resize ------------------------------------------------------------------

def test_resize_identity_and_constant():
    img = _img(8, 8, seed=3)
    assert np.array_equal(mc.resize_bilinear(img, 8, 8), img)
    const = np.full((9, 13, 3), 77, np.uint8)
    assert (mc.resize_bilinear(const, 4, 5) == 77).all()


def test_resize_downscale_average():
    # 2x2 blocks of (0, 255) average to ~128 under half-pixel bilinear
    img = np.zeros((4, 4, 3), np.uint8)
    img[::2] = 0
    img[1::2] = 255
    out = mc.resize_bilinear(img, 2, 2)
    assert np.abs(out.astype(int) - 128).max() <= 1


def test_resize_preserves_gradient_monotonicity():
    col = np.linspace(0, 255, 16).astype(np.uint8)
    img = np.repeat(col[None, :, None], 4, axis=0)
    img = np.repeat(img, 3, axis=2)
    out = mc.resize_bilinear(img, 4, 8).astype(int)
    row = out[1, :, 0]
    assert (np.diff(row) >= 0).all() and row[-1] > row[0]


# --- image features ----------------------------------------------------------

def test_image_features_deterministic_and_meaningful():
    img = _img(32, 32, seed=4)
    f1 = mc.image_features(img, 16)
    f2 = mc.image_features(img.copy(), 16)
    assert f1.shape == (16,) and f1.dtype == np.float32
    assert np.array_equal(f1, f2)
    # channel means are real: a pure-red image has mean_r=1, mean_g=0
    red = np.zeros((4, 4, 3), np.uint8)
    red[:, :, 0] = 255
    fr = mc.image_features(red, 16)
    assert fr[0] == pytest.approx(1.0) and fr[1] == pytest.approx(0.0)


# --- WAV ---------------------------------------------------------------------

def test_wav_round_trip_sine():
    sr = 8000
    t = np.arange(sr // 2) / sr
    sig = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    out, out_sr = mc.decode_wav(mc.encode_wav(sig, sr))
    assert out_sr == sr and out.shape == sig.shape
    assert np.abs(out - sig).max() < 1.0 / 32000  # 16-bit quantization only


def test_wav_8bit_and_stereo_downmix():
    import io
    import wave

    sr = 4000
    left = np.full(100, 100, np.int16)
    right = np.full(100, -100, np.int16)
    inter = np.empty(200, np.int16)
    inter[0::2], inter[1::2] = left, right
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(sr)
        wf.writeframes(inter.astype("<i2").tobytes())
    out, out_sr = mc.decode_wav(buf.getvalue())
    assert out_sr == sr and out.shape == (100,)
    assert np.abs(out).max() < 1e-6  # L/R cancel in the mean downmix


# --- MFCC --------------------------------------------------------------------

def test_mfcc_shape_and_determinism():
    sr = 8000
    t = np.arange(sr) / sr  # 1 second
    sig = np.sin(2 * np.pi * 300 * t).astype(np.float32)
    m1 = mc.mfcc(sig, sr, n_mfcc=13, hop_sec=0.25)
    m2 = mc.mfcc(sig.copy(), sr, n_mfcc=13, hop_sec=0.25)
    assert m1.shape == (4, 13) and m1.dtype == np.float32
    assert np.array_equal(m1, m2)


def test_mfcc_distinguishes_tone_from_silence():
    sr = 8000
    sig = np.sin(2 * np.pi * 500 * np.arange(sr) / sr).astype(np.float32)
    silence = np.zeros(sr, np.float32)
    m_tone = mc.mfcc(sig, sr)[0]
    m_sil = mc.mfcc(silence, sr)[0]
    # c0 ~ total log energy: tone must carry far more than digital silence
    assert m_tone[0] > m_sil[0] + 10


def test_mfcc_empty_signal():
    out = mc.mfcc(np.array([], np.float32), 8000)
    assert out.shape == (1, 13) and np.isfinite(out).all()


# --- stages with fake=False over real payloads -------------------------------

def test_decode_stage_real_payloads(ray_session):
    import ray

    from anno_ray.stages.multimodal import (
        decode_images,
        synthetic_real_media_table,
    )

    tbl = synthetic_real_media_table(30, seed=7)
    images = tbl.filter(
        np.isin(np.array(tbl.column("kind")), ["image"])
    )
    ds = ray.data.from_arrow(images)
    out = decode_images(ds, fake=False, concurrency=2).to_arrow_refs()
    import pyarrow as pa

    got = pa.concat_tables([ray.get(r) for r in out]).sort_by("media_id")
    assert got.num_rows == images.num_rows
    # dims must equal the true encoded dims from the metadata
    import json

    meta = {m: json.loads(s) for m, s in zip(
        images.column("media_id").to_pylist(), images.column("meta").to_pylist())}
    for mid, h, w in zip(got.column("media_id").to_pylist(),
                         got.column("height").to_pylist(),
                         got.column("width").to_pylist()):
        assert h == meta[mid]["height"] and w == meta[mid]["width"]


def test_resize_stage_real_payloads(ray_session):
    import ray

    from anno_ray.core import media_codecs
    from anno_ray.stages.multimodal import (
        resize_images,
        synthetic_real_media_table,
    )

    tbl = synthetic_real_media_table(12, seed=8)
    images = tbl.filter(np.isin(np.array(tbl.column("kind")), ["image"]))
    ds = ray.data.from_arrow(images)
    res = resize_images(ds, max_side=16, fake=False).take_all()
    assert len(res) == images.num_rows
    for row in res:
        assert max(row["height"], row["width"]) <= 16
        # output payload is a decodable PPM with the claimed dims
        img = media_codecs.decode_ppm(row["payload"])
        assert img.shape[:2] == (row["height"], row["width"])


def test_audio_stage_real_payloads(ray_session):
    import json

    import ray

    from anno_ray.stages.multimodal import (
        audio_features,
        synthetic_real_media_table,
    )

    tbl = synthetic_real_media_table(12, seed=9)
    audio = tbl.filter(np.isin(np.array(tbl.column("kind")), ["audio"]))
    ds = ray.data.from_arrow(audio)
    res = audio_features(ds, hop_sec=0.25, fake=False).take_all()
    per_id: dict[int, int] = {}
    for row in res:
        assert len(row["mfcc"]) == 13
        per_id[row["media_id"]] = per_id.get(row["media_id"], 0) + 1
    # frame count tracks true duration: ceil-ish duration/hop frames
    for mid, meta_s in zip(audio.column("media_id").to_pylist(),
                           audio.column("meta").to_pylist()):
        dur = json.loads(meta_s)["duration_sec"]
        expected = max(1, 1 + int((dur * 8000 - 1) // (0.25 * 8000)))
        assert per_id[mid] == expected


def test_unsupported_format_still_gated():
    from anno_ray.stages.multimodal import AudioFeatures, DecodeImage

    with pytest.raises(NotImplementedError):
        DecodeImage(fake=False).decode_impl(b"\x89PNG\r\n\x1a\n...")
    with pytest.raises(NotImplementedError):
        AudioFeatures(fake=False).features_impl(b"ID3\x03mp3data", "{}")


# --- property-based round-trip laws ------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra import numpy as hnp


@st.composite
def _images(draw):
    h = draw(st.integers(1, 24))
    w = draw(st.integers(1, 24))
    return draw(hnp.arrays(np.uint8, (h, w, 3)))


@settings(max_examples=40, deadline=None)
@given(_images())
def test_ppm_round_trip_property(img):
    assert np.array_equal(mc.decode_ppm(mc.encode_ppm(img)), img)


@settings(max_examples=40, deadline=None)
@given(_images())
def test_bmp_round_trip_property(img):
    assert np.array_equal(mc.decode_bmp(mc.encode_bmp(img)), img)


@settings(max_examples=25, deadline=None)
@given(_images(), st.integers(1, 30), st.integers(1, 30))
def test_resize_bounds_property(img, oh, ow):
    out = mc.resize_bilinear(img, oh, ow)
    assert out.shape == (oh, ow, 3) and out.dtype == np.uint8
    # bilinear output stays inside the source value range per channel
    for c in range(3):
        assert out[:, :, c].min() >= img[:, :, c].min()
        assert out[:, :, c].max() <= img[:, :, c].max()


@settings(max_examples=25, deadline=None)
@given(
    hnp.arrays(
        np.float32,
        st.integers(0, 4000),
        elements=st.floats(-1.0, 1.0, width=32),
    ),
    st.sampled_from([4000, 8000, 16000]),
)
def test_wav_round_trip_property(sig, sr):
    out, out_sr = mc.decode_wav(mc.encode_wav(sig, sr))
    assert out_sr == sr and out.shape == sig.shape
    if sig.size:
        assert np.abs(out - sig).max() <= 1.5 / 32768  # 16-bit quantization


@settings(max_examples=15, deadline=None)
@given(
    hnp.arrays(
        np.float32,
        st.integers(0, 6000),
        elements=st.floats(-1.0, 1.0, width=32),
    ),
)
def test_mfcc_always_finite_property(sig):
    out = mc.mfcc(sig, 8000, hop_sec=0.25)
    assert out.ndim == 2 and out.shape[1] == 13
    assert np.isfinite(out).all()
