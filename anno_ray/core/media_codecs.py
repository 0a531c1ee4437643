"""Pure-numpy / stdlib media codecs for the multimodal stages.

No image/audio *libraries* ship in this container, but several standard
formats need none: binary PPM (P6) and uncompressed 24/32-bit BMP are plain
headers over raw pixel rows, and RIFF/WAVE PCM decodes with the stdlib
``wave`` module. MFCC is ordinary DSP (Hann window -> power spectrum -> mel
filterbank -> log -> DCT-II), implementable exactly with numpy's rfft.

These are the REAL decode paths for ``stages/multimodal.py``: a payload that
sniffs as ppm/bmp/wav is decoded for real; compressed formats (JPEG/PNG/
MP3/...) remain container-gated behind ``NotImplementedError``.

Reference scope note: the reference repo has no media pipeline at all --
this module exists for the LLM-training-data operator set (multimodal
columns) the graft adds beyond reference parity.
"""

from __future__ import annotations

import io
import struct

import numpy as np

# --- sniffing ----------------------------------------------------------------


def sniff_format(payload: bytes) -> str | None:
    """Identify a decodable payload: 'ppm' | 'bmp' | 'wav' | None."""
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    return None


# --- PPM (P6, binary, maxval <= 255) -----------------------------------------


def decode_ppm(payload: bytes) -> np.ndarray:
    """P6 PPM -> (H, W, 3) uint8. Handles comments and any whitespace runs."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header = magic + 3 whitespace-separated ints, '#' comments to EOL
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # exactly one whitespace byte after maxval, then raster
    width, height, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    n = width * height * 3
    raster = payload[pos : pos + n]
    if len(raster) != n:
        raise ValueError(f"PPM raster truncated: {len(raster)} != {n}")
    return np.frombuffer(raster, np.uint8).reshape(height, width, 3).copy()


def encode_ppm(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 -> P6 PPM bytes (the resize stage's output payload)."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_ppm expects (H, W, 3) uint8")
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


# --- BMP (BITMAPINFOHEADER, uncompressed 24/32-bit BI_RGB) --------------------


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BMP -> (H, W, 3) uint8 (RGB).

    BMP stores BGR(A) rows padded to 4 bytes, bottom-up unless height is
    negative (top-down).
    """
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    header_size = struct.unpack_from("<I", payload, 14)[0]
    if header_size < 40:
        raise ValueError("BITMAPCOREHEADER BMP not supported")
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"only uncompressed 24/32-bit BMP (got {bpp}bpp, "
                         f"compression={compression})")
    top_down = height < 0
    height = abs(height)
    nch = bpp // 8
    stride = (width * nch + 3) & ~3
    rows = np.frombuffer(
        payload, np.uint8, count=stride * height, offset=data_offset
    ).reshape(height, stride)
    img = rows[:, : width * nch].reshape(height, width, nch)
    if not top_down:
        img = img[::-1]
    return img[:, :, 2::-1].copy()  # BGR(A) -> RGB, alpha dropped


def encode_bmp(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> 24-bit bottom-up BMP (for tests/round-trips)."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_bmp expects (H, W, 3) uint8")
    h, w = arr.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    raster = rows.tobytes()
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(raster), 0, 0, 54
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 2835, 2835, 0, 0)
    return header + raster


# --- resize ------------------------------------------------------------------


def resize_bilinear(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """(H, W, C) uint8 -> (out_h, out_w, C) uint8, bilinear, edge-clamped.

    Uses the half-pixel-center source mapping (align_corners=False), the
    convention shared by PIL/opencv/TF, so a real library drop-in agrees.
    """
    h, w = arr.shape[:2]
    if (out_h, out_w) == (h, w):
        return arr.copy()
    src = arr.astype(np.float32)
    ys = (np.arange(out_h, dtype=np.float32) + 0.5) * (h / out_h) - 0.5
    xs = (np.arange(out_w, dtype=np.float32) + 0.5) * (w / out_w) - 0.5
    y0 = np.clip(np.floor(ys), 0, h - 1).astype(np.int64)
    x0 = np.clip(np.floor(xs), 0, w - 1).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    top = src[y0][:, x0] * (1 - wx) + src[y0][:, x1] * wx
    bot = src[y1][:, x0] * (1 - wx) + src[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def image_features(img: np.ndarray, feature_dim: int = 16) -> np.ndarray:
    """Deterministic real features from a decoded image: per-channel mean/std,
    3x3 grayscale grid means (coarse layout), gradient energy. Padded or
    truncated to ``feature_dim`` float32 values in [0, 1]-ish range."""
    f = np.asarray(img, np.float32) / 255.0
    gray = f.mean(axis=2)
    h, w = gray.shape
    feats = [f[:, :, c].mean() for c in range(f.shape[2])]
    feats += [f[:, :, c].std() for c in range(f.shape[2])]
    hb = np.linspace(0, h, 4).astype(np.int64)
    wb = np.linspace(0, w, 4).astype(np.int64)
    for i in range(3):
        for j in range(3):
            cell = gray[hb[i] : max(hb[i + 1], hb[i] + 1),
                        wb[j] : max(wb[j + 1], wb[j] + 1)]
            feats.append(cell.mean() if cell.size else 0.0)
    gy = np.abs(np.diff(gray, axis=0)).mean() if h > 1 else 0.0
    gx = np.abs(np.diff(gray, axis=1)).mean() if w > 1 else 0.0
    feats += [gy, gx]
    out = np.asarray(feats, np.float32)
    if out.size < feature_dim:
        out = np.pad(out, (0, feature_dim - out.size))
    return out[:feature_dim]


# --- WAV / MFCC --------------------------------------------------------------


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM -> (mono float32 in [-1, 1], sample_rate).

    stdlib ``wave`` handles the chunk parsing; 8-bit (unsigned), 16- and
    32-bit (signed) PCM supported, channels mean-downmixed.
    """
    import wave

    with wave.open(io.BytesIO(payload), "rb") as wf:
        n_ch = wf.getnchannels()
        sampwidth = wf.getsampwidth()
        sr = wf.getframerate()
        raw = wf.readframes(wf.getnframes())
    if sampwidth == 1:
        x = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    elif sampwidth == 2:
        x = np.frombuffer(raw, "<i2").astype(np.float32) / 32768.0
    elif sampwidth == 4:
        x = np.frombuffer(raw, "<i4").astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"unsupported PCM sample width {sampwidth}")
    if n_ch > 1:
        x = x.reshape(-1, n_ch).mean(axis=1)
    return x, sr


def encode_wav(signal: np.ndarray, sr: int) -> bytes:
    """Mono float32 [-1, 1] -> 16-bit PCM WAV bytes (for tests/fixtures)."""
    import wave

    pcm = np.clip(np.rint(signal * 32767.0), -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sr)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


def _mel_filterbank(n_mels: int, n_fft: int, sr: int) -> np.ndarray:
    """Triangular mel filterbank (n_mels, n_fft//2 + 1), HTK mel scale."""
    def hz_to_mel(hz):
        return 2595.0 * np.log10(1.0 + np.asarray(hz, np.float64) / 700.0)

    def mel_to_hz(mel):
        return 700.0 * (10.0 ** (np.asarray(mel, np.float64) / 2595.0) - 1.0)

    mel_pts = np.linspace(hz_to_mel(0.0), hz_to_mel(sr / 2.0), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)
    bins = np.floor((n_fft + 1) * hz_pts / sr).astype(np.int64)
    fb = np.zeros((n_mels, n_fft // 2 + 1), np.float64)
    for m in range(1, n_mels + 1):
        lo, c, hi = bins[m - 1], bins[m], bins[m + 1]
        for k in range(lo, c):
            if c > lo:
                fb[m - 1, k] = (k - lo) / (c - lo)
        for k in range(c, hi):
            if hi > c:
                fb[m - 1, k] = (hi - k) / (hi - c)
    return fb


def _dct_ii_ortho(n_out: int, n_in: int) -> np.ndarray:
    """Orthonormal DCT-II matrix rows (n_out, n_in) — scipy-free."""
    k = np.arange(n_out)[:, None].astype(np.float64)
    n = np.arange(n_in)[None, :].astype(np.float64)
    mat = np.cos(np.pi * k * (2 * n + 1) / (2 * n_in))
    mat *= np.sqrt(2.0 / n_in)
    mat[0] *= np.sqrt(0.5)
    return mat


def mfcc(
    signal: np.ndarray,
    sr: int,
    *,
    n_mfcc: int = 13,
    frame_sec: float = 0.025,
    hop_sec: float = 0.5,
    n_mels: int = 26,
) -> np.ndarray:
    """Frame-level MFCCs (n_frames, n_mfcc) float32.

    Standard chain: Hann-windowed frames -> |rfft|^2 -> mel filterbank ->
    log -> orthonormal DCT-II, first ``n_mfcc`` coefficients. Frames start
    every ``hop_sec``; a trailing partial frame is zero-padded. Empty or
    too-short signals produce one zero-padded frame.
    """
    frame_len = max(2, int(round(sr * frame_sec)))
    hop_len = max(1, int(round(sr * hop_sec)))
    if signal.size == 0:
        signal = np.zeros(frame_len, np.float32)
    n_frames = max(1, 1 + (len(signal) - 1) // hop_len)
    frames = np.zeros((n_frames, frame_len), np.float64)
    for i in range(n_frames):
        seg = signal[i * hop_len : i * hop_len + frame_len]
        frames[i, : len(seg)] = seg
    frames *= np.hanning(frame_len)[None, :]
    power = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    fb = _mel_filterbank(n_mels, frame_len, sr)
    mel_energy = power @ fb.T
    log_mel = np.log(mel_energy + 1e-10)
    coeffs = log_mel @ _dct_ii_ortho(n_mfcc, n_mels).T
    return coeffs.astype(np.float32)
