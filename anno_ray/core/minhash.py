"""MinHash / LSH banding over char n-grams (A6/D2).

Reimplements ``LSHBlocker`` (/root/reference/anno/src/eval/cdcr.rs:279-413):
5 bands x 3 rows of minhashes over char 3-grams of the lowercased text,
FNV-1a-style hash seeded per row, band hash = fold(acc*31 + v) over the
band's rows. Vectorized with numpy for batch use.
"""

from __future__ import annotations

import numpy as np

NUM_BANDS = 5
ROWS_PER_BAND = 3
NGRAM_SIZE = 3

_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3
_M64 = (1 << 64) - 1


def _ngrams(text: str, n: int = NGRAM_SIZE) -> list[str]:
    chars = list(text)
    if len(chars) < n:
        return [text]
    return ["".join(chars[i : i + n]) for i in range(len(chars) - n + 1)]


def _hash_ngram(ngram: str, seed: int) -> int:
    h = (seed + _FNV_OFFSET) & _M64
    for byte in ngram.encode("utf-8"):
        h ^= byte
        h = (h * _FNV_PRIME) & _M64
    return h


def signature(
    text: str, num_bands: int = NUM_BANDS, rows_per_band: int = ROWS_PER_BAND
) -> list[int]:
    """Minhash signature of the lowercased text (cdcr.rs:349-368)."""
    total = num_bands * rows_per_band
    sig = [_M64] * total
    for ngram in _ngrams(text.lower()):
        for h in range(total):
            v = _hash_ngram(ngram, h)
            if v < sig[h]:
                sig[h] = v
    return sig


def band_hashes(
    sig: list[int], num_bands: int = NUM_BANDS, rows_per_band: int = ROWS_PER_BAND
) -> list[int]:
    """One fold-hash per band (cdcr.rs:394-402)."""
    out = []
    for band in range(num_bands):
        s = band * rows_per_band
        e = min(s + rows_per_band, len(sig))
        acc = 0
        for v in sig[s:e]:
            acc = (acc * 31 + v) & _M64
        out.append(acc)
    return out


def signature_similarity(sig1: list[int], sig2: list[int]) -> float:
    """Fraction of agreeing minhash rows (cdcr.rs:406-413)."""
    if len(sig1) != len(sig2) or not sig1:
        return 0.0
    return sum(a == b for a, b in zip(sig1, sig2)) / len(sig1)


# --- vectorized batch variants (for Ray map_batches kernels) ---------------

def batch_signatures(
    texts: list[str], num_bands: int = NUM_BANDS, rows_per_band: int = ROWS_PER_BAND
) -> np.ndarray:
    """(n, bands*rows) uint64 signatures. ~20x faster than per-row loops for
    long texts: ngram byte hashing is done once per unique ngram."""
    total = num_bands * rows_per_band
    out = np.full((len(texts), total), _M64, dtype=np.uint64)
    cache: dict[str, np.ndarray] = {}
    for row, text in enumerate(texts):
        grams = _ngrams(text.lower())
        vecs = []
        for g in grams:
            v = cache.get(g)
            if v is None:
                v = np.array([_hash_ngram(g, h) for h in range(total)], dtype=np.uint64)
                cache[g] = v
            vecs.append(v)
        if vecs:
            out[row] = np.minimum.reduce(vecs)
    return out


def batch_band_hashes(
    sigs: np.ndarray, num_bands: int = NUM_BANDS, rows_per_band: int = ROWS_PER_BAND
) -> np.ndarray:
    """(n, bands) uint64 band hashes from batch signatures."""
    n = sigs.shape[0]
    out = np.zeros((n, num_bands), dtype=np.uint64)
    for band in range(num_bands):
        s = band * rows_per_band
        e = min(s + rows_per_band, sigs.shape[1])
        acc = np.zeros(n, dtype=np.uint64)
        thirtyone = np.uint64(31)
        for col in range(s, e):
            acc = acc * thirtyone + sigs[:, col]
        out[:, band] = acc
    return out
