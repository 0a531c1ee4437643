"""Text analysis operators for training-data pipelines.

- ``language_id``      — the reference's script-count heuristic (lang.py);
- ``quality_scores``   — length / punctuation / stopword-ratio features +
                         composite score;
- ``token_counts``     — whitespace tokens + a BPE-ish subword estimate
                         (word-piece regex);
- ``fingerprints``     — 64-bit rolling (polynomial) hash of the normalized
                         text + first/last 256-char prefixes for container
                         matching.

All kernels vectorize where Arrow kernels exist and keep the per-row Python
work branch-light; stateless -> plain map_batches tasks.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..core.lang import detect_language
from ..ray_utils import register_for_ray

_STOPWORDS = frozenset(
    "the a an and or but if of to in on at by for from with as is are was were "
    "be been it this that these those he she they we you i not no do does did "
    "have has had will would can could so than then there here when what who".split()
)

_WORD_RE = re.compile(r"\S+")
# BPE-ish segmentation: alnum runs split from punctuation, ~GPT-2 pre-tokens
_SUBWORD_RE = re.compile(r"[A-Za-z]+|[0-9]{1,3}|[^\sA-Za-z0-9]")
_PUNCT_RE = re.compile(r"[^\w\s]", re.UNICODE)


def language_id(ds, *, text_col: str = "text"):
    """Append detected_lang via the reference heuristic (lang.rs:54-120)."""
    register_for_ray()

    def kernel(b: pa.Table) -> pa.Table:
        texts = b.column(text_col).to_pylist()
        return b.append_column(
            "detected_lang", pa.array([detect_language(t or "") for t in texts], pa.string())
        )

    return ds.map_batches(kernel, batch_format="pyarrow")


def token_count(text: str) -> int:
    return len(_WORD_RE.findall(text))


def subword_count(text: str) -> int:
    return len(_SUBWORD_RE.findall(text))


def token_counts(ds, *, text_col: str = "text"):
    register_for_ray()

    def kernel(b: pa.Table) -> pa.Table:
        texts = [t or "" for t in b.column(text_col).to_pylist()]
        b = b.append_column(
            "n_tokens", pa.array([token_count(t) for t in texts], pa.int64())
        )
        return b.append_column(
            "n_subwords", pa.array([subword_count(t) for t in texts], pa.int64())
        )

    return ds.map_batches(kernel, batch_format="pyarrow")


def quality_features(text: str) -> tuple[int, float, float, float, float]:
    """(n_chars, punct_ratio, stopword_ratio, mean_word_len, score)."""
    n_chars = len(text)
    if n_chars == 0:
        return (0, 0.0, 0.0, 0.0, 0.0)
    words = text.split()
    n_words = len(words)
    n_punct = len(_PUNCT_RE.findall(text))
    punct_ratio = n_punct / n_chars
    stop = sum(1 for w in words if w.lower().strip(".,!?;:'\"") in _STOPWORDS)
    stopword_ratio = stop / n_words if n_words else 0.0
    mean_word_len = sum(len(w) for w in words) / n_words if n_words else 0.0
    # composite: prefer mid-length docs, some stopwords (real prose), sane
    # punctuation density, word lengths 3-10
    length_score = min(1.0, n_words / 50.0) * (1.0 if n_words < 5000 else 0.5)
    stop_score = min(1.0, stopword_ratio / 0.25)
    punct_score = 1.0 if punct_ratio < 0.2 else max(0.0, 1.0 - (punct_ratio - 0.2) * 4)
    wl_score = 1.0 if 3.0 <= mean_word_len <= 10.0 else 0.5
    score = round(0.35 * length_score + 0.3 * stop_score + 0.2 * punct_score + 0.15 * wl_score, 4)
    return (n_chars, round(punct_ratio, 4), round(stopword_ratio, 4), round(mean_word_len, 4), score)


def quality_scores(ds, *, text_col: str = "text"):
    register_for_ray()

    def kernel(b: pa.Table) -> pa.Table:
        texts = [t or "" for t in b.column(text_col).to_pylist()]
        feats = [quality_features(t) for t in texts]
        b = b.append_column("punct_ratio", pa.array([f[1] for f in feats], pa.float64()))
        b = b.append_column("stopword_ratio", pa.array([f[2] for f in feats], pa.float64()))
        b = b.append_column("mean_word_len", pa.array([f[3] for f in feats], pa.float64()))
        return b.append_column("quality_score", pa.array([f[4] for f in feats], pa.float64()))

    return ds.map_batches(kernel, batch_format="pyarrow")


_POLY_BASE = 1000003
_M64 = (1 << 64) - 1


def rolling_fingerprint(text: str) -> int:
    """64-bit polynomial rolling hash of the whitespace-normalized text."""
    h = 0
    for b in " ".join(text.split()).encode("utf-8"):
        h = (h * _POLY_BASE + b) & _M64
    return h


def fingerprints(ds, *, text_col: str = "text"):
    register_for_ray()

    def kernel(b: pa.Table) -> pa.Table:
        texts = [t or "" for t in b.column(text_col).to_pylist()]
        b = b.append_column(
            "fingerprint", pa.array([rolling_fingerprint(t) for t in texts], pa.uint64())
        )
        b = b.append_column("head", pa.array([t[:256] for t in texts], pa.string()))
        return b.append_column("tail", pa.array([t[-256:] for t in texts], pa.string()))

    return ds.map_batches(kernel, batch_format="pyarrow")
