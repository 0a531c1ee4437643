"""Surface normalization + similarity scalar functions.

- ``normalize_entity_name``: lowercase + trim — the canonicalization shuffle
  key (anno-cli/src/main.rs:2490-2492).
- ``string_similarity``: exact(1.0) -> substring(0.8) -> word-Jaccard
  (/root/reference/anno/src/similarity.rs:37-92).
- ``jaccard_similarity``: pure word-set Jaccard, the coalesce variant
  (/root/reference/coalesce/src/resolver.rs:241-261).
- ``embedding_similarity``: cosine normalized to [0,1] via (cos+1)/2
  (resolver.rs:280-296).
"""

from __future__ import annotations

import math

from .html import RUST_WHITESPACE


def normalize_entity_name(name: str) -> str:
    return name.lower().strip(RUST_WHITESPACE)


def jaccard_similarity(a: str, b: str) -> float:
    wa = set(a.split())
    wb = set(b.split())
    if not wa and not wb:
        return 1.0
    if not wa or not wb:
        return 0.0
    union = len(wa | wb)
    return len(wa & wb) / union if union else 0.0


def string_similarity(a: str, b: str) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    al, bl = a.lower(), b.lower()
    if al == bl:
        return 1.0
    if bl in al or al in bl:
        return 0.8
    return jaccard_similarity(al, bl)


def embedding_similarity(a, b) -> float:
    if len(a) != len(b) or len(a) == 0:
        return 0.0
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(y * y for y in b))
    if na == 0.0 or nb == 0.0:
        return 0.0
    return (dot / (na * nb) + 1.0) / 2.0
