"""Negation + quantifier context detectors (P6/P7).

Reimplements ``is_negated`` / ``detect_quantifier``
(/root/reference/anno-cli/src/main.rs:2031-2080): scan the (whitespace-split)
words of the text before the entity's char start; negation if any of the last
3 words is a negation word; quantifier from the immediately preceding word.
"""

from __future__ import annotations

NEGATION_WORDS = frozenset([
    "not", "no", "never", "none", "neither", "nor", "without", "isn't",
    "aren't", "wasn't", "weren't", "don't", "doesn't", "didn't", "won't",
    "wouldn't", "couldn't", "shouldn't",
])

_UNIVERSAL = frozenset(["every", "all", "each", "any"])
_EXISTENTIAL = frozenset(["some", "certain", "a", "an"])
_NONE = frozenset(["no", "none"])
_DEFINITE = frozenset(["the", "this", "that", "these", "those"])


def is_negated(text: str, entity_start: int) -> bool:
    words = text[:entity_start].split()
    return any(w.lower() in NEGATION_WORDS for w in words[-3:])


def detect_quantifier(text: str, entity_start: int) -> str:
    words = text[:entity_start].split()
    if not words:
        return ""
    w = words[-1].lower()
    if w in _UNIVERSAL:
        return "universal"
    if w in _EXISTENTIAL:
        return "existential"
    if w in _NONE:
        return "none"
    if w in _DEFINITE:
        return "definite"
    return ""
