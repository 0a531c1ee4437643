"""Text preprocessor (optional cleanup before extraction).

Reimplements ``DocumentPreprocessor::prepare``
(/root/reference/anno/src/ingest/preprocessor.rs:41-129): zero-width strip,
CRLF/CR -> LF, whitespace-run collapse preserving single newlines and double
newlines (paragraph breaks), final trim.
"""

from __future__ import annotations

from .html import RUST_WHITESPACE

_ZERO_WIDTH = {"​", "‌", "‍", "﻿"}
_WS = frozenset(RUST_WHITESPACE)


def prepare(
    text: str,
    clean_whitespace: bool = True,
    normalize_unicode: bool = True,
) -> str:
    processed = text
    if normalize_unicode:
        processed = "".join(c for c in processed if c not in _ZERO_WIDTH)

    if clean_whitespace:
        processed = processed.replace("\r\n", "\n").replace("\r", "\n")
        cleaned: list[str] = []
        last_was_space = False
        for ch in processed:
            if ch in _WS:
                if not last_was_space:
                    cleaned.append("\n" if ch == "\n" else " ")
                    last_was_space = True
                elif ch == "\n" and (not cleaned or cleaned[-1] != "\n"):
                    cleaned.append("\n")  # preserve paragraph breaks
            else:
                cleaned.append(ch)
                last_was_space = False
        processed = "".join(cleaned).strip(RUST_WHITESPACE)

    return processed
