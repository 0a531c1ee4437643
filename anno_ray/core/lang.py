"""Unicode-script language detection.

Reimplements ``detect_language`` (/root/reference/anno/src/lang.rs:54-120):
count alphabetic chars per script with weighted diacritic hints; argmax with
earliest-index tie-break; Chinese reclassified as Japanese when any kana seen.
Quirks preserved: Spanish 'é' is credited to French (match-arm order), and
'¿'/'¡' never count (filtered by the is_alphabetic guard).
"""

from __future__ import annotations

LANGS = [
    "en", "de", "fr", "es", "it", "pt", "ru", "zh", "ja", "ko", "ar", "he", "other",
]
_EN, _DE, _FR, _ES, _IT, _PT, _RU, _ZH, _JA, _KO, _AR, _HE, _OTHER = range(13)

_GERMAN = set("ßäöüÄÖÜ")
_FRENCH = set("àâçéèêëîïôûù")
_SPANISH = set("ñáíóú")  # é handled by the French arm first; ¿¡ not alphabetic


def detect_language(text: str) -> str:
    # ASCII fast path: only the generic-Latin (EN) bucket can score, and the
    # zero-alpha fallback is also "en"
    if text.isascii():
        return "en"
    counts = [0] * 13
    total = 0
    for c in text:
        if not c.isalpha():
            continue
        total += 1
        o = ord(c)
        if 0x4E00 <= o <= 0x9FFF:
            counts[_ZH] += 1
        elif 0x3040 <= o <= 0x30FF:
            counts[_JA] += 1
        elif 0xAC00 <= o <= 0xD7AF:
            counts[_KO] += 1
        elif 0x0600 <= o <= 0x06FF:
            counts[_AR] += 1
        elif 0x0590 <= o <= 0x05FF:
            counts[_HE] += 1
        elif 0x0400 <= o <= 0x04FF:
            counts[_RU] += 1
        elif ("a" <= c <= "z") or ("A" <= c <= "Z"):
            counts[_EN] += 1
        elif c in _GERMAN:
            counts[_DE] += 10
        elif c in _FRENCH:
            counts[_FR] += 5
        elif c in _SPANISH:
            counts[_ES] += 5

    if total == 0:
        return "en"

    max_idx = 0
    max_val = 0
    for i, v in enumerate(counts):
        if v > max_val:
            max_val = v
            max_idx = i

    if max_idx == _ZH and counts[_JA] > 0:
        return "ja"
    return LANGS[max_idx]
