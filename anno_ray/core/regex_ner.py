"""RegexNER: structured-entity extraction via 24 fixed patterns.

Faithful reimplementation of ``RegexNER::extract_entities``
(/root/reference/anno/src/backends/regex.rs:67-396):

- the 24 patterns run in a fixed order (EN dates, i18n dates, times, money,
  percent, email, url, phones, @mention, #hashtag);
- first-claim-wins: a match is dropped if its span overlaps ANY already
  accepted entity (regex.rs:399-401);
- offsets are CHARACTER offsets (Python ``re`` over ``str`` yields these
  directly; the reference converts byte->char with SpanConverter);
- result sorted by start (regex.rs:368).

Patterns are compiled once at import (module-level), i.e. once per Ray worker
process — the analog of the reference's ``Lazy<Regex>`` statics.
"""

from __future__ import annotations

import re

from .types import Mention

# --- pattern table: (name, compiled_regex). Source: regex.rs:67-215 ---------

def _c(p: str) -> re.Pattern[str]:
    return re.compile(p)


_MONTHS_FULL = r"January|February|March|April|May|June|July|August|September|October|November|December"
_MONTHS_SHORT = r"Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Sept|Oct|Nov|Dec"

DATE_PATTERNS_EN: list[tuple[str, re.Pattern[str]]] = [
    ("DATE_ISO", _c(r"\b\d{4}-\d{2}-\d{2}\b")),
    ("DATE_US", _c(r"\b\d{1,2}/\d{1,2}/\d{2,4}\b")),
    ("DATE_EU", _c(r"\b\d{1,2}\.\d{1,2}\.\d{2,4}\b")),
    ("DATE_WRITTEN_FULL", _c(r"(?i)\b(?:%s)\s+\d{1,2}(?:st|nd|rd|th)?(?:,?\s*\d{4})?\b" % _MONTHS_FULL)),
    ("DATE_WRITTEN_SHORT", _c(r"(?i)\b(?:%s)\.?\s+\d{1,2}(?:st|nd|rd|th)?(?:,?\s*\d{4})?\b" % _MONTHS_SHORT)),
    ("DATE_WRITTEN_EU", _c(r"(?i)\b\d{1,2}(?:st|nd|rd|th)?\s+(?:%s|%s)\.?(?:\s+\d{4})?\b" % (_MONTHS_FULL, _MONTHS_SHORT))),
]

DATE_PATTERNS_I18N: list[tuple[str, re.Pattern[str]]] = [
    ("DATE_JAPANESE", _c(r"\d{4}年\d{1,2}月\d{1,2}日")),
    ("DATE_KOREAN", _c(r"\d{4}년\s*\d{1,2}월\s*\d{1,2}일")),
    ("DATE_GERMAN_FULL", _c(r"(?i)\b(?:Januar|Februar|März|April|Mai|Juni|Juli|August|September|Oktober|November|Dezember)\s+\d{1,2}(?:\.)?(?:,?\s*\d{4})?\b")),
    ("DATE_GERMAN_EU", _c(r"(?i)\b\d{1,2}\.?\s+(?:Januar|Februar|März|April|Mai|Juni|Juli|August|September|Oktober|November|Dezember)(?:\s+\d{4})?\b")),
    ("DATE_FRENCH_FULL", _c(r"(?i)\b(?:janvier|février|fevrier|mars|avril|mai|juin|juillet|août|aout|septembre|octobre|novembre|décembre|decembre)\s+\d{1,2}(?:,?\s*\d{4})?\b")),
    ("DATE_FRENCH_EU", _c(r"(?i)\b\d{1,2}(?:er)?\s+(?:janvier|février|fevrier|mars|avril|mai|juin|juillet|août|aout|septembre|octobre|novembre|décembre|decembre)(?:\s+\d{4})?\b")),
    ("DATE_SPANISH_EU", _c(r"(?i)\b\d{1,2}\s+(?:de\s+)?(?:enero|febrero|marzo|abril|mayo|junio|julio|agosto|septiembre|octubre|noviembre|diciembre)(?:\s+(?:de\s+)?\d{4})?\b")),
    ("DATE_ITALIAN_EU", _c(r"(?i)\b\d{1,2}\s+(?:gennaio|febbraio|marzo|aprile|maggio|giugno|luglio|agosto|settembre|ottobre|novembre|dicembre)(?:\s+\d{4})?\b")),
    ("DATE_PORTUGUESE_EU", _c(r"(?i)\b\d{1,2}\s+(?:de\s+)?(?:janeiro|fevereiro|março|marco|abril|maio|junho|julho|agosto|setembro|outubro|novembro|dezembro)(?:\s+(?:de\s+)?\d{4})?\b")),
    ("DATE_DUTCH_EU", _c(r"(?i)\b\d{1,2}\s+(?:januari|februari|maart|april|mei|juni|juli|augustus|september|oktober|november|december)(?:\s+\d{4})?\b")),
    ("DATE_RUSSIAN_EU", _c(r"\b\d{1,2}\s+(?:января|февраля|марта|апреля|мая|июня|июля|августа|сентября|октября|ноября|декабря)(?:\s+\d{4})?\b")),
]

TIME_PATTERNS: list[tuple[str, re.Pattern[str]]] = [
    ("TIME_12H", _c(r"(?i)\b\d{1,2}:\d{2}(?::\d{2})?\s*(?:am|pm|a\.m\.|p\.m\.)\b")),
    ("TIME_24H", _c(r"\b(?:[01]?\d|2[0-3]):[0-5]\d(?::[0-5]\d)?\b")),
    ("TIME_SIMPLE", _c(r"(?i)\b\d{1,2}\s*(?:am\b|pm\b|a\.m\.|p\.m\.)")),
]

MONEY_PATTERNS: list[tuple[str, re.Pattern[str]]] = [
    ("MONEY_SYMBOL", _c(r"[$€£¥][\d,]+(?:\.\d{1,2})?(?:\s*(?:billion|million|thousand|B|M|K|bn|mn))?")),
    ("MONEY_WRITTEN", _c(r"(?i)\b\d+(?:,\d{3})*(?:\.\d{1,2})?\s*(?:dollars?|USD|euros?|EUR|pounds?|GBP|yen|JPY)\b")),
    ("MONEY_MAGNITUDE", _c(r"(?i)\b\d+(?:\.\d+)?\s*(?:billion|million|trillion)\s*(?:dollars?|euros?|pounds?)?\b")),
]

PERCENT_PATTERN = _c(r"\b\d+(?:\.\d+)?\s*(?:%|percent\b|pct\b)")
EMAIL_PATTERN = _c(r"\b[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}\b")
URL_PATTERN = _c(r"(?i)\bhttps?://[^\s<>\[\]{}|\\^`\x00-\x1f]+")

PHONE_PATTERNS: list[tuple[str, re.Pattern[str]]] = [
    ("PHONE_US", _c(r"(?:\+?1[-.\s]?)?\(?\d{3}\)?[-.\s]?\d{3}[-.\s]?\d{4}\b")),
    ("PHONE_INTL", _c(r"\+\d{1,3}[-.\s]?\d{1,4}[-.\s]?\d{1,4}[-.\s]?\d{1,9}\b")),
]

MENTION_PATTERN = _c(r"\B@[\w](?:[\w.]*[\w])?")
HASHTAG_PATTERN = _c(r"\B#\w+")


_DIGIT_RE = re.compile(r"\d")
_HTTP_RE = re.compile(r"(?i)http")

# --- lexical-cue gates: NECESSARY substrings per pattern ---------------------
# A pattern is skipped when NONE of its cue substrings occur in the
# lowercased text. Each cue set is a necessary condition read off the
# pattern literal (a DATE_ISO match must contain '-', a MONEY_MAGNITUDE
# match must contain 'illion', ...), so gating cannot change results —
# it only skips regex scans that provably cannot match. Substring `in`
# checks run at C memchr speed, ~10x cheaper than an re scan of the same
# text, and typical prose triggers only a handful of the 23 digit-gated
# patterns.
_CUES: dict[str, tuple[str, ...]] = {
    "DATE_ISO": ("-",),
    "DATE_US": ("/",),
    "DATE_EU": (".",),
    "DATE_WRITTEN_FULL": (
        "january", "february", "march", "april", "may", "june", "july",
        "august", "september", "october", "november", "december",
    ),
    "DATE_WRITTEN_SHORT": (
        "jan", "feb", "mar", "apr", "may", "jun", "jul", "aug", "sep",
        "oct", "nov", "dec",
    ),
    "DATE_WRITTEN_EU": (
        "jan", "feb", "mar", "apr", "may", "jun", "jul", "aug", "sep",
        "oct", "nov", "dec",  # short forms are substrings of the full ones
    ),
    "DATE_JAPANESE": ("年",),
    "DATE_KOREAN": ("년",),
    "DATE_GERMAN_FULL": (
        "januar", "februar", "märz", "april", "mai", "juni", "juli",
        "august", "september", "oktober", "november", "dezember",
    ),
    "DATE_GERMAN_EU": (
        "januar", "februar", "märz", "april", "mai", "juni", "juli",
        "august", "september", "oktober", "november", "dezember",
    ),
    "DATE_FRENCH_FULL": (
        "janvier", "février", "fevrier", "mars", "avril", "mai", "juin",
        "juillet", "août", "aout", "septembre", "octobre", "novembre",
        "décembre", "decembre",
    ),
    "DATE_FRENCH_EU": (
        "janvier", "février", "fevrier", "mars", "avril", "mai", "juin",
        "juillet", "août", "aout", "septembre", "octobre", "novembre",
        "décembre", "decembre",
    ),
    "DATE_SPANISH_EU": (
        "enero", "febrero", "marzo", "abril", "mayo", "junio", "julio",
        "agosto", "septiembre", "octubre", "noviembre", "diciembre",
    ),
    "DATE_ITALIAN_EU": (
        "gennaio", "febbraio", "marzo", "aprile", "maggio", "giugno",
        "luglio", "agosto", "settembre", "ottobre", "novembre", "dicembre",
    ),
    "DATE_PORTUGUESE_EU": (
        "janeiro", "fevereiro", "março", "marco", "abril", "maio", "junho",
        "julho", "agosto", "setembro", "outubro", "novembro", "dezembro",
    ),
    "DATE_DUTCH_EU": (
        "januari", "februari", "maart", "april", "mei", "juni", "juli",
        "augustus", "september", "oktober", "november", "december",
    ),
    "DATE_RUSSIAN_EU": (
        "января", "февраля", "марта", "апреля", "мая", "июня", "июля",
        "августа", "сентября", "октября", "ноября", "декабря",
    ),
    "TIME_12H": (":",),
    "TIME_24H": (":",),
    "TIME_SIMPLE": ("am", "pm", "a.m", "p.m"),
    "MONEY_SYMBOL": ("$", "€", "£", "¥"),
    "MONEY_WRITTEN": ("dollar", "usd", "eur", "pound", "gbp", "yen", "jpy"),
    "MONEY_MAGNITUDE": ("illion",),
    "PERCENT": ("%", "percent", "pct"),
    "PHONE_US": (),  # digit gate only (no distinguishing literal)
    "PHONE_INTL": ("+",),
}


def extract(text: str) -> list[Mention]:
    """Run all patterns in fixed order with first-claim-wins overlap rules.

    Cheap prechecks skip whole pattern families that cannot match (every
    date/time/money/percent/phone pattern requires a digit; email/mention
    need '@'; urls need 'http'; hashtags need '#'), and per-pattern lexical
    cues (_CUES) skip individual scans whose necessary substring is absent
    — identical results, large constant-factor win on typical prose."""
    entities: list[Mention] = []
    spans: list[tuple[int, int]] = []  # accepted spans, same order
    has_digit = _DIGIT_RE.search(text) is not None
    has_at = "@" in text
    has_hash = "#" in text
    has_http = _HTTP_RE.search(text) is not None

    def add(m: re.Match[str], label: str, conf: float, pattern: str) -> None:
        s, e = m.start(), m.end()
        for (es, ee) in spans:
            if not (e <= es or s >= ee):
                return  # overlaps an earlier claim -> dropped
        entities.append(Mention(m.group(), label, s, e, conf, pattern, "regex"))
        spans.append((s, e))

    if has_digit:
        # casefold, not lower: re's (?i) uses Unicode case folding, so 'ſ'
        # matches (?i)s — casefold maps it to 's' too, keeping every cue a
        # true necessary condition even on exotic-cased text
        tl = text.casefold()

        def gated(name: str) -> bool:
            cues = _CUES[name]
            return not cues or any(c in tl for c in cues)

        for name, pat in DATE_PATTERNS_EN:
            if gated(name):
                for m in pat.finditer(text):
                    add(m, "DATE", 0.95, name)
        for name, pat in DATE_PATTERNS_I18N:
            if gated(name):
                for m in pat.finditer(text):
                    add(m, "DATE", 0.93, name)
        for name, pat in TIME_PATTERNS:
            if gated(name):
                for m in pat.finditer(text):
                    add(m, "TIME", 0.90, name)
        for name, pat in MONEY_PATTERNS:
            if gated(name):
                for m in pat.finditer(text):
                    add(m, "MONEY", 0.95, name)
        if gated("PERCENT"):
            for m in PERCENT_PATTERN.finditer(text):
                add(m, "PERCENT", 0.95, "PERCENT")
    if has_at:
        for m in EMAIL_PATTERN.finditer(text):
            add(m, "EMAIL", 0.98, "EMAIL")
    if has_http:
        for m in URL_PATTERN.finditer(text):
            add(m, "URL", 0.98, "URL")
    if has_digit:
        for name, pat in PHONE_PATTERNS:
            if gated(name):
                for m in pat.finditer(text):
                    add(m, "PHONE", 0.85, name)
    if has_at:
        for m in MENTION_PATTERN.finditer(text):
            add(m, "Mention", 0.95, "MENTION")
    if has_hash:
        for m in HASHTAG_PATTERN.finditer(text):
            add(m, "Hashtag", 0.95, "HASHTAG")

    entities.sort(key=lambda e: e.start)
    return entities
