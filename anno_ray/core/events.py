"""Rule-based event/trigger extraction (C3).

Reimplements the rule-based path of ``EventExtractor``
(/root/reference/anno/src/discourse/event_extractor.rs:1112-1454):

- tokenizer over alnum/'/- runs, yielding BYTE offsets (the reference's
  ``char_indices`` indices are byte positions) — preserved verbatim, including
  the latent byte-vs-char mismatch when trigger offsets are later compared
  with entity char offsets in ``extract_with_entities`` (lines 1178-1213);
- trigger lookup (lowercased) in the ACE lexicon (event_triggers.py);
- polarity: negation word in preceding 3 tokens -> negative, else modal ->
  uncertain, else lexicon hint or positive (lines 1246-1268);
- tense: future/hypothetical markers in preceding 3 tokens, then -ed/irregular
  past list, then -ing present (lines 1271-1409);
- heuristic arguments: nearest capitalized word (len > 1 bytes, not a
  sentence-start word) within 5 tokens before -> Agent; within 5 after ->
  Patient (lines 1412-1454); NER entities within 50 units override
  (last-before agent, first-after patient).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .event_triggers import MODAL_VERBS, NEGATION_WORDS, TRIGGERS
from .types import Mention

POSITIVE = "positive"
NEGATIVE = "negative"
UNCERTAIN = "uncertain"

_IRREGULAR_PAST = frozenset([
    "went", "came", "said", "took", "gave", "made", "got", "found", "knew",
    "thought", "felt", "became", "left", "held", "brought", "began", "kept",
    "put", "set", "saw", "heard", "told", "stood", "lost", "paid", "met",
    "ran", "sent", "built", "fell", "caught", "wrote", "sat", "led", "rose",
    "spoke", "won", "broke", "spent", "hit", "cut", "sold", "bought", "shot",
    "struck", "shut", "threw", "drove", "flew", "drew", "grew", "sang",
    "swam", "rang", "wore", "chose", "woke", "froze", "stole", "blew", "ate",
    "drank", "rode", "shook", "bit", "hid", "tore", "beat", "laid", "spread",
    "hurt", "fought", "hung", "slept", "swept", "bent", "dealt", "fed",
    "fled", "dug", "spun", "wove", "sank", "shone", "swung", "clung",
    "crept", "burnt", "leapt", "meant", "lent", "dwelt", "dreamt", "knelt",
    "split", "spit", "bid", "forbid", "shed", "rid", "burst", "stuck", "slid",
])

_SENTENCE_START = frozenset([
    "the", "a", "an", "this", "that", "these", "those", "it", "he", "she",
    "they", "we", "i",
])


@dataclass(slots=True)
class EventMention:
    trigger: str
    trigger_start: int  # byte offset (reference semantics)
    trigger_end: int
    event_type: str = ""
    polarity: str = POSITIVE
    tense: str = ""
    confidence: float = 0.8
    arguments: list[tuple[str, str]] = field(default_factory=list)


_ASCII_TOKEN_RE = None


def tokenize(text: str) -> list[tuple[str, int, int]]:
    """Alnum/'/- token runs with BYTE offsets (event_extractor.rs:1220-1243).

    ASCII fast path: byte offsets == char offsets and Rust/Python alnum
    agree on ASCII, so a compiled regex scan is exact."""
    global _ASCII_TOKEN_RE
    if text.isascii():
        if _ASCII_TOKEN_RE is None:
            import re as _re

            _ASCII_TOKEN_RE = _re.compile(r"[0-9A-Za-z'\-]+")
        return [(m.group(), m.start(), m.end()) for m in _ASCII_TOKEN_RE.finditer(text)]
    tokens: list[tuple[str, int, int]] = []
    word_start = None
    start_chars: list[str] = []
    bpos = 0
    for c in text:
        if c.isalnum() or c == "'" or c == "-":
            if word_start is None:
                word_start = bpos
                start_chars = []
            start_chars.append(c)
        elif word_start is not None:
            tokens.append(("".join(start_chars), word_start, bpos))
            word_start = None
        bpos += len(c.encode("utf-8"))
    if word_start is not None:
        tokens.append(("".join(start_chars), word_start, bpos))
    return tokens


def _detect_polarity(words, trigger_idx: int, hint: str | None) -> str:
    start = max(0, trigger_idx - 3)
    for w, _, _ in words[start:trigger_idx]:
        if w.lower() in NEGATION_WORDS:
            return NEGATIVE
    for w, _, _ in words[start:trigger_idx]:
        if w.lower() in MODAL_VERBS:
            return UNCERTAIN
    if hint == "Negative":
        return NEGATIVE
    return POSITIVE


def _detect_tense(words, trigger_idx: int, trigger: str) -> str:
    tl = trigger.lower()
    start = max(0, trigger_idx - 3)
    for word, _, _ in words[start:trigger_idx]:
        w = word.lower()
        if w in ("will", "going", "shall"):
            return "future"
        if w in ("would", "could", "might", "may"):
            return "hypothetical"
    if tl.endswith("ed") or tl in _IRREGULAR_PAST:
        return "past"
    if tl.endswith("ing"):
        return "present"
    return ""


def _extract_arguments(words, trigger_idx: int) -> list[tuple[str, str]]:
    args: list[tuple[str, str]] = []
    if trigger_idx > 0:
        for word, _, _ in reversed(words[max(0, trigger_idx - 5) : trigger_idx]):
            if (
                word[:1].isupper()
                and len(word.encode("utf-8")) > 1
                and word.lower() not in _SENTENCE_START
            ):
                args.append(("Agent", word))
                break
    if trigger_idx + 1 < len(words):
        for word, _, _ in words[trigger_idx + 1 : trigger_idx + 6]:
            if word[:1].isupper() and len(word.encode("utf-8")) > 1:
                args.append(("Patient", word))
                break
    return args


def extract(text: str) -> list[EventMention]:
    events: list[EventMention] = []
    words = tokenize(text)
    for idx, (word, start, end) in enumerate(words):
        hit = TRIGGERS.get(word.lower())
        if hit is None:
            continue
        event_type, pol_hint = hit
        ev = EventMention(
            trigger=word,
            trigger_start=start,
            trigger_end=end,
            event_type=event_type,
            polarity=_detect_polarity(words, idx, pol_hint),
            tense=_detect_tense(words, idx, word),
            confidence=0.8,
        )
        ev.arguments = _extract_arguments(words, idx)
        events.append(ev)
    return events


def extract_with_entities(text: str, entities: list[Mention]) -> list[EventMention]:
    """NER entities override heuristic Agent/Patient within 50 units
    (event_extractor.rs:1178-1213; entity char offsets vs trigger byte
    offsets compared directly, as in the reference)."""
    events = extract(text)
    for ev in events:
        agents = [e for e in entities if e.end <= ev.trigger_start and ev.trigger_start - e.end < 50]
        patients = [e for e in entities if e.start >= ev.trigger_end and e.start - ev.trigger_end < 50]
        if agents:
            ev.arguments = [(r, v) for (r, v) in ev.arguments if r != "Agent"]
            ev.arguments.append(("Agent", agents[-1].text))
        if patients:
            ev.arguments = [(r, v) for (r, v) in ev.arguments if r != "Patient"]
            ev.arguments.append(("Patient", patients[0].text))
    return events
