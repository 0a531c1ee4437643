"""HeuristicNER: capitalization + pattern based PER/ORG/LOC extraction.

Faithful reimplementation of ``HeuristicNER::extract_entities`` and
``classify_minimal`` (/root/reference/anno/src/backends/heuristic.rs:294-754),
including its quirks:

- span extension over consecutive capitalized words, with only "of"/"the" as
  connectors; spans break after a word ending in ``.!?)]}`` unless the next
  word is an ORG suffix (heuristic.rs:444-508);
- person-prefix merge ("Dr." etc.) keeps the RAW span text (no trailing
  punctuation cleanup on that path, heuristic.rs:536-567);
- on the normal path, the char start offset is advanced by the BYTE length of
  the stripped leading punctuation (heuristic.rs:571-591 uses
  ``entity_text.len()`` byte arithmetic) — reproduced verbatim;
- the classify_minimal rule cascade with fixed confidences and a 0.35
  threshold (heuristic.rs:650-754);
- a CJK substring pass over the KNOWN_ORGS/KNOWN_LOCS gazetteers when the
  text contains CJK codepoints (heuristic.rs:304-375).

Rust ``char::is_alphanumeric`` == Alphabetic | Nd | Nl | No; approximated by
``c.isalpha() or c.isnumeric()`` (differences only in exotic codepoints).
"""

from __future__ import annotations

import re

from .html import RUST_WHITESPACE
from .types import Mention

THRESHOLD = 0.35

ORG_SUFFIX = frozenset([
    "inc.", "inc", "corp.", "corp", "ltd.", "ltd", "llc", "co.", "plc",
    "foundation", "institute", "university", "college", "bank", "group",
    "agency", "gmbh", "ag", "kg", "sa", "s.a.", "s.l.", "s.r.l.", "spa",
    "nv", "bv", "pty", "ab", "limited", "corporation", "incorporated",
    "company", "holding", "holdings",
])

PERSON_PREFIX = frozenset(["mr.", "mr", "ms.", "ms", "mrs.", "mrs", "dr.", "dr", "prof.", "prof"])

LOC_PREPOSITION = frozenset([
    "in", "from", "at", "to", "near", "aus", "nach", "bei", "von",
    "en", "de", "à", "dans", "por", "sur",
])

SKIP_WORDS = frozenset(["ceo", "cto", "cfo", "vp", "president", "chairman", "director"])

COMMON_SENTENCE_STARTERS = frozenset([
    "the", "a", "an", "this", "that", "these", "those", "it", "he", "she",
    "we", "they", "in", "on", "at", "to", "for", "from", "by", "with",
    "and", "but", "or", "so", "yet", "if", "because", "contact", "call",
    "email", "visit", "please", "see", "note", "today", "yesterday",
    "tomorrow", "now", "then", "what", "where", "when", "who", "why",
    "how", "is", "are", "was", "were", "be", "been", "have", "has", "had",
])

# Ordered as in the reference arrays: the CJK pass iterates them in order,
# which fixes the output entity ordering (feeds stacked conflict resolution).
KNOWN_ORGS_ORDERED = ([
    "google", "apple", "microsoft", "amazon", "facebook", "meta", "tesla",
    "twitter", "ibm", "intel", "nvidia", "oracle", "cisco", "samsung",
    "sony", "toyota", "honda", "bmw", "mercedes", "volkswagen", "nasa",
    "fbi", "cia", "nsa", "nato", "un", "eu", "bbc", "cnn", "nbc", "cbs",
    "abc", "fox", "nyt", "wsj", "reuters", "bloomberg", "spotify",
    "netflix", "uber", "airbnb", "paypal", "visa", "mastercard", "amex",
    "ソニー", "トヨタ", "ホンダ", "任天堂", "サムスン", "ファーウェイ",
    "アリババ", "テンセント", "华为", "阿里巴巴", "腾讯", "百度", "小米",
])
KNOWN_ORGS = frozenset(KNOWN_ORGS_ORDERED)

KNOWN_LOCS_ORDERED = ([
    "paris", "london", "tokyo", "berlin", "rome", "madrid", "moscow",
    "beijing", "shanghai", "dubai", "singapore", "sydney", "toronto",
    "chicago", "boston", "california", "texas", "florida", "new york",
    "washington", "europe", "asia", "africa", "america", "australia",
    "china", "india", "japan", "germany", "france", "italy", "spain",
    "brazil", "mexico", "russia", "korea", "canada", "uk", "usa",
    "東京", "大阪", "京都", "北京", "上海", "香港", "ソウル", "台北",
    "中国", "日本", "韓国", "アメリカ", "イギリス", "フランス", "ドイツ",
])
KNOWN_LOCS = frozenset(KNOWN_LOCS_ORDERED)

KNOWN_PERSONS = frozenset([
    "john", "jane", "mary", "james", "robert", "michael", "william",
    "david", "richard", "joseph", "thomas", "charles", "barack", "donald",
    "joe", "george", "bill", "vladimir", "emmanuel", "boris", "narendra",
    "justin", "elon", "jeff", "mark", "steve", "tim", "satya", "sundar",
    "albert", "isaac", "stephen", "neil", "peter", "paul", "matthew",
    "andrew", "philip", "simon", "marie", "angela", "hillary", "nancy",
    "kamala", "michelle", "melania", "jill", "theresa", "ursula",
])

_SKIP_PRONOUNS = frozenset(["the", "a", "an", "he", "she", "it", "they", "we", "i", "you"])
_PLACE_INDICATORS = frozenset(["united", "new", "south", "north", "west", "east", "great"])

# Words = maximal runs of non-(Rust-)whitespace, with char offsets.
_WORD_RE = re.compile("[^" + re.escape(RUST_WHITESPACE) + "]+")

# CJK detection range per heuristic.rs:304-309.
_CJK_RE = re.compile("[一-鿿぀-ゟ゠-ヿ]")


def _is_alnum(c: str) -> bool:
    return c.isalpha() or c.isnumeric()


def _lstrip_non_alnum(s: str) -> str:
    i = 0
    n = len(s)
    while i < n and not _is_alnum(s[i]):
        i += 1
    return s[i:]


def _rstrip_non_alnum(s: str) -> str:
    n = len(s)
    while n > 0 and not _is_alnum(s[n - 1]):
        n -= 1
    return s[:n]


def _strip_non_alnum(s: str) -> str:
    return _rstrip_non_alnum(_lstrip_non_alnum(s))


def classify_minimal(
    span: list[str], all_words: list[str], start_idx: int
) -> tuple[str, float, str]:
    """Rule cascade; returns (label, confidence, reason). Label "skip" with
    conf 0.0 marks filtered candidates (heuristic.rs:650-754)."""
    last_word = span[-1].lower() if span else ""
    first_word = span[0].lower() if span else ""
    span_lower = " ".join(s.lower() for s in span)
    prev_word = all_words[start_idx - 1].lower() if start_idx > 0 else None

    if len(span) == 1 and first_word in _SKIP_PRONOUNS:
        return ("skip", 0.0, "skip_pronoun")
    first_clean_lc = _rstrip_non_alnum(first_word)
    if len(span) == 1 and first_clean_lc in SKIP_WORDS:
        return ("skip", 0.0, "skip_word")

    if _rstrip_non_alnum(last_word) in ORG_SUFFIX:
        return ("ORG", 0.85, "org_suffix")

    first_clean_text = _rstrip_non_alnum(first_word)
    if first_clean_text in KNOWN_ORGS or span_lower in KNOWN_ORGS:
        return ("ORG", 0.80, "known_org")
    if first_clean_text in KNOWN_LOCS or span_lower in KNOWN_LOCS:
        return ("LOC", 0.80, "known_location")
    if first_clean_text in KNOWN_PERSONS:
        return ("PER", 0.75, "common_name")

    if prev_word is not None and prev_word.rstrip(".") in PERSON_PREFIX:
        return ("PER", 0.80, "person_prefix_context")
    if first_word.rstrip(".") in PERSON_PREFIX and len(span) >= 2:
        return ("PER", 0.75, "person_prefix_span")
    if prev_word is not None and prev_word in LOC_PREPOSITION:
        return ("LOC", 0.70, "loc_context")

    if len(span) == 2:
        if first_word in _PLACE_INDICATORS:
            return ("LOC", 0.65, "loc_indicator")
        return ("PER", 0.60, "two_word_name")

    if len(span) >= 3:
        if span[1].lower() == "of":
            return ("ORG", 0.65, "org_of_pattern")
        return ("ORG", 0.50, "long_span_org")

    if start_idx == 0 and prev_word is None:
        return ("PER", 0.30, "single_start_word")
    return ("PER", 0.45, "capitalized")


def extract(text: str, threshold: float = THRESHOLD) -> list[Mention]:
    if not text:
        return []

    entities: list[Mention] = []

    # --- CJK gazetteer substring pass (heuristic.rs:304-375) ---------------
    if _CJK_RE.search(text):
        for gaz, label in ((KNOWN_ORGS_ORDERED, "ORG"), (KNOWN_LOCS_ORDERED, "LOC")):
            for term in gaz:  # reference array order
                if not any(c >= "぀" for c in term):
                    continue
                start = 0
                tlen = len(term)
                while True:
                    idx = text.find(term, start)
                    if idx == -1:
                        break
                    char_start, char_end = idx, idx + tlen
                    if not any(
                        e.start == char_start and e.end == char_end for e in entities
                    ):
                        entities.append(
                            Mention(term, label, char_start, char_end, 0.9, "", "heuristic")
                        )
                    start = idx + tlen  # non-overlapping, like match_indices
    # --- word scan with char positions (heuristic.rs:380-408) --------------
    words_with_pos = [(m.group(), m.start(), m.end()) for m in _WORD_RE.finditer(text)]
    words = [w for (w, _, _) in words_with_pos]
    nwords = len(words)

    # one precompute pass replaces the 2-3 _lstrip_non_alnum calls each word
    # previously paid across the outer scan + span-extension loops (words are
    # visited up to twice); the fast path skips the char loop entirely when
    # the first char is already alphanumeric — the overwhelmingly common case
    lstripped = [
        w if (w[0].isalpha() or w[0].isnumeric()) else _lstrip_non_alnum(w)
        for w in words
    ]
    first_upper = [bool(s) and s[0].isupper() for s in lstripped]

    i = 0
    while i < nwords:
        if not first_upper[i]:
            i += 1
            continue
        word = words[i]

        start_idx = i
        first_word_clean = _strip_non_alnum(word.lower())
        if first_word_clean in COMMON_SENTENCE_STARTERS:
            i += 1
            continue

        # span-extension loop (heuristic.rs:444-508)
        while i < nwords:
            w = words[i]
            ends_with_closing = w.endswith((")", "]", "}"))
            ends_with_punct = w.endswith((".", "!", "?"))
            first_char_upper = first_upper[i]
            is_connector = w.lower() in ("of", "the")

            if i + 1 < nwords:
                nxt_clean = lstripped[i + 1]
                next_upper = first_upper[i + 1]
                is_suffix = nxt_clean.lower() in ORG_SUFFIX
                if (ends_with_closing or ends_with_punct) and not is_suffix:
                    next_word_ok = False
                else:
                    next_word_ok = next_upper
            else:
                next_word_ok = False

            if first_char_upper or (is_connector and next_word_ok):
                i += 1
                if ends_with_closing or ends_with_punct:
                    if i < nwords:
                        is_suffix_next = _strip_non_alnum(words[i].lower()) in ORG_SUFFIX
                    else:
                        is_suffix_next = False
                    if not is_suffix_next:
                        break
            else:
                break
        end_idx = i

        if start_idx == end_idx:
            continue  # defensive; cannot occur (first word always advances)

        entity_text = " ".join(words[start_idx:end_idx])

        # person-prefix merge (heuristic.rs:519-567): raw text, no cleanup
        prev_word = words[start_idx - 1].lower().rstrip(".") if start_idx > 0 else None
        if prev_word is not None and prev_word in PERSON_PREFIX:
            prefix_word = words[start_idx - 1]
            entity_text = f"{prefix_word} {entity_text}"
            char_start = words_with_pos[start_idx - 1][1]
            char_end = char_start + len(entity_text)
            label, conf, reason = classify_minimal(
                entity_text.split(), words, start_idx - 1
            )
            if conf >= threshold and label != "skip":
                entities.append(
                    Mention(entity_text, label, char_start, char_end, conf, reason, "heuristic")
                )
            continue

        # leading punctuation cleanup — start offset advanced by BYTE length
        stripped = _lstrip_non_alnum(entity_text)
        removed = entity_text[: len(entity_text) - len(stripped)]
        leading_punct_len = len(removed.encode("utf-8"))  # bytes, per reference
        entity_text = stripped
        entity_text = _rstrip_non_alnum(entity_text)
        if not entity_text:
            continue

        char_start = words_with_pos[start_idx][1] + leading_punct_len
        char_end = char_start + len(entity_text)

        label, conf, reason = classify_minimal(entity_text.split(), words, start_idx)
        if conf >= threshold and label != "skip":
            entities.append(
                Mention(entity_text, label, char_start, char_end, conf, reason, "heuristic")
            )

    return entities
