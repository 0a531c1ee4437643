"""Entity record type + label taxonomy.

Mentions are plain dicts/tuples in batch kernels for speed; this module holds
the shared label vocabulary and the small ``Mention`` record used by the
per-document extractors before they are written to Arrow columns.

Label strings follow ``EntityType::as_label``
(/root/reference/anno-core/src/entity.rs:370-424): PER/ORG/LOC/DATE/TIME/
MONEY/PERCENT/QUANTITY/CARDINAL/ORDINAL/EMAIL/URL/PHONE, with open-world
labels (e.g. "Mention", "Hashtag") passed through as-is.
"""

from __future__ import annotations

from dataclasses import dataclass, field


PER = "PER"
ORG = "ORG"
LOC = "LOC"
DATE = "DATE"
TIME = "TIME"
MONEY = "MONEY"
PERCENT = "PERCENT"
QUANTITY = "QUANTITY"
CARDINAL = "CARDINAL"
ORDINAL = "ORDINAL"
EMAIL = "EMAIL"
URL = "URL"
PHONE = "PHONE"
MENTION = "Mention"
HASHTAG = "Hashtag"

_CANON = {
    "PER": PER, "PERSON": PER,
    "ORG": ORG, "ORGANIZATION": ORG,
    "LOC": LOC, "LOCATION": LOC, "GPE": LOC,
    "DATE": DATE, "TIME": TIME,
    "MONEY": MONEY, "CURRENCY": MONEY,
    "PERCENT": PERCENT, "PERCENTAGE": PERCENT,
    "QUANTITY": QUANTITY, "CARDINAL": CARDINAL, "ORDINAL": ORDINAL,
    "EMAIL": EMAIL, "URL": URL, "URI": URL,
    "PHONE": PHONE, "TELEPHONE": PHONE,
}


def from_label(label: str) -> str:
    """Parse a label, stripping one BIO prefix (B-/I-/E-/S-), to its
    canonical form; unknown labels return their uppercase form
    (``EntityType::from_label``, entity.rs:394-424)."""
    for p in ("B-", "I-", "E-", "S-"):
        if label.startswith(p):
            label = label[len(p):]
            break
    up = label.upper()
    return _CANON.get(up, up)


def types_match_flexible(pred: str, gold: str) -> bool:
    """PER~PERSON, LOC~LOCATION~GPE, ORG~ORGANIZATION, DATE~YEAR/HOURS
    (anno-cli/src/main.rs:2083-2105)."""
    p, g = pred.upper(), gold.upper()
    if p == g:
        return True
    pairs = {
        ("PERSON", "PER"), ("PER", "PERSON"),
        ("LOCATION", "LOC"), ("LOC", "LOCATION"),
        ("LOCATION", "GPE"), ("GPE", "LOCATION"),
        ("ORGANIZATION", "ORG"), ("ORG", "ORGANIZATION"),
        ("DATE", "YEAR"), ("YEAR", "DATE"), ("DATE", "HOURS"),
    }
    return (p, g) in pairs


@dataclass(slots=True)
class Mention:
    """One extracted mention; char offsets into the extracted text."""

    text: str
    label: str
    start: int
    end: int
    conf: float
    pattern: str = ""   # provenance pattern / rule name
    source: str = ""    # backend name ("regex" | "heuristic")
    negated: bool = False
    quantifier: str = ""
    track_id: int = -1
    norm_surface: str = ""
    kb_id: str = ""

    def key(self) -> tuple[int, int, str]:
        return (self.start, self.end, self.label)
