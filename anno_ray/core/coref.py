"""Within-document coreference: signals -> tracks (C1).

Reimplements ``resolve_coreference`` (/root/reference/anno-cli/src/main.rs:
2120-2347) and the gender-name heuristics (main.rs:2350-2411):

1. detect pronouns (male/female/org/neutral lists) by substring scan over the
   lowercased text with word-boundary checks, skipping spans already claimed
   by a signal; add them as PRON signals;
2. group PER/ORG/LOC mentions by ``normalize_entity_name(surface)`` per type
   — one track per distinct normalized surface, canonical_surface = the
   normalized key (main.rs:2239-2268);
3. link each pronoun to the track of the nearest preceding gender/type
   compatible antecedent (strictly before: antecedent.end < pronoun.start).

Deliberate divergence (documented): the reference iterates a HashMap when
creating tracks, so its track *ids* are nondeterministic; we order tracks by
(entity_type_group, first mention position) for deterministic output. Cluster
membership is identical.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .normalize import normalize_entity_name
from .types import Mention

MALE_PRONOUNS = ("he", "him", "his")
FEMALE_PRONOUNS = ("she", "her", "hers")
NEUTRAL_PRONOUNS = ("they", "them", "their", "theirs")
ORG_PRONOUNS = ("it", "its")

MALE_NAMES = frozenset([
    "james", "john", "robert", "michael", "william", "david", "richard",
    "joseph", "thomas", "charles", "barack", "donald", "joe", "george",
    "bill", "vladimir", "emmanuel", "boris", "xi", "narendra", "justin",
    "elon", "jeff", "mark", "steve", "tim", "satya", "sundar", "albert",
    "isaac", "stephen", "neil", "peter", "paul", "matthew", "andrew",
    "philip", "simon",
])

FEMALE_NAMES = frozenset([
    "mary", "patricia", "jennifer", "linda", "elizabeth", "angela", "marie",
    "susan", "margaret", "dorothy", "hillary", "nancy", "kamala", "michelle",
    "melania", "jill", "theresa", "ursula", "christine", "sanna", "jacinda",
    "oprah", "beyonce", "taylor", "sheryl", "marissa", "ginni", "diana",
    "catherine", "anne", "victoria", "queen", "jane", "sarah",
])


def is_likely_male(name: str) -> bool:
    parts = name.split()
    first = parts[0].lower() if parts else ""
    return first in MALE_NAMES


def is_likely_female(name: str) -> bool:
    parts = name.split()
    first = parts[0].lower() if parts else ""
    return first in FEMALE_NAMES


@dataclass(slots=True)
class Track:
    track_id: int
    canonical_surface: str  # normalized (lowercased, trimmed)
    entity_type: str
    mention_idxs: list[int] = field(default_factory=list)  # indexes into mentions


def _is_alnum(c: str) -> bool:
    return c.isalpha() or c.isnumeric()


def detect_pronouns(text: str, existing_spans: set[tuple[int, int]]) -> list[tuple[str, int, int, str]]:
    """Return (surface, start, end, ptype) pronoun signals in detection order."""
    tl = text.lower()
    n = len(text)
    out: list[tuple[str, int, int, str]] = []
    claimed = set(existing_spans)
    for pronouns, ptype in (
        (MALE_PRONOUNS, "male"),
        (FEMALE_PRONOUNS, "female"),
        (ORG_PRONOUNS, "org"),
        (NEUTRAL_PRONOUNS, "any"),
    ):
        for p in pronouns:
            start = 0
            plen = len(p)
            while True:
                idx = tl.find(p, start)
                if idx == -1:
                    break
                char_start, char_end = idx, idx + plen
                is_word_start = char_start == 0 or not _is_alnum(text[char_start - 1])
                is_word_end = char_end >= n or not _is_alnum(text[char_end])
                if is_word_start and is_word_end and (char_start, char_end) not in claimed:
                    out.append((text[char_start:char_end], char_start, char_end, ptype))
                    claimed.add((char_start, char_end))
                start = idx + 1  # overlapping scan, as in the reference
    return out


_PER_LABELS = frozenset(["per", "person"])
_ORG_LABELS = frozenset(["org", "organization"])
_LOC_LABELS = frozenset(["loc", "location", "gpe"])


def build_tracks(
    text: str, mentions: list[Mention]
) -> tuple[list[Track], list[Mention], dict[int, int]]:
    """Group mentions into tracks and attach pronouns.

    Returns (tracks, pronoun_mentions, assignment) where ``assignment`` maps
    a mention index (NER mentions first, then pronouns appended after them)
    to its track id. Pronoun mentions carry label "PRON", conf 0.9.
    """
    per_idx = [i for i, m in enumerate(mentions) if m.label.lower() in _PER_LABELS]
    org_idx = [i for i, m in enumerate(mentions) if m.label.lower() in _ORG_LABELS]
    loc_idx = [i for i, m in enumerate(mentions) if m.label.lower() in _LOC_LABELS]

    existing = {(m.start, m.end) for m in mentions}
    pron_raw = detect_pronouns(text, existing)
    pronouns = [
        Mention(surface, "PRON", s, e, 0.9, "", "coref")
        for (surface, s, e, _pt) in pron_raw
    ]
    pron_types = [pt for (_, _, _, pt) in pron_raw]

    tracks: list[Track] = []
    assignment: dict[int, int] = {}
    for group, etype in ((per_idx, "PER"), (org_idx, "ORG"), (loc_idx, "LOC")):
        if not group:
            continue
        canonical_groups: dict[str, list[int]] = {}
        for i in group:
            canonical_groups.setdefault(
                normalize_entity_name(mentions[i].text), []
            ).append(i)
        # deterministic order: by first mention position (see module docstring)
        for canonical, members in sorted(
            canonical_groups.items(), key=lambda kv: (mentions[kv[1][0]].start, kv[0])
        ):
            tid = len(tracks)
            tracks.append(Track(tid, canonical, etype, list(members)))
            for i in members:
                assignment[i] = tid

    # link pronouns to nearest preceding compatible antecedent's track
    npron = len(pronouns)
    for k in range(npron):
        p = pronouns[k]
        ptype = pron_types[k]
        if ptype == "male":
            candidates = [i for i in per_idx if is_likely_male(mentions[i].text)]
        elif ptype == "female":
            candidates = [i for i in per_idx if is_likely_female(mentions[i].text)]
        elif ptype == "org":
            candidates = org_idx
        else:  # "any"
            candidates = per_idx + org_idx
        nearest = None
        nearest_dist = None
        for i in candidates:
            if mentions[i].end < p.start:
                d = p.start - mentions[i].end
                if nearest_dist is None or d < nearest_dist:
                    nearest, nearest_dist = i, d
        if nearest is not None and nearest in assignment:
            tid = assignment[nearest]
            tracks[tid].mention_idxs.append(len(mentions) + k)
            assignment[len(mentions) + k] = tid

    return tracks, pronouns, assignment
