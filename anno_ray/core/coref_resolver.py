"""C2: SimpleCorefResolver — the reference library's in-order coref variant.

Port of /root/reference/anno/src/eval/coref_resolver.rs:84-437 (CorefConfig,
SimpleCorefResolver). Distinct from the CLI rule-based coref (C1,
core/coref.py): this variant processes entities IN ORDER and assigns
``canonical_id`` cluster ids using three strategies:

1. pronoun resolution — nearest preceding non-pronoun, type-compatible,
   gender-compatible antecedent (gender known only from PRONOUNS, never
   inferred from names; neopronoun sets xe/ze/ey/fae treated as neutral,
   coref_resolver.rs:295-430);
2. exact canonical match — "type:lowercased-trimmed-text" key;
3. fuzzy ``names_match`` — exact / substring / last-name match between
   canonical keys of the same type (coref_resolver.rs:406-430).

DOCUMENTED DIVERGENCE: the reference iterates the canonical->cluster map in
Rust HashMap order for strategy 3, which is unspecified when a mention
fuzzy-matches several clusters. We iterate in SORTED canonical-key order —
deterministic, and identical to a reference build whose map is ordered (the
differential harness compiles the reference source against a BTreeMap for
exactly this reason). Cluster membership is otherwise identical.

Used standalone (per-document, inside map_batches) — no shuffle.
"""

from __future__ import annotations

from dataclasses import dataclass

_MASCULINE = {"he", "him", "his", "himself"}
_FEMININE = {"she", "her", "hers", "herself"}
_NEUTRAL = {
    "they", "them", "their", "theirs", "themselves", "themself",
    # neopronouns: xe/xem set
    "xe", "xem", "xyr", "xyrs", "xemself",
    # ze/zir set ("hir" is distinct from "her")
    "ze", "hir", "zir", "hirs", "zirs", "hirself", "zirself",
    # ey/em set
    "ey", "em", "eir", "eirs", "emself",
    # fae/faer set
    "fae", "faer", "faers", "faeself",
}
_IMPERSONAL = {"it", "its", "itself"}
_ALL_PRONOUNS = _MASCULINE | _FEMININE | _NEUTRAL | _IMPERSONAL

_PERSON_PRONOUNS = (
    {
        "he", "she", "they", "him", "her", "them",
        "his", "hers", "their", "theirs",
        "himself", "herself", "themselves", "themself",
    }
    | {
        "xe", "xem", "xyr", "xyrs", "xemself",
        "ze", "hir", "zir", "hirs", "zirs", "hirself", "zirself",
        "ey", "em", "eir", "eirs", "emself",
        "fae", "faer", "faers", "faeself",
    }
)
_ORG_PRONOUNS = {"it", "they", "its", "their", "theirs", "itself", "themselves"}
_LOC_PRONOUNS = {"it", "its", "itself"}


def is_pronoun(text: str) -> bool:
    return text.lower() in _ALL_PRONOUNS


def infer_gender(text: str) -> str | None:
    """'m' / 'f' / 'n' from PRONOUN text only; None for names (no
    gender-from-name inference, per the reference's explicit design)."""
    lower = text.lower()
    if lower in _MASCULINE:
        return "m"
    if lower in _FEMININE:
        return "f"
    if lower in _NEUTRAL:
        return "n"
    return None


def pronoun_compatible(pronoun: str, label: str) -> bool:
    lower = pronoun.lower()
    if label == "PER":
        return lower in _PERSON_PRONOUNS
    if label == "ORG":
        return lower in _ORG_PRONOUNS
    if label == "LOC":
        return lower in _LOC_PRONOUNS
    return lower in _LOC_PRONOUNS  # other types: it/its/itself


def canonical_form(text: str, label: str) -> str:
    return f"{label}:{text.lower().strip()}"


def names_match(name1: str, name2: str) -> bool:
    """Exact / substring / last-name match between canonical keys
    (coref_resolver.rs:406-430); type prefixes must agree."""
    type1, _, text1 = name1.partition(":")
    type2, _, text2 = name2.partition(":")
    if type1 != type2:
        return False
    if text1 == text2:
        return True
    if text2 in text1 or text1 in text2:
        return True
    words1 = text1.split()
    words2 = text2.split()
    if len(words1) > 1 and len(words2) == 1 and words1[-1] == words2[0]:
        return True
    if len(words2) > 1 and len(words1) == 1 and words2[-1] == words1[0]:
        return True
    return False


@dataclass(slots=True)
class CorefConfig:
    similarity_threshold: float = 0.7
    max_pronoun_distance: int = 3
    fuzzy_matching: bool = True
    include_singletons: bool = True


class SimpleCorefResolver:
    """In-order cluster assignment; entities are dicts with text/label (and
    any other keys, preserved); returns copies with ``canonical_id``."""

    def __init__(self, config: CorefConfig | None = None):
        self.config = config or CorefConfig()

    def resolve(self, entities: list[dict]) -> list[dict]:
        if not entities:
            return []
        resolved = [dict(e) for e in entities]
        next_cluster_id = 0
        canonical_to_cluster: dict[str, int] = {}

        for i, entity in enumerate(resolved):
            if entity.get("canonical_id") is not None:
                continue
            cluster_id = self._find_matching_cluster(
                entity, resolved[:i], canonical_to_cluster
            )
            if cluster_id is None:
                cluster_id = next_cluster_id
                next_cluster_id += 1
            entity["canonical_id"] = cluster_id
            canonical_to_cluster[
                canonical_form(entity["text"], entity["label"])
            ] = cluster_id
        return resolved

    def resolve_to_chains(self, entities: list[dict]) -> list[list[int]]:
        """Clusters as lists of entity indices, ordered by first mention."""
        resolved = self.resolve(entities)
        chains: dict[int, list[int]] = {}
        for i, e in enumerate(resolved):
            chains.setdefault(e["canonical_id"], []).append(i)
        out = sorted(chains.values(), key=lambda c: c[0])
        if not self.config.include_singletons:
            out = [c for c in out if len(c) > 1]
        return out

    def _find_matching_cluster(
        self, entity: dict, previous: list[dict], canonical_map: dict[str, int]
    ) -> int | None:
        if is_pronoun(entity["text"]):
            return self._resolve_pronoun(entity, previous)
        canonical = canonical_form(entity["text"], entity["label"])
        hit = canonical_map.get(canonical)
        if hit is not None:
            return hit
        if self.config.fuzzy_matching:
            # sorted key order: see DOCUMENTED DIVERGENCE in module docstring
            for other_canonical in sorted(canonical_map):
                if names_match(canonical, other_canonical):
                    return canonical_map[other_canonical]
        return None

    def _resolve_pronoun(self, pronoun: dict, previous: list[dict]) -> int | None:
        pronoun_gender = infer_gender(pronoun["text"])
        window = previous[::-1][: self.config.max_pronoun_distance * 10]
        for entity in window:
            if is_pronoun(entity["text"]):
                continue
            if not pronoun_compatible(pronoun["text"], entity["label"]):
                continue
            entity_gender = infer_gender(entity["text"])
            if pronoun_gender == "n" or entity_gender == "n":
                pass
            elif pronoun_gender and entity_gender and pronoun_gender != entity_gender:
                continue
            return entity.get("canonical_id")
        return None


def build_tracks_simple(
    text: str, mentions, config: CorefConfig | None = None
):
    """Opt-in C2 track builder with the same contract as coref.build_tracks
    (C1): returns (tracks, pronoun_mentions, assignment).

    Detects pronouns like C1 (same span detector), merges them with the NER
    mentions in DOCUMENT ORDER (C2 is an in-order resolver), runs
    SimpleCorefResolver, and groups the resulting canonical_id clusters into
    Track objects. Unlike C1, all entity types participate (the reference
    resolver is type-gated per strategy, not pre-filtered)."""
    from .coref import Track, detect_pronouns
    from .normalize import normalize_entity_name
    from .types import Mention

    existing = {(m.start, m.end) for m in mentions}
    pron_raw = detect_pronouns(text, existing)
    pronouns = [
        Mention(surface, "PRON", s, e, 0.9, "", "coref")
        for (surface, s, e, _pt) in pron_raw
    ]

    items = [
        {"text": m.text, "label": m.label, "start": m.start, "end": m.end,
         "orig": i}
        for i, m in enumerate(mentions)
    ] + [
        {"text": p.text, "label": "PRON", "start": p.start, "end": p.end,
         "orig": len(mentions) + k}
        for k, p in enumerate(pronouns)
    ]
    items.sort(key=lambda d: (d["start"], d["end"]))

    resolved = SimpleCorefResolver(config).resolve(items)
    clusters: dict[int, list[dict]] = {}
    for it in resolved:
        clusters.setdefault(it["canonical_id"], []).append(it)

    tracks: list[Track] = []
    assignment: dict[int, int] = {}
    for members in sorted(clusters.values(), key=lambda ms: ms[0]["start"]):
        named = [m for m in members if not is_pronoun(m["text"])]
        rep = named[0] if named else members[0]
        tid = len(tracks)
        tracks.append(
            Track(
                tid,
                normalize_entity_name(rep["text"]),
                rep["label"] if named else "PER",
                [m["orig"] for m in members],
            )
        )
        for m in members:
            assignment[m["orig"]] = tid
    return tracks, pronouns, assignment
