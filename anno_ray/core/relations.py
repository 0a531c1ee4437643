"""Entity-pair relation extraction (C4) + co-occurrence edges (C5).

Reimplements ``create_entity_pair_relations``
(/root/reference/anno-cli/src/main.rs:1393-1481): for pairs among the first
50 valid entities with char-gap <= 200, classify the between-text by keyword:
FOUNDED > WORKS_FOR > LOCATED_IN ("located in"/"based in"/"in ") > BORN_IN,
else the fallback type. Note the reference quirk that "born in " matches the
"in " test first and thus labels as LOCATED_IN (preserved).

Triple rendering follows ``Relation::as_triple``
(/root/reference/anno-core/src/entity.rs:2833-2838): (head.text,
relation_type, tail.text).

Co-occurrence edges follow ``GraphDocument::from_entities_cooccurrence``
(/root/reference/anno-core/src/graph.rs:320-382).
"""

from __future__ import annotations

from dataclasses import dataclass

from .types import Mention

MAX_DISTANCE = 200
MAX_ENTITIES = 50
FALLBACK_RELATION = "RELATED"


@dataclass(slots=True)
class Relation:
    head: Mention
    tail: Mention
    relation_type: str
    confidence: float

    def as_triple(self) -> tuple[str, str, str]:
        return (self.head.text, self.relation_type, self.tail.text)


def _classify_between(between_lower: str, fallback: str) -> str:
    if "founded" in between_lower or "founder" in between_lower:
        return "FOUNDED"
    if (
        "works for" in between_lower
        or "employee" in between_lower
        or "employed" in between_lower
    ):
        return "WORKS_FOR"
    if (
        "located in" in between_lower
        or "based in" in between_lower
        or "in " in between_lower
    ):
        return "LOCATED_IN"
    if "born in" in between_lower:
        return "BORN_IN"
    return fallback


def extract_pair_relations(
    entities: list[Mention],
    text: str,
    fallback: str = FALLBACK_RELATION,
    max_distance: int = MAX_DISTANCE,
    max_entities: int = MAX_ENTITIES,
) -> list[Relation]:
    text_len = len(text)
    valid = [e for e in entities if e.start < e.end and e.end <= text_len and e.start < text_len]
    n = min(max_entities, len(valid))

    # ASCII fast path: lowercase the text ONCE and slice the between-span
    # from it (O(pairs) slices instead of O(pairs) slice+lower calls).
    # ASCII-only because Unicode lowercasing is not length-preserving
    # ('İ' -> 'i̇'), which would misalign the char offsets; non-ASCII docs
    # keep the per-pair lower() with identical results.
    text_lower = text.lower() if text.isascii() else None

    out: list[Relation] = []
    for i in range(n):
        for j in range(i + 1, n):
            head, tail = valid[i], valid[j]
            if tail.start >= head.end:
                distance = tail.start - head.end
            elif head.start >= tail.end:
                distance = head.start - tail.end
            else:
                continue  # overlapping
            if distance > max_distance:
                continue
            if head.end <= tail.start:
                bs, be = head.end, tail.start
            else:
                bs, be = tail.end, head.start
            between_lower = (
                text_lower[bs:be] if text_lower is not None else text[bs:be].lower()
            )
            rel_type = _classify_between(between_lower, fallback)
            out.append(Relation(head, tail, rel_type, 0.5))
    return out


def cooccurrence_edges(
    entities: list[Mention], max_distance: int
) -> list[tuple[int, int, int]]:
    """(i, j, distance) pairs within max_distance chars (graph.rs:356-379)."""
    out = []
    n = len(entities)
    for i in range(n):
        a = entities[i]
        for j in range(i + 1, n):
            b = entities[j]
            if a.end <= b.start:
                distance = b.start - a.end
            elif b.end <= a.start:
                distance = a.start - b.end
            else:
                distance = 0
            if distance <= max_distance:
                out.append((i, j, distance))
    return out


def node_id(label: str, text: str, kb_id: str = "", canonical_id: int | None = None) -> str:
    """Stable node id: kb_id > coref_<canonical_id> > "type:text_lower"
    (graph.rs:677-691)."""
    if kb_id:
        return kb_id
    if canonical_id is not None:
        return f"coref_{canonical_id}"
    return f"{label.lower()}:{text.lower().replace(' ', '_')}"
