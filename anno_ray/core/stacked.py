"""StackedNER: layered composition of RegexNER + HeuristicNER.

Faithful reimplementation of ``StackedNER::extract_entities`` and
``ConflictStrategy`` (/root/reference/anno/src/backends/stacked.rs:176-290,
531-770):

- layers run in priority order (regex first, heuristic second by default);
- per-candidate offset clamping: end > len -> clamp; start >= end or
  start > len -> skip (stacked.rs:575-597);
- candidates overlapping exactly ONE existing entity resolve via the
  strategy; candidates overlapping SEVERAL resolve against the "best"
  existing entity and REMOVE the other overlapping ones — including under
  Priority/KeepExisting (stacked.rs:653-744, reproduced deliberately);
- final sort by (start, end) + consecutive (start, end, label) dedup
  keeping the first (stacked.rs:749-762).
"""

from __future__ import annotations

from collections.abc import Callable

from . import heuristic_ner, regex_ner
from .types import Mention

PRIORITY = "priority"
LONGEST_SPAN = "longest_span"
HIGHEST_CONF = "highest_conf"
UNION = "union"

_KEEP_EXISTING = 0
_REPLACE = 1
_KEEP_BOTH = 2


def _resolve(strategy: str, existing: Mention, candidate: Mention) -> int:
    if strategy == PRIORITY:
        return _KEEP_EXISTING
    if strategy == LONGEST_SPAN:
        if (candidate.end - candidate.start) > (existing.end - existing.start):
            return _REPLACE
        return _KEEP_EXISTING
    if strategy == HIGHEST_CONF:
        if candidate.conf > existing.conf:
            return _REPLACE
        return _KEEP_EXISTING
    return _KEEP_BOTH  # UNION


def extract(
    text: str,
    layers: list[Callable[[str], list[Mention]]] | None = None,
    strategy: str = PRIORITY,
) -> list[Mention]:
    """Run layers in order, resolving overlaps per the strategy."""
    if layers is None:
        layers = [regex_ner.extract, heuristic_ner.extract]

    entities: list[Mention] = []
    text_len = len(text)  # char count

    for layer in layers:
        for cand in layer(text):
            if cand.end > text_len:
                cand.end = text_len
            if cand.start >= cand.end or cand.start > text_len:
                continue

            overlapping = [
                idx
                for idx, e in enumerate(entities)
                if cand.end > e.start and cand.start < e.end
            ]

            if not overlapping:
                entities.append(cand)
            elif len(overlapping) == 1:
                idx = overlapping[0]
                r = _resolve(strategy, entities[idx], cand)
                if r == _REPLACE:
                    entities[idx] = cand
                elif r == _KEEP_BOTH:
                    entities.append(cand)
            else:
                # pick the "best" existing entity per strategy (stacked.rs:657-682)
                if strategy == PRIORITY:
                    best_idx = min(overlapping)
                elif strategy == LONGEST_SPAN:
                    best_idx = max(
                        overlapping, key=lambda i: (entities[i].end - entities[i].start, i)
                    )
                elif strategy == HIGHEST_CONF:
                    best_idx = max(overlapping, key=lambda i: (entities[i].conf, i))
                else:  # UNION picks first but keeps everything anyway
                    best_idx = max(overlapping)

                if strategy == UNION:
                    entities.append(cand)
                else:
                    r = _resolve(strategy, entities[best_idx], cand)
                    to_remove = sorted(
                        (i for i in overlapping if i != best_idx), reverse=True
                    )
                    if r == _KEEP_EXISTING:
                        for i in to_remove:
                            entities.pop(i)
                    elif r == _REPLACE:
                        removed_before = sum(1 for i in to_remove if i < best_idx)
                        for i in to_remove:
                            entities.pop(i)
                        entities[best_idx - removed_before] = cand
                    else:  # KEEP_BOTH
                        for i in to_remove:
                            entities.pop(i)
                        entities.append(cand)

    entities.sort(key=lambda e: (e.start, e.end))
    if strategy != UNION:
        deduped: list[Mention] = []
        for e in entities:
            if deduped and (
                e.start == deduped[-1].start
                and e.end == deduped[-1].end
                and e.label == deduped[-1].label
            ):
                continue
            deduped.append(e)
        entities = deduped
    return entities
