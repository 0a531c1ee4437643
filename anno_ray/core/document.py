"""Fused per-document extraction: the unit of work of the extract stage.

One call runs the full Level-1/2 pipeline of the reference on one document
(the per-doc part of ``anno pipeline``, /root/reference/anno/src/cli/commands/
pipeline.rs:134-176): HTML->text (P1), StackedNER (P3+P4+P5), negation /
quantifier enrichment (P6/P7), doc-local coref tracks (C1), KB alias linking
(J1), event extraction (C3) and entity-pair relations (C4) rendered as
(subj, pred, obj) triples per ``Relation::as_triple``.

Pure Python, no Ray imports — wrapped by anno_ray.stages.extract in
``map_batches`` kernels.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from . import coref, events, linking, relations, stacked
from .html import resolve_content
from .negation import detect_quantifier, is_negated
from .normalize import normalize_entity_name
from .types import Mention


@dataclass(slots=True)
class DocResult:
    url: str
    text: str
    mentions: list[Mention] = field(default_factory=list)  # NER + PRON rows
    tracks: list[coref.Track] = field(default_factory=list)
    triples: list[dict] = field(default_factory=list)
    n_events: int = 0


def process_document(
    url: str,
    raw: str,
    *,
    is_html: bool = True,
    alias_table: dict[str, tuple[str, str]] | None = None,
    with_coref: bool = True,
    coref_strategy: str = "cli",
    with_linking: bool = True,
    with_triples: bool = True,
) -> DocResult:
    """``coref_strategy``: "cli" = C1 (anno-cli rule-based, the reference
    pipeline default); "simple" = C2 (SimpleCorefResolver, the library's
    in-order exact/substring/last-name + neopronoun resolver) — opt-in."""
    text = resolve_content(raw) if is_html else raw

    ner = stacked.extract(text)

    # enrichment (P6/P7): negation window + quantifier from preceding words
    for m in ner:
        m.negated = is_negated(text, m.start)
        m.quantifier = detect_quantifier(text, m.start)
        m.norm_surface = normalize_entity_name(m.text)

    tracks: list[coref.Track] = []
    pronouns: list[Mention] = []
    if with_coref:
        if coref_strategy == "simple":
            from .coref_resolver import build_tracks_simple

            tracks, pronouns, assignment = build_tracks_simple(text, ner)
        else:
            tracks, pronouns, assignment = coref.build_tracks(text, ner)
        all_mentions = ner + pronouns
        for idx, tid in assignment.items():
            all_mentions[idx].track_id = tid
    else:
        all_mentions = ner

    if with_linking:
        for t in tracks:
            kb_id, _desc = linking.link_surface(t.canonical_surface, alias_table)
            if kb_id:
                for i in t.mention_idxs:
                    all_mentions[i].kb_id = kb_id

    triples: list[dict] = []
    n_events = 0
    if with_triples:
        # C4: entity-pair relations over the NER mentions (pronouns excluded,
        # as in the reference where relations see the entity list only)
        for rel in relations.extract_pair_relations(ner, text):
            subj, pred, obj = rel.as_triple()
            triples.append(
                {
                    "url": url,
                    "subj": subj,
                    "pred": pred,
                    "obj": obj,
                    "conf": rel.confidence,
                    "subj_label": rel.head.label,
                    "obj_label": rel.tail.label,
                    "subj_start": rel.head.start,
                    "obj_start": rel.tail.start,
                    "source": "pair",
                }
            )
        # C3/C6: events with entity-argument override; (Agent, trigger,
        # Patient) becomes a triple when both arguments are present
        evs = events.extract_with_entities(text, ner)
        n_events = len(evs)
        for ev in evs:
            agent = next((v for (r, v) in ev.arguments if r == "Agent"), None)
            patient = next((v for (r, v) in ev.arguments if r == "Patient"), None)
            if agent is not None and patient is not None:
                triples.append(
                    {
                        "url": url,
                        "subj": agent,
                        "pred": ev.trigger,
                        "obj": patient,
                        "conf": ev.confidence,
                        "subj_label": "",
                        "obj_label": "",
                        "subj_start": -1,
                        "obj_start": ev.trigger_start,
                        "source": "event",
                    }
                )

    return DocResult(
        url=url,
        text=text,
        mentions=all_mentions,
        tracks=tracks,
        triples=triples,
        n_events=n_events,
    )
