"""Golden tests for event extraction (C3) and pair relations (C4).

Goldens in events_relations.json were produced by the ACTUAL reference code
(event_extractor.rs + create_entity_pair_relations) compiled into a harness —
so these pin reference-exact triple semantics.
"""

from __future__ import annotations

import json
import os

import pytest

from anno_ray.core import events, relations
from anno_ray.core.types import Mention

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "events_relations.json")


def _load():
    with open(GOLDEN, encoding="utf-8") as f:
        return json.load(f)


CASES = _load()


def _mentions(case):
    return [
        Mention(e["text"], e["label"], e["start"], e["end"], e["conf"])
        for e in case["entities"]
    ]


@pytest.mark.parametrize("case", CASES, ids=lambda c: str(abs(hash(c["text"])) % 10**8))
def test_pair_relations_golden(case):
    ents = _mentions(case)
    mine = [
        [r.head.start, r.head.end, r.tail.start, r.tail.end, r.relation_type, r.confidence]
        for r in relations.extract_pair_relations(ents, case["text"], fallback="RELATED")
    ]
    assert mine == [list(x) for x in case["ref_relations"]]


@pytest.mark.parametrize("case", CASES, ids=lambda c: str(abs(hash(c["text"])) % 10**8))
def test_events_golden(case):
    ents = _mentions(case)
    mine = [
        [
            e.trigger, e.trigger_start, e.trigger_end, e.event_type,
            e.polarity.capitalize(), e.tense.capitalize() if e.tense else "",
            e.confidence, [[r, v] for r, v in e.arguments],
        ]
        for e in events.extract_with_entities(case["text"], ents)
    ]
    assert mine == [list(x) for x in case["ref_events"]]


def test_relation_keyword_quirks():
    # "born in " is claimed by the "in " check first (reference quirk)
    assert relations._classify_between(" was born in ", "RELATED") == "LOCATED_IN"
    assert relations._classify_between("born in", "RELATED") == "BORN_IN"
    assert relations._classify_between(" founded ", "RELATED") == "FOUNDED"
    assert relations._classify_between(" works for ", "RELATED") == "WORKS_FOR"
    assert relations._classify_between(" xyz ", "RELATED") == "RELATED"


def test_event_polarity_and_tense():
    evs = events.extract("Alice did not attack Bob.")
    assert evs[0].polarity == events.NEGATIVE
    evs = events.extract("They might buy Google.")
    assert evs[0].polarity == events.UNCERTAIN
    evs = events.extract("He will launch the rocket.")
    assert any(e.tense == "future" for e in evs)
