"""Golden + property tests for HeuristicNER (P4).

Goldens captured from the actual reference implementation
(/root/reference/anno/src/backends/heuristic.rs) compiled into a harness.
"""

from __future__ import annotations

import json
import os

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from anno_ray.core.heuristic_ner import extract

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "heuristic_ner.json")


def _load():
    with open(GOLDEN, encoding="utf-8") as f:
        return json.load(f)


def _tuples(ms):
    return [
        (m.text.replace("\t", " ").replace("\n", " "), m.label, m.start, m.end,
         round(m.conf, 4), m.pattern)
        for m in ms
    ]


@pytest.mark.parametrize("case", _load(), ids=lambda c: str(abs(hash(c["input"])) % 10**8))
def test_golden(case):
    got = _tuples(extract(case["input"]))
    want = [
        (e["text"], e["label"], e["start"], e["end"], round(e["conf"], 4), e["pattern"])
        for e in case["entities"]
    ]
    assert got == want


def test_basic_rules():
    ents = extract("Dr. Smith visited Bank of America in Paris. Google Inc. hired John Smith.")
    by_text = {m.text: m for m in ents}
    assert by_text["Dr. Smith"].label == "PER"
    assert by_text["Bank of America"].label == "ORG"
    assert by_text["Paris"].label == "LOC"
    assert by_text["Google Inc"].label == "ORG"
    assert by_text["John Smith"].label == "PER"


@given(st.text(alphabet=st.characters(codec="utf-8", max_codepoint=0x2FFF), max_size=120))
@settings(max_examples=150, deadline=None)
def test_offsets_in_bounds(s):
    for m in extract(s):
        assert 0 <= m.start <= m.end
        # end offsets can exceed len(text) only via the documented byte-length
        # start-advance quirk replicated from the reference
        assert m.conf >= 0.35
