"""Tests for coref metrics, interval index, model-NER actor plumbing, sinks."""

from __future__ import annotations

import pytest

from anno_ray.core.interval_index import IntervalIndex, span_distance, span_iou, span_overlaps
from anno_ray.functions.coref_metrics import b_cubed, muc, purity_completeness


def test_b_cubed_perfect_and_degenerate():
    gold = {"a": 0, "b": 0, "c": 1}
    assert b_cubed(gold, gold) == (1.0, 1.0, 1.0)
    all_one = {"a": 0, "b": 0, "c": 0}
    p, r, f = b_cubed(all_one, gold)
    assert r == 1.0 and p < 1.0
    singletons = {"a": 0, "b": 1, "c": 2}
    p, r, f = b_cubed(singletons, gold)
    assert p == 1.0 and r < 1.0


def test_muc():
    gold = {"a": 0, "b": 0, "c": 1, "d": 1}
    assert muc(gold, gold) == (1.0, 1.0, 1.0)
    merged = {"a": 0, "b": 0, "c": 0, "d": 0}
    p, r, f = muc(merged, gold)
    assert r == 1.0 and p < 1.0


def test_purity_completeness():
    gold = {"a": 0, "b": 0, "c": 1, "d": 1}
    pu, co = purity_completeness(gold, gold)
    assert pu == 1.0 and co == 1.0
    split = {"a": 0, "b": 1, "c": 2, "d": 3}
    pu, co = purity_completeness(split, gold)
    assert pu == 1.0 and co == 0.5


def test_interval_index():
    spans = [(0, 5), (3, 8), (10, 12), (0, 20)]
    ix = IntervalIndex(spans)
    assert ix.overlapping(4, 6) == [0, 1, 3]
    assert ix.containing(11) == [2, 3]
    assert ix.contained_in(0, 9) == [0, 1]
    assert ix.overlapping(100, 110) == []
    assert span_overlaps((0, 5), (4, 6)) and not span_overlaps((0, 5), (5, 6))
    assert span_iou((0, 10), (5, 15)) == 5 / 15
    assert span_distance((0, 5), (8, 10)) == 3
    assert span_distance((8, 10), (0, 5)) == 3
    assert span_distance((0, 5), (3, 6)) == 0


def test_zero_shot_actor_plumbing(ray_session):
    import ray.data

    from anno_ray.stages.model_ner import ZeroShotNERActor, zero_shot_ner

    ds = ray.data.from_items(
        [
            {"url": "u1", "text": "Alice visited Berlin with Bob."},
            {"url": "u2", "text": "nothing capitalized here"},
        ]
    )
    out = zero_shot_ner(ds, ["person", "place"], fake=True, concurrency=(1, 2)).to_pandas()
    assert set(out[out.url == "u1"].text) >= {"Alice", "Berlin"}
    assert len(out[out.url == "u2"]) == 0
    # spans slice back into the text
    row = out[out.text == "Berlin"].iloc[0]
    assert "Alice visited Berlin with Bob."[row.start : row.end] == "Berlin"
    # strict mode (no runtime) raises at actor construction
    with pytest.raises(NotImplementedError):
        ZeroShotNERActor(["x"], fake=False)
    # per-actor LRU prompt cache: same labels hit the cache
    actor = ZeroShotNERActor(["person"], fake=True)
    k1 = actor._encode_prompt(("person",))["key"]
    k2 = actor._encode_prompt(("person",))["key"]
    assert k1 == k2 and len(actor.prompt_cache) == 1


def test_sinks(ray_session, tmp_path):
    import ray.data

    from anno_ray.fixtures.pages import generate_pages_table
    from anno_ray.sources.sinks import mentions_tsv, write_docs_jsonl
    from anno_ray.stages.extract import extract_docs, mentions_table

    pages = ray.data.from_arrow(generate_pages_table(0, 10))
    docs = extract_docs(pages).materialize()
    out = str(tmp_path / "jsonl")
    write_docs_jsonl(docs, out)
    import glob
    import json

    files = glob.glob(out + "/*.json")
    assert files
    line = open(files[0]).readline()
    d = json.loads(line)
    assert "signals" in d and "relations" in d and d["url"].startswith("https://")

    tsv = mentions_tsv(mentions_table(docs))
    header = tsv.splitlines()[0].split("\t")
    assert "label" in header and len(tsv.splitlines()) > 10
