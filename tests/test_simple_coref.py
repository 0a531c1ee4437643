"""C2 SimpleCorefResolver: unit semantics + differential vs the COMPILED
reference (coref_resolver.rs built against a BTreeMap canonical map — see
tools/build_ref_harnesses.py::build_simplecorefharness)."""

from __future__ import annotations

import os
import random
import subprocess

import pytest

from anno_ray.core.coref_resolver import (
    CorefConfig,
    SimpleCorefResolver,
    infer_gender,
    is_pronoun,
    names_match,
    pronoun_compatible,
)

HARNESS = "/tmp/simplecorefharness/target/release/simplecorefharness"


def _e(text, label="PER", start=0, end=0):
    return {"text": text, "label": label, "start": start, "end": end}


# --- unit semantics ----------------------------------------------------------

def test_doc_example_chain():
    """Module doc example: John Smith / Smith / he -> one cluster."""
    r = SimpleCorefResolver()
    out = r.resolve(
        [_e("John Smith", "PER", 0, 10), _e("Smith", "PER", 45, 50), _e("he", "PER", 80, 82)]
    )
    assert out[0]["canonical_id"] == out[1]["canonical_id"] == out[2]["canonical_id"]


def test_exact_match_same_type_only():
    r = SimpleCorefResolver(CorefConfig(fuzzy_matching=False))
    out = r.resolve([_e("Apple", "ORG"), _e("Apple", "LOC"), _e("apple ", "ORG")])
    assert out[0]["canonical_id"] != out[1]["canonical_id"]  # type gate
    assert out[0]["canonical_id"] == out[2]["canonical_id"]  # lower+trim


def test_substring_and_lastname():
    assert names_match("PER:john smith", "PER:smith")
    assert names_match("PER:smith", "PER:john smith")
    assert names_match("PER:j smith", "PER:smith")  # last-name rule
    assert not names_match("ORG:smith", "PER:smith")
    assert not names_match("PER:smith", "PER:jones")


def test_fuzzy_off_splits_clusters():
    ents = [_e("John Smith"), _e("Smith")]
    on = SimpleCorefResolver().resolve(ents)
    off = SimpleCorefResolver(CorefConfig(fuzzy_matching=False)).resolve(ents)
    assert on[0]["canonical_id"] == on[1]["canonical_id"]
    assert off[0]["canonical_id"] != off[1]["canonical_id"]


def test_neopronouns_resolve_to_person():
    r = SimpleCorefResolver()
    for pron in ("xe", "ze", "ey", "fae", "they", "themself", "zirself"):
        out = r.resolve([_e("Alex Rivera", "PER"), _e(pron, "PER")])
        assert out[1]["canonical_id"] == out[0]["canonical_id"], pron


def test_no_gender_from_names():
    """'she' can resolve to 'John' — gender is only known from pronouns."""
    r = SimpleCorefResolver()
    out = r.resolve([_e("John", "PER"), _e("she", "PER")])
    assert out[1]["canonical_id"] == out[0]["canonical_id"]


def test_org_loc_pronoun_compat():
    assert pronoun_compatible("they", "ORG")
    assert pronoun_compatible("it", "ORG")
    assert not pronoun_compatible("he", "ORG")
    assert pronoun_compatible("it", "LOC")
    assert not pronoun_compatible("they", "LOC")
    assert pronoun_compatible("faer", "PER")


def test_pronoun_skips_pronouns_and_respects_distance():
    r = SimpleCorefResolver()
    ents = [_e("Acme Corp", "ORG")] + [_e("filler%d" % i, "DATE") for i in range(40)] + [_e("it", "ORG")]
    out = r.resolve(ents)
    # 40 fillers > 30-entity window: pronoun finds no antecedent -> own cluster
    assert out[-1]["canonical_id"] not in {out[0]["canonical_id"]}


def test_gender_infer_table():
    assert infer_gender("He") == "m"
    assert infer_gender("hers") == "f"
    assert infer_gender("hir") == "n"  # zir set, NOT 'her'
    assert infer_gender("Mary") is None
    assert is_pronoun("Faer") and not is_pronoun("Mary")


def test_unresolved_pronoun_new_cluster():
    r = SimpleCorefResolver()
    out = r.resolve([_e("he", "PER"), _e("John", "PER")])
    assert out[0]["canonical_id"] == 0
    assert out[1]["canonical_id"] == 1


# --- differential vs compiled reference --------------------------------------

NAMES = [
    "John Smith", "Smith", "John", "Mary Johnson", "Johnson", "Dr. Sarah Lee",
    "Lee", "Alex Rivera", "Rivera", "J Smith", "Acme Corp", "Acme",
    "Globex Corporation", "Globex", "United Nations", "Paris", "New York",
    "New York City", "York",
]
PRONOUN_POOL = [
    "he", "she", "they", "it", "him", "her", "them", "his", "its",
    "xe", "ze", "ey", "fae", "hir", "zir", "themselves", "herself",
]
LABELS = ["PER", "PER", "ORG", "LOC", "DATE"]


def _gen_cases(n_cases: int, seed: int) -> list[tuple[str, list[dict]]]:
    rng = random.Random(seed)
    cases = []
    for ci in range(n_cases):
        n = rng.randint(0, 12)
        ents = []
        pos = 0
        for _ in range(n):
            if rng.random() < 0.3:
                text = rng.choice(PRONOUN_POOL)
            else:
                text = rng.choice(NAMES)
            label = rng.choice(LABELS)
            ents.append(_e(text, label, pos, pos + len(text)))
            pos += len(text) + 1
        cfg = "NF" if ci % 3 == 0 else "F"
        cases.append((cfg, ents))
    return cases


@pytest.mark.skipif(not os.path.exists(HARNESS), reason="harness not built")
def test_differential_vs_reference():
    cases = _gen_cases(400, seed=1234)
    lines = []
    for cfg, ents in cases:
        body = "\x1e".join(
            f"{e['text']}\x1f{e['label']}\x1f{e['start']}\x1f{e['end']}" for e in ents
        )
        lines.append((f"NF\t{body}" if cfg == "NF" else body))
    out = subprocess.run(
        [HARNESS], input="\n".join(lines), capture_output=True, text=True, check=True
    ).stdout.splitlines()
    assert len(out) == len(cases)

    mismatches = 0
    for (cfg, ents), ref_line in zip(cases, out):
        config = CorefConfig(fuzzy_matching=(cfg == "F"))
        got = SimpleCorefResolver(config).resolve(ents)
        got_ids = ",".join(str(e["canonical_id"]) for e in got)
        if got_ids != ref_line:
            mismatches += 1
            if mismatches <= 3:
                print("MISMATCH", cfg, ents, "ref=", ref_line, "got=", got_ids)
    assert mismatches == 0, f"{mismatches}/{len(cases)} mismatches"


# --- opt-in pipeline integration (coref_strategy="simple") -------------------

def test_process_document_simple_strategy():
    from anno_ray.core.document import process_document

    text = "John Smith founded Acme Corp. Smith said he was proud."
    res = process_document("u", text, is_html=False, coref_strategy="simple")
    # John Smith + Smith (+ the pronoun) share one track
    by_surface = {}
    for m in res.mentions:
        by_surface.setdefault(m.text, m.track_id)
    assert by_surface["John Smith"] == by_surface["Smith"]
    assert by_surface["John Smith"] >= 0
    # default C1 strategy still the pipeline default (unchanged output shape)
    res_c1 = process_document("u", text, is_html=False)
    assert {m.text for m in res_c1.mentions} >= {"John Smith", "Smith"}


def test_kg_pipeline_simple_coref_strategy(ray_session, tmp_path):
    """The flagship pipeline runs end-to-end with --coref simple, and resume
    refuses to mix docs partitions extracted under different strategies."""
    import pyarrow.parquet as pq

    from anno_ray.fixtures.pages import generate_pages_table
    from anno_ray.pipelines.kg import run_extract_stage, run_kg_pipeline

    d = tmp_path / "pages"
    d.mkdir()
    pq.write_table(generate_pages_table(0, 20, seed=3), str(d / "p0.parquet"))
    out = str(tmp_path / "kg")
    stats = run_kg_pipeline(str(d), out, resume=False, coref_strategy="simple")
    assert stats["materialize"]["nodes"]["rows_written"] > 0
    # resuming with the OTHER strategy must re-run the shard, not skip it
    s2 = run_extract_stage(str(d), out, resume=True, coref_strategy="cli")
    assert s2["shards_run"] == 1 and s2["shards_skipped"] == 0
    # resuming with the same strategy skips
    s3 = run_extract_stage(str(d), out, resume=True, coref_strategy="cli")
    assert s3["shards_skipped"] == 1
