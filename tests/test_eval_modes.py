"""SemEval eval modes, 2-pass greedy comparison, and Rel/Rel+ relation eval.

Test cases mirror the reference's own unit tests
(/root/reference/anno/src/eval/modes.rs:659-790, eval/relation.rs doc tests,
anno-core/src/grounded.rs compare doc test)."""

from __future__ import annotations

import pytest

from anno_ray.functions.eval import (
    MODES,
    RelationEvalConfig,
    compare_spans,
    evaluate_mode,
    evaluate_relations,
    mode_counts,
    multi_mode_results,
    overlap_ratio,
)


def _m(start, end, label):
    return {"start": start, "end": end, "label": label}


# --- modes.rs unit-test mirrors ----------------------------------------------

def test_strict_exact_match():
    r = evaluate_mode([_m(0, 4, "PER")], [_m(0, 4, "PER")], "strict")
    assert abs(r.f1 - 1.0) < 1e-3


def test_strict_wrong_boundary_partial_passes():
    pred = [_m(0, 10, "PER")]
    gold = [_m(0, 4, "PER")]
    assert evaluate_mode(pred, gold, "strict").f1 == 0.0
    assert abs(evaluate_mode(pred, gold, "partial").f1 - 1.0) < 1e-3


def test_strict_wrong_type_exact_passes():
    pred = [_m(0, 5, "ORG")]
    gold = [_m(0, 5, "LOC")]
    assert evaluate_mode(pred, gold, "strict").f1 == 0.0
    assert abs(evaluate_mode(pred, gold, "exact").f1 - 1.0) < 1e-3


def test_partial_overlap():
    pred = [_m(0, 13, "LOC")]  # "New York City"
    gold = [_m(0, 8, "LOC")]  # "New York"
    assert evaluate_mode(pred, gold, "strict").f1 == 0.0
    assert abs(evaluate_mode(pred, gold, "partial").f1 - 1.0) < 1e-3


def test_no_overlap_fails_all_modes():
    pred = [_m(0, 4, "PER")]
    gold = [_m(10, 14, "PER")]
    for mode in MODES:
        assert evaluate_mode(pred, gold, mode).f1 == 0.0, mode


def test_multi_mode_results():
    pred = [_m(0, 4, "PER"), _m(10, 23, "LOC")]
    gold = [_m(0, 4, "PER"), _m(10, 18, "LOC")]
    all_r = multi_mode_results(pred, gold)
    assert abs(all_r["strict"].precision - 0.5) < 1e-3
    assert abs(all_r["partial"].f1 - 1.0) < 1e-3


def test_overlap_ratio():
    assert abs(overlap_ratio(0, 10, 0, 10) - 1.0) < 1e-3
    assert overlap_ratio(0, 5, 10, 15) == 0.0
    assert abs(overlap_ratio(0, 10, 5, 15) - 5.0 / 15.0) < 1e-3


def test_min_overlap_config():
    # "New York" (0,8) vs gold "New York City" (0,13): IoU = 8/13 = 0.615
    pred = [_m(0, 8, "LOC")]
    gold = [_m(0, 13, "LOC")]
    assert evaluate_mode(pred, gold, "partial", min_overlap=0.5).f1 > 0.99
    assert evaluate_mode(pred, gold, "partial", min_overlap=0.7).f1 == 0.0


def test_empty_inputs():
    r = evaluate_mode([], [], "strict")
    assert r.precision == 0.0 and r.recall == 0.0 and r.f1 == 0.0
    assert r.true_positives == r.false_positives == r.false_negatives == 0


def test_greedy_first_unmatched_gold():
    """Two identical predictions, one gold: first takes it, second is FP."""
    pred = [_m(0, 4, "PER"), _m(0, 4, "PER")]
    gold = [_m(0, 4, "PER")]
    tp, fp, fn = mode_counts(pred, gold, "strict")
    assert (tp, fp, fn) == (1, 1, 0)


# --- grounded.rs 2-pass greedy comparison ------------------------------------

def test_compare_doc_example():
    """grounded.rs compare doc test: 1 correct + 1 missed."""
    gold = [
        {"id": 0, "start": 0, "end": 11, "label": "PER"},
        {"id": 1, "start": 20, "end": 31, "label": "AWARD"},
    ]
    pred = [{"id": 0, "start": 0, "end": 11, "label": "PER"}]
    matches = compare_spans(gold, pred)
    kinds = sorted(m["kind"] for m in matches)
    assert kinds == ["correct", "missed"]


def test_compare_type_mismatch_and_boundary():
    gold = [
        {"id": 0, "start": 0, "end": 5, "label": "ORG"},
        {"id": 1, "start": 10, "end": 20, "label": "LOC"},
    ]
    pred = [
        {"id": 0, "start": 0, "end": 5, "label": "LOC"},  # exact span, wrong type
        {"id": 1, "start": 12, "end": 22, "label": "LOC"},  # overlap
        {"id": 2, "start": 40, "end": 44, "label": "PER"},  # spurious
    ]
    matches = compare_spans(gold, pred)
    by_kind = {m["kind"]: m for m in matches}
    assert by_kind["type_mismatch"]["gold_label"] == "ORG"
    assert abs(by_kind["boundary_error"]["iou"] - 8.0 / 12.0) < 1e-9
    assert by_kind["spurious"]["pred_id"] == 2
    assert "missed" not in by_kind


def test_compare_exact_pass_beats_overlap():
    """Pass 1 claims the exact-span gold even when an earlier prediction
    merely overlaps it (pass ordering, grounded.rs)."""
    gold = [{"id": 0, "start": 0, "end": 10, "label": "PER"}]
    pred = [
        {"id": 0, "start": 0, "end": 8, "label": "PER"},  # overlap only
        {"id": 1, "start": 0, "end": 10, "label": "PER"},  # exact
    ]
    matches = compare_spans(gold, pred)
    by_kind = {m["kind"]: m for m in matches}
    assert by_kind["correct"]["pred_id"] == 1
    assert by_kind["spurious"]["pred_id"] == 0


# --- relation.rs Rel / Rel+ --------------------------------------------------

def _rel(hs, ht, ts, tt, rt):
    return {
        "head_span": hs, "head_type": ht,
        "tail_span": ts, "tail_type": tt,
        "relation_type": rt,
    }


def test_relation_exact_match():
    gold = [_rel((0, 10), "PER", (20, 25), "ORG", "FOUNDED")]
    pred = [_rel((0, 10), "PER", (20, 25), "ORG", "FOUNDED")]
    m = evaluate_relations(gold, pred)
    assert abs(m.strict_f1 - 1.0) < 1e-3
    assert abs(m.boundary_f1 - 1.0) < 1e-3


def test_relation_boundary_only():
    """Head span shifted but >=50% overlap: Rel passes, Rel+ fails."""
    gold = [_rel((0, 10), "PER", (20, 25), "ORG", "FOUNDED")]
    pred = [_rel((0, 8), "PER", (20, 25), "ORG", "FOUNDED")]
    m = evaluate_relations(gold, pred)
    assert m.strict_matches == 0
    assert m.boundary_matches == 1
    assert abs(m.boundary_f1 - 1.0) < 1e-3


def test_relation_type_case_insensitive_and_wrong_rel():
    gold = [_rel((0, 10), "PER", (20, 25), "ORG", "founded")]
    pred = [_rel((0, 10), "PER", (20, 25), "ORG", "FOUNDED")]
    assert evaluate_relations(gold, pred).strict_matches == 1
    pred2 = [_rel((0, 10), "PER", (20, 25), "ORG", "WORKS_FOR")]
    m2 = evaluate_relations(gold, pred2)
    assert m2.strict_matches == 0 and m2.boundary_matches == 0


def test_relation_entity_type_gate():
    gold = [_rel((0, 10), "PER", (20, 25), "ORG", "FOUNDED")]
    pred = [_rel((0, 10), "ORG", (20, 25), "ORG", "FOUNDED")]
    assert evaluate_relations(gold, pred).strict_matches == 0
    cfg = RelationEvalConfig(require_entity_type_match=False)
    assert evaluate_relations(gold, pred, cfg).strict_matches == 1


def test_relation_undirected():
    # NOTE reference quirk preserved (relation.rs:272-276): the entity-type
    # gate compares head-to-head/tail-to-tail even for a REVERSED candidate,
    # so undirected matching only fires when the types are symmetric (or the
    # gate is off)
    gold = [_rel((0, 10), "PER", (20, 25), "PER", "RELATED")]
    pred = [_rel((20, 25), "PER", (0, 10), "PER", "RELATED")]
    assert evaluate_relations(gold, pred).strict_matches == 0
    cfg = RelationEvalConfig(directed_relations=False)
    m = evaluate_relations(gold, pred, cfg)
    assert m.strict_matches == 1
    # asymmetric types + reversed + type gate on: blocked even undirected
    gold2 = [_rel((0, 10), "PER", (20, 25), "ORG", "RELATED")]
    pred2 = [_rel((20, 25), "ORG", (0, 10), "PER", "RELATED")]
    assert evaluate_relations(gold2, pred2, cfg).strict_matches == 0
    cfg2 = RelationEvalConfig(directed_relations=False, require_entity_type_match=False)
    assert evaluate_relations(gold2, pred2, cfg2).strict_matches == 1


def test_relation_empty_empty_is_perfect():
    m = evaluate_relations([], [])
    assert m.strict_f1 == 1.0 and m.boundary_f1 == 1.0


def test_relation_per_type_breakdown():
    gold = [
        _rel((0, 10), "PER", (20, 25), "ORG", "FOUNDED"),
        _rel((30, 35), "PER", (40, 45), "ORG", "WORKS_FOR"),
    ]
    pred = [_rel((0, 10), "PER", (20, 25), "ORG", "FOUNDED")]
    m = evaluate_relations(gold, pred)
    assert m.per_relation["FOUNDED"]["strict_matches"] == 1
    assert m.per_relation["WORKS_FOR"]["gold_count"] == 1
    assert m.per_relation["WORKS_FOR"]["pred_count"] == 0


# --- the distributed eval_ner_modes query ------------------------------------

def test_eval_ner_modes_query(ray_session):
    from anno_ray.functions.docqueries import eval_ner_modes

    df = eval_ner_modes("/root/testdata/sf0.001")
    assert list(df["mode"]) == ["exact", "partial", "strict", "type"]
    # the fake zero-shot scorer overlaps the stacked NER a lot on spans but
    # assigns hash-random labels: exact (span-only) must dominate strict,
    # and partial >= strict always
    by_mode = dict(zip(df["mode"], df["f1"]))
    assert by_mode["exact"] >= by_mode["strict"]
    assert by_mode["partial"] >= by_mode["strict"]
    assert (df[["tp", "fp", "fn"]].to_numpy() >= 0).all()
    assert df["tp"].sum() > 0


def test_coref_quality_query(ray_session):
    from anno_ray.functions.docqueries import coref_quality

    df = coref_quality("/root/testdata/sf0.001")
    assert list(df["metric"]) == [
        "b3_f1", "blanc_f1", "ceaf_e_f1", "ceaf_m_f1", "conll_f1", "lea_f1", "muc_f1",
    ]
    # C1 and C2 agree strongly but not perfectly (different fuzzy rules)
    vals = dict(zip(df["metric"], df["macro_avg"]))
    assert 0.5 < vals["conll_f1"] <= 1.0
    assert all(0.0 <= v <= 1.0 for v in vals.values())
    # deterministic
    df2 = coref_quality("/root/testdata/sf0.001")
    assert df.equals(df2)


def test_minhash_dedup_keep_query(ray_session):
    from anno_ray.functions.docqueries import minhash_dedup_keep

    t = minhash_dedup_keep("/root/testdata/sf0.001")
    ids = t.column("doc_id").to_pylist()
    keeps = t.column("keep_id").to_pylist()
    assert len(ids) > 0
    assert all(k <= d for d, k in zip(ids, keeps))  # keep = min of cluster
    assert set(keeps) <= set(ids)  # representatives are cluster members
