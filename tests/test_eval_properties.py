"""Property-based invariants (hypothesis) for the round-2 eval/metric/coref
modules — the analog of the reference's proptest suites (SURVEY §5)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

LABELS = ["PER", "ORG", "LOC", "DATE"]


@st.composite
def spans(draw, max_n=12):
    n = draw(st.integers(0, max_n))
    out = []
    for i in range(n):
        start = draw(st.integers(0, 60))
        length = draw(st.integers(1, 12))
        out.append(
            {
                "id": i,
                "start": start,
                "end": start + length,
                "label": draw(st.sampled_from(LABELS)),
            }
        )
    return out


@settings(max_examples=200, deadline=None)
@given(pred=spans(), gold=spans())
def test_mode_count_invariants(pred, gold):
    from anno_ray.functions.eval import MODES, mode_counts

    counts = {m: mode_counts(pred, gold, m) for m in MODES}
    for m, (tp, fp, fn) in counts.items():
        assert tp + fp == len(pred), m
        assert tp + fn == len(gold), m
        assert tp >= 0 and fp >= 0 and fn >= 0
    # strict is the most demanding: its tp never exceeds exact's or partial's
    assert counts["strict"][0] <= counts["exact"][0]
    assert counts["strict"][0] <= counts["partial"][0]
    # partial and type are identical without a min-overlap config
    assert counts["partial"] == counts["type"]


@settings(max_examples=200, deadline=None)
@given(pred=spans(), gold=spans())
def test_compare_spans_partition(pred, gold):
    """Every prediction and every gold appears in EXACTLY one match record."""
    from anno_ray.functions.eval import compare_spans

    matches = compare_spans(gold, pred)
    pred_seen = [m["pred_id"] for m in matches if "pred_id" in m]
    gold_seen = [m["gold_id"] for m in matches if "gold_id" in m]
    assert sorted(pred_seen) == [p["id"] for p in pred]
    assert sorted(gold_seen) == [g["id"] for g in gold]
    for m in matches:
        if m["kind"] == "boundary_error":
            assert 0.0 < m["iou"] <= 1.0


@st.composite
def chain_sets(draw, items="abcdefghij"):
    labels = {
        it: draw(st.integers(0, 3))
        for it in items
        if draw(st.booleans())
    }
    by: dict[int, list] = {}
    for it, c in labels.items():
        by.setdefault(c, []).append(it)
    return list(by.values())


@settings(max_examples=150, deadline=None)
@given(pred=chain_sets(), gold=chain_sets())
def test_coref_metric_bounds(pred, gold):
    from anno_ray.functions.coref_metrics import blanc, ceaf_e, ceaf_m, lea

    for fn in (ceaf_e, ceaf_m, lea, blanc):
        p, r, f = fn(pred, gold)
        assert 0.0 <= p <= 1.0 + 1e-9, fn.__name__
        assert 0.0 <= r <= 1.0 + 1e-9, fn.__name__
        assert 0.0 <= f <= 1.0 + 1e-9, fn.__name__
    # identity is perfect for CEAF/LEA when both sides non-empty
    if pred:
        for fn in (ceaf_e, ceaf_m, lea):
            assert fn(pred, pred) == (1.0, 1.0, 1.0), fn.__name__
        # BLANC identity: perfect iff BOTH pair classes exist (reference
        # formula averages in a 0-denominator 0.0 when a class is absent —
        # e.g. blanc of one 2-mention chain vs itself is 0.5, faithful to
        # coref_metrics.rs:905-955)
        n_mentions = sum(len(c) for c in pred)
        has_coref = any(len(c) > 1 for c in pred)
        has_non = len(pred) > 1
        bp, br, bf = blanc(pred, pred)
        if n_mentions < 2:
            assert (bp, br, bf) == (1.0, 1.0, 1.0)
        elif has_coref and has_non:
            assert (bp, br, bf) == (1.0, 1.0, 1.0)
        else:
            assert (bp, br, bf) == (0.5, 0.5, 0.5)


@st.composite
def entity_seqs(draw):
    names = ["John Smith", "Smith", "Acme Corp", "Acme", "Paris", "Berlin"]
    prons = ["he", "she", "they", "it", "xe"]
    n = draw(st.integers(0, 10))
    out = []
    pos = 0
    for _ in range(n):
        text = draw(st.sampled_from(names + prons))
        out.append(
            {
                "text": text,
                "label": draw(st.sampled_from(LABELS)),
                "start": pos,
                "end": pos + len(text),
            }
        )
        pos += len(text) + 1
    return out


@settings(max_examples=200, deadline=None)
@given(ents=entity_seqs(), fuzzy=st.booleans())
def test_simple_coref_invariants(ents, fuzzy):
    from anno_ray.core.coref_resolver import CorefConfig, SimpleCorefResolver

    out = SimpleCorefResolver(CorefConfig(fuzzy_matching=fuzzy)).resolve(ents)
    assert len(out) == len(ents)
    ids = [e["canonical_id"] for e in out]
    assert all(isinstance(i, int) and i >= 0 for i in ids)
    # cluster ids are dense 0..k-1 and numbered by first appearance
    seen: list[int] = []
    for i in ids:
        if i not in seen:
            seen.append(i)
    assert seen == list(range(len(seen)))
    # resolving twice is stable (no hidden state)
    out2 = SimpleCorefResolver(CorefConfig(fuzzy_matching=fuzzy)).resolve(ents)
    assert [e["canonical_id"] for e in out2] == ids


@settings(max_examples=100, deadline=None)
@given(
    preds=st.lists(
        st.tuples(st.floats(0.0, 1.0), st.booleans()), min_size=0, max_size=60
    ),
    bins=st.integers(2, 20),
)
def test_calibration_bounds(preds, bins):
    from anno_ray.functions.coref_metrics import calibration

    res = calibration(preds, num_bins=bins)
    assert 0.0 <= res["ece"] <= 1.0 + 1e-9
    assert res["ece"] <= res["mce"] + 1e-9  # ECE is a weighted avg of bin errors
    assert 0.0 <= res["brier_score"] <= 1.0 + 1e-9
    assert res["total_predictions"] == len(preds)
    assert sum(b["count"] for b in res["reliability_bins"]) == len(preds)
