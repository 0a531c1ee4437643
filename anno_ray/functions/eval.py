"""Evaluation joins (J4): triple/mention exact-match P/R, the 2-pass greedy
span matcher, SemEval-2013 modes, and relation Rel/Rel+ metrics.

Reference semantics mirrored exactly:
- 2-pass greedy comparison (exact -> Correct/TypeMismatch, then any-overlap
  -> BoundaryError(iou), leftovers Spurious/Missed):
  /root/reference/anno-core/src/grounded.rs:2439-2560
- SemEval Strict/Exact/Partial/Type modes with min-overlap config:
  /root/reference/anno/src/eval/modes.rs:229-660 (greedy first-unmatched-gold
  per prediction; Partial and Type differ only via EvalConfig.min_overlap)
- Relation Rel (boundary-overlap, threshold 0.5) and Rel+ (exact spans):
  /root/reference/anno/src/eval/relation.rs:33-420
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa


@dataclass(slots=True)
class PRResult:
    precision: float
    recall: float
    f1: float
    n_pred: int
    n_gold: int
    n_match: int


def _key_set(tbl: pa.Table) -> set[tuple]:
    cols = ["url", "subj", "pred", "obj"]
    return set(
        zip(*(tbl.column(c).to_pylist() for c in cols))
    )


def triple_pr(predicted: pa.Table, gold: pa.Table) -> PRResult:
    """Exact-match precision/recall over distinct (url, subj, pred, obj)."""
    p = _key_set(predicted)
    g = _key_set(gold)
    match = len(p & g)
    precision = match / len(p) if p else 1.0
    recall = match / len(g) if g else 1.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if (precision + recall) > 0
        else 0.0
    )
    return PRResult(precision, recall, f1, len(p), len(g), match)


def mention_pr(predicted: pa.Table, gold: pa.Table) -> PRResult:
    """Exact span+label mention P/R on (url, start, end, label)."""
    cols = ["url", "start", "end", "label"]
    p = set(zip(*(predicted.column(c).to_pylist() for c in cols)))
    g = set(zip(*(gold.column(c).to_pylist() for c in cols)))
    match = len(p & g)
    precision = match / len(p) if p else 1.0
    recall = match / len(g) if g else 1.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if (precision + recall) > 0
        else 0.0
    )
    return PRResult(precision, recall, f1, len(p), len(g), match)


# --- 2-pass greedy span comparison (grounded.rs:2439-2560) -------------------

def overlap_ratio(s1: int, e1: int, s2: int, e2: int) -> float:
    """Span IoU (modes.rs:468-486): intersection / union; 1.0 for two empty
    coincident spans."""
    inter_s = max(s1, s2)
    inter_e = min(e1, e2)
    if inter_s >= inter_e:
        return 0.0
    inter = inter_e - inter_s
    union = (e1 - s1) + (e2 - s2) - inter
    return 1.0 if union == 0 else inter / union


def _overlaps(s1: int, e1: int, s2: int, e2: int) -> bool:
    return s1 < e2 and s2 < e1


def compare_spans(gold: list[dict], predicted: list[dict]) -> list[dict]:
    """Greedy 2-pass comparison of one document's mentions.

    ``gold``/``predicted``: dicts with start, end, label (and optionally id —
    defaults to the list index). Returns match records with kind in
    {correct, type_mismatch, boundary_error, spurious, missed}; boundary
    errors carry ``iou``. Pass order and first-unmatched-gold-wins greediness
    replicate grounded.rs exactly."""
    matches: list[dict] = []
    gold_matched = [False] * len(gold)
    pred_matched = [False] * len(predicted)

    def _id(items, i):
        return items[i].get("id", i)

    # pass 1: exact span -> Correct / TypeMismatch
    for pi, p in enumerate(predicted):
        for gi, g in enumerate(gold):
            if gold_matched[gi]:
                continue
            if (p["start"], p["end"]) == (g["start"], g["end"]):
                if p["label"] == g["label"]:
                    matches.append(
                        {"kind": "correct", "gold_id": _id(gold, gi),
                         "pred_id": _id(predicted, pi)}
                    )
                else:
                    matches.append(
                        {"kind": "type_mismatch", "gold_id": _id(gold, gi),
                         "pred_id": _id(predicted, pi),
                         "gold_label": g["label"], "pred_label": p["label"]}
                    )
                gold_matched[gi] = True
                pred_matched[pi] = True
                break

    # pass 2: any overlap -> BoundaryError(iou)
    for pi, p in enumerate(predicted):
        if pred_matched[pi]:
            continue
        for gi, g in enumerate(gold):
            if gold_matched[gi]:
                continue
            if _overlaps(p["start"], p["end"], g["start"], g["end"]):
                iou = overlap_ratio(p["start"], p["end"], g["start"], g["end"])
                matches.append(
                    {"kind": "boundary_error", "gold_id": _id(gold, gi),
                     "pred_id": _id(predicted, pi), "iou": iou}
                )
                gold_matched[gi] = True
                pred_matched[pi] = True
                break

    for pi in range(len(predicted)):
        if not pred_matched[pi]:
            matches.append({"kind": "spurious", "pred_id": _id(predicted, pi)})
    for gi in range(len(gold)):
        if not gold_matched[gi]:
            matches.append({"kind": "missed", "gold_id": _id(gold, gi)})
    return matches


# --- SemEval-2013 Task 9.1 modes (modes.rs) ----------------------------------

MODES = ("strict", "exact", "partial", "type")


@dataclass(slots=True)
class ModeResults:
    mode: str
    precision: float
    recall: float
    f1: float
    true_positives: int
    false_positives: int
    false_negatives: int


def _entities_match(p: dict, g: dict, mode: str, min_overlap: float) -> bool:
    if mode == "strict":
        return (
            p["start"] == g["start"] and p["end"] == g["end"]
            and p["label"] == g["label"]
        )
    if mode == "exact":
        return p["start"] == g["start"] and p["end"] == g["end"]
    if mode in ("partial", "type"):
        if not _overlaps(p["start"], p["end"], g["start"], g["end"]):
            return False
        if min_overlap > 0.0 and overlap_ratio(
            p["start"], p["end"], g["start"], g["end"]
        ) < min_overlap:
            return False
        return p["label"] == g["label"]
    raise ValueError(mode)


def mode_counts(
    predicted: list[dict], gold: list[dict], mode: str, min_overlap: float = 0.0
) -> tuple[int, int, int]:
    """(tp, fp, fn) with the reference's greedy first-unmatched-gold match
    (modes.rs count_matches)."""
    gold_matched = [False] * len(gold)
    tp = fp = 0
    for p in predicted:
        found = False
        for gi, g in enumerate(gold):
            if gold_matched[gi]:
                continue
            if _entities_match(p, g, mode, min_overlap):
                gold_matched[gi] = True
                found = True
                tp += 1
                break
        if not found:
            fp += 1
    fn = sum(1 for m in gold_matched if not m)
    return tp, fp, fn


def _prf(tp: int, fp: int, fn: int) -> tuple[float, float, float]:
    p = tp / (tp + fp) if tp + fp else 0.0
    r = tp / (tp + fn) if tp + fn else 0.0
    f = 2 * p * r / (p + r) if p + r else 0.0
    return p, r, f


def evaluate_mode(
    predicted: list[dict], gold: list[dict], mode: str, min_overlap: float = 0.0
) -> ModeResults:
    tp, fp, fn = mode_counts(predicted, gold, mode, min_overlap)
    p, r, f = _prf(tp, fp, fn)
    return ModeResults(mode, p, r, f, tp, fp, fn)


def multi_mode_results(
    predicted: list[dict], gold: list[dict], min_overlap: float = 0.0
) -> dict[str, ModeResults]:
    return {m: evaluate_mode(predicted, gold, m, min_overlap) for m in MODES}


# --- relation eval: Rel (boundary) / Rel+ (strict) (eval/relation.rs) --------

@dataclass(slots=True)
class RelationEvalConfig:
    overlap_threshold: float = 0.5
    require_entity_type_match: bool = True
    directed_relations: bool = True


@dataclass(slots=True)
class RelationMetrics:
    boundary_precision: float
    boundary_recall: float
    boundary_f1: float
    strict_precision: float
    strict_recall: float
    strict_f1: float
    num_predicted: int
    num_gold: int
    boundary_matches: int
    strict_matches: int
    per_relation: dict = field(default_factory=dict)


def _span_overlap(a: tuple[int, int], b: tuple[int, int]) -> float:
    return overlap_ratio(a[0], a[1], b[0], b[1])


def evaluate_relations(
    gold: list[dict], pred: list[dict], config: RelationEvalConfig | None = None
) -> RelationMetrics:
    """Relation triples: Rel (entity spans overlap >= threshold) and Rel+
    (exact spans), greedy per-prediction, relation type case-insensitive.
    ``gold``/``pred`` dicts: head_span, head_type, tail_span, tail_type,
    relation_type. Matches relation.rs:218-420 including the empty-empty
    = all-1.0 convention."""
    config = config or RelationEvalConfig()
    if not gold and not pred:
        return RelationMetrics(1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0, 0, 0, 0, {})

    gold_b = [False] * len(gold)
    gold_s = [False] * len(gold)
    pred_b = [False] * len(pred)
    pred_s = [False] * len(pred)
    # rel_type -> [gold_count, pred_count, boundary_matches, strict_matches]
    stats: dict[str, list[int]] = {}
    for g in gold:
        stats.setdefault(g["relation_type"], [0, 0, 0, 0])[0] += 1
    for p in pred:
        stats.setdefault(p["relation_type"], [0, 0, 0, 0])[1] += 1

    def _types_ok(p, g):
        return not config.require_entity_type_match or (
            p["head_type"] == g["head_type"] and p["tail_type"] == g["tail_type"]
        )

    # strict pass (Rel+): exact spans
    for pi, p in enumerate(pred):
        if pred_s[pi]:
            continue
        for gi, g in enumerate(gold):
            if gold_s[gi]:
                continue
            if p["relation_type"].lower() != g["relation_type"].lower():
                continue
            if not _types_ok(p, g):
                continue
            fwd = (
                tuple(p["head_span"]) == tuple(g["head_span"])
                and tuple(p["tail_span"]) == tuple(g["tail_span"])
            )
            rev = not config.directed_relations and (
                tuple(p["head_span"]) == tuple(g["tail_span"])
                and tuple(p["tail_span"]) == tuple(g["head_span"])
            )
            if fwd or rev:
                gold_s[gi] = True
                pred_s[pi] = True
                stats[g["relation_type"]][3] += 1
                break

    # boundary pass (Rel): span overlap >= threshold
    for pi, p in enumerate(pred):
        if pred_b[pi]:
            continue
        for gi, g in enumerate(gold):
            if gold_b[gi]:
                continue
            if p["relation_type"].lower() != g["relation_type"].lower():
                continue
            if not _types_ok(p, g):
                continue
            fwd = (
                _span_overlap(p["head_span"], g["head_span"]) >= config.overlap_threshold
                and _span_overlap(p["tail_span"], g["tail_span"]) >= config.overlap_threshold
            )
            rev = not config.directed_relations and (
                _span_overlap(p["head_span"], g["tail_span"]) >= config.overlap_threshold
                and _span_overlap(p["tail_span"], g["head_span"]) >= config.overlap_threshold
            )
            if fwd or rev:
                gold_b[gi] = True
                pred_b[pi] = True
                stats[g["relation_type"]][2] += 1
                break

    bm = sum(pred_b)
    sm = sum(pred_s)
    bp = bm / len(pred) if pred else 0.0
    br = bm / len(gold) if gold else 0.0
    sp = sm / len(pred) if pred else 0.0
    sr = sm / len(gold) if gold else 0.0

    def _f1(p, r):
        return 2 * p * r / (p + r) if p + r else 0.0

    per_relation = {}
    for rel, (gc, pcnt, b, s) in stats.items():
        b_p = b / pcnt if pcnt else 0.0
        b_r = b / gc if gc else 0.0
        s_p = s / pcnt if pcnt else 0.0
        s_r = s / gc if gc else 0.0
        per_relation[rel] = {
            "boundary_f1": _f1(b_p, b_r),
            "strict_f1": _f1(s_p, s_r),
            "gold_count": gc,
            "pred_count": pcnt,
            "boundary_matches": b,
            "strict_matches": s,
        }
    return RelationMetrics(
        bp, br, _f1(bp, br), sp, sr, _f1(sp, sr),
        len(pred), len(gold), bm, sm, per_relation,
    )
