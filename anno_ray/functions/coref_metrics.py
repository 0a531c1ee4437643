"""Coreference / clustering evaluation metrics (A4).

Reimplements the metric definitions used by the reference eval framework:
B-cubed (eval/coref_metrics.rs), MUC link-based counts
(eval/ner_metrics.rs:108-160 analog for clusters), and the purity /
completeness pair used for inter-doc coref (eval/inter_doc_coref.rs:10-40).
Driver-side functions over small (predicted, gold) partitions: clusters are
dicts item -> cluster id.
"""

from __future__ import annotations

from collections import Counter, defaultdict


def _clusters(assign: dict) -> list[set]:
    by: dict = defaultdict(set)
    for item, cid in assign.items():
        by[cid].add(item)
    return list(by.values())


def b_cubed(predicted: dict, gold: dict) -> tuple[float, float, float]:
    """B^3 precision/recall/F1 over the common item set."""
    items = set(predicted) & set(gold)
    if not items:
        return (0.0, 0.0, 0.0)
    pred_c = {i: frozenset(k for k in items if predicted[k] == predicted[i]) for i in items}
    gold_c = {i: frozenset(k for k in items if gold[k] == gold[i]) for i in items}
    p = sum(len(pred_c[i] & gold_c[i]) / len(pred_c[i]) for i in items) / len(items)
    r = sum(len(pred_c[i] & gold_c[i]) / len(gold_c[i]) for i in items) / len(items)
    f = 2 * p * r / (p + r) if p + r else 0.0
    return (p, r, f)


def muc(predicted: dict, gold: dict) -> tuple[float, float, float]:
    """MUC link-based P/R/F1: links needed vs links found."""
    items = set(predicted) & set(gold)

    def _score(source: dict, target: dict) -> tuple[int, int]:
        num = den = 0
        for cluster in _clusters({i: source[i] for i in items}):
            den += len(cluster) - 1
            partitions = len({target[i] for i in cluster})
            num += len(cluster) - partitions
        return num, den

    rn, rd = _score(gold, predicted)
    pn, pd = _score(predicted, gold)
    p = pn / pd if pd else 0.0
    r = rn / rd if rd else 0.0
    f = 2 * p * r / (p + r) if p + r else 0.0
    return (p, r, f)


def purity_completeness(predicted: dict, gold: dict) -> tuple[float, float]:
    """Cluster purity (majority-gold fraction) and completeness (inverse
    direction), per inter_doc_coref.rs:10-40."""
    items = set(predicted) & set(gold)
    if not items:
        return (0.0, 0.0)

    def _purity(a: dict, b: dict) -> float:
        total = 0
        for cluster in _clusters({i: a[i] for i in items}):
            counts = Counter(b[i] for i in cluster)
            total += counts.most_common(1)[0][1]
        return total / len(items)

    return (_purity(predicted, gold), _purity(gold, predicted))
