"""Triple-set evaluation: exact-match P/R (the >=0.95 gate, J4 analog).

Mirrors the reference eval join semantics (exact span+label matching mode,
/root/reference/anno-core/src/grounded.rs:2439-2560 and eval/relation.rs):
predicted vs gold triples joined on the DISTINCT key (url, subj, pred, obj).
"""

from __future__ import annotations

from dataclasses import dataclass

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
