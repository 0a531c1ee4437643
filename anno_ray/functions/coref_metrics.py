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


# --- chain-based metrics (CEAF / LEA / BLANC / CoNLL), coref_metrics.rs ------
#
# Chains are lists of hashable mention ids (e.g. span tuples). Unlike the
# dict-based B^3/MUC above, these follow the reference's CorefChain API:
# CEAF uses FULL chain sizes in the denominators (no common-mention
# filtering), LEA/BLANC restrict to mentions present on both sides
# (coref_metrics.rs:289-330).


def _chain_index(chains: list) -> dict:
    return {m: i for i, ch in enumerate(chains) for m in ch}


def _common_mentions(pred: list, gold: list) -> set:
    p = {m for ch in pred for m in ch}
    g = {m for ch in gold for m in ch}
    return p & g


def _f1(p: float, r: float) -> float:
    return 2 * p * r / (p + r) if p + r else 0.0


def _ceaf_phi4(pred_chain, gold_chain) -> float:
    """phi4 = |shared mentions| (Luo 2005; coref_metrics.rs:534)."""
    return float(len(set(pred_chain) & set(gold_chain)))


def _ceaf_phi3(pred_chain, gold_chain) -> float:
    """phi3 = 2*|shared| / (|p|+|g|) if any shared else 0
    (coref_metrics.rs:543)."""
    overlap = len(set(pred_chain) & set(gold_chain))
    if overlap == 0:
        return 0.0
    return 2 * overlap / (len(pred_chain) + len(gold_chain))


def _greedy_assignment(pred: list, gold: list, sim_fn) -> float:
    """Greedy max-similarity 1:1 chain alignment (the reference's Hungarian
    approximation, coref_metrics.rs:557-595; stable sort keeps the same
    (i, j)-order tie behavior)."""
    if not pred or not gold:
        return 0.0
    sims = []
    for i, p in enumerate(pred):
        for j, g in enumerate(gold):
            s = sim_fn(p, g)
            if s > 0.0:
                sims.append((i, j, s))
    sims.sort(key=lambda t: -t[2])  # stable: ties keep i-major, j-minor order
    used_p: set[int] = set()
    used_g: set[int] = set()
    total = 0.0
    for i, j, s in sims:
        if i not in used_p and j not in used_g:
            total += s
            used_p.add(i)
            used_g.add(j)
    return total


def ceaf_e(predicted: list, gold: list) -> tuple[float, float, float]:
    """CEAF entity-based (phi4): P = sim/|pred mentions|, R = sim/|gold
    mentions| (coref_metrics.rs:610-638)."""
    sim = _greedy_assignment(predicted, gold, _ceaf_phi4)
    pred_mentions = sum(len(c) for c in predicted)
    gold_mentions = sum(len(c) for c in gold)
    p = sim / pred_mentions if pred_mentions else 0.0
    r = sim / gold_mentions if gold_mentions else 0.0
    return (p, r, _f1(p, r))


def ceaf_m(predicted: list, gold: list) -> tuple[float, float, float]:
    """CEAF mention-based (phi3): denominators are CHAIN counts
    (coref_metrics.rs:640-668)."""
    sim = _greedy_assignment(predicted, gold, _ceaf_phi3)
    p = sim / len(predicted) if predicted else 0.0
    r = sim / len(gold) if gold else 0.0
    return (p, r, _f1(p, r))


def lea(predicted: list, gold: list) -> tuple[float, float, float]:
    """LEA (Moosavi & Strube 2016): per-entity link-resolution score weighted
    by entity size over common mentions; singleton credit iff the other side
    also has it as a singleton (coref_metrics.rs:680-830)."""
    common = _common_mentions(predicted, gold)
    if not common:
        return (0.0, 0.0, 0.0)
    pred_index = _chain_index(predicted)
    gold_index = _chain_index(gold)

    def _side(chains, other_chains, own_index, other_index):
        num = den = 0.0
        for chain in chains:
            mentions = [m for m in chain if m in common]
            if not mentions:
                continue
            importance = float(len(mentions))
            den += importance
            if len(mentions) == 1:
                span = mentions[0]
                oc = other_index.get(span)
                if oc is not None:
                    other_in_common = [m for m in other_chains[oc] if m in common]
                    if len(other_in_common) == 1:
                        num += importance
            else:
                correct = 0
                total = len(mentions) * (len(mentions) - 1) // 2
                for i in range(len(mentions)):
                    for j in range(i + 1, len(mentions)):
                        oi = other_index.get(mentions[i])
                        oj = other_index.get(mentions[j])
                        if oi is not None and oj is not None and oi == oj:
                            correct += 1
                num += importance * (correct / total if total else 0.0)
        return num / den if den else 0.0

    r = _side(gold, predicted, gold_index, pred_index)
    p = _side(predicted, gold, pred_index, gold_index)
    return (p, r, _f1(p, r))


def blanc(predicted: list, gold: list) -> tuple[float, float, float]:
    """BLANC (Recasens & Hovy 2010): Rand-index style average of coref and
    non-coref pair F1 over common mentions; <2 common mentions -> perfect by
    definition (coref_metrics.rs:851-955)."""
    common = sorted(_common_mentions(predicted, gold))
    if len(common) < 2:
        return (1.0, 1.0, 1.0)
    pred_index = _chain_index(predicted)
    gold_index = _chain_index(gold)
    c_tp = c_fp = c_fn = n_tp = n_fp = n_fn = 0
    for i in range(len(common)):
        for j in range(i + 1, len(common)):
            pi, pj = pred_index.get(common[i]), pred_index.get(common[j])
            gi, gj = gold_index.get(common[i]), gold_index.get(common[j])
            pred_same = pi is not None and pi == pj
            gold_same = gi is not None and gi == gj
            if pred_same and gold_same:
                c_tp += 1
            elif pred_same:
                c_fp += 1
                n_fn += 1
            elif gold_same:
                c_fn += 1
                n_fp += 1
            else:
                n_tp += 1
    cp = c_tp / (c_tp + c_fp) if c_tp + c_fp else 0.0
    cr = c_tp / (c_tp + c_fn) if c_tp + c_fn else 0.0
    np_ = n_tp / (n_tp + n_fp) if n_tp + n_fp else 0.0
    nr = n_tp / (n_tp + n_fn) if n_tp + n_fn else 0.0
    return (
        (cp + np_) / 2.0,
        (cr + nr) / 2.0,
        (_f1(cp, cr) + _f1(np_, nr)) / 2.0,
    )


def _chains_from_assign(assign: dict) -> list[list]:
    by: dict = defaultdict(list)
    for item in sorted(assign, key=repr):
        by[assign[item]].append(item)
    return list(by.values())


def conll_f1(predicted: list, gold: list) -> float:
    """Official CoNLL-2011/2012 metric: mean of MUC, B^3, CEAFe F1
    (coref_metrics.rs:958)."""
    pa = {m: i for i, ch in enumerate(predicted) for m in ch}
    ga = {m: i for i, ch in enumerate(gold) for m in ch}
    _, _, muc_f = muc(pa, ga)
    _, _, b3_f = b_cubed(pa, ga)
    _, _, ceafe_f = ceaf_e(predicted, gold)
    return (muc_f + b3_f + ceafe_f) / 3.0


# --- confidence calibration (eval/calibration.rs) ----------------------------


def calibration(
    predictions: list[tuple[float, bool]],
    num_bins: int = 10,
    thresholds: tuple[float, ...] = (0.5, 0.7, 0.8, 0.9, 0.95),
) -> dict:
    """ECE / MCE / Brier + reliability bins from (confidence, correct) pairs
    (calibration.rs:142-260; Guo et al. 2017).

    ECE = sum over bins of (n_i/N) * |accuracy_i - avg_confidence_i|."""
    if not predictions:
        return {
            "ece": 0.0, "mce": 0.0, "brier_score": 0.0,
            "avg_confidence_correct": 0.0, "avg_confidence_incorrect": 0.0,
            "confidence_gap": 0.0, "reliability_bins": [],
            "total_predictions": 0, "threshold_accuracy": {},
        }
    bin_width = 1.0 / num_bins
    bins: list[list[tuple[float, bool]]] = [[] for _ in range(num_bins)]
    for conf, correct in predictions:
        idx = min(int(conf * num_bins), num_bins - 1)
        bins[idx].append((conf, correct))

    reliability_bins = []
    ece = 0.0
    mce = 0.0
    n = len(predictions)
    for i, b in enumerate(bins):
        if not b:
            continue
        avg_conf = sum(c for c, _ in b) / len(b)
        acc = sum(1 for _, ok in b if ok) / len(b)
        err = abs(acc - avg_conf)
        ece += (len(b) / n) * err
        mce = max(mce, err)
        reliability_bins.append(
            {
                "range": (i * bin_width, (i + 1) * bin_width),
                "avg_confidence": avg_conf,
                "accuracy": acc,
                "count": len(b),
                "calibration_error": err,
            }
        )
    brier = sum((c - (1.0 if ok else 0.0)) ** 2 for c, ok in predictions) / n
    correct_confs = [c for c, ok in predictions if ok]
    incorrect_confs = [c for c, ok in predictions if not ok]
    avg_c = sum(correct_confs) / len(correct_confs) if correct_confs else 0.0
    avg_i = sum(incorrect_confs) / len(incorrect_confs) if incorrect_confs else 0.0
    threshold_accuracy = {}
    for t in thresholds:
        above = [(c, ok) for c, ok in predictions if c >= t]
        threshold_accuracy[t] = (
            sum(1 for _, ok in above if ok) / len(above) if above else 0.0
        )
    return {
        "ece": ece, "mce": mce, "brier_score": brier,
        "avg_confidence_correct": avg_c, "avg_confidence_incorrect": avg_i,
        "confidence_gap": avg_c - avg_i, "reliability_bins": reliability_bins,
        "total_predictions": n, "threshold_accuracy": threshold_accuracy,
    }
