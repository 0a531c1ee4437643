"""CEAF/LEA/BLANC/CoNLL-F1 + calibration against hand-computed fixtures."""

from __future__ import annotations

import pytest

from anno_ray.functions.coref_metrics import (
    blanc,
    calibration,
    ceaf_e,
    ceaf_m,
    conll_f1,
    lea,
)

# pred: {a,b,c}{d}  vs  gold: {a,b}{c,d} — the standard worked example
PRED = [["a", "b", "c"], ["d"]]
GOLD = [["a", "b"], ["c", "d"]]


def test_perfect_match_all_ones():
    chains = [["a", "b"], ["c"], ["d", "e", "f"]]
    for fn in (ceaf_e, ceaf_m, lea, blanc):
        p, r, f = fn(chains, chains)
        assert (p, r, f) == (1.0, 1.0, 1.0), fn.__name__
    assert abs(conll_f1(chains, chains) - 1.0) < 1e-9


def test_ceaf_e_hand_computed():
    # phi4 alignment: (p0,g0)=2 then (p1,g1)=1 -> sim 3; P=R=3/4
    p, r, f = ceaf_e(PRED, GOLD)
    assert abs(p - 0.75) < 1e-9
    assert abs(r - 0.75) < 1e-9
    assert abs(f - 0.75) < 1e-9


def test_ceaf_m_hand_computed():
    # phi3: (p0,g0)=4/5 then (p1,g1)=2/3 -> sim 22/15; P=R=11/15
    p, r, f = ceaf_m(PRED, GOLD)
    assert abs(p - 11.0 / 15.0) < 1e-9
    assert abs(r - 11.0 / 15.0) < 1e-9


def test_lea_hand_computed():
    # R: g0 fully resolved (2*1), g1 links broken (0) -> 2/4 = 0.5
    # P: p0 1-of-3 links (3*(1/3)=1), p1 singleton d maps to 2-mention gold
    #    chain -> no credit -> 1/4 = 0.25
    p, r, f = lea(PRED, GOLD)
    assert abs(r - 0.5) < 1e-9
    assert abs(p - 0.25) < 1e-9
    assert abs(f - 1.0 / 3.0) < 1e-9


def test_lea_singleton_credit():
    # both sides have x as a singleton -> full credit
    p, r, f = lea([["x"]], [["x"]])
    assert (p, r, f) == (1.0, 1.0, 1.0)


def test_blanc_hand_computed():
    # pairs: c_tp=1 c_fp=2 c_fn=1; n_tp=2 n_fp=1 n_fn=2
    # coref F1 = 0.4, non-coref F1 = 4/7; BLANC F1 = (0.4 + 4/7)/2
    p, r, f = blanc(PRED, GOLD)
    assert abs(f - (0.4 + 4.0 / 7.0) / 2.0) < 1e-9
    assert abs(p - (1.0 / 3.0 + 2.0 / 3.0) / 2.0) < 1e-9
    assert abs(r - (0.5 + 0.5) / 2.0) < 1e-9


def test_blanc_fewer_than_two_common_is_perfect():
    assert blanc([["a"]], [["b"]]) == (1.0, 1.0, 1.0)


def test_conll_is_mean_of_three():
    from anno_ray.functions.coref_metrics import b_cubed, muc

    pa = {m: i for i, ch in enumerate(PRED) for m in ch}
    ga = {m: i for i, ch in enumerate(GOLD) for m in ch}
    expected = (muc(pa, ga)[2] + b_cubed(pa, ga)[2] + ceaf_e(PRED, GOLD)[2]) / 3
    assert abs(conll_f1(PRED, GOLD) - expected) < 1e-12


def test_empty_sides():
    assert ceaf_e([], GOLD)[2] == 0.0
    assert ceaf_m(PRED, [])[2] == 0.0
    assert lea([], [])[2] == 0.0


# --- calibration -------------------------------------------------------------

def test_ece_hand_computed():
    res = calibration([(0.9, True), (0.9, False)])
    assert abs(res["ece"] - 0.4) < 1e-9
    assert abs(res["mce"] - 0.4) < 1e-9
    assert abs(res["brier_score"] - 0.41) < 1e-9
    assert res["total_predictions"] == 2
    assert abs(res["confidence_gap"] - 0.0) < 1e-9


def test_ece_perfectly_calibrated():
    # bin [0.6,0.7): 10 preds at 0.65 with 65% accuracy -> ece ~ 0.015? no:
    # acc 0.6 vs avg conf 0.65 -> err 0.05 weighted 1.0
    preds = [(0.65, i < 6) for i in range(10)]
    res = calibration(preds)
    assert abs(res["ece"] - 0.05) < 1e-9
    # exact: 1.0-confidence always-correct is perfectly calibrated
    assert calibration([(1.0, True)] * 5)["ece"] == 0.0


def test_ece_bins_and_thresholds():
    preds = [(0.95, True), (0.55, False), (0.05, False), (0.85, True)]
    res = calibration(preds)
    assert len(res["reliability_bins"]) == 4  # four distinct bins hit
    assert res["threshold_accuracy"][0.8] == 1.0  # 0.95 and 0.85 both correct
    assert res["threshold_accuracy"][0.5] == pytest.approx(2.0 / 3.0)
    assert calibration([])["ece"] == 0.0
