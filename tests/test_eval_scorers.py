"""Eval scorer parity tests (formulas per the reference scorers)."""

import numpy as np

from visper_lm_tpu.eval.cvbench import extract_choice, score_cvbench
from visper_lm_tpu.eval.mmstar import _prediction_matches, score_mmstar
from visper_lm_tpu.eval.probe import MeanIoU, accumulate_layer_scores, cosine_similarity, da2k_accuracy


def test_cvbench_letter_extraction():
    assert extract_choice("(A)") == "(A)"
    assert extract_choice("The answer is (B).") == "(B)"
    assert extract_choice("C") == "(C)"
    assert extract_choice("A) something") == "(A)"


def test_cvbench_accuracy_formula():
    answers = [
        # ADE20K: 1/1, COCO: 0/1 -> 2D = 0.5 ; Omni3D: 1/1 -> 3D = 1.0 ; overall 0.75
        {"prediction": "(A)", "answer": "(A)", "task": "Count", "source": "ADE20K"},
        {"prediction": "(B)", "answer": "(A)", "task": "Depth", "source": "COCO"},
        {"prediction": "(C)", "answer": "(C)", "task": "Distance", "source": "Omni3D"},
    ]
    scores = score_cvbench(answers)
    assert scores["2D"] == 0.5
    assert scores["3D"] == 1.0
    assert scores["Overall"] == 0.75
    assert scores["Count"] == 1.0
    assert scores["Depth"] == 0.0


def test_mmstar_matching_rules():
    assert _prediction_matches("A", "A")
    assert _prediction_matches("a", "(A) because")
    assert _prediction_matches("b", "option B")
    assert _prediction_matches("c", "the answer is C")
    assert not _prediction_matches("a", "B")


def test_mmstar_score_table():
    answers = [
        {"prediction": "A", "answer": "A", "category": "math", "l2_category": "geometry"},
        {"prediction": "B", "answer": "A", "category": "math", "l2_category": "geometry"},
    ]
    scores = score_mmstar(answers)
    assert scores["math(geometry)"] == 0.5
    assert scores["math"] == 1 / 250.0
    assert scores["final score"] == 1 / 1500.0


def test_cosine_similarity_and_merge():
    a = np.array([[1.0, 0.0], [0.0, 2.0]])
    assert abs(cosine_similarity(a, a) - 1.0) < 1e-9
    b = np.array([[0.0, 1.0], [2.0, 0.0]])
    assert abs(cosine_similarity(a, b)) < 1e-9

    merged = accumulate_layer_scores(
        [{"depth": {1: 0.5}}, {"depth": {1: 0.7, 3: 0.9}}]
    )
    assert abs(merged["depth"][1] - 0.6) < 1e-9
    assert merged["depth"][3] == 0.9


def test_da2k_accuracy():
    depth = np.array([[1.0, 0.2], [0.5, 0.9]])
    pairs = [
        ((0, 0), (0, 1), "point1"),   # 1.0 > 0.2 -> correct
        ((1, 0), (1, 1), "point1"),   # 0.5 < 0.9 -> wrong
    ]
    assert da2k_accuracy(depth, pairs) == 0.5


def test_miou():
    m = MeanIoU(num_classes=3)
    gt = np.array([[0, 0], [1, 255]])
    pred = np.array([[0, 1], [1, 2]])
    m.update(pred, gt)
    out = m.compute()
    # class0: inter 1, union 2 -> 0.5 ; class1: inter 1, union 2 -> 0.5; class2 absent in GT but union>0 via pred...
    # union counts pred-only too (reference conf-matrix mIoU), class2 union=0 in gt+pred? pred has one 2 on ignored gt -> dropped
    assert 0.0 < out["mIoU"] <= 1.0
    assert abs(out["mIoU"] - 0.5) < 1e-9
    assert abs(out["pACC"] - 2 / 3) < 1e-9
