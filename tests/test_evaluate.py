"""Evaluation parity with the reference contract: per-label 2×2 metrics
including specificity (R/evaluation.R:2-22) and instance-level accuracy
(crfsuite.c:369-396), checked against hand-computed tables."""

import pytest

from crfsuite_spark.operators.evaluate import crf_evaluation, instance_accuracy


@pytest.fixture(scope="module")
def labelled(spark):
    # seq 1: all correct; seq 2: one wrong; seq 3: all wrong
    rows = [
        (1, 0, "PER", "PER"),
        (1, 1, "O", "O"),
        (2, 0, "ORG", "ORG"),
        (2, 1, "PER", "ORG"),
        (2, 2, "O", "O"),
        (3, 0, "ORG", "PER"),
        (3, 1, "PER", "O"),
    ]
    return spark.createDataFrame(rows, "seq int, t int, gold string, pred string")


def test_specificity_hand_computed(labelled):
    ev = crf_evaluation(labelled, gold_col="gold", pred_col="pred")
    by = ev["bylabel"].set_index("label")
    # total 7 tokens
    # PER: tp=1 (seq1), gold={1,2,3 -> rows (1,0),(2,1),(3,1)} = 3, pred={(1,0),(3,0)} = 2
    #   fp = 2-1 = 1, fn = 3-1 = 2, tn = 7-1-1-2 = 3 -> spec = 3/(3+1) = 0.75
    assert by.loc["PER", "support"] == 3
    assert abs(by.loc["PER", "specificity"] - 0.75) < 1e-12
    assert abs(by.loc["PER", "precision"] - 0.5) < 1e-12
    assert abs(by.loc["PER", "recall"] - 1 / 3) < 1e-12
    # ORG: tp=1, gold=2, pred=2 -> fp=1, fn=1, tn=4 -> spec=4/5
    assert abs(by.loc["ORG", "specificity"] - 0.8) < 1e-12
    # O: tp=2, gold=2, pred=3 -> fp=1, fn=0, tn=4 -> spec=4/5
    assert abs(by.loc["O", "specificity"] - 0.8) < 1e-12
    # per-label accuracy: PER (tp+tn)/total = 4/7
    assert abs(by.loc["PER", "accuracy"] - 4 / 7) < 1e-12
    # overall excludes 'O' by default
    assert "specificity_weighted" in ev["overall"]
    assert "specificity_mean" in ev["overall"]


def test_instance_accuracy(labelled):
    # seq1 fully correct, seq2 and seq3 not -> 1/3
    acc = instance_accuracy(labelled, ["seq"], "gold", "pred")
    assert abs(acc - 1 / 3) < 1e-12
    ev = crf_evaluation(labelled, gold_col="gold", pred_col="pred", seq_cols=["seq"])
    assert abs(ev["overall"]["instance_accuracy"] - 1 / 3) < 1e-12


def test_item_accuracy(labelled):
    ev = crf_evaluation(labelled, gold_col="gold", pred_col="pred")
    assert abs(ev["overall"]["accuracy"] - 4 / 7) < 1e-12
