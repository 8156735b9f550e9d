"""Evaluation parity with the reference contract: per-label 2×2 metrics
including specificity (R/evaluation.R:2-22) and instance-level accuracy
(crfsuite.c:369-396), checked against hand-computed tables."""

import pytest
from pyspark.sql import functions as F

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


def test_calibration_report_bins_and_ece(spark):
    """Hand-built confidences: bin edges, last-bin inclusion of 1.0,
    NULL exclusion, and the ECE/max-gap arithmetic."""
    from crfsuite_spark.operators.evaluate import (
        calibration_report,
        expected_calibration_error,
    )

    rows = [
        (0.05, True), (0.05, False),          # bin 0: conf .05, acc .5
        (0.95, True), (0.95, True),           # bin 9: conf .95, acc 1.
        (1.0, True),                          # conf 1.0 -> last bin
        (0.10, False),                        # bin 1 boundary
        (None, True),                         # excluded
    ]
    df = spark.createDataFrame(rows, "marginal double, correct boolean")
    bins = {r["bin"]: r for r in
            calibration_report(df, n_bins=10).collect()}
    assert set(bins) == {0, 1, 9}
    assert bins[0]["n"] == 2
    assert bins[0]["avg_conf"] == pytest.approx(0.05)
    assert bins[0]["accuracy"] == pytest.approx(0.5)
    assert bins[0]["abs_gap"] == pytest.approx(0.45)
    assert bins[1]["n"] == 1 and bins[1]["accuracy"] == 0.0
    b9_conf = (0.95 + 0.95 + 1.0) / 3
    assert bins[9]["n"] == 3
    assert bins[9]["avg_conf"] == pytest.approx(b9_conf)
    assert bins[9]["accuracy"] == pytest.approx(1.0)

    ece = expected_calibration_error(df, n_bins=10).collect()[0]
    assert ece["n_tokens"] == 6
    expected = (2 * 0.45 + 1 * 0.10 + 3 * (1.0 - b9_conf)) / 6
    assert ece["ece"] == pytest.approx(expected)
    assert ece["max_gap"] == pytest.approx(0.45)


def test_calibration_on_real_decode_marginals(spark, synth):
    """End-to-end: train briefly, decode with marginals, and check the
    report is well-formed over genuine tagger confidences (bins within
    [0,1], counts add up, gaps consistent)."""
    from crfsuite_spark.datagen.transcripts import to_spark
    from crfsuite_spark.functions.tokenize import tokenize
    from crfsuite_spark.functions.templates import cbind_attributes
    from crfsuite_spark.train.trainer import train_crf
    from crfsuite_spark.decode.tagger import decode
    from crfsuite_spark.operators.evaluate import calibration_report

    dfs = to_spark(spark, synth)
    toks = tokenize(dfs["transcripts"]).join(
        dfs["tokens"].select("conv_id", "turn_idx", "token_idx", "label"),
        ["conv_id", "turn_idx", "token_idx"],
    )
    feat = cbind_attributes(toks, ["token", "pos"],
                            ["conv_id", "turn_idx"], "token_idx")
    m = train_crf(feat, ["conv_id", "turn_idx"], "token_idx",
                  max_iterations=10)
    dec = decode(feat, m, ["conv_id", "turn_idx"], "token_idx",
                 with_marginal=True)
    scored = dec.join(
        toks.select("conv_id", "turn_idx", "token_idx",
                    F.col("label").alias("gold")),
        ["conv_id", "turn_idx", "token_idx"],
    ).select(
        F.col("marginal"),
        (F.col("label") == F.col("gold")).alias("correct"),
    )
    rep = calibration_report(scored, n_bins=10).collect()
    assert sum(r["n"] for r in rep) == scored.count()
    for r in rep:
        assert 0 <= r["bin"] <= 9
        assert 0.0 <= r["avg_conf"] <= 1.0
        assert 0.0 <= r["accuracy"] <= 1.0
        assert r["abs_gap"] == pytest.approx(abs(r["accuracy"] - r["avg_conf"]))


def test_triple_prf_counts_and_zero_guards(spark):
    """Hand-checkable per-predicate P/R/F1: duplicates dedup before
    counting, predicates missing from one side get 0.0 (never NULL),
    and the numbers agree with set_prf restricted to that predicate."""
    import pytest

    from crfsuite_spark.operators.evaluate import set_prf, triple_prf

    cols = ["conv_id", "turn_idx", "subj", "pred", "obj"]
    gold = spark.createDataFrame(
        [
            ("c1", 1, "a", "works_at", "x"),
            ("c1", 2, "b", "works_at", "y"),
            ("c2", 1, "c", "works_at", "z"),
            ("c2", 2, "d", "visited", "w"),
        ],
        cols,
    )
    pred = spark.createDataFrame(
        [
            ("c1", 1, "a", "works_at", "x"),   # correct
            ("c1", 1, "a", "works_at", "x"),   # dup, dedups away
            ("c1", 2, "b", "works_at", "WRONG"),
            ("c3", 9, "e", "founded", "q"),    # pred-only predicate
        ],
        cols,
    )
    got = {r["pred"]: r for r in triple_prf(pred, gold).collect()}
    w = got["works_at"]
    assert (w["n_gold"], w["n_pred"], w["n_correct"]) == (3, 2, 1)
    assert w["precision"] == pytest.approx(1 / 2)
    assert w["recall"] == pytest.approx(1 / 3)
    assert w["f1"] == pytest.approx(2 * 0.5 * (1 / 3) / (0.5 + 1 / 3))
    v = got["visited"]           # gold-only: P=0 (no preds), R=0
    assert (v["n_pred"], v["precision"], v["recall"], v["f1"]) == (
        0, 0.0, 0.0, 0.0)
    f = got["founded"]           # pred-only
    assert (f["n_gold"], f["precision"], f["recall"]) == (0, 0.0, 0.0)
    # agreement with the scalar set_prf on the works_at slice
    s = set_prf(
        pred.where("pred = 'works_at'"), gold.where("pred = 'works_at'"),
        cols)
    assert s["precision"] == pytest.approx(w["precision"])
    assert s["recall"] == pytest.approx(w["recall"])


def test_extraction_yield_counts_and_zero_yield(spark):
    import pytest

    from crfsuite_spark.operators.evaluate import extraction_yield

    turns = spark.createDataFrame(
        [("c1", 0), ("c1", 1), ("c1", 2), ("c1", 3), ("c2", 0), ("c2", 1)],
        ["conv_id", "turn_idx"],
    )
    triples = spark.createDataFrame(
        [
            ("c1", 0, "a", "r", "b"),
            ("c1", 0, "a", "r", "c"),   # same turn, second triple
            ("c1", 2, "b", "r", "c"),
            # c2: zero extractions — must still report
        ],
        ["conv_id", "turn_idx", "subj", "pred", "obj"],
    )
    got = {r["conv_id"]: r for r in extraction_yield(turns, triples).collect()}
    c1 = got["c1"]
    assert (c1["n_turns"], c1["n_triple_turns"], c1["n_triples"]) == (4, 2, 3)
    assert c1["n_entities"] == 3                      # a, b, c
    assert c1["coverage"] == pytest.approx(0.5)
    c2 = got["c2"]
    assert (c2["n_triples"], c2["n_entities"]) == (0, 0)
    assert c2["coverage"] == pytest.approx(0.0)


def test_span_agreement_exact_vs_lenient(spark):
    """Boundary slips count lenient-only; type mismatches and
    different-turn overlaps count nowhere; each span credits at most
    once even when it overlaps two gold spans."""
    import pytest

    from crfsuite_spark.operators.evaluate import span_agreement

    cols = ["conv_id", "turn_idx", "entity_type", "start_tok", "end_tok"]
    gold = spark.createDataFrame(
        [
            ("c1", 0, "PER", 2, 3),
            ("c1", 0, "PER", 5, 6),
            ("c1", 0, "ORG", 8, 9),
            ("c1", 1, "PER", 2, 3),     # other turn
        ],
        cols,
    )
    pred = spark.createDataFrame(
        [
            ("c1", 0, "PER", 2, 3),     # exact
            ("c1", 0, "PER", 4, 5),     # boundary slip: overlaps (5,6)
            ("c1", 0, "ORG", 2, 3),     # type mismatch with PER span
            ("c1", 0, "PER", 1, 7),     # spans BOTH PER golds: one credit
            ("c1", 2, "PER", 2, 3),     # wrong turn entirely
        ],
        cols,
    )
    got = {r["entity_type"]: r for r in span_agreement(pred, gold).collect()}
    per = got["PER"]
    assert (per["n_gold"], per["n_pred"], per["n_exact"]) == (3, 4, 1)
    # lenient precision: exact + slip + umbrella = 3 of 4 pred spans
    assert per["n_lenient_p"] == 3
    assert per["precision_lenient"] == pytest.approx(3 / 4)
    # lenient recall: both turn-0 golds covered, turn-1 gold not
    assert per["n_lenient_g"] == 2
    assert per["recall_lenient"] == pytest.approx(2 / 3)
    assert per["precision_exact"] == pytest.approx(1 / 4)
    org = got["ORG"]
    # the mistyped ORG pred overlaps no ORG gold
    assert (org["n_exact"], org["n_lenient_p"]) == (0, 0)
    assert org["precision_exact"] == 0.0 and org["recall_lenient"] == 0.0


def test_cohens_kappa_hand_arithmetic(spark):
    """Textbook 2x2 example + the degenerate all-agree single-label
    case (pe = 1 -> kappa 1.0) + independence (kappa ~ 0)."""
    import pytest

    from crfsuite_spark.operators.evaluate import cohens_kappa

    # classic: 20 A-yes/B-yes, 5 A-yes/B-no, 10 A-no/B-yes, 15 A-no/B-no
    rows = ([("y", "y")] * 20 + [("y", "n")] * 5
            + [("n", "y")] * 10 + [("n", "n")] * 15)
    r = cohens_kappa(
        spark.createDataFrame(rows, ["a", "b"]), "a", "b"
    ).first()
    assert r["n"] == 50
    assert r["po"] == pytest.approx(0.7)
    # pe = (25*30 + 25*20) / 2500 = 0.5 -> kappa = 0.4
    assert r["pe"] == pytest.approx(0.5)
    assert r["kappa"] == pytest.approx(0.4)
    # degenerate: both always say the same single label
    r2 = cohens_kappa(
        spark.createDataFrame([("x", "x")] * 7, ["a", "b"]), "a", "b"
    ).first()
    assert r2["pe"] == pytest.approx(1.0) and r2["kappa"] == 1.0


def test_acceptance_curve_monotonic_and_exact(spark):
    import pytest

    from crfsuite_spark.operators.evaluate import acceptance_curve

    # 4 high-conf (3 correct), 6 low-conf (1 correct)
    rows = ([(0.95, True)] * 3 + [(0.95, False)]
            + [(0.25, True)] + [(0.25, False)] * 5)
    out = acceptance_curve(
        spark.createDataFrame(rows, ["confidence", "correct"])
    ).orderBy("threshold").collect()
    assert len(out) == 2
    lo, hi = out
    assert hi["threshold"] == pytest.approx(0.9)
    assert (hi["n_accepted"], hi["n_correct_accepted"]) == (4, 3)
    assert hi["precision"] == pytest.approx(3 / 4)
    assert hi["coverage"] == pytest.approx(3 / 4)
    assert (lo["n_accepted"], lo["n_correct_accepted"]) == (10, 4)
    assert lo["precision"] == pytest.approx(0.4)
    assert lo["coverage"] == pytest.approx(1.0)
    # lowering the threshold can only grow acceptance and coverage
    assert lo["n_accepted"] >= hi["n_accepted"]
    assert lo["coverage"] >= hi["coverage"]


def test_triple_prf_fuzz_vs_python_sets(spark):
    """Random pred/gold mention streams vs a pure-Python set mirror."""
    import random
    from collections import defaultdict

    import pytest

    from crfsuite_spark.operators.evaluate import triple_prf

    rng = random.Random(41)
    cols = ["conv_id", "turn_idx", "subj", "pred", "obj"]
    for trial in range(3):
        def stream(n):
            return [
                (
                    f"c{rng.randint(0, 2)}",
                    rng.randint(0, 3),
                    f"s{rng.randint(0, 3)}",
                    rng.choice(["p1", "p2", "p3"]),
                    f"o{rng.randint(0, 3)}",
                )
                for _ in range(n)
            ]

        pr, gr = stream(rng.randint(5, 40)), stream(rng.randint(5, 40))
        ps, gs = set(pr), set(gr)
        exp = defaultdict(lambda: [0, 0, 0])   # pred -> gold, pred, correct
        for t in gs:
            exp[t[3]][0] += 1
        for t in ps:
            exp[t[3]][1] += 1
        for t in ps & gs:
            exp[t[3]][2] += 1
        got = {
            r["pred"]: (r["n_gold"], r["n_pred"], r["n_correct"],
                        r["precision"], r["recall"])
            for r in triple_prf(
                spark.createDataFrame(pr, cols),
                spark.createDataFrame(gr, cols),
            ).collect()
        }
        assert set(got) == set(exp), trial
        for p, (ng, np_, nc) in exp.items():
            g = got[p]
            assert g[:3] == (ng, np_, nc), (trial, p)
            assert g[3] == pytest.approx(nc / np_ if np_ else 0.0)
            assert g[4] == pytest.approx(nc / ng if ng else 0.0)
