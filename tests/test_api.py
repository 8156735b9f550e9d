"""Reference-style facade: crf() string options + predict_crf() types
(R/modelling.R:107-152, 278-311)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def toy(spark):
    rows = []
    for ci in range(12):
        seq = [("jan", "PER"), ("woont", "O"), ("in", "O"), ("gent", "LOC")]
        for ti, (tok, lab) in enumerate(seq):
            rows.append((f"c{ci}", 0, ti, [f"tok={tok}"], lab))
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, token_idx int, attrs array<string>, label string",
    )


def test_crf_facade_lbfgs_options(spark, toy):
    from crfsuite_spark.api import crf, predict_crf

    m = crf(
        toy, ["conv_id", "turn_idx"], "token_idx", method="lbfgs",
        options={"feature.minfreq": 1.0, "c2": 1.0, "max_iterations": 15,
                 "linesearch": "MoreThuente",
                 "feature.possible_transitions": True},
    )
    assert m.meta["possible_transitions"] is True
    tok = predict_crf(m, toy, ["conv_id", "turn_idx"], "token_idx", type="marginal")
    assert {"label", "marginal"} <= set(tok.columns)
    pdf = tok.toPandas()
    assert (pdf["marginal"] > 0).all() and (pdf["marginal"] <= 1.0).all()
    seq = predict_crf(m, toy, ["conv_id", "turn_idx"], "token_idx", type="sequence")
    spdf = seq.toPandas()
    assert len(spdf) == 12 and {"probability"} <= set(spdf.columns)
    assert ((spdf["probability"] > 0) & (spdf["probability"] <= 1.0)).all()


def test_crf_facade_rejects_unknown_option(spark, toy):
    from crfsuite_spark.api import crf

    with pytest.raises(ValueError, match="unknown option"):
        crf(toy, ["conv_id", "turn_idx"], "token_idx",
            options={"not_an_option": 1})


@pytest.mark.parametrize("method,opts", [
    ("averaged-perceptron", {"max_iterations": 4}),
    ("passive-aggressive", {"type": 1, "c": 1.0, "max_iterations": 4}),
    ("arow", {"variance": 1.0, "gamma": 1.0, "max_iterations": 4}),
    ("l2sgd", {"c2": 1.0, "max_iterations": 4}),
])
def test_crf_facade_all_methods(spark, toy, method, opts):
    from crfsuite_spark.api import crf, predict_crf

    m = crf(toy, ["conv_id", "turn_idx"], "token_idx", method=method,
            options=opts)
    pred = predict_crf(m, toy, ["conv_id", "turn_idx"], "token_idx")
    pdf = pred.toPandas()
    assert len(pdf) == toy.count()
    acc = (pdf["label"] == "PER").sum()  # sanity: some labels emitted
    assert set(pdf["label"]) <= {"PER", "LOC", "O"}


def test_crf_seeds_registry_defaults(spark, toy, monkeypatch):
    """Unsupplied options must resolve to the registry's reference
    defaults (e.g. l2sgd delta=1e-6, calibration.samples=1000), not the
    Python trainers' own signature defaults."""
    import crfsuite_spark.train.l2sgd as l2sgd_mod
    from crfsuite_spark.api import crf

    captured = {}

    def fake(tokens, **kw):
        captured.update(kw)
        return "sentinel"

    monkeypatch.setattr(l2sgd_mod, "train_l2sgd", fake)
    out = crf(toy, ["conv_id", "turn_idx"], "token_idx", method="l2sgd",
              options={"c2": 2.5})
    assert out == "sentinel"
    assert captured["c2"] == 2.5            # user override wins
    assert captured["max_iterations"] == 1000   # registry, not trainer's 20
    assert captured["epsilon"] == 1e-6          # registry delta, not 1e-4
    assert captured["calibration_samples"] == 1000  # registry, not 500
