"""Hashed-NB text classifier (operators/classify.py): fit parity vs a
pure-Python reference, score parity vs hand computation, model
roundtrip, separation on a labeled corpus, and the zero-shuffle plan
contract at scoring time."""

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from crfsuite_spark.operators.classify import (
    HashedNBModel,
    fit_hashed_nb,
    score_hashed_nb,
)

B = 64  # small bucket count so collisions are exercised


def _bucket(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % B


def _ref_fit(rows, alpha=1.0):
    """Pure-Python NB fit with the same hashing — the ground truth."""
    counts = np.zeros((2, B))
    n_docs = [0, 0]
    for text, y in rows:
        n_docs[y] += 1
        for tok in text.lower().strip().split():
            counts[y, _bucket(tok)] += 1
    tot = counts.sum(axis=1)
    llr = np.log((counts[1] + alpha) / (tot[1] + alpha * B)) - np.log(
        (counts[0] + alpha) / (tot[0] + alpha * B)
    )
    prior = math.log(n_docs[1]) - math.log(n_docs[0])
    return prior, llr


ROWS = [
    ("the cat sat on the mat", 0),
    ("a dog chased the cat", 0),
    ("cats and dogs are pets", 0),
    ("gradient descent minimizes the loss", 1),
    ("the loss converges under gradient steps", 1),
    ("stochastic gradient descent with momentum", 1),
    ("  Mixed CASE   and   spacing  ", 0),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t, y) for i, (t, y) in enumerate(ROWS)],
        "doc_id int, text string, label int",
    )


def test_fit_matches_python_reference(docs):
    model = fit_hashed_nb(docs, "text", "label", n_buckets=B)
    prior, llr = _ref_fit(ROWS)
    assert model.n_buckets == B
    assert model.prior_llr == pytest.approx(prior, abs=1e-12)
    np.testing.assert_allclose(model.llr, llr, atol=1e-12)


def test_score_matches_hand_sum(docs):
    model = fit_hashed_nb(docs, "text", "label", n_buckets=B)
    out = score_hashed_nb(docs, model, "text").toPandas().set_index("doc_id")
    for i, (text, _) in enumerate(ROWS):
        want = model.prior_llr + sum(
            model.llr[_bucket(t)] for t in text.lower().strip().split()
        )
        assert out.loc[i, "nb_score"] == pytest.approx(round(want, 6), abs=1e-9)
        assert out.loc[i, "nb_pred"] == int(out.loc[i, "nb_score"] > 0)


def test_separates_training_corpus(docs):
    model = fit_hashed_nb(docs, "text", "label", n_buckets=B)
    out = score_hashed_nb(docs, model, "text").toPandas()
    # NB on its own training set with disjoint vocabularies: perfect
    assert (out["nb_pred"] == out["label"]).all()


def test_null_and_empty_text_score_prior_only(spark, docs):
    model = fit_hashed_nb(docs, "text", "label", n_buckets=B)
    edge = spark.createDataFrame(
        [(0, None), (1, ""), (2, "   ")], "doc_id int, text string"
    )
    out = score_hashed_nb(edge, model, "text").toPandas()
    want = round(model.prior_llr, 6)
    np.testing.assert_allclose(out["nb_score"], want, atol=1e-9)


def test_model_frame_roundtrip(spark, docs):
    model = fit_hashed_nb(docs, "text", "label", n_buckets=B)
    back = HashedNBModel.from_frame(model.to_frame(spark))
    assert back.n_buckets == model.n_buckets
    assert back.prior_llr == model.prior_llr
    np.testing.assert_array_equal(back.llr, model.llr)


def test_single_class_raises(spark):
    one = spark.createDataFrame(
        [(0, "only positives here", 1)], "doc_id int, text string, label int"
    )
    with pytest.raises(ValueError, match="both classes"):
        fit_hashed_nb(one, "text", "label", n_buckets=B)


def test_score_plan_zero_exchange(docs):
    """Scoring embeds the model as a plan literal — no join, no
    explode, no shuffle; the scan feeds whole-stage codegen directly."""
    model = fit_hashed_nb(docs, "text", "label", n_buckets=B)
    scored = score_hashed_nb(docs.select("doc_id", "text"), model, "text")
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "Generate" not in plan, plan  # no explode at score time
