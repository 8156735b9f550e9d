"""Entity disambiguation (kg/disambiguate.py): accuracy gate on the
seeded ambiguous corpus, deterministic tie-breaking, unknown-surface
policy, and the broadcast-dictionary plan shape."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from crfsuite_spark.datagen.disambig import disambig_mentions
from crfsuite_spark.kg.disambiguate import disambiguate_mentions, hash_embedding


@pytest.fixture(scope="module")
def corpus(spark):
    m, a, p = disambig_mentions(n_mentions=200, seed=13)
    return (
        m,
        spark.createDataFrame(m.drop(columns=["gold_id"])),
        spark.createDataFrame(a),
        spark.createDataFrame(p),
    )


def test_accuracy_on_ambiguous_mentions(corpus):
    gold, md, ad, pdf = corpus
    res = (
        disambiguate_mentions(md, ad, pdf)
        .toPandas()
        .merge(gold[["mention_id", "gold_id"]], on="mention_id")
    )
    assert len(res) == 200
    amb = res[res.n_candidates > 1]
    assert len(amb) > 50
    assert (amb.canonical_id == amb.gold_id).mean() >= 0.90
    # unambiguous mentions must be exact — one candidate, no scoring risk
    una = res[res.n_candidates == 1]
    assert (una.canonical_id == una.gold_id).all()


def test_tie_breaks_to_smallest_canonical_id(spark):
    # identical profiles => identical scores => smallest id wins
    m = spark.createDataFrame(pd.DataFrame(
        {"mention_id": [0], "surface": ["X"], "context": ["alpha beta"]}
    ))
    a = spark.createDataFrame(pd.DataFrame(
        {"alias": ["X", "X"], "canonical_id": ["ent:b", "ent:a"]}
    ))
    p = spark.createDataFrame(pd.DataFrame(
        {"canonical_id": ["ent:a", "ent:b"], "profile": ["same words", "same words"]}
    ))
    row = disambiguate_mentions(m, a, p).collect()[0]
    assert row.canonical_id == "ent:a"
    assert row.n_candidates == 2


def test_unknown_surface_dropped(spark):
    m = spark.createDataFrame(pd.DataFrame(
        {"mention_id": [0], "surface": ["Nobody"], "context": ["ctx"]}
    ))
    a = spark.createDataFrame(pd.DataFrame(
        {"alias": ["X"], "canonical_id": ["ent:a"]}
    ))
    p = spark.createDataFrame(pd.DataFrame(
        {"canonical_id": ["ent:a"], "profile": ["p"]}
    ))
    assert disambiguate_mentions(m, a, p).count() == 0


def test_hash_embedding_deterministic_and_integer(spark):
    df = spark.createDataFrame(pd.DataFrame({"context": ["hello world", ""]}))
    out = df.select(hash_embedding("context", dim=4).alias("e")).collect()
    again = df.select(hash_embedding("context", dim=4).alias("e")).collect()
    assert [r.e for r in out] == [r.e for r in again]
    assert all(isinstance(v, int) for r in out for v in r.e)
    assert len(out[0].e) == 4


def test_plan_broadcasts_dictionaries(corpus):
    _, md, ad, pdf = corpus
    plan = (
        disambiguate_mentions(md, ad, pdf)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("BroadcastExchange") == 2, plan
    # exactly one hash shuffle: the mention-key min_by groupBy
    import re
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan
