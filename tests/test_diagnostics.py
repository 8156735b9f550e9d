"""key_skew_profile: exact shares on a known distribution + the
partial-aggregation plan contract."""

import pytest

from crfsuite_spark.operators.diagnostics import key_skew_profile


def test_key_skew_profile_shares(spark):
    rows = [("a",)] * 6 + [("b",)] * 3 + [("c",)] * 1
    df = spark.createDataFrame(rows, ["k"])
    got = key_skew_profile(df, "k", top_n=2).collect()
    assert [(r["k"], r["n_rows"], r["rank"]) for r in got] == [
        ("a", 6, 1), ("b", 3, 2)]
    assert got[0]["share"] == pytest.approx(0.6)
    assert got[0]["cum_share"] == pytest.approx(0.6)
    assert got[1]["cum_share"] == pytest.approx(0.9)


def test_key_skew_profile_tie_break_and_plan(spark):
    df = spark.createDataFrame(
        [("b", 1), ("a", 1), ("a", 2), ("b", 2)], ["k", "v"])
    got = key_skew_profile(df, ["k"], top_n=10).collect()
    # equal counts tie-break ascending key: deterministic rank
    assert [(r["k"], r["rank"]) for r in got] == [("a", 1), ("b", 2)]
    plan = (
        key_skew_profile(df, ["k"], top_n=10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the heavy groupBy is partial-aggregated; the window runs on the
    # top-N slice only (after the limit), which is fine
    assert "partial" in plan.lower(), plan
