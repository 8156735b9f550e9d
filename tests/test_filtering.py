"""CCNet-style quantile bucketing (operators/filtering.py): threshold
parity vs a brute-force Python reference, per-key independence, tie and
degenerate-key behavior, and the broadcast-join plan contract."""

from itertools import groupby

import pytest
from pyspark.sql import functions as F

from crfsuite_spark.operators.filtering import ccnet_buckets, quantile_thresholds

# binary-exact 2-decimal scores: no rounding-mode ambiguity anywhere
ROWS = [
    ("en", 1.25), ("en", 0.5), ("en", 2.75), ("en", 2.75), ("en", 0.25),
    ("en", 3.5), ("en", 1.0), ("en", 0.75), ("en", 4.25),
    ("de", 10.0), ("de", 11.5), ("de", 12.25),
    ("zh", 7.0), ("zh", 7.0), ("zh", 7.0),  # degenerate: all equal
]


def _ref_threshold(vals, p):
    vs = sorted(vals)
    cum = 0
    for v, g in groupby(vs):
        cum += len(list(g))
        if cum >= p * len(vs):
            return v
    return vs[-1]


@pytest.fixture(scope="module")
def scored(spark):
    return spark.createDataFrame(
        [(i, k, s) for i, (k, s) in enumerate(ROWS)],
        "doc_id int, lang string, score double",
    )


def test_thresholds_match_reference(scored):
    probs = [1.0 / 3.0, 2.0 / 3.0, 0.5, 1.0]
    got = {
        (r["lang"], r["prob"]): r["threshold"]
        for r in quantile_thresholds(scored, "lang", "score", probs).collect()
    }
    by_key = {}
    for k, s in ROWS:
        by_key.setdefault(k, []).append(s)
    for k, vals in by_key.items():
        for p in probs:
            assert got[(k, p)] == _ref_threshold(vals, p), (k, p)


def test_bucket_labels_match_reference(scored):
    out = ccnet_buckets(scored, "lang", "score").toPandas()
    by_key = {}
    for k, s in ROWS:
        by_key.setdefault(k, []).append(s)
    th = {
        k: (_ref_threshold(v, 1.0 / 3.0), _ref_threshold(v, 2.0 / 3.0))
        for k, v in by_key.items()
    }
    for r in out.itertuples():
        t_head, t_tail = th[r.lang]
        want = (
            "head" if r.score <= t_head
            else "middle" if r.score <= t_tail
            else "tail"
        )
        assert r.bucket == want, (r.lang, r.score)
    assert len(out) == len(ROWS)  # join loses no rows


def test_masses_roughly_equal_per_key(spark):
    # 300 distinct scores, one key: each bucket gets exactly 100
    df = spark.createDataFrame(
        [(i, "en", float(i) / 4.0) for i in range(300)],
        "doc_id int, lang string, score double",
    )
    out = ccnet_buckets(df, "lang", "score").groupBy("bucket").count()
    counts = {r["bucket"]: r["count"] for r in out.collect()}
    assert counts == {"head": 100, "middle": 100, "tail": 100}


def test_degenerate_key_all_head(scored):
    out = ccnet_buckets(scored, "lang", "score").toPandas()
    zh = out[out["lang"] == "zh"]
    assert (zh["bucket"] == "head").all()


def test_empty_probs_raises(scored):
    with pytest.raises(ValueError, match="non-empty"):
        quantile_thresholds(scored, "lang", "score", [])


def test_label_join_is_broadcast(scored):
    plan = (
        ccnet_buckets(scored, "lang", "score")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
