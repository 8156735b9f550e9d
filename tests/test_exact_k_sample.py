"""exact_k_sample (operators/sampling.py): brute-force parity with the
per-key top-k-by-(hash, id) contract, exact sizes, partition
invariance, rescue path, and k ≥ n behavior."""

import hashlib

import pytest
from pyspark.sql import functions as F

from crfsuite_spark.operators.sampling import exact_k_sample

SCALE = 1_000_000


def _h(doc_id, seed=42):
    return int(
        hashlib.md5(f"{doc_id}:{seed}".encode()).hexdigest()[:8], 16
    ) % SCALE


def _ref_topk(ids_by_key, k):
    return {
        key: sorted(ids, key=lambda i: (_h(i), i))[:k]
        for key, ids in ids_by_key.items()
    }


@pytest.fixture(scope="module")
def skewed(spark):
    # 3 domains with very different sizes: 600 / 150 / 8 rows
    df = spark.range(0, 758).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 600, "web")
        .when(F.col("id") < 750, "books")
        .otherwise("code")
        .alias("source"),
    )
    return df


def _ids_by_key():
    out = {"web": list(range(600)), "books": list(range(600, 750)),
           "code": list(range(750, 758))}
    return out


def test_matches_brute_force_and_exact_sizes(skewed):
    out = exact_k_sample(skewed, "doc_id", "source", k=25).toPandas()
    want = _ref_topk(_ids_by_key(), 25)
    got = {
        k: sorted(g["doc_id"], key=lambda i: (_h(i), i))
        for k, g in out.groupby("source")
    }
    assert got == {k: v for k, v in want.items()}
    sizes = out.groupby("source").size().to_dict()
    assert sizes == {"web": 25, "books": 25, "code": 8}  # min(k, n)


def test_partition_invariant(skewed):
    a = exact_k_sample(skewed, "doc_id", "source", k=25).toPandas()
    b = exact_k_sample(
        skewed.repartition(17), "doc_id", "source", k=25
    ).toPandas()
    assert set(a["doc_id"]) == set(b["doc_id"])


def test_rescue_path_still_exact(skewed):
    """Degenerate oversample under-screens every key — the rescue
    re-rank must still return exactly the brute-force answer."""
    out = exact_k_sample(
        skewed, "doc_id", "source", k=25, oversample=1e-6
    ).toPandas()
    want = _ref_topk(_ids_by_key(), 25)
    got = {k: set(g["doc_id"]) for k, g in out.groupby("source")}
    assert got == {k: set(v) for k, v in want.items()}


def test_k_exceeds_n_keeps_all(skewed):
    out = exact_k_sample(skewed, "doc_id", "source", k=10_000).toPandas()
    assert len(out) == 758


def test_nonpositive_k_raises(skewed):
    with pytest.raises(ValueError, match="positive"):
        exact_k_sample(skewed, "doc_id", "source", k=0)


def test_columns_preserved(skewed):
    extra = skewed.withColumn("payload", F.concat(F.lit("p"), "doc_id"))
    out = exact_k_sample(extra, "doc_id", "source", k=5)
    assert set(out.columns) == {"doc_id", "source", "payload"}
