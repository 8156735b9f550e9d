"""End-to-end corpus curation (operators/curate.py): every stage of the
composed chain — C4 quality filter, exact dedup, MinHash near-dedup,
benchmark decontamination — must fire on a crafted corpus where each
stage has exactly one designated victim."""

import pytest
from pyspark.sql import functions as F

from crfsuite_spark.operators.curate import CurateConfig, curate_corpus

GOOD = (
    "the quick brown fox jumps over the lazy dog while seven other "
    "animals watch from the fence and nobody seems bothered at all today"
)
NEAR = (
    "the quick brown fox jumps over the lazy dog while seven other "
    "animals watch from the fence and nobody seems bothered at all now"
)
OTHER = (
    "completely different prose about distributed query engines and "
    "their shuffle behaviour under heavy load with many skewed keys"
)
CONTAM = (
    "benchmark question alpha beta gamma delta epsilon zeta eta theta "
    "iota kappa nothing else shares this particular sequence of words"
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, GOOD),
        (1, GOOD),          # exact dup of 0 → stage 2 drops
        (2, NEAR),          # near dup of 0 → stage 3 drops (greater id)
        (3, OTHER),
        (4, "too short"),   # stage 1 drops (min_words)
        (5, CONTAM),        # stage 4 drops (shares benchmark 5-gram)
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


@pytest.fixture(scope="module")
def cfg():
    return CurateConfig(
        min_words=5, min_sentences=0, min_mean_word_len=1.0,
        max_mean_word_len=20.0,
        n_hashes=32, bands=16, shingle_size=4, jaccard_threshold=0.6,
        contamination_ngram=5,
    )


def test_curate_each_stage_fires(spark, corpus, cfg):
    bench = spark.createDataFrame(
        [("benchmark question alpha beta gamma delta epsilon zeta",)],
        "text string",
    )
    out = curate_corpus(corpus, bench, "doc_id", "text", "text", cfg)
    kept = sorted(out.toPandas()["doc_id"])
    for c in out.pinned_caches:
        c.unpersist()
    assert kept == [0, 3]


def test_curate_no_benchmark_skips_decontamination(spark, corpus, cfg):
    out = curate_corpus(corpus, None, "doc_id", "text", "text", cfg)
    kept = sorted(out.toPandas()["doc_id"])
    for c in out.pinned_caches:
        c.unpersist()
    assert kept == [0, 3, 5]


def test_curate_preserves_all_columns(spark, cfg):
    df = spark.createDataFrame(
        [(0, GOOD, "en", 3.5), (1, OTHER, "en", 1.0)],
        "doc_id int, text string, lang string, score double",
    )
    out = curate_corpus(df, None, "doc_id", "text", "text", cfg)
    assert out.columns == ["doc_id", "text", "lang", "score"]
    got = out.orderBy("doc_id").toPandas()
    for c in out.pinned_caches:
        c.unpersist()
    assert list(got["score"]) == [3.5, 1.0]
