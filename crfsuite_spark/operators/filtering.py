"""Per-key quantile bucketing over a bounded score histogram — the
CCNet head/middle/tail perplexity filter (Wenzek et al. 2020 §4.4)
done in the shape that survives 100 TB.

CCNet splits each language's documents into three equal-mass buckets
by LM perplexity and trains on the "head" (lowest-perplexity third).
The naive implementation is a per-language global sort / percent_rank
— at 100 TB that is a full-corpus range shuffle per key.  Here the
quantile thresholds come from a **bounded histogram** instead:

1. quantize the score to ``resolution`` decimals (``round(s, 2)`` ⇒
   threshold granularity 0.01 — far below any quality-bucket boundary
   anyone cares about) and ``groupBy(key, bucket).count()`` — partial
   aggregation collapses each task to (keys × distinct buckets) rows,
   thousands not trillions, regardless of corpus size;
2. cumulative-sum the tiny histogram per key (a window over the
   histogram frame, not the corpus) and read off, per requested
   probability p, the smallest bucket whose cumulative mass reaches
   ``p * total``;
3. broadcast-join the (keys × probs)-row threshold table back and
   label each document with a scan-local CASE — the corpus never
   shuffles and is read exactly twice (histogram pass + label pass).

Every step is integer counts + a deterministic quantization, so the
whole chain replays bit-for-bit in the DuckDB driver oracle
(``ds_ccnet_buckets``).

The reference (bnosac/crfsuite) curates training corpora by hand;
this is part of the corpus-curation surface a 10^12-turn transcript
pipeline needs (SURVEY.md §2.12).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def quantile_thresholds(
    scored: DataFrame,
    key_col: str,
    score_col: str,
    probs: Sequence[float],
    resolution: int = 2,
) -> DataFrame:
    """(key, prob, threshold) per key and requested probability.

    ``threshold`` is the smallest ``round(score, resolution)`` value
    whose cumulative row count reaches ``prob * total`` within the key
    — i.e. a conservative (never-undershooting) empirical quantile at
    histogram granularity.  The histogram, not the corpus, is
    windowed: the only corpus-wide stage is one partial-aggregated
    groupBy on (key, quantized score).
    """
    if not probs:
        raise ValueError("probs must be non-empty")
    hist = (
        scored.groupBy(
            F.col(key_col).alias("__k"),
            F.round(F.col(score_col), resolution).alias("__b"),
        )
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    cum = hist.withColumn(
        "__cum",
        F.sum("__c").over(
            Window.partitionBy("__k")
            .orderBy("__b")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    ).withColumn("__tot", F.sum("__c").over(Window.partitionBy("__k")))
    out = None
    for p in probs:
        t = (
            cum.where(F.col("__cum") >= F.lit(float(p)) * F.col("__tot"))
            .groupBy("__k")
            .agg(F.min("__b").alias("threshold"))
            .withColumn("prob", F.lit(float(p)))
        )
        out = t if out is None else out.unionByName(t)
    return out.select(F.col("__k").alias(key_col), "prob", "threshold")


def ccnet_buckets(
    scored: DataFrame,
    key_col: str,
    score_col: str,
    head: float = 1.0 / 3.0,
    tail: float = 2.0 / 3.0,
    resolution: int = 2,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Label every row ``head`` / ``middle`` / ``tail`` by its score's
    per-key empirical tercile (CCNet's quality split: with score =
    LM NLL, ``head`` is the lowest-perplexity ≈third of each key).

    Thresholds from :func:`quantile_thresholds` (bounded histogram,
    no corpus sort) broadcast back; the label is a scan-local CASE on
    the quantized score.  Ties at a threshold all land in the lower
    bucket — bucket masses are equal only up to score-tie granularity,
    exactly like CCNet's own chunk-quantile split.
    """
    th = quantile_thresholds(
        scored, key_col, score_col, [head, tail], resolution
    )
    t = th.groupBy(key_col).agg(
        F.min(
            F.when(F.col("prob") == float(head), F.col("threshold"))
        ).alias("__t_head"),
        F.min(
            F.when(F.col("prob") == float(tail), F.col("threshold"))
        ).alias("__t_tail"),
    )
    s = F.round(F.col(score_col), resolution)
    return (
        scored.join(F.broadcast(t), key_col)
        .withColumn(
            bucket_col,
            F.when(s <= F.col("__t_head"), F.lit("head"))
            .when(s <= F.col("__t_tail"), F.lit("middle"))
            .otherwise(F.lit("tail")),
        )
        .drop("__t_head", "__t_tail")
    )
