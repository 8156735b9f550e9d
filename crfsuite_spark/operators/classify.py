"""Hashed bag-of-words text classification (fastText/CCNet pattern).

Large-scale training-data pipelines distill cheap heuristics or
metadata labels into a learned text scorer (CCNet trains fastText on
Wikipedia-vs-CommonCrawl; quality filters train on heuristic labels)
and then score every document with it.  This module implements the
closed-form member of that family — binary Naive Bayes over hashed
whitespace tokens (hashing trick, Weinberger et al. 2009) — entirely
with Spark's declarative surface:

- **fit** is two partial-aggregated ``groupBy``s: (bucket, label)
  token counts and per-label doc counts.  The corpus shuffles once, as
  pre-aggregated counts bounded by ``2 * n_buckets`` rows — never as
  text.  The collected model is ``n_buckets`` doubles.
- **score** is zero-shuffle: the per-bucket log-likelihood-ratio table
  embeds in the plan as a literal array (the same broadcast-small-model
  shape as the CRF weight matrix in decode/tagger.py), and each row's
  score is a whole-stage-codegen ``aggregate`` HOF over its own tokens.
  No Python UDF, no join, no explode at scoring time.

Token hashing uses the repo's portable md5 idiom
(``('0x' || substr(md5(w), 1, 8))::BIGINT % B`` in DuckDB), so the
whole fit+score chain is reproducible cross-engine for the driver
oracle.  Scores are rounded to 6 decimals on both sides (the repo's
float-oracle convention) — summation order across engines differs in
the last ulps, far below the rounding quantum.

The reference (bnosac/crfsuite) has no document classifier — this is
part of the LLM-data-pipeline surface the engine adds on top of the
reference's sequence-labeling scope.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class HashedNBModel:
    """Binary NB over hashed tokens: ``score = prior_llr + sum(llr[b])``
    over the document's token buckets; positive score -> class 1."""

    n_buckets: int
    prior_llr: float
    llr: np.ndarray  # shape (n_buckets,), float64
    alpha: float

    def to_frame(self, spark) -> DataFrame:
        """Model as a (bucket, llr) frame (plus bucket -1 = prior) for
        persistence next to other parquet model artifacts."""
        rows = [(-1, float(self.prior_llr))] + [
            (int(b), float(v)) for b, v in enumerate(self.llr)
        ]
        return spark.createDataFrame(rows, "bucket int, llr double")

    @classmethod
    def from_frame(cls, frame: DataFrame, alpha: float = 1.0) -> "HashedNBModel":
        rows = {r["bucket"]: r["llr"] for r in frame.collect()}
        prior = rows.pop(-1)
        llr = np.zeros(len(rows))
        for b, v in rows.items():
            llr[b] = v
        return cls(len(rows), prior, llr, alpha)


def _tokens(text_col: str) -> Column:
    """Whitespace tokens of lower(trim(text)), empties dropped — the
    repo's standard tokenization (mirrors string_split_regex +
    unnest-with-empty-filter in the DuckDB oracles)."""
    arr = F.split(F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), r"\s+")
    return F.filter(arr, lambda t: t != F.lit(""))


def _bucket(tok: Column, n_buckets: int) -> Column:
    """Portable bucket hash: first 8 md5 hex digits as int, mod B."""
    return (
        F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long")
        % F.lit(int(n_buckets))
    )


def fit_hashed_nb(
    docs: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    n_buckets: int = 512,
    alpha: float = 1.0,
) -> HashedNBModel:
    """Fit binary NB from a frame with ``label_col`` in {0, 1}.

    Two jobs, both shuffle only pre-aggregated counts: (bucket, label)
    token counts (<= 2B rows cross the wire regardless of corpus size)
    and per-label doc counts (2 rows).  Collecting the model is
    bounded by ``n_buckets`` — the corpus never reaches the driver.
    """
    cnt = (
        docs.select(
            F.col(label_col).cast("int").alias("y"),
            F.explode(_tokens(text_col)).alias("w"),
        )
        .select("y", _bucket(F.col("w"), n_buckets).alias("b"))
        .groupBy("y", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    n_docs = {
        r["y"]: r["n"]
        for r in docs.groupBy(F.col(label_col).cast("int").alias("y"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    if n_docs.get(0, 0) == 0 or n_docs.get(1, 0) == 0:
        raise ValueError("fit_hashed_nb needs both classes present")
    counts = np.zeros((2, n_buckets), dtype=np.float64)
    for r in cnt:
        counts[r["y"], r["b"]] = r["c"]
    totals = counts.sum(axis=1)
    a = float(alpha)
    llr = np.log((counts[1] + a) / (totals[1] + a * n_buckets)) - np.log(
        (counts[0] + a) / (totals[0] + a * n_buckets)
    )
    prior = float(np.log(float(n_docs[1])) - np.log(float(n_docs[0])))
    return HashedNBModel(n_buckets, prior, llr, a)


def score_hashed_nb(
    docs: DataFrame,
    model: HashedNBModel,
    text_col: str = "text",
    score_col: str = "nb_score",
    pred_col: str = "nb_pred",
) -> DataFrame:
    """Add ``score_col`` (log-odds, rounded to 6) and ``pred_col``
    (1 if score > 0) to every row.  Zero shuffle: the llr table is a
    plan literal and the token sum is a codegen ``aggregate`` HOF.
    """
    llr_lit = F.array(*[F.lit(float(v)) for v in model.llr])
    raw = F.lit(float(model.prior_llr)) + F.aggregate(
        _tokens(text_col),
        F.lit(0.0),
        lambda acc, t: acc
        + F.element_at(
            llr_lit, (_bucket(t, model.n_buckets) + F.lit(1)).cast("int")
        ),
    )
    score = F.round(raw, 6)
    return docs.withColumn(score_col, score).withColumn(
        pred_col, (F.col(score_col) > 0).cast("int")
    )
