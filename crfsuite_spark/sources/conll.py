"""CoNLL-2002-style token-per-line readers (reference S1/S2,
R/data.R:26-154).

The reference downloads CoNLL-2002 zips and parses them in R: split
each line on a separator into (token, pos, label); a ``-DOCSTART-``
line starts a new document, a blank line starts a new sentence, ids are
running cumulative sums (R/data.R:49-79). The Spark version expresses
the same thing declaratively:

- ``spark.read.text`` keeps file order per file split; we materialize
  an explicit ``line_id`` so the cumulative sums are well-defined and
  deterministic regardless of partitioning (zipWithIndex semantics via
  a single-file read or a provided order column);
- doc/sentence ids = ``sum(is_boundary) OVER (ORDER BY line_id)`` —
  one global window (fine: training corpora are bounded, §scale note in
  train/trainer.py), or per-file windows at many-file scale;
- WikiNER's ``token|pos|label`` pipe format (R/data.R:140-145) is the
  same plan with a different separator and an explode of
  space-separated tokens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def read_conll(
    spark,
    path: str,
    sep: str = " ",
    columns: tuple[str, ...] = ("token", "pos", "label"),
    docstart: str = "-DOCSTART-",
) -> DataFrame:
    """Parse a CoNLL-2002-style file → one row per token with
    (doc_id, sentence_id, token_id, *columns).

    Blank line = sentence boundary; line starting with ``docstart`` =
    document boundary (R/data.R:49-79 semantics, cumulative-sum ids).
    """
    lines = spark.read.text(path)
    w = Window.orderBy("line_id")
    df = (
        lines.select(
            F.monotonically_increasing_id().alias("line_id"),
            F.col("value").alias("line"),
        )
        .withColumn("is_doc", F.col("line").startswith(docstart).cast("int"))
        .withColumn(
            "is_blank", (F.trim(F.col("line")) == "").cast("int")
        )
        .withColumn("doc_id", F.sum("is_doc").over(w))
        .withColumn(
            "sentence_id",
            F.sum(F.greatest("is_doc", "is_blank")).over(w),
        )
    )
    toks = df.where((F.col("is_doc") == 0) & (F.col("is_blank") == 0))
    parts = F.split(F.col("line"), F.lit(sep) if sep != "|" else r"\|")
    sel = [
        "doc_id",
        "sentence_id",
        F.row_number().over(
            Window.partitionBy("doc_id", "sentence_id").orderBy("line_id")
        ).alias("token_id"),
    ] + [parts.getItem(i).alias(c) for i, c in enumerate(columns)]
    return toks.select(*sel)


def read_wikiner(spark, path: str) -> DataFrame:
    """WikiNER format: one sentence per line, tokens separated by
    spaces, each token ``word|pos|label`` (R/data.R:140-145)."""
    lines = spark.read.text(path)
    df = lines.select(
        F.monotonically_increasing_id().alias("sentence_id"),
        F.col("value").alias("line"),
    ).where(F.trim("line") != "")
    tok = df.select(
        "sentence_id",
        F.posexplode(F.split("line", " ")).alias("pos_idx", "tok"),
    )
    parts = F.split(F.col("tok"), r"\|")
    return tok.select(
        "sentence_id",
        (F.col("pos_idx") + 1).alias("token_id"),
        parts.getItem(0).alias("token"),
        parts.getItem(1).alias("pos"),
        parts.getItem(2).alias("label"),
    )
