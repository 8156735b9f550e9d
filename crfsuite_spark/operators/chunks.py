"""Chunk-range containment join — the reference's ``merge.chunkrange``
(R/training_data.R:52-106): assign each token the entity of the chunk
whose [start, end] char span contains the token's [start, end] span,
per doc; ties broken by the LAST matching chunk (R line 90,
``tail(idx, 1)``); uncovered tokens default to 'O' (lines 91-92); only
docs present in both tables are joined (doc-intersection semi-join,
lines 71-75).

Spark plan: broadcast the chunk side (annotation tables are tiny
relative to the token stream), range-predicate join, last-wins via one
row_number window, IOB recode via a second window — all JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_chunkrange(
    tokens: DataFrame,
    chunks: DataFrame,
    doc_col: str = "doc_id",
    token_start: str = "start",
    token_end: str = "end",
    chunk_start: str = "start",
    chunk_end: str = "end",
    chunk_id: str = "chunk_id",
    entity_col: str = "chunk_entity",
    default: str = "O",
    iob: bool = True,
    order_col: str = "token_idx",
) -> DataFrame:
    """Tokens + chunk annotations → tokens with a gold ``label`` column.

    With ``iob=True`` the entity is B-/I- recoded per (doc, chunk) run
    (R/training_data.R:103); otherwise the raw entity is attached.
    """
    c = chunks.select(
        F.col(doc_col).alias("__doc"),
        F.col(chunk_id).alias("__cid"),
        F.col(chunk_start).alias("__cs"),
        F.col(chunk_end).alias("__ce"),
        F.col(entity_col).alias("__ent"),
    )
    t = tokens.withColumn("__doc", F.col(doc_col))
    joined = t.join(
        F.broadcast(c),
        (t["__doc"] == c["__doc"])
        & (F.col("__cs") <= F.col(token_start))
        & (F.col(token_end) <= F.col("__ce")),
        "left",
    ).drop(c["__doc"])
    # last-wins tie-break: highest chunk_id per token
    w = Window.partitionBy(doc_col, order_col).orderBy(F.desc_nulls_last("__cid"))
    picked = (
        joined.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", "__doc")
    )
    if not iob:
        return picked.withColumn(
            "label", F.coalesce("__ent", F.lit(default))
        ).drop("__cid", "__cs", "__ce", "__ent")
    # IOB recode: first token of each (doc, chunk) run gets B-, rest I-
    w2 = Window.partitionBy(doc_col, "__cid").orderBy(order_col)
    rn = F.row_number().over(w2)
    label = F.when(F.col("__ent").isNull(), F.lit(default)).otherwise(
        F.concat(F.when(rn == 1, F.lit("B-")).otherwise(F.lit("I-")), F.col("__ent"))
    )
    return picked.withColumn("label", label).drop("__cid", "__cs", "__ce", "__ent")


# the shiny annotation app's chunkrange record (S9): one row per saved
# chunk — inst/app/annotation.Rmd:87-95 writes exactly these fields
ANNOTATION_SCHEMA = (
    "annotation_time timestamp, doc_id string, text string, "
    "text_visible string, start int, end int, chunk_id int, "
    "chunk_entity string, chunk string"
)
_ANNOTATION_COLS = [f.split()[0] for f in ANNOTATION_SCHEMA.split(", ")]


def write_annotations(df: DataFrame, path: str, mode: str = "append") -> None:
    """S9 annotation sink: persist chunkrange annotation rows in the
    app's record layout (the reference saves RDS; we write parquet so
    the table is directly joinable by merge_chunkrange at any scale).
    Raises on missing columns — the app schema is the contract."""
    missing = [c for c in _ANNOTATION_COLS if c not in df.columns]
    if missing:
        raise ValueError(f"annotation frame missing columns: {missing}")
    df.select(*_ANNOTATION_COLS).write.mode(mode).parquet(path)


def read_annotations(spark, path: str) -> DataFrame:
    """Scan saved chunkrange annotations (S9 companion scan)."""
    return spark.read.parquet(path).select(*_ANNOTATION_COLS)
