"""Deterministic tokenizer: transcripts → token table.

The transcript fixture's ``text`` is the space-join of its tokens
(per-turn text equality invariant, BASELINE.json:input_hint), so the
tokenizer is ``posexplode(split(text, ' '))`` — a pure JVM-side
transform with exact char offsets reconstructed from cumulative token
lengths. POS tags are assigned by the same closed-set heuristic the
generator uses, expressed as Column logic (no UDF).

Reference analogue: the CoNLL readers that produce the
(doc_id, sentence_id, token, pos, label) shape (R/data.R:62-76).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crfsuite_spark.datagen.transcripts import FUNC_WORDS, VERB_WORDS

_PREPS = {"at", "by", "in", "of", "to", "with"}


def pos_column(tok) -> "F.Column":
    """Deterministic POS-ish tag as a Column expression (mirrors
    datagen.transcripts._pos_of exactly)."""
    c = F.col(tok) if isinstance(tok, str) else tok
    low = F.lower(c)
    return (
        F.when(c.isin(".", ",", "?", ":", "!", ";"), "Punc")
        .when(low.isin(*sorted(VERB_WORDS)), "V")
        .when(low.isin(*sorted(_PREPS)), "Prep")
        .when(low.isin(*sorted(FUNC_WORDS - _PREPS)), "Art")
        .when(c.rlike("^[A-Z]"), "NNP")
        .when(c.rlike("^[0-9]+$"), "Num")
        .otherwise("N")
    )


def tokenize(transcripts: DataFrame, with_offsets: bool = True) -> DataFrame:
    """(conv_id, turn_idx, role, text, ...) → one row per token.

    Output: conv_id, turn_idx, token_idx (int), token, pos
    [, start, end char offsets]. Empty/NULL text yields no rows.
    """
    toks = transcripts.select(
        "conv_id",
        "turn_idx",
        F.posexplode(F.split(F.col("text"), " ")).alias("token_idx", "token"),
    ).where(F.col("token") != "")
    toks = toks.withColumn("pos", pos_column("token"))
    if with_offsets:
        w = (
            Window.partitionBy("conv_id", "turn_idx")
            .orderBy("token_idx")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        # start = sum(len(prev tokens) + 1 space each)
        start = F.coalesce(F.sum(F.length("token") + 1).over(w), F.lit(0))
        toks = toks.withColumn("start", start.cast("int")).withColumn(
            "end", (F.col("start") + F.length("token") - 1).cast("int")
        )
    return toks
