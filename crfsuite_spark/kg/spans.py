"""BIO label runs → mention spans, and span-pair → relation assembly.

Inverse of the IOB recode (reference R/training_data.R:103): detect
span starts with a window ``lag(label)`` change-point, number spans
with a running sum, and aggregate tokens per span — all JVM-side
DataFrame ops, no UDFs.

Relation assembly follows the transcript grammar the tagger was
trained on: within a turn, each REL span takes the nearest entity span
ending before it as subject and the nearest starting after it as
object (ties by distance then token order). Expressed as two
turn-local joins + row_number pruning; the join key (conv_id,
turn_idx) hash-distributes, so hot conversations spread across the
cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assemble_spans(
    decoded: DataFrame,
    seq_cols: list[str] = ("conv_id", "turn_idx"),
    order_col: str = "token_idx",
    label_col: str = "label",
    token_col: str = "token",
) -> DataFrame:
    """Token rows with BIO labels → one row per span.

    Output: *seq_cols, span_id, entity_type, surface, start_tok, end_tok.
    Spans: maximal runs where label is B-X followed by I-X of the same X.
    """
    seq_cols = list(seq_cols)
    w = Window.partitionBy(*seq_cols).orderBy(order_col)
    lab = F.col(label_col)
    etype = F.substring_index(lab, "-", -1)
    prev_lab = F.lag(label_col).over(w)
    # continuation only after B-<type> / I-<type> with the EXACT same
    # type (a suffix match like "B-GPE-LOC".endswith("LOC") must NOT
    # continue an I-LOC run); identical test in the streaming twin
    prev_continues = (prev_lab == F.concat(F.lit("B-"), etype)) | (
        prev_lab == F.concat(F.lit("I-"), etype)
    )
    is_start = lab.startswith("B-") | (
        lab.startswith("I-")
        & (prev_lab.isNull() | ~F.coalesce(prev_continues, F.lit(False)))
    )
    toks = (
        decoded.withColumn("__etype", etype)
        .withColumn("__start", F.when(lab == "O", None).otherwise(is_start.cast("int")))
        .withColumn(
            "__span",
            F.sum(F.coalesce(F.col("__start"), F.lit(0))).over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .where(lab != "O")
    )
    # a token continues the previous span only if same type AND contiguous;
    # a type change forces __start=1 above, so grouping by running sum is safe
    return (
        toks.groupBy(*seq_cols, "__span", "__etype")
        .agg(
            F.min(order_col).alias("start_tok"),
            F.max(order_col).alias("end_tok"),
            F.concat_ws(
                " ", F.array_sort(F.collect_list(F.struct(order_col, token_col))).getField(token_col)
            ).alias("surface"),
        )
        .select(
            *seq_cols,
            F.col("__span").alias("span_id"),
            F.col("__etype").alias("entity_type"),
            "surface",
            "start_tok",
            "end_tok",
        )
    )


def assemble_spans_streaming(
    decoded: DataFrame,
    seq_cols: list[str] = ("conv_id", "turn_idx"),
    order_col: str = "token_idx",
    label_col: str = "label",
    token_col: str = "token",
) -> DataFrame:
    """Shuffle-free span assembly for DECODE OUTPUT.

    ``decode`` already repartitions by the sequence key and sorts within
    partitions, and its streaming UDF emits sequences whole and ordered
    — so the rows arriving here are sequence-contiguous per partition.
    A narrow ``mapInPandas`` (NO Exchange: Catalyst plans map → map)
    re-stitches Arrow batch boundaries with the same
    ``iter_sequence_frames`` contract decode itself uses and extracts
    BIO runs vectorized in pandas. Identical output to
    :func:`assemble_spans` (parity-tested), minus one full shuffle of
    every decoded token.

    Measured trade at 3.6M turns: the pandas pass costs more CPU than
    the JVM window+agg but removes the token shuffle, so it wins where
    shuffle/memory bandwidth is the binding resource (16 pinned cores:
    142 s → 118 s end-to-end) and loses slightly where compute is
    (8 cores: 185 s → 194 s). Pick via
    ``PipelineConfig(streaming_spans=True)`` — the right call on wide
    executors or slow shuffle fabric.

    Only valid on sequence-contiguous input (decode output or anything
    passed through ``repartition(*seq).sortWithinPartitions(*seq,
    order)``); use :func:`assemble_spans` for arbitrary frames.
    """
    import pandas as pd

    from crfsuite_spark.operators.sequences import iter_sequence_frames

    seq_cols = list(seq_cols)
    keep = [*seq_cols, order_col, label_col, token_col]
    fields = dict(decoded.select(*keep).dtypes)
    schema = (
        ", ".join(f"{c} {fields[c]}" for c in seq_cols)
        + ", span_id bigint, entity_type string, surface string"
        + f", start_tok {fields[order_col]}, end_tok {fields[order_col]}"
    )

    def spans_fn(batches):
        for pdf in iter_sequence_frames(batches, seq_cols):
            lab = pdf[label_col].fillna("O")
            non_o = lab != "O"
            if not non_o.any():
                continue
            etype = lab.str.rpartition("-")[2]
            prev_lab = lab.shift(1)
            same_seq = pd.Series(True, index=pdf.index)
            for k in seq_cols:
                same_seq &= pdf[k].eq(pdf[k].shift(1))
            prev_ends_type = prev_lab.fillna("") == ("B-" + etype)
            prev_ends_type |= prev_lab.fillna("") == ("I-" + etype)
            is_start = non_o & (
                lab.str.startswith("B-")
                | (~same_seq)
                | ~prev_ends_type
            )
            # span numbering: running count of starts within the sequence
            span_id = is_start.astype("int64").groupby(
                [pdf[k] for k in seq_cols], sort=False
            ).cumsum()
            sub = pdf.loc[non_o, keep].copy()
            sub["span_id"] = span_id[non_o]
            sub["entity_type"] = etype[non_o]
            agg = (
                sub.groupby([*seq_cols, "span_id", "entity_type"], sort=False)
                .agg(
                    start_tok=(order_col, "min"),
                    end_tok=(order_col, "max"),
                    surface=(token_col, lambda s: " ".join(map(str, s))),
                )
                .reset_index()
            )
            yield agg[[*seq_cols, "span_id", "entity_type", "surface",
                       "start_tok", "end_tok"]]

    return decoded.select(*keep).mapInPandas(spans_fn, schema)


# default predicate lexicon: normalized REL surface → predicate id
# (mirrors datagen.transcripts.RELATIONS so gold parity is exact)
def default_predicate_map() -> dict[str, str]:
    from crfsuite_spark.datagen.transcripts import PRED_BY_PHRASE

    return dict(PRED_BY_PHRASE)


def predicate_column(pred_map: dict[str, str], default_pred: str) -> "F.Column":
    """rel_surface → predicate id via a literal map (small,
    constant-folded by Catalyst); shared by assemble_relations and the
    fused relation path so the lookup semantics stay single-sourced."""
    if pred_map:
        mapping = F.create_map(
            *[F.lit(x) for kv in pred_map.items() for x in kv]
        )
        return F.coalesce(
            mapping.getItem(F.lower(F.col("rel_surface"))), F.lit(default_pred)
        )
    return F.lit(default_pred)


def assemble_relations(
    spans: DataFrame,
    seq_cols: list[str] = ("conv_id", "turn_idx"),
    predicate_map: dict[str, str] | None = None,
    default_pred: str = "related_to",
) -> DataFrame:
    """REL spans + entity spans → (subj_surface, pred, obj_surface) rows.

    Output: *seq_cols, subj_surface, subj_type, pred, obj_surface,
    obj_type, rel_surface.
    """
    seq_cols = list(seq_cols)
    pred_map = predicate_map if predicate_map is not None else default_predicate_map()
    spark = spans.sparkSession
    rels = spans.where(F.col("entity_type") == "REL").select(
        *seq_cols,
        F.col("span_id").alias("rel_id"),
        F.col("surface").alias("rel_surface"),
        F.col("start_tok").alias("rel_start"),
        F.col("end_tok").alias("rel_end"),
    )
    ents = spans.where(F.col("entity_type") != "REL").select(
        *seq_cols,
        F.col("surface").alias("ent_surface"),
        F.col("entity_type").alias("ent_type"),
        "start_tok",
        "end_tok",
    )
    # one turn-local join, then conditional max_by/min_by aggregation:
    # subject = entity with the greatest end_tok before the REL span,
    # object = entity with the smallest start_tok after it. A single
    # shuffle pair (join + partial-agg groupBy) replaces the previous
    # two-join/two-window plan; null keys are ignored by max_by/min_by
    # so both roles resolve in the same pass.
    ent = F.struct("ent_surface", "ent_type")
    out = (
        rels.join(ents, seq_cols)
        .groupBy(*seq_cols, "rel_id", "rel_surface")
        .agg(
            F.max_by(
                ent, F.when(F.col("end_tok") < F.col("rel_start"), F.col("end_tok"))
            ).alias("__subj"),
            F.min_by(
                ent, F.when(F.col("start_tok") > F.col("rel_end"), F.col("start_tok"))
            ).alias("__obj"),
        )
        .where(F.col("__subj").isNotNull() & F.col("__obj").isNotNull())
        .select(
            *seq_cols, "rel_id", "rel_surface",
            F.col("__subj.ent_surface").alias("subj_surface"),
            F.col("__subj.ent_type").alias("subj_type"),
            F.col("__obj.ent_surface").alias("obj_surface"),
            F.col("__obj.ent_type").alias("obj_type"),
        )
    )
    pred = predicate_column(pred_map, default_pred)
    return out.withColumn("pred", pred).select(
        *seq_cols, "subj_surface", "subj_type", "pred",
        "obj_surface", "obj_type", "rel_surface",
    )
