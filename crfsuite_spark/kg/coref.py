"""Conversation-scope pronoun coreference (coref-lite) for KG recall.

The reference tags mentions per sentence (`R/crfsuite.R` predict over
one sequence at a time) and never links across turns, so a transcript
like "Alice founded Acme . She works at Globex ." yields no subject
for the second relation. At conversation scope the standard cheap
resolver — most recent prior mention of a compatible entity type —
recovers those triples. This module implements it as a pure window
computation: entity mentions and pronoun tokens are unioned into one
per-conversation stream ordered by (turn_idx, position), and each
pronoun reads per-type ``last(..., ignorenulls=True)`` values over the
strictly-preceding rows. One hash Exchange on ``conv_id`` total, no
join, no per-row Python — the shape survives 10^12 turns because a
conversation's stream is the window unit and conversations are the
partitioning key the rest of the pipeline already uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# pronoun (lowercased) -> entity types it may refer to, in priority
# order when recencies tie (they cannot: positions are unique)
PRONOUN_TYPES: dict[str, tuple[str, ...]] = {
    "he": ("PER",),
    "him": ("PER",),
    "his": ("PER",),
    "she": ("PER",),
    "her": ("PER",),
    "they": ("PER", "ORG"),
    "them": ("PER", "ORG"),
    "it": ("ORG", "LOC"),
    "its": ("ORG", "LOC"),
    "there": ("LOC",),
}

def resolve_pronouns(
    tokens: DataFrame,
    spans: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    pos_col: str = "token_idx",
    pronoun_types: dict[str, tuple[str, ...]] | None = None,
) -> DataFrame:
    """Resolve pronoun tokens to their most recent prior entity mention
    of a compatible type within the same conversation.

    ``tokens``: (conv_col, turn_col, pos_col, token) — the token stream.
    ``spans``: assemble_spans output (conv_col, turn_col, entity_type,
    surface, start_tok, end_tok).

    Output: one row per pronoun occurrence —
    (conv_col, turn_col, token_idx, pronoun, ant_turn_idx, ant_pos,
    ant_type, ant_surface), antecedent columns NULL when no compatible
    mention precedes the pronoun.
    """
    pronoun_types = PRONOUN_TYPES if pronoun_types is None else pronoun_types
    pron_lc = F.lower(F.col("token"))
    prons = tokens.where(pron_lc.isin(*pronoun_types.keys())).select(
        conv_col,
        F.col(turn_col).alias("turn_idx"),
        F.col(pos_col).cast("int").alias("token_idx"),
        pron_lc.alias("pronoun"),
    )
    return resolve_pronoun_stream(
        prons, spans, conv_col=conv_col, turn_col=turn_col,
        pronoun_types=pronoun_types,
    )


def resolve_pronoun_stream(
    prons: DataFrame,
    spans: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    pronoun_types: dict[str, tuple[str, ...]] | None = None,
) -> DataFrame:
    """The window core of :func:`resolve_pronouns` for callers that
    already extracted the pronoun stream (e.g. the fused decoder's
    emit='coref' union): ``prons`` is (conv_col, turn_idx, token_idx,
    pronoun[lowercase]), ``spans`` the usual mention span frame.
    Output and semantics identical to resolve_pronouns."""
    pronoun_types = PRONOUN_TYPES if pronoun_types is None else pronoun_types
    mentions = spans.select(
        conv_col,
        F.col(turn_col).alias("__turn"),
        # a mention becomes visible once it is complete: order at its
        # last token so a pronoun never resolves to a span it sits in
        F.col("end_tok").cast("int").alias("__pos"),
        F.lit(None).cast("string").alias("pronoun"),
        F.col("entity_type").alias("__etype"),
        F.col("surface").alias("__surface"),
    )
    stream = prons.select(
        conv_col,
        F.col("turn_idx").alias("__turn"),
        F.col("token_idx").cast("int").alias("__pos"),
        "pronoun",
        F.lit(None).cast("string").alias("__etype"),
        F.lit(None).cast("string").alias("__surface"),
    ).unionByName(mentions)

    # mentions sort before pronouns at identical (turn, pos): a span
    # cannot end ON a pronoun token, but determinism costs nothing
    w = (
        Window.partitionBy(conv_col)
        .orderBy("__turn", "__pos", F.col("pronoun").isNotNull().cast("int"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # candidate windows driven by the configured type universe, so
    # custom pronoun_types maps (new types, >2 types per pronoun) work
    tracked = sorted({t for ts in pronoun_types.values() for t in ts})
    cand = {}
    for t in tracked:
        packed = F.when(
            F.col("__etype") == t,
            F.struct(
                F.col("__turn").alias("t"),
                F.col("__pos").alias("p"),
                F.col("__surface").alias("s"),
            ),
        )
        cand[t] = F.last(packed, ignorenulls=True).over(w)

    out = stream.select(
        conv_col, "__turn", "__pos", "pronoun",
        *[cand[t].alias(f"__c_{t}") for t in tracked],
    ).where(F.col("pronoun").isNotNull())

    def best_for(types: tuple[str, ...]):
        # most recent of the compatible candidates, folded pairwise;
        # (turn, pos) comparison — positions are unique per conv
        cols = [F.col(f"__c_{t}").withField("k", F.lit(t)) for t in types]
        best = cols[0]
        for c in cols[1:]:
            best = F.when(best.isNull(), c).when(c.isNull(), best).otherwise(
                F.when(
                    (best["t"] > c["t"])
                    | ((best["t"] == c["t"]) & (best["p"] > c["p"])),
                    best,
                ).otherwise(c)
            )
        return best

    chosen = None
    for pron, types in pronoun_types.items():
        expr = best_for(types)
        chosen = (
            F.when(F.col("pronoun") == pron, expr)
            if chosen is None
            else chosen.when(F.col("pronoun") == pron, expr)
        )

    return out.select(
        conv_col,
        F.col("__turn").alias("turn_idx"),
        F.col("__pos").alias("token_idx"),
        "pronoun",
        chosen.getField("t").alias("ant_turn_idx"),
        chosen.getField("p").alias("ant_pos"),
        chosen.getField("k").alias("ant_type"),
        chosen.getField("s").alias("ant_surface"),
    )


def spans_with_antecedents(
    spans: DataFrame, resolved: DataFrame, conv_col: str = "conv_id"
) -> DataFrame:
    """Union the span table with resolved pronouns re-written as
    mention rows (the antecedent's type and surface at the pronoun's
    position), so assemble_relations / link_mentions recover triples
    whose subject or object was pronominal. Unresolved pronouns
    (NULL antecedent) are dropped."""
    has_span_id = "span_id" in spans.columns
    extra = resolved.where(F.col("ant_surface").isNotNull()).select(
        conv_col,
        "turn_idx",
        F.col("ant_type").alias("entity_type"),
        F.col("ant_surface").alias("surface"),
        F.col("token_idx").alias("start_tok"),
        F.col("token_idx").alias("end_tok"),
    )
    if has_span_id:
        # negative ids keep pronoun rows disjoint from assemble_spans'
        # positive running-sum span ids
        extra = extra.withColumn(
            "span_id", (-(F.col("start_tok") + 1)).cast("long")
        )
        cols = [conv_col, "turn_idx", "span_id", "entity_type", "surface",
                "start_tok", "end_tok"]
    else:
        cols = [conv_col, "turn_idx", "entity_type", "surface",
                "start_tok", "end_tok"]
    return spans.select(*cols).unionByName(extra.select(*cols))
