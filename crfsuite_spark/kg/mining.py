"""Alias mining: grow the entity-linking dictionary from supervision.

The reference ships a FIXED alias dictionary (the user hand-curates it;
crfsuite itself only tags spans — see vignettes/crfsuite-nlp.Rmd, where
entity linking is left to the caller).  At 10^12-turn scale the
dictionary is never complete: new products, people, and shorthands
appear in transcripts faster than curation.  This module closes the
loop — given any mention stream that carries (surface, canonical_id)
supervision (human labels, high-confidence exact links, or accepted
coref chains), it mines NEW dictionary entries:

- :func:`mine_aliases` — co-occurrence mining.  A normalized surface
  that maps to one canonical id with high support and high confidence
  (share of that surface's occurrences) is a new alias.  The whole
  computation is two partial-aggregated ``groupBy``s: the first
  collapses the 10^12-row mention stream to distinct (surface, id)
  pairs map-side (vocabulary-scale output), the second runs on that
  collapsed frame — the raw stream is shuffled once, as pre-aggregated
  pair counts, never as rows.
- :func:`mine_acronyms` — initialism recovery.  An UNKNOWN surface
  ("sf") that equals the initials of a known multi-word alias of
  entity E ("san francisco") is accepted only with conv-local
  evidence: some turn in the same conversation mentions E by a known
  alias.  The dictionary side (known aliases, their initials) stays
  broadcast; the only shuffle touches the slim (conv_id, canonical_id)
  evidence pairs, never mention text.

Both emit (alias, canonical_id, support, ...) frames ready to union
into the broadcast dictionary that ``kg/linking.py::link_mentions``
consumes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crfsuite_spark.kg.linking import normalize_surface


def mine_aliases(
    mentions: DataFrame,
    alias_dict: DataFrame,
    surface_col: str = "surface",
    id_col: str = "canonical_id",
    min_support: int = 2,
    min_confidence: float = 0.6,
) -> DataFrame:
    """Mine (alias, canonical_id) pairs absent from ``alias_dict``.

    ``mentions`` must carry a surface column and a resolved-entity
    column (gold labels, exact-link output, accepted coref chains).
    Confidence is P(canonical_id | alias) over the mention stream;
    ``support`` is the raw pair count.  Returns
    (alias, canonical_id, support, confidence) with alias normalized
    exactly like the linker normalizes dictionary entries, so the
    output unions straight into the dictionary.

    Scale shape: the first ``groupBy`` partially aggregates map-side,
    so the shuffle carries one (alias, id, count) row per DISTINCT
    pair — vocabulary-scale, not corpus-scale.  The per-alias total is
    a second aggregation over that collapsed frame, joined back on the
    uniform alias key; the known-pair anti-join broadcasts the
    dictionary.  No window functions, no full-row shuffle.
    """
    pairs = (
        mentions.select(
            normalize_surface(surface_col).alias("alias"),
            F.col(id_col).alias("canonical_id"),
        )
        .where(F.length("alias") > 0)
        .groupBy("alias", "canonical_id")
        .agg(F.count(F.lit(1)).alias("support"))
    )
    totals = pairs.groupBy("alias").agg(F.sum("support").alias("__total"))
    scored = (
        pairs.join(totals, "alias")
        .withColumn("confidence", F.col("support") / F.col("__total"))
        .where(
            (F.col("support") >= int(min_support))
            & (F.col("confidence") >= float(min_confidence))
        )
        .select("alias", "canonical_id", "support", "confidence")
    )
    known = alias_dict.select(
        normalize_surface("alias").alias("alias"), "canonical_id"
    ).distinct()
    return scored.join(F.broadcast(known), ["alias", "canonical_id"], "left_anti")


def mine_acronyms(
    mentions: DataFrame,
    alias_dict: DataFrame,
    surface_col: str = "surface",
    conv_col: str = "conv_id",
    min_convs: int = 2,
    max_len: int = 8,
) -> DataFrame:
    """Recover initialisms: unknown surfaces that spell the initials of
    a known multi-word alias, with conversation-local evidence.

    A candidate (surface s, entity E) needs BOTH: ``s`` equals the
    first letters of some known multi-word alias of E, AND the same
    conversation links to E through a known alias somewhere (so "sf"
    in a conversation that also says "San Francisco" counts, a bare
    "sf" elsewhere does not — initials collide too easily to accept
    without local evidence).  Returns (alias, canonical_id, support,
    n_convs) where support counts evidenced mentions and n_convs the
    distinct conversations providing evidence.

    Scale shape: dictionary, initials map, and the known-alias filter
    all broadcast (dictionary-scale).  The evidence semi-join shuffles
    only the slim (conv_id, canonical_id) pairs — candidate surfaces
    are rare and evidence rows are two short columns; mention text
    never moves.
    """
    known = alias_dict.select(
        normalize_surface("alias").alias("__norm"), "canonical_id"
    ).distinct()
    initials = (
        known.where(F.size(F.split("__norm", " ")) >= 2)
        .select(
            F.array_join(
                F.transform(F.split("__norm", " "), lambda w: F.substring(w, 1, 1)),
                "",
            ).alias("alias"),
            "canonical_id",
        )
        .where(F.length("alias") >= 2)
        .distinct()
    )
    m = mentions.select(
        F.col(conv_col).alias("conv_id"),
        normalize_surface(surface_col).alias("__norm"),
    ).where(F.length("__norm") > 0)
    evidence = (
        m.join(F.broadcast(known), "__norm")
        .select("conv_id", "canonical_id")
        .distinct()
    )
    unknown = m.join(
        F.broadcast(known.select("__norm").distinct()), "__norm", "left_anti"
    )
    cand = (
        unknown.where(
            (~F.col("__norm").contains(" "))
            & F.col("__norm").rlike("^[a-z]+$")
            & (F.length("__norm") <= int(max_len))
        )
        .join(F.broadcast(initials), F.col("__norm") == F.col("alias"))
        .select("conv_id", "alias", "canonical_id")
    )
    return (
        cand.join(evidence, ["conv_id", "canonical_id"], "left_semi")
        .groupBy("alias", "canonical_id")
        .agg(
            F.count(F.lit(1)).alias("support"),
            F.countDistinct("conv_id").alias("n_convs"),
        )
        .where(F.col("n_convs") >= int(min_convs))
    )


def dictionary_spans(
    tokens: DataFrame,
    alias_dict: DataFrame,
    conv: str = "conv_id",
    turn: str = "turn_idx",
    tok_idx: str = "token_idx",
    token: str = "token",
) -> DataFrame:
    """Distant-supervision span projection: every dictionary alias
    found verbatim (lowercased token equality) in the token stream
    becomes a typed span — (conv_id, turn_idx, start_tok, end_tok,
    canonical_id, entity_type, alias) — the Mintz et al. 2009
    bootstrap that weak-labels a NEW corpus before any model exists
    (feed the result to operators/chunks.py for BIO recode and the
    trainer has silver training data; the inverse of
    :func:`mine_aliases`, which grows the dictionary FROM
    supervision).

    Match semantics, deterministic and engine-replayable: candidate =
    an alias whose token sequence equals a contiguous lowercased
    token window; a candidate strictly CONTAINED in a longer
    candidate on the same turn is suppressed (longest-match);
    overlapping-but-not-nested candidates both survive (documented —
    true greedy segmentation is an inherently sequential scan);
    an ambiguous span (two canonical ids for the same alias) resolves
    by (weight desc, canonical_id asc) max_by.

    Scale shape: one groupBy packs each turn's tokens into an ordered
    array (turn-bounded, same partitioning the tagger uses); matching
    is a posexplode of start positions joined BROADCAST against the
    (first-token, n-tokens, alias) dictionary — the stream shuffles
    once into turn arrays and never again; the phrase equality is a
    scan-local slice + array_join, the containment suppression an
    anti-join at candidate cardinality within turns. Real token ids
    ride the array (``token_idx`` gaps survive — start/end map back
    through the packed structs, not positions)."""
    arr = (
        tokens.groupBy(F.col(conv).alias("conv_id"),
                       F.col(turn).alias("turn_idx"))
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col(tok_idx).alias("i"),
                        F.lower(F.col(token)).alias("t"),
                    )
                )
            ).alias("__a")
        )
        .select(
            "conv_id", "turn_idx",
            F.col("__a.i").alias("__ids"),
            F.col("__a.t").alias("__toks"),
        )
    )
    d = (
        alias_dict.select(
            F.lower("alias").alias("__alias"),
            "canonical_id",
            "entity_type",
            F.coalesce(F.col("weight").cast("double"), F.lit(0.0)).alias(
                "__w"
            ),
        )
        .distinct()
        .withColumn("__atoks", F.split("__alias", " "))
        .withColumn("__n", F.size("__atoks"))
        .withColumn("__first", F.col("__atoks")[0])
    )
    cand = (
        arr.select(
            "conv_id", "turn_idx", "__ids", "__toks",
            F.posexplode("__toks").alias("__pos", "__tok"),
        )
        .join(F.broadcast(d), F.col("__tok") == F.col("__first"))
        .where(F.col("__pos") + F.col("__n") <= F.size("__toks"))
        .where(
            F.array_join(
                F.slice(F.col("__toks"), F.col("__pos") + 1, F.col("__n")),
                " ",
            )
            == F.col("__alias")
        )
        .select(
            "conv_id", "turn_idx",
            F.col("__pos").alias("__s"),
            (F.col("__pos") + F.col("__n") - 1).alias("__e"),
            F.element_at(F.col("__ids"), F.col("__pos") + 1).alias(
                "start_tok"
            ),
            F.element_at(
                F.col("__ids"), F.col("__pos") + F.col("__n")
            ).alias("end_tok"),
            "canonical_id", "entity_type",
            F.col("__alias").alias("alias"),
            "__w", "__n",
        )
    )
    # longest-match: drop candidates strictly inside a longer one
    inner = cand.alias("c")
    outer = cand.select(
        "conv_id", "turn_idx",
        F.col("__s").alias("__os"), F.col("__e").alias("__oe"),
        F.col("__n").alias("__on"),
    ).alias("o")
    kept = inner.join(
        outer,
        F.expr(
            "c.conv_id = o.conv_id AND c.turn_idx = o.turn_idx "
            "AND o.__os <= c.__s AND c.__e <= o.__oe AND o.__on > c.__n"
        ),
        "left_anti",
    )
    # ambiguous span -> best (weight desc, canonical_id asc)
    row = F.struct(
        "conv_id", "turn_idx", "start_tok", "end_tok",
        "canonical_id", "entity_type", "alias",
    )
    key = F.struct(
        (-F.col("__w")).alias("nw"), F.col("canonical_id").alias("id")
    )
    return (
        kept.groupBy("conv_id", "turn_idx", "__s", "__e")
        .agg(F.min_by(row, key).alias("__b"))
        .select("__b.*")
    )


def spans_to_bio(
    tokens: DataFrame,
    spans: DataFrame,
    conv: str = "conv_id",
    turn: str = "turn_idx",
    tok_idx: str = "token_idx",
    label_col: str = "label",
) -> DataFrame:
    """Project typed spans back onto the token stream as BIO labels —
    the second half of the distant-supervision bootstrap: tokens
    covered by a :func:`dictionary_spans` span get ``B-<type>`` at the
    span start and ``I-<type>`` inside, everything else ``O``; the
    result is silver training data for the trainer (same label
    alphabet the CoNLL readers emit, R/training_data.R:103 IOB
    convention).

    A token covered by two surviving (overlapping, non-nested) spans
    resolves deterministically to the span with the smallest
    (start_tok, end_tok, canonical_id).

    Shape: the containment join is equi on (conv, turn) plus the
    token-range residual — J1's chunk-range shape, sequence-bounded;
    the per-token winner is one map-side-combined ``min_by`` groupBy
    on the token key, then a left join attaches labels with 'O'
    default (label cardinality: covered tokens only, not the stream).
    """
    t = tokens.alias("t")
    s = spans.select(
        F.col(conv).alias("__c"), F.col(turn).alias("__t"),
        "start_tok", "end_tok", "entity_type", "canonical_id",
    ).alias("s")
    covered = (
        t.join(
            s,
            F.expr(
                f"t.`{conv}` = s.__c AND t.`{turn}` = s.__t "
                f"AND t.`{tok_idx}` >= s.start_tok "
                f"AND t.`{tok_idx}` <= s.end_tok"
            ),
        )
        .select(
            F.col(f"t.{conv}").alias("__kc"),
            F.col(f"t.{turn}").alias("__kt"),
            F.col(f"t.{tok_idx}").alias("__ki"),
            F.struct("s.start_tok", "s.end_tok", "s.canonical_id").alias(
                "__key"
            ),
            F.concat(
                F.when(
                    F.col(f"t.{tok_idx}") == F.col("s.start_tok"),
                    F.lit("B-"),
                ).otherwise(F.lit("I-")),
                F.col("s.entity_type"),
            ).alias("__lab"),
        )
        .groupBy("__kc", "__kt", "__ki")
        .agg(F.min_by(F.col("__lab"), F.col("__key")).alias("__lab"))
    )
    return (
        tokens.join(
            covered,
            (F.col(conv) == F.col("__kc"))
            & (F.col(turn) == F.col("__kt"))
            & (F.col(tok_idx) == F.col("__ki")),
            "left",
        )
        .drop("__kc", "__kt", "__ki")
        .withColumn(label_col, F.coalesce(F.col("__lab"), F.lit("O")))
        .drop("__lab")
    )


def dictionary_health(
    alias_dict: DataFrame,
    spans: DataFrame | None = None,
) -> DataFrame:
    """Dictionary QC report, one row per normalized alias:
    (alias, n_canonicals, ambiguous, n_spans, matched) — the health
    check run before anyone trusts :func:`dictionary_spans` output:
    ambiguous aliases (one surface → several canonical ids) dilute
    weak labels, and dead aliases (zero corpus matches) signal a
    rotten dictionary or a normalization drift between dictionary
    and tokenizer.

    ``spans`` is a :func:`dictionary_spans` output for the corpus
    under audit; omit it for the dictionary-only view (n_spans 0,
    matched false).

    Shape: both sides are bounded — the ambiguity count is one
    groupBy over the dictionary (vocabulary-sized), the per-alias
    span count one partial-aggregated groupBy over the span table
    (matches, not tokens), met by a left join at alias cardinality."""
    d = (
        alias_dict.select(
            F.lower("alias").alias("alias"), "canonical_id"
        )
        .distinct()
        .groupBy("alias")
        .agg(F.countDistinct("canonical_id").alias("n_canonicals"))
        .withColumn("ambiguous", F.col("n_canonicals") > 1)
    )
    if spans is None:
        return d.select(
            "alias", "n_canonicals", "ambiguous",
            F.lit(0).cast("bigint").alias("n_spans"),
            F.lit(False).alias("matched"),
        )
    sc = spans.groupBy("alias").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_spans")
    )
    return d.join(sc, "alias", "left").select(
        "alias", "n_canonicals", "ambiguous",
        F.coalesce("n_spans", F.lit(0)).cast("bigint").alias("n_spans"),
        (F.coalesce("n_spans", F.lit(0)) > 0).alias("matched"),
    )
