"""End-to-end KG-construction pipeline (the north-star job).

transcripts (conv_id, turn_idx, role, text, tool, ts)
  → FUSED extraction (run_pipeline default): tokenize + window
    templates + batched Viterbi + BIO span assembly + the turn-local
    relation grammar ALL in ONE zero-Exchange Arrow pass over the
    unexploded turn rows (decode/fused.py emit='relations') — the
    token stream never exists as Spark rows; every stage is
    parity-tested against the staged chain below
  → [staged fallback: tokenize explode → window templates (one
    Exchange) → Arrow decode → span assembly (window change-points)
    → relation assembly (turn-local joins) — used for non-derivable
    terms, marginal output, or arbitrary token tables]
  → entity linking (broadcast alias join + MinHash-LSH fallback)
  → canonicalization (connected components over co-reference edges)
  → (subj, pred, obj) triple materialization (bucketed, manifest-committed,
    idempotent resume)

Every stage is a DataFrame → DataFrame function usable alone; this
module just wires the default pipeline and carries the config.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crfsuite_spark.decode.fused import (
    FUSED_TERMS,
    decode_fused,
    decode_relations_fused,
)
from crfsuite_spark.decode.tagger import decode
from crfsuite_spark.functions.templates import cbind_attributes
from crfsuite_spark.functions.tokenize import tokenize
from crfsuite_spark.kg.linking import link_mentions, normalize_surface
from crfsuite_spark.kg.spans import (
    assemble_relations,
    assemble_spans,
    assemble_spans_streaming,
)
from crfsuite_spark.train.model import CRFModel

SEQ_COLS = ["conv_id", "turn_idx"]


@dataclass
class PipelineConfig:
    terms: list[str] = field(default_factory=lambda: ["token", "pos"])
    from_offset: int = -2
    to_offset: int = 2
    ngram_max: int = 2
    num_partitions: int | None = None
    fuzzy_linking: bool = True
    with_marginal: bool = False
    # cluster unlinkable surrogate ids whose surfaces are near-duplicates
    # (MinHash edges -> connected components); dictionary ids untouched
    canonicalize: bool = True
    canon_threshold: float = 0.85
    # above this many fuzzy-linked surfaces the link table stays
    # distributed (shuffle join) instead of collect+broadcast — the
    # open-domain-corpus driver-OOM guard (kg/linking.py)
    fuzzy_collect_threshold: int = 100_000
    # assemble spans in a narrow pass over decode's sequence-contiguous
    # output (no second full-token shuffle). Only safe when the decoded
    # frame comes straight from decode() — extract_triples callers with
    # arbitrary token frames (e.g. gold labels) must leave this False.
    streaming_spans: bool = False
    # fuse tokenize+templates+Viterbi into one zero-shuffle Arrow pass
    # over the unexploded transcript table (decode/fused.py) — label-
    # bit-identical to the canonical explode→window→decode chain, but
    # the token stream never shuffles. Auto-falls back to the canonical
    # path when terms aren't text-derivable (anything beyond token/pos).
    fused_decode: bool = True
    # resolve pronouns to their most recent compatible prior mention
    # within the conversation (kg/coref.py) and feed them into relation
    # assembly as extra mention rows — recovers triples whose subject
    # or object is pronominal. With fused_decode the decode still runs
    # in the zero-shuffle Arrow pass (emit='spans'); only relation
    # assembly moves back to the staged aggregation, since the
    # turn-local fused grammar cannot see cross-turn antecedents.
    coref: bool = False


def featurize_transcripts(transcripts: DataFrame, cfg: PipelineConfig | None = None) -> DataFrame:
    cfg = cfg or PipelineConfig()
    toks = tokenize(transcripts, with_offsets=False)
    return cbind_attributes(
        toks, terms=cfg.terms, by=SEQ_COLS, order_col="token_idx",
        from_offset=cfg.from_offset, to_offset=cfg.to_offset,
        ngram_max=cfg.ngram_max,
    )


def tag_transcripts(
    transcripts: DataFrame, model: CRFModel, cfg: PipelineConfig | None = None
) -> DataFrame:
    cfg = cfg or PipelineConfig()
    # preferred path: fuse tokenize+templates+Viterbi into ONE Arrow
    # pass over the turn rows — zero Exchange, the token stream never
    # shuffles (decode/fused.py; label-bit-identical by test). Legal
    # whenever every template term derives from the row's own text.
    if cfg.fused_decode and set(cfg.terms) <= set(FUSED_TERMS):
        src = transcripts
        if cfg.num_partitions:
            src = src.repartition(cfg.num_partitions)
        return decode_fused(
            src, model, seq_cols=SEQ_COLS, terms=cfg.terms,
            from_offset=cfg.from_offset, to_offset=cfg.to_offset,
            ngram_max=cfg.ngram_max, with_marginal=cfg.with_marginal,
        )
    feat = featurize_transcripts(transcripts, cfg)
    # downstream (span assembly → relations → linking) only consumes the
    # sequence key, order, token text and the predicted label — trimming
    # the passthrough here shrinks the decode shuffle and both Arrow hops.
    # (A hash-native template twin exists — cbind_attribute_hashes +
    # decode(attrs_hashed=True), label-identical by test — but at this
    # template set the window shuffle dominates and the string build is
    # noise, so the pipeline keeps the single canonical feature source.)
    return decode(
        feat, model, seq_cols=SEQ_COLS, order_col="token_idx",
        with_marginal=cfg.with_marginal, num_partitions=cfg.num_partitions,
        passthrough_cols=[*SEQ_COLS, "token_idx", "token"],
    )


def extract_triples(
    decoded: DataFrame,
    alias_dict: DataFrame,
    cfg: PipelineConfig | None = None,
    predicate_map: dict[str, str] | None = None,
) -> DataFrame:
    """Decoded tokens → linked (subj, pred, obj) triples with provenance."""
    cfg = cfg or PipelineConfig()
    # persist span + relation tables: spans feed three scans (REL rows,
    # subj join, obj join) and rels feed four — without the caches the
    # whole upstream decode UDF would re-run once per scan
    span_fn = assemble_spans_streaming if cfg.streaming_spans else assemble_spans
    spans = span_fn(decoded, seq_cols=SEQ_COLS, order_col="token_idx").persist()
    spans.count()  # one decode pass fills the cache BEFORE the self-join
    # below scans spans twice (REL side + entity side)
    rel_input = spans
    if cfg.coref:
        from crfsuite_spark.kg.coref import resolve_pronouns, spans_with_antecedents

        # REL spans match no pronoun type, so the full span table is a
        # valid mention stream; decoded already carries the token rows
        resolved = resolve_pronouns(decoded, spans)
        rel_input = spans_with_antecedents(spans, resolved)
    rels = assemble_relations(
        rel_input, seq_cols=SEQ_COLS, predicate_map=predicate_map
    ).persist()
    rels.count()
    # the span cache only exists to fan the decode pass out into the
    # relation aggregation — once rels is materialized nothing reads it
    # again (rels and linked stay cached: the returned lazy plan scans
    # them, and they are tiny relative to the token stream)
    out = _link_and_join(rels, alias_dict, cfg)
    spans.unpersist()
    return out


def _link_and_join(rels: DataFrame, alias_dict: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Relation rows (persisted) → linked (subj, pred, obj) triples.

    Shared tail of the canonical and fused pipelines: link distinct
    surfaces once (the mention stream repeats surfaces heavily at
    transcript scale), then broadcast the tiny link table back.
    PERSIST the distinct set: the linking stages (exact agg, miss
    derivation, LSH fuzzy chain, final join) each walk their input
    lineage — without the cache every walk re-runs the 2x-rels
    union+distinct shuffle (measured 10x the whole link stage at 3.6M
    turns). The set is tiny (distinct surfaces), the cache is cheap."""
    surfaces = (
        rels.select(F.col("subj_surface").alias("surface"))
        .unionByName(rels.select(F.col("obj_surface").alias("surface")))
        .distinct()
    ).persist()
    # no eager count — link_mentions' first eager job materializes this
    # cache (and the rels cache behind it) in one chained pass
    linked = link_mentions(
        surfaces, alias_dict, surface_col="surface", fuzzy=cfg.fuzzy_linking,
        fuzzy_collect_threshold=cfg.fuzzy_collect_threshold,
    ).select("surface", "canonical_id", "link_method").persist()
    linked.count()  # materialize: exactly one decode pass through the cache
    surfaces.unpersist()
    if cfg.canonicalize:
        from crfsuite_spark.kg.linking import canonicalize_surrogates

        # operates on the cached link table (tiny: distinct surfaces)
        linked = canonicalize_surrogates(linked, cfg.canon_threshold).persist()
    out = (
        rels.join(
            F.broadcast(linked.withColumnRenamed("surface", "subj_surface")
                        .withColumnRenamed("canonical_id", "subj")
                        .drop("link_method")),
            "subj_surface",
        )
        .join(
            F.broadcast(linked.withColumnRenamed("surface", "obj_surface")
                        .withColumnRenamed("canonical_id", "obj")
                        .drop("link_method")),
            "obj_surface",
        )
    )
    return out.select(
        "conv_id", "turn_idx", "subj", "pred", "obj",
        "subj_surface", "obj_surface", "rel_surface", "subj_type", "obj_type",
    )


def run_pipeline(
    transcripts: DataFrame,
    model: CRFModel,
    alias_dict: DataFrame,
    cfg: PipelineConfig | None = None,
    predicate_map: dict[str, str] | None = None,
) -> DataFrame:
    cfg = cfg or PipelineConfig()
    # fully-fused fast path: tokenize + templates + Viterbi + span
    # assembly + the turn-local relation grammar ALL inside one
    # zero-Exchange Arrow pass (decode/fused.py emit='relations') —
    # parity-tested against the staged chain. The only shuffles left
    # in the whole pipeline are the tiny distinct-surface aggregations
    # inside linking; the token stream never exists as Spark rows.
    if (
        cfg.fused_decode
        and set(cfg.terms) <= set(FUSED_TERMS)
        and not cfg.with_marginal
    ):
        from crfsuite_spark.kg.spans import default_predicate_map, predicate_column

        src = transcripts
        if cfg.num_partitions:
            src = src.repartition(cfg.num_partitions)
        pred_map = (
            predicate_map if predicate_map is not None else default_predicate_map()
        )
        if cfg.coref:
            # ONE fused pass (emit='coref') yields the relation rows,
            # the mention spans, AND the pronoun tokens as a tagged
            # union — still zero-Exchange. Pronouns resolve over the
            # small span/pronoun stream; then relation assembly is
            # re-run staged ONLY for the turns that actually resolved
            # a pronoun (broadcast-pruned), so coref's extra cost is
            # proportional to pronoun density, not corpus size.
            # Turn-locality of the relation grammar makes the
            # fused/staged split exact: for every other turn the fused
            # rows are parity-identical to staged assembly.
            from crfsuite_spark.kg.coref import (
                PRONOUN_TYPES,
                resolve_pronoun_stream,
                spans_with_antecedents,
            )

            # cheap JVM pre-scan: which conversations contain any
            # pronoun token at all? Span/pronoun emission (and the
            # whole resolve window) prunes to those conversations, so
            # a pronoun-light corpus pays ~nothing for coref. The
            # flag set is conversation-count-bounded and broadcast.
            pron_arr = F.array(*[F.lit(p) for p in PRONOUN_TYPES])
            conv_col = SEQ_COLS[0]
            pron_convs = (
                src.where(F.arrays_overlap(
                    F.split(F.lower(F.col("text")), " "), pron_arr))
                .select(conv_col).distinct()
                .withColumn("__has_pron", F.lit(True))
            ).persist()
            n_pron_convs = pron_convs.count()
            if n_pron_convs == 0:
                # pronoun-free corpus: coref is a no-op by definition —
                # the only cost paid was the JVM pre-scan above
                pron_convs.unpersist()
                cfg = replace(cfg, coref=False)
                return run_pipeline(transcripts, model, alias_dict, cfg,
                                    predicate_map=predicate_map)
            flagged = src.join(F.broadcast(pron_convs), conv_col, "left")
            flagged = flagged.withColumn(
                "__has_pron", F.coalesce("__has_pron", F.lit(False))
            )
            combo = decode_fused(
                flagged, model, seq_cols=SEQ_COLS, terms=cfg.terms,
                from_offset=cfg.from_offset, to_offset=cfg.to_offset,
                ngram_max=cfg.ngram_max, emit="coref",
                pronouns=set(PRONOUN_TYPES),
                span_filter_col="__has_pron",
            ).persist()
            combo.count()
            pron_convs.unpersist()
            rel_cols = ["subj_surface", "subj_type", "obj_surface",
                        "obj_type", "rel_surface"]
            rels_fused = combo.where(F.col("kind") == "rel").select(
                *SEQ_COLS, *rel_cols
            )
            spans = combo.where(F.col("kind") == "span").select(
                *SEQ_COLS, "span_id", "entity_type", "surface",
                "start_tok", "end_tok",
            )
            prons = combo.where(F.col("kind") == "pron").select(
                *SEQ_COLS,
                F.col("pron_pos").alias("token_idx"),
                "pronoun",
            )
            # hits is consumed twice (antecedent rows + the turn set);
            # persist WITHOUT an eager count — the first broadcast
            # materializes it, saving one blocking job in the serial
            # stage chain (fixed cost that dominates at bench scale)
            hits = resolve_pronoun_stream(prons, spans).where(
                F.col("ant_surface").isNotNull()
            ).persist()
            pron_turns = hits.select(*SEQ_COLS).distinct()
            aug = spans_with_antecedents(
                spans.join(F.broadcast(pron_turns), SEQ_COLS), hits
            )
            rels_p = assemble_relations(
                aug, seq_cols=SEQ_COLS, predicate_map=pred_map
            ).select(*SEQ_COLS, "subj_surface", "subj_type", "pred",
                     *rel_cols[2:])
            rels_f = rels_fused.join(
                F.broadcast(pron_turns), SEQ_COLS, "left_anti"
            ).withColumn("pred", predicate_column(pred_map, "related_to")
                         ).select(*SEQ_COLS, "subj_surface", "subj_type",
                                  "pred", *rel_cols[2:])
            rels = rels_f.unionByName(rels_p).persist()
            rels.count()
            out = _link_and_join(rels, alias_dict, cfg)
            combo.unpersist()
            hits.unpersist()
            return out
        raw = decode_relations_fused(
            src, model, seq_cols=SEQ_COLS, terms=cfg.terms,
            from_offset=cfg.from_offset, to_offset=cfg.to_offset,
            ngram_max=cfg.ngram_max,
        )
        rels = raw.withColumn(
            "pred", predicate_column(pred_map, "related_to")
        ).select(
            *SEQ_COLS, "subj_surface", "subj_type", "pred",
            "obj_surface", "obj_type", "rel_surface",
        ).persist()
        # no eager count: the first linking job (the eager probe inside
        # link_mentions, via the surfaces aggregation) pulls the fused
        # decode through this cache in the SAME pass — an explicit
        # count() here only added a serial blocking job (guide §1.2:
        # the serial stage chain is the bench-scale fixed cost)
        return _link_and_join(rels, alias_dict, cfg)
    decoded = tag_transcripts(transcripts, model, cfg)
    return extract_triples(decoded, alias_dict, cfg, predicate_map=predicate_map)
