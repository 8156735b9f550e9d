"""Rule-based KG inference: SPARQL CONSTRUCT + bounded forward
chaining (datalog-style) over the triple table.

A rule is ``Rule(body, head, filters=None)``: when the conjunctive
``body`` patterns match (kg/query.py semantics — ``?var`` binds,
constants filter, FILTER exprs allowed), emit the ``head`` triple with
the bound variables substituted. ``infer`` applies a rule set to a
fixpoint (or an iteration bound), deriving e.g. ``colleague_of`` from
shared employers or transitive ``subsidiary_of`` chains — the
deductive-closure step a KG-construction pipeline runs after
extraction, per the public datalog/OWL-RL literature.

Scale shape (textbook semi-naive evaluation, Abiteboul/Hull/Vianu ch.
13): round r+1 evaluates each m-pattern rule m times, with body
position j scanning only the triples FIRST DERIVED in round r and the
other positions scanning the accumulated set — every derivation
involving a new fact is found, but the naive re-join of the full
(growing) relation against itself never happens. New facts are claimed
by one anti-join per round on the uniform (subj, pred, obj) key.
Rounds are Spark jobs; the per-round frames are persisted and the
fixpoint probe is one ``limit(1).count()``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crfsuite_spark.kg.query import _is_var, match_patterns

_SLOTS = ("subj", "pred", "obj")


@dataclass(frozen=True)
class Rule:
    """head :- body[0], body[1], ... [, filters]."""

    body: tuple
    head: tuple
    filters: tuple = field(default_factory=tuple)

    def __post_init__(self):
        if len(self.head) != 3:
            raise ValueError(f"head {self.head!r} is not a triple")
        bound = {t[1:] for p in self.body for t in p if _is_var(t)}
        unbound = [t for t in self.head if _is_var(t) and t[1:] not in bound]
        if unbound:
            raise ValueError(f"head variables {unbound} not bound by the body")


def construct(
    triples: DataFrame,
    body,
    head,
    filters=None,
    sources=None,
    assume_distinct: bool = False,
) -> DataFrame:
    """SPARQL ``CONSTRUCT``: match ``body``, emit one ``head`` triple
    per distinct binding (a (subj, pred, obj) frame)."""
    Rule(tuple(body), tuple(head), tuple(filters or ()))  # validate
    bindings = match_patterns(
        triples,
        body,
        filters=list(filters or ()),
        distinct=True,
        assume_distinct=assume_distinct,
        sources=sources,
    )
    out = bindings.select(
        *[
            (F.col(t[1:]) if _is_var(t) else F.lit(t)).alias(slot)
            for slot, t in zip(_SLOTS, head)
        ]
    ).distinct()
    # pred+ path terms in the body pin closure rounds — surface them
    out.pinned_caches = bindings.pinned_caches
    return out


def infer(
    triples: DataFrame,
    rules,
    max_rounds: int = 3,
    include_base: bool = True,
) -> DataFrame:
    """Bounded forward chaining of ``rules`` to fixpoint.

    Returns (subj, pred, obj, round) — round 0 is the base DISTINCT
    triple set, round r ≥ 1 the facts first derived in round r. Stops
    at ``max_rounds`` or when a round derives nothing new. Set
    ``include_base=False`` for the derived facts alone.
    Unpersist intermediates via ``out.pinned_caches``.
    """
    if not rules:
        raise ValueError("need at least one rule")
    rules = [r if isinstance(r, Rule) else Rule(*r) for r in rules]
    base = (
        triples.select(*_SLOTS).distinct()
        .withColumn("round", F.lit(0))
        .persist()
    )
    total = base.select(*_SLOTS)
    derived, pinned = _chain(total, total, rules, max_rounds,
                             delta_is_total=True)
    out = base if include_base else base.filter(F.lit(False))
    for rnd, new in derived:
        out = out.unionByName(new.withColumn("round", F.lit(rnd)))
    out.pinned_caches = [base] + pinned
    return out


def infer_increment(
    closed: DataFrame,
    new_facts: DataFrame,
    rules,
    max_rounds: int = 3,
) -> DataFrame:
    """Incremental maintenance of an inferred closure: given ``closed``
    (a triple set ALREADY closed under ``rules`` — e.g. a prior
    ``infer`` output) and a batch of ``new_facts``, derive only the
    consequences the new facts enable. Returns (subj, pred, obj,
    round) for the strictly-new derived facts (new_facts themselves
    and already-known facts excluded).

    Correctness rests on the semi-naive invariant: every derivation
    using ≥1 new fact is found by the delta-pinned variants, and
    derivations using none were already in ``closed`` — so
    closed ∪ new ∪ result equals a full re-close of closed ∪ new
    (property-tested). Per micro-batch cost is proportional to the
    consequences of the batch, not the accumulated graph: exactly the
    shape a streaming foreachBatch needs at 100 TB.
    """
    if not rules:
        raise ValueError("need at least one rule")
    rules = [r if isinstance(r, Rule) else Rule(*r) for r in rules]
    prior = closed.select(*_SLOTS).distinct().persist()
    delta = (
        new_facts.select(*_SLOTS).distinct()
        .join(prior, list(_SLOTS), "left_anti")
        .persist()
    )
    total = prior.unionByName(delta)
    derived, pinned = _chain(total, delta, rules, max_rounds,
                             delta_is_total=False)
    out = None
    for rnd, new in derived:
        tagged = new.withColumn("round", F.lit(rnd))
        out = tagged if out is None else out.unionByName(tagged)
    if out is None:
        out = prior.withColumn("round", F.lit(0)).filter(F.lit(False))
    out.pinned_caches = [prior, delta] + pinned
    return out


def _chain(total, delta, rules, max_rounds, delta_is_total):
    """Shared semi-naive round loop: returns ([(round, new_frame)...],
    pinned). ``delta_is_total`` skips the redundant per-position
    variants in round 1 when delta == total."""
    pinned = []
    derived = []
    for rnd in range(1, max_rounds + 1):
        parts = []
        for rule in rules:
            m = len(rule.body)
            n_variants = 1 if (delta_is_total and rnd == 1) else m
            for j in range(n_variants):
                srcs = [None] * m
                srcs[j] = delta
                part = construct(
                    total,
                    rule.body,
                    rule.head,
                    filters=rule.filters,
                    sources=srcs,
                    assume_distinct=True,
                )
                pinned += part.pinned_caches
                parts.append(part)
        new = parts[0]
        for p in parts[1:]:
            new = new.unionByName(p)
        # localCheckpoint truncates lineage — each round's plan embeds
        # every prior round's otherwise, and Catalyst re-analysis goes
        # exponential after a handful of rounds (same fix as
        # canonicalize.connected_components); eager, so it doubles as
        # the materialization for the fixpoint probe.
        new = (
            new.distinct()
            .join(total, list(_SLOTS), "left_anti")
            .localCheckpoint(eager=True)
        )
        if new.limit(1).count() == 0:
            break
        derived.append((rnd, new))
        total = total.unionByName(new)
        delta = new
    return derived, pinned


def mine_path_rules(
    triples: DataFrame,
    min_support: int = 2,
    min_confidence: float = 0.1,
) -> DataFrame:
    """AMIE-style path-rule DISCOVERY (Galárraga et al. 2013) for the
    2-atom chain shape ``p1(x, y) ∧ p2(y, z) ⇒ head(x, z)``:
    (p1, p2, head, support, n_body, confidence) with

        support    = |{(x,z): body holds AND head(x,z) ∈ graph}|
        n_body     = |{(x,z): body holds}|
        confidence = support / n_body   (AMIE "standard confidence")

    — the discovery complement to :func:`infer` (which APPLIES given
    rules): mined high-confidence rules feed ``Rule`` objects for
    materialization, and low-confidence heads flag predicate pairs
    the extractor conflates.

    Scale shape: distinct edge set first (mention multiplicity never
    reaches the joins), body = ONE self-join on the shared-entity key
    (the 2-path join — same cost center and AQE skew-split story as
    triangle_count), collapsed to DISTINCT (p1, p2, x, z) groundings
    before the head join so a dense y-hub can't multiply grounding
    counts; head check is one equi-join on (x, z); both counts are
    partial-aggregated groupBys on the bounded (p1, p2[, head])
    pattern key, met by a broadcast-size report join. Thresholds
    prune at pattern grain, the only place they can."""
    e = triples.select(
        F.col("subj").alias("x"), F.col("pred").alias("p"),
        F.col("obj").alias("z"),
    ).distinct()
    body = (
        e.select(F.col("p").alias("p1"), "x", F.col("z").alias("y"))
        .join(
            e.select(F.col("p").alias("p2"), F.col("x").alias("y"), "z"),
            "y",
        )
        .select("p1", "p2", "x", "z")
        .distinct()
    )
    n_body = body.groupBy("p1", "p2").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_body")
    )
    sup = (
        body.join(
            e.select("x", F.col("p").alias("head"), "z"), ["x", "z"]
        )
        .groupBy("p1", "p2", "head")
        .agg(F.count(F.lit(1)).cast("bigint").alias("support"))
        .where(F.col("support") >= int(min_support))
    )
    return (
        sup.join(F.broadcast(n_body), ["p1", "p2"])
        .withColumn(
            "confidence", F.col("support") / F.col("n_body")
        )
        .where(F.col("confidence") >= float(min_confidence))
        .select("p1", "p2", "head", "support", "n_body", "confidence")
    )
