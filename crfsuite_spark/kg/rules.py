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
    )
    return out.distinct()


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
    pinned = [base]
    total = base.select(*_SLOTS)
    delta = total
    out = base
    for rnd in range(1, max_rounds + 1):
        parts = []
        for rule in rules:
            m = len(rule.body)
            for j in range(m if rnd > 1 else 1):
                # round 1: delta == total, one evaluation suffices
                srcs = [None] * m
                srcs[j] = delta
                parts.append(
                    construct(
                        total,
                        rule.body,
                        rule.head,
                        filters=rule.filters,
                        sources=srcs,
                        assume_distinct=True,
                    )
                )
        new = parts[0]
        for p in parts[1:]:
            new = new.unionByName(p)
        new = (
            new.distinct()
            .join(total, list(_SLOTS), "left_anti")
            .persist()
        )
        pinned.append(new)
        if new.limit(1).count() == 0:
            break
        out = out.unionByName(new.withColumn("round", F.lit(rnd)))
        total = total.unionByName(new)
        delta = new
    res = out if include_base else out.filter(F.col("round") > 0)
    res.pinned_caches = pinned
    return res
