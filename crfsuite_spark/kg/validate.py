"""Graph constraint validation (SHACL-lite) over a triple frame.

KG construction at 10^12-turn scale emits triples from a statistical
tagger — a validation pass that REPORTS constraint violations (rather
than silently resolving them, which ``kg/lifecycle.py:resolve_functional``
does for the functional case) is the quality gate between extraction
and the serving graph.  The constraint vocabulary is the useful core
of W3C SHACL / OWL property axioms: domain/range by entity-type
prefix, functional / inverse-functional properties, out-degree
cardinality bounds, and irreflexivity.

The reference (bnosac/crfsuite) stops at tagging; this module is part
of this engine's KG-construction tier (SURVEY.md §2 extensions).

Spark-first shapes, sized for the 100 TB graph:

- Row-level checks (domain, range, irreflexive) are pure map-side
  Column predicates unioned into one scan — ZERO shuffle, and the
  per-predicate constants reach the scan as pushed filters.
- Degree-level checks (functional, inverse-functional, max out-degree)
  are ONE partial-aggregated ``groupBy(pred, entity)`` per direction —
  map-side combine collapses each partition's mentions before the
  exchange, and only violating groups survive the HAVING filter.  No
  join back to the mention stream: the violation report carries the
  group key + counts, which is what a triage dashboard needs.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class PredicateConstraint:
    """Declarative shape for one predicate.

    ``domain`` / ``range`` are allowed entity-type prefixes (the part
    of the identifier before ``:``, e.g. ``per`` in ``per:ada``) for
    the subject / object slot; ``None`` means unconstrained.
    ``functional`` asserts at most one DISTINCT object per subject,
    ``inverse_functional`` at most one distinct subject per object,
    ``max_out`` bounds distinct objects per subject, ``irreflexive``
    forbids self-loops.
    """

    pred: str
    domain: tuple[str, ...] | None = None
    range: tuple[str, ...] | None = None
    functional: bool = False
    inverse_functional: bool = False
    max_out: int | None = None
    irreflexive: bool = False


@dataclass(frozen=True)
class RequiredPredicate:
    """SHACL ``sh:minCount`` analogue: every entity of type
    ``subject_type`` (prefix before ``:``) appearing anywhere in the
    graph must have at least ``min_count`` distinct ``pred`` objects.
    """

    subject_type: str
    pred: str
    min_count: int = 1


def _etype(col: str):
    # entity-type prefix; an id without ':' types as itself
    return F.split_part(F.col(col), F.lit(":"), F.lit(1))


def validate_required(
    triples: DataFrame,
    requirements: list[RequiredPredicate],
) -> DataFrame:
    """min-count violations: ``(pred, entity, n_distinct, violation)``
    with ``n_distinct`` the entity's ACTUAL distinct-object count
    (0 when the predicate is entirely absent).

    Shape: the node set is one vocabulary-scale distinct over the
    endpoint columns; per requirement it left-joins the predicate's
    partial-aggregated out-degree counts — the mention stream is read
    once per direction and never joined row-to-row.
    """
    t = triples.select("subj", "pred", "obj")
    nodes = (
        t.select(F.col("subj").alias("entity"))
        .unionByName(t.select(F.col("obj").alias("entity")))
        .distinct()
    )
    parts = []
    for req in requirements:
        typed = nodes.filter(
            F.split_part(F.col("entity"), F.lit(":"), F.lit(1))
            == req.subject_type
        )
        deg = (
            t.filter(F.col("pred") == req.pred)
            .groupBy(F.col("subj").alias("entity"))
            .agg(F.count_distinct("obj").alias("n_distinct"))
        )
        parts.append(
            typed.join(deg, on="entity", how="left")
            .withColumn("n_distinct",
                        F.coalesce(F.col("n_distinct"), F.lit(0)))
            .filter(F.col("n_distinct") < req.min_count)
            .select(
                F.lit(req.pred).alias("pred"), "entity", "n_distinct",
                F.lit("min_count").alias("violation"),
            )
        )
    if not parts:
        return nodes.select(
            F.lit("").alias("pred"), "entity",
            F.lit(0).cast("long").alias("n_distinct"),
            F.lit("").alias("violation"),
        ).limit(0)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def validate_rows(
    triples: DataFrame,
    constraints: list[PredicateConstraint],
    assume_distinct: bool = False,
) -> DataFrame:
    """Per-triple violations of the row-level constraints.

    Returns ``(subj, pred, obj, violation)`` — one row per violated
    rule per distinct triple (a triple breaking both domain and range
    yields two rows).  ONE map-side pass: every check is a Column
    predicate folded into a per-row label array that is filtered and
    exploded — not a union of per-check scans, so the input is read
    once no matter how many constraints are declared.  The only
    exchange is the input's own distinct; skip it with
    ``assume_distinct=True`` when the frame is already a triple SET.
    """
    t = triples.select("subj", "pred", "obj")
    if not assume_distinct:
        t = t.distinct()
    checks = []  # (pred, predicate Column, violation label)
    for c in constraints:
        if c.domain is not None:
            checks.append((c.pred, ~_etype("subj").isin(*c.domain), "domain"))
        if c.range is not None:
            checks.append((c.pred, ~_etype("obj").isin(*c.range), "range"))
        if c.irreflexive:
            checks.append(
                (c.pred, F.col("subj") == F.col("obj"), "irreflexive")
            )
    if not checks:
        return t.select(
            "subj", "pred", "obj", F.lit("").alias("violation")
        ).limit(0)
    labels = F.array_compact(
        F.array(
            *[
                F.when((F.col("pred") == p) & cond, F.lit(label))
                for p, cond, label in checks
            ]
        )
    )
    return (
        t.withColumn("__viols", labels)
        .filter(F.size("__viols") > 0)
        .select(
            "subj", "pred", "obj",
            F.explode("__viols").alias("violation"),
        )
    )


def validate_degrees(
    triples: DataFrame,
    constraints: list[PredicateConstraint],
    assume_distinct: bool = False,
) -> DataFrame:
    """Aggregate violations of the degree-level constraints.

    Returns ``(pred, entity, n_distinct, violation)``: ``entity`` is
    the subject for ``functional`` / ``max_out`` (with the count of
    distinct objects) and the object for ``inverse_functional`` (count
    of distinct subjects).  One partial-aggregated groupBy per needed
    direction; ``count_distinct`` is invariant to mention duplicates,
    so the input is NOT pre-distincted (Spark's two-phase distinct
    aggregation already dedups map-side) — ``assume_distinct`` is
    accepted for signature symmetry but changes nothing.  Only
    violating groups survive.
    """
    t = triples.select("subj", "pred", "obj")
    out_caps = {}  # pred -> (effective max distinct objects, label)
    inv_preds = []
    for c in constraints:
        if c.functional:
            out_caps[c.pred] = (1, "functional")
        elif c.max_out is not None:
            out_caps[c.pred] = (c.max_out, "max_out")
        if c.inverse_functional:
            inv_preds.append(c.pred)

    parts = []
    if out_caps:
        cap_col = F.create_map(
            *[x for p, (cap, _) in sorted(out_caps.items())
              for x in (F.lit(p), F.lit(cap))]
        )
        label_col = F.create_map(
            *[x for p, (_, label) in sorted(out_caps.items())
              for x in (F.lit(p), F.lit(label))]
        )
        deg = (
            t.filter(F.col("pred").isin(list(out_caps)))
            .groupBy("pred", F.col("subj").alias("entity"))
            .agg(F.count_distinct("obj").alias("n_distinct"))
        )
        parts.append(
            deg.filter(F.col("n_distinct") > cap_col[F.col("pred")]).select(
                "pred",
                "entity",
                "n_distinct",
                label_col[F.col("pred")].alias("violation"),
            )
        )
    if inv_preds:
        deg = (
            t.filter(F.col("pred").isin(inv_preds))
            .groupBy("pred", F.col("obj").alias("entity"))
            .agg(F.count_distinct("subj").alias("n_distinct"))
        )
        parts.append(
            deg.filter(F.col("n_distinct") > 1).select(
                "pred", "entity", "n_distinct",
                F.lit("inverse_functional").alias("violation"),
            )
        )
    if not parts:
        return (
            t.groupBy("pred", F.col("subj").alias("entity"))
            .agg(F.count_distinct("obj").alias("n_distinct"))
            .select("pred", "entity", "n_distinct",
                    F.lit("").alias("violation"))
            .limit(0)
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def validate_graph(
    triples: DataFrame,
    constraints: list[PredicateConstraint],
    assume_distinct: bool = False,
    required: list[RequiredPredicate] | None = None,
) -> DataFrame:
    """Union of row-, degree-, and (when ``required`` is given)
    min-count violation reports in one frame: ``(violation, pred,
    subj, obj, entity, n_distinct)`` with NULLs in the slots a report
    kind does not carry."""
    rows = validate_rows(triples, constraints, assume_distinct).select(
        "violation", "pred", "subj", "obj",
        F.lit(None).cast("string").alias("entity"),
        F.lit(None).cast("long").alias("n_distinct"),
    )
    degs = validate_degrees(triples, constraints).select(
        "violation", "pred",
        F.lit(None).cast("string").alias("subj"),
        F.lit(None).cast("string").alias("obj"),
        "entity", "n_distinct",
    )
    out = rows.unionByName(degs)
    if required:
        reqs = validate_required(triples, required).select(
            "violation", "pred",
            F.lit(None).cast("string").alias("subj"),
            F.lit(None).cast("string").alias("obj"),
            "entity", "n_distinct",
        )
        out = out.unionByName(reqs)
    return out


def validate_asymmetric(
    triples: DataFrame,
    asymmetric_preds: list[str],
    assume_distinct: bool = False,
) -> DataFrame:
    """OWL ``AsymmetricProperty`` check (the pair-level constraint
    :func:`validate_rows` can't see): for each listed predicate,
    report unordered pairs asserted in BOTH directions — "A acquired
    B" and "B acquired A" cannot both hold, and in transcript-mined
    graphs a symmetric assertion of an asymmetric predicate is the
    signature of a subject/object slot swap upstream (the relation
    grammar picked the wrong argument order).

    Output: (pred, entity_a, entity_b) with ``entity_a < entity_b`` —
    one row per violating pair per predicate, both directions folded.

    Shape: pred filter reaches the scan (a pred-partitioned table
    reads only the constrained slice), the mention stream collapses to
    the distinct directed edge set FIRST, then a self-join keyed on
    the canonically-ordered pair detects the reverse edge — the join
    runs at edge cardinality on a uniform composite key, and the
    canonical (least, greatest) projection means violations surface
    as pair-count == 2 in ONE partial-aggregated groupBy, no actual
    self-join materialization."""
    t = triples.select("subj", "pred", "obj").where(
        F.col("pred").isin(list(asymmetric_preds))
        & (F.col("subj") != F.col("obj"))
    )
    if not assume_distinct:
        t = t.distinct()
    return (
        t.select(
            "pred",
            F.least("subj", "obj").alias("entity_a"),
            F.greatest("subj", "obj").alias("entity_b"),
        )
        .groupBy("pred", "entity_a", "entity_b")
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") == 2)
        .select("pred", "entity_a", "entity_b")
    )
