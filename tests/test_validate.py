"""Graph constraint validation (SHACL-lite) — kg/validate.py.

Semantics hand-checked on a tiny deliberately-dirty graph, plus plan
assertions pinning the zero-extra-shuffle shapes.
"""

import pytest
from pyspark.sql import functions as F

from crfsuite_spark.kg.validate import (
    PredicateConstraint,
    validate_degrees,
    validate_graph,
    validate_rows,
)

DIRTY = [
    ("per:ada", "works_at", "org:acme"),
    ("per:ada", "works_at", "org:initech"),   # max_out=1 violation
    ("per:bob", "works_at", "org:acme"),
    ("org:acme", "located_in", "loc:berlin"),
    ("org:acme", "located_in", "loc:oslo"),   # functional violation
    ("org:x", "acquired", "org:x"),           # irreflexive violation
    ("per:cyd", "visited", "org:acme"),       # range violation
    ("per:a", "ceo_of", "org:acme"),
    ("per:b", "ceo_of", "org:acme"),          # inverse-functional violation
]

CONSTRAINTS = [
    PredicateConstraint("works_at", domain=("per",), range=("org",), max_out=1),
    PredicateConstraint("located_in", functional=True),
    PredicateConstraint("acquired", irreflexive=True),
    PredicateConstraint("visited", range=("loc",)),
    PredicateConstraint("ceo_of", inverse_functional=True),
]


@pytest.fixture(scope="module")
def dirty(spark):
    return spark.createDataFrame(DIRTY, ["subj", "pred", "obj"])


def rows(df):
    return sorted(map(tuple, df.collect()))


def test_row_level_violations(dirty):
    assert rows(validate_rows(dirty, CONSTRAINTS)) == [
        ("org:x", "acquired", "org:x", "irreflexive"),
        ("per:cyd", "visited", "org:acme", "range"),
    ]


def test_degree_level_violations(dirty):
    assert rows(validate_degrees(dirty, CONSTRAINTS)) == [
        ("ceo_of", "org:acme", 2, "inverse_functional"),
        ("located_in", "org:acme", 2, "functional"),
        ("works_at", "per:ada", 2, "max_out"),
    ]


def test_validate_graph_union(dirty):
    out = validate_graph(dirty, CONSTRAINTS)
    assert out.count() == 5
    assert set(out.columns) == {
        "violation", "pred", "subj", "obj", "entity", "n_distinct"
    }


def test_clean_graph_no_violations(spark):
    clean = spark.createDataFrame(
        [("per:ada", "works_at", "org:acme"),
         ("org:acme", "located_in", "loc:berlin")],
        ["subj", "pred", "obj"],
    )
    assert validate_graph(clean, CONSTRAINTS).count() == 0


def test_mention_duplicates_do_not_fake_degree_violations(spark):
    """The same edge asserted in 100 turns is ONE distinct object —
    count_distinct semantics, not mention counting."""
    t = spark.createDataFrame(
        [("org:acme", "located_in", "loc:berlin")] * 100,
        ["subj", "pred", "obj"],
    )
    assert validate_degrees(
        t, [PredicateConstraint("located_in", functional=True)]
    ).count() == 0
    # and row-level reports stay per-DISTINCT-triple
    bad = spark.createDataFrame(
        [("org:x", "acquired", "org:x")] * 7, ["subj", "pred", "obj"]
    )
    assert validate_rows(
        bad, [PredicateConstraint("acquired", irreflexive=True)]
    ).count() == 1


def test_multi_violation_triple_yields_one_row_per_rule(spark):
    t = spark.createDataFrame(
        [("loc:z", "works_at", "loc:z")], ["subj", "pred", "obj"]
    )
    cs = [PredicateConstraint("works_at", domain=("per",), range=("org",),
                              irreflexive=True)]
    got = rows(validate_rows(t, cs))
    assert [g[3] for g in got] == ["domain", "irreflexive", "range"]


def test_empty_constraint_lists_yield_empty_typed_frames(dirty):
    r = validate_rows(dirty, [PredicateConstraint("works_at")])
    d = validate_degrees(dirty, [PredicateConstraint("works_at")])
    assert r.count() == 0 and d.count() == 0
    assert r.columns == ["subj", "pred", "obj", "violation"]
    assert d.columns == ["pred", "entity", "n_distinct", "violation"]


def test_untyped_entity_types_as_itself(spark):
    t = spark.createDataFrame(
        [("ada", "works_at", "org:acme")], ["subj", "pred", "obj"]
    )
    got = rows(validate_rows(t, [PredicateConstraint("works_at",
                                                     domain=("per",))]))
    assert got == [("ada", "works_at", "org:acme", "domain")]


def test_validate_rows_single_scan_no_extra_exchange(dirty):
    """Row-level checks fold into ONE pass: with assume_distinct the
    plan has ZERO Exchange regardless of constraint count, and the
    input is scanned once (no union of per-check scans)."""
    out = validate_rows(dirty, CONSTRAINTS, assume_distinct=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_validate_degrees_partial_aggregation(dirty):
    """Degree checks are partial-aggregated groupBys — map-side
    combine before the exchange, no Window sort anywhere."""
    out = validate_degrees(dirty, CONSTRAINTS)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "partial" in plan.lower(), plan


def test_required_predicate_min_count(dirty):
    from crfsuite_spark.kg.validate import RequiredPredicate, validate_required

    out = validate_required(dirty, [RequiredPredicate("org", "located_in")])
    assert rows(out) == [
        ("located_in", "org:initech", 0, "min_count"),
        ("located_in", "org:x", 0, "min_count"),
    ]
    # min_count > 1: partial presence still violates, count reported
    out2 = validate_required(
        dirty, [RequiredPredicate("per", "works_at", min_count=2)])
    assert rows(out2) == [
        ("works_at", "per:a", 0, "min_count"),
        ("works_at", "per:b", 0, "min_count"),
        ("works_at", "per:bob", 1, "min_count"),
        ("works_at", "per:cyd", 0, "min_count"),
    ]


def test_required_in_validate_graph_union(dirty):
    from crfsuite_spark.kg.validate import RequiredPredicate

    out = validate_graph(
        dirty, CONSTRAINTS,
        required=[RequiredPredicate("org", "located_in")],
    )
    mins = out.filter(F.col("violation") == "min_count")
    assert sorted(r.entity for r in mins.collect()) == [
        "org:initech", "org:x"]
    # other report kinds unaffected
    assert out.filter(F.col("violation") == "irreflexive").count() == 1


def test_required_no_window_partial_agg(dirty):
    from crfsuite_spark.kg.validate import RequiredPredicate, validate_required

    out = validate_required(dirty, [RequiredPredicate("org", "located_in")])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "partial" in plan.lower(), plan


def test_validate_asymmetric_pairs(spark):
    """Both-direction pairs flag once (canonical order); one-direction
    edges, self-loops, unconstrained predicates, and duplicate
    mentions never flag."""
    from crfsuite_spark.kg.validate import validate_asymmetric

    cols = ["subj", "pred", "obj"]
    t = spark.createDataFrame(
        [
            ("a", "acquired", "b"), ("b", "acquired", "a"),   # violation
            ("a", "acquired", "b"),                           # dup mention
            ("a", "acquired", "c"),                           # one-way: fine
            ("d", "acquired", "d"),                           # self-loop: ignored
            ("x", "partnered_with", "y"), ("y", "partnered_with", "x"),
            # ^ symmetric predicate, not constrained
        ],
        cols,
    )
    got = validate_asymmetric(t, ["acquired"]).collect()
    assert [(r["pred"], r["entity_a"], r["entity_b"]) for r in got] == [
        ("acquired", "a", "b")
    ]
    plan = (
        validate_asymmetric(t, ["acquired"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "partial" in plan.lower(), plan   # pair count map-side combines
    assert "Window" not in plan, plan
