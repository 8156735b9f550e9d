"""Triple-pattern (basic graph pattern) matching — kg/query.py.

Semantics cross-checked by hand on a tiny fixed graph, plus a
pushed-filter plan assertion over a parquet-backed triple table.
"""

import pytest
from pyspark.sql import functions as F

from crfsuite_spark.kg.query import match_patterns, match_union

TRIPLES = [
    # (subj, pred, obj)
    ("ada", "works_at", "acme"),
    ("bob", "works_at", "acme"),
    ("cyd", "works_at", "initech"),
    ("acme", "located_in", "berlin"),
    ("initech", "located_in", "oslo"),
    ("acme", "acquired", "initech"),
    ("ada", "visited", "oslo"),
    ("loopy", "knows", "loopy"),
]


@pytest.fixture(scope="module")
def triples(spark):
    return spark.createDataFrame(TRIPLES, ["subj", "pred", "obj"])


def rows(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple((v is None, v) for v in t),
    )


def test_two_hop_join(triples):
    out = match_patterns(
        triples,
        [("?p", "works_at", "?org"), ("?org", "located_in", "?city")],
    )
    assert out.columns == ["p", "org", "city"]
    assert rows(out) == [
        ("ada", "acme", "berlin"),
        ("bob", "acme", "berlin"),
        ("cyd", "initech", "oslo"),
    ]


def test_constant_subject_and_projection(triples):
    out = match_patterns(
        triples,
        [("ada", "works_at", "?org"), ("?org", "located_in", "?city")],
        select=["city"],
    )
    assert rows(out) == [("berlin",)]


def test_repeated_variable_within_pattern(triples):
    out = match_patterns(triples, [("?x", "knows", "?x")])
    assert out.columns == ["x"]
    assert rows(out) == [("loopy",)]


def test_repeated_variable_across_patterns(triples):
    # who visited the city their employer's acquisition is located in?
    out = match_patterns(
        triples,
        [
            ("?p", "works_at", "?org"),
            ("?org", "acquired", "?other"),
            ("?other", "located_in", "?city"),
            ("?p", "visited", "?city"),
        ],
    )
    assert rows(out) == [("ada", "acme", "initech", "oslo")]


def test_ground_pattern_present_keeps_bindings(triples):
    out = match_patterns(
        triples,
        [("?p", "works_at", "acme"), ("acme", "located_in", "berlin")],
    )
    assert rows(out) == [("ada",), ("bob",)]


def test_ground_pattern_absent_annihilates(triples):
    out = match_patterns(
        triples,
        [("?p", "works_at", "acme"), ("acme", "located_in", "oslo")],
    )
    assert out.count() == 0


def test_disconnected_patterns_cross_join(triples):
    out = match_patterns(
        triples,
        [("?org", "located_in", "?city"), ("?p", "visited", "?where")],
    )
    # 2 located_in rows x 1 visited row
    assert out.count() == 2
    assert set(out.columns) == {"org", "city", "p", "where"}


def test_filters_and_multiplicity(triples):
    out = match_patterns(
        triples,
        [("?a", "works_at", "?org")],
        filters=["a <> 'cyd'"],
    )
    assert rows(out) == [("ada", "acme"), ("bob", "acme")]
    # distinct=False keeps binding multiplicity through a join funnel
    dup = match_patterns(
        triples,
        [("?a", "works_at", "acme"), ("acme", "acquired", "?t")],
        select=["t"],
        distinct=False,
    )
    assert rows(dup) == [("initech",), ("initech",)]


def test_optional_pattern_left_join(triples):
    out = match_patterns(
        triples,
        [("?p", "works_at", "?org")],
        optional=[("?p", "visited", "?city")],
    )
    assert out.columns == ["p", "org", "city"]
    assert rows(out) == [
        ("ada", "acme", "oslo"),
        ("bob", "acme", None),
        ("cyd", "initech", None),
    ]


def test_optional_chain_binds_through_earlier_optional(triples):
    # second optional joins on a variable the FIRST optional bound
    out = match_patterns(
        triples,
        [("?p", "works_at", "?org")],
        optional=[
            ("?org", "acquired", "?other"),
            ("?other", "located_in", "?city"),
        ],
    )
    assert rows(out) == [
        ("ada", "acme", "initech", "oslo"),
        ("bob", "acme", "initech", "oslo"),
        ("cyd", "initech", None, None),
    ]


def test_optional_unanchored_raises(triples):
    with pytest.raises(ValueError, match="shares no variable"):
        match_patterns(
            triples,
            [("?p", "works_at", "?org")],
            optional=[("?a", "located_in", "?b")],
        )


def test_mention_duplicates_collapse_per_scan(spark):
    # the graph is a SET of triples: provenance duplicates of the same
    # edge must not multiply through joins even with distinct=False
    dup = spark.createDataFrame(
        [("a", "works_at", "x")] * 1000 + [("x", "located_in", "b")] * 1000,
        ["subj", "pred", "obj"],
    )
    out = match_patterns(
        dup,
        [("?p", "works_at", "?org"), ("?org", "located_in", "?city")],
        distinct=False,
    )
    assert out.collect() == [("a", "x", "b")]


def test_union_null_pads_unshared_variables(triples):
    out = match_union(
        triples,
        [
            [("?p", "works_at", "?org")],
            [("?p", "visited", "?city")],
        ],
    )
    assert out.columns == ["p", "org", "city"]
    assert rows(out) == [
        ("ada", "acme", None),
        ("ada", None, "oslo"),
        ("bob", "acme", None),
        ("cyd", "initech", None),
    ]


def test_union_bag_semantics_and_filter(triples):
    # same group twice, distinct=False -> duplicates survive;
    # a filter on a NULL-padded variable drops those rows (SPARQL
    # error-is-false)
    out = match_union(
        triples,
        [[("?p", "works_at", "?org")], [("?p", "works_at", "?org")]],
        distinct=False,
    )
    assert out.count() == 6
    filt = match_union(
        triples,
        [[("?p", "works_at", "?org")], [("?p", "visited", "?city")]],
        filters=["city = 'oslo'"],
    )
    assert rows(filt) == [("ada", None, "oslo")]


def test_union_ground_group_contributes_empty_solution(triples):
    # present ground pattern -> one all-NULL row alongside the other
    # group's bindings; its marker column must not leak
    out = match_union(
        triples,
        [[("acme", "located_in", "berlin")], [("?p", "visited", "?w")]],
    )
    assert out.columns == ["p", "w"]
    assert rows(out) == [("ada", "oslo"), (None, None)]
    # absent ground pattern -> contributes nothing
    gone = match_union(
        triples,
        [[("acme", "located_in", "oslo")], [("?p", "visited", "?w")]],
    )
    assert rows(gone) == [("ada", "oslo")]


def test_select_unbound_variable_raises(triples):
    with pytest.raises(ValueError, match="unbound"):
        match_patterns(triples, [("?a", "works_at", "?b")], select=["nope"])


def test_property_path_pattern_inside_bgp(spark):
    rows = [
        ("a", "owns", "b"), ("b", "owns", "c"), ("c", "owns", "d"),
        ("d", "located_in", "x"), ("b", "rents", "z"),
    ]
    t = spark.createDataFrame(rows, ["subj", "pred", "obj"])
    out = match_patterns(
        t,
        [("?s", "owns+", "?t"), ("?t", "located_in", "?city")],
        path_hops=3,
    )
    got = sorted(tuple(r) for r in out.collect())
    for c in out.pinned_caches:
        c.unpersist()
    assert got == [
        ("a", "d", "x"), ("b", "d", "x"), ("c", "d", "x"),
    ]
    # constant subject + bounded hops exclude the 3-hop pair
    short = match_patterns(t, [("a", "owns+", "?t")], path_hops=2)
    vals = sorted(r["t"] for r in short.collect())
    for c in short.pinned_caches:
        c.unpersist()
    assert vals == ["b", "c"]


def test_property_path_pattern_cycle_var_repeat(spark):
    t = spark.createDataFrame(
        [("x", "owns", "y"), ("y", "owns", "x")], ["subj", "pred", "obj"]
    )
    out = match_patterns(t, [("?n", "owns+", "?n")], path_hops=2)
    got = sorted(r["n"] for r in out.collect())
    for c in out.pinned_caches:
        c.unpersist()
    assert got == ["x", "y"]


def _brute_force_bgp(tset, patterns):
    """Reference evaluator: extend bindings triple-by-triple."""
    bindings = [{}]
    for s, p, o in patterns:
        nxt = []
        for b in bindings:
            for ts, tp, to in tset:
                b2 = dict(b)
                ok = True
                for term, val in ((s, ts), (p, tp), (o, to)):
                    if term.startswith("?"):
                        v = term[1:]
                        if b2.get(v, val) != val:
                            ok = False
                            break
                        b2[v] = val
                    elif term != val:
                        ok = False
                        break
                if ok:
                    nxt.append(b2)
        bindings = nxt
    return bindings


def test_fuzz_bgp_vs_brute_force(spark):
    import random

    rng = random.Random(20260818)
    ents = ["a", "b", "c", "d", "e"]
    preds = ["p", "q", "r"]
    for trial in range(12):
        tset = {
            (rng.choice(ents), rng.choice(preds), rng.choice(ents))
            for _ in range(rng.randint(4, 15))
        }
        t = spark.createDataFrame(sorted(tset), ["subj", "pred", "obj"])
        n_pat = rng.randint(1, 3)
        vars_ = ["?x", "?y", "?z", "?w"]
        patterns = []
        for _ in range(n_pat):
            pat = tuple(
                rng.choice(vars_) if rng.random() < 0.6
                else rng.choice(ents if i != 1 else preds)
                for i in range(3)
            )
            patterns.append(pat)
        pat_vars = []
        for pat in patterns:
            for term in pat:
                if term.startswith("?") and term[1:] not in pat_vars:
                    pat_vars.append(term[1:])
        exp_bindings = _brute_force_bgp(tset, patterns)
        exp = sorted({tuple(b[v] for v in pat_vars) for b in exp_bindings})
        if pat_vars:
            got = rows(match_patterns(t, patterns))
        else:
            got = match_patterns(t, patterns).count()
            exp = 1 if exp_bindings else 0
            assert got == exp, (trial, patterns)
            continue
        assert got == exp, (trial, patterns, sorted(tset))


def test_constant_filters_pushed_to_parquet_scan(spark, tmp_path, triples):
    """Constants must reach the scan: the parquet read of each pattern
    shows PushedFilters on pred (and subj/obj when constant), so a
    pred-partitioned 100 TB table prunes instead of full-scanning."""
    path = str(tmp_path / "triples.parquet")
    triples.write.parquet(path)
    t = spark.read.parquet(path)
    out = match_patterns(
        t, [("?p", "works_at", "?org"), ("?org", "located_in", "?city")]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("PushedFilters: [IsNotNull(pred), EqualTo(pred,") >= 2
    assert rows(out) == [
        ("ada", "acme", "berlin"),
        ("bob", "acme", "berlin"),
        ("cyd", "initech", "oslo"),
    ]


# ---------------------------------------------------------------- negation

def test_not_exists_anti_join(triples):
    """FILTER NOT EXISTS on a shared variable: employment rows whose
    org has no located_in edge (only initech's oslo edge exists — both
    acme and initech are located, so add an unlocated org case)."""
    out = match_patterns(
        triples,
        [("?p", "works_at", "?org")],
        not_exists=[[("?org", "acquired", "?t")]],
    )
    # acme acquired initech → acme rows drop; cyd@initech survives
    assert rows(out) == [("cyd", "initech")]


def test_not_exists_plan_is_left_anti(triples):
    out = match_patterns(
        triples,
        [("?p", "works_at", "?org")],
        not_exists=[[("?org", "acquired", "?t")]],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan, plan


def test_minus_disjoint_domain_removes_nothing(triples):
    """The classic SPARQL MINUS vs NOT EXISTS split: a group sharing
    no variable is a no-op under MINUS but an existence probe under
    NOT EXISTS."""
    base = match_patterns(triples, [("?p", "works_at", "?org")])
    kept = match_patterns(
        triples,
        [("?p", "works_at", "?org")],
        minus=[[("?x", "visited", "?y")]],
    )
    assert rows(kept) == rows(base)
    dropped = match_patterns(
        triples,
        [("?p", "works_at", "?org")],
        not_exists=[[("?x", "visited", "?y")]],
    )
    assert dropped.count() == 0


def test_not_exists_disconnected_empty_group_keeps_all(triples):
    """A disconnected NOT EXISTS group with NO matches removes nothing."""
    out = match_patterns(
        triples,
        [("?p", "works_at", "?org")],
        not_exists=[[("?x", "never_asserted", "?y")]],
    )
    assert out.count() == 3


def test_minus_shared_variable_anti_joins(triples):
    out = match_patterns(
        triples,
        [("?p", "works_at", "?org")],
        minus=[[("?buyer", "acquired", "?org")]],
    )
    # initech is the acquired object → cyd@initech drops; acme (the
    # buyer, never an object) keeps its rows
    assert rows(out) == [("ada", "acme"), ("bob", "acme")]


def test_negation_group_is_conjunctive(triples):
    """A multi-pattern negation group must match as a whole (join)
    before it removes anything: acme is acquired-by-nobody AND
    located_in berlin — only the conjunction with located_in 'oslo'
    keeps acme rows."""
    out = match_patterns(
        triples,
        [("?p", "works_at", "?org")],
        not_exists=[[("?org", "located_in", "oslo"), ("?org", "located_in", "?c")]],
    )
    assert rows(out) == [("ada", "acme"), ("bob", "acme")]


def test_optional_null_survives_minus_and_not_exists(triples):
    """NULL shared values from OPTIONAL never match the anti-join."""
    out = match_patterns(
        triples,
        [("?p", "works_at", "?org")],
        optional=[("?p", "visited", "?city")],
        minus=[[("?x", "located_in", "?city")]],
    )
    # ada visited oslo (a located_in object) → removed; bob/cyd have
    # NULL city → kept
    assert rows(out) == [("bob", "acme", None), ("cyd", "initech", None)]


# ------------------------------------------------------- path-term sugar

def test_inverse_predicate_term(triples):
    fwd = match_patterns(triples, [("?p", "works_at", "?org")])
    inv = match_patterns(triples, [("?org", "^works_at", "?p")],
                         select=["p", "org"])
    assert rows(fwd) == rows(inv)


def test_inverse_composes_with_closure(spark):
    chain = spark.createDataFrame(
        [("a", "acquired", "b"), ("b", "acquired", "c")],
        ["subj", "pred", "obj"],
    )
    out = match_patterns(chain, [("?sub", "^acquired+", "?root")],
                         path_hops=3)
    got = rows(out.select("sub", "root"))
    for c in out.pinned_caches:
        c.unpersist()
    assert got == [("b", "a"), ("c", "a"), ("c", "b")]


def test_alternation_predicate_term(triples):
    out = match_patterns(triples, [("?a", "visited|acquired", "?b")])
    assert rows(out) == [("acme", "initech"), ("ada", "oslo")]


# ------------------------------------------------------------ aggregation

def test_match_aggregate_group_count(triples):
    from crfsuite_spark.kg.query import match_aggregate

    out = match_aggregate(
        triples,
        [("?p", "works_at", "?org")],
        ["org"],
        {"n_employees": "count(p)"},
    )
    assert rows(out) == [("acme", 2), ("initech", 1)]


def test_match_aggregate_having_and_multiplicity(triples):
    from crfsuite_spark.kg.query import match_aggregate

    # two-pattern join: count sees the solution multiset (bag)
    out = match_aggregate(
        triples,
        [("?p", "works_at", "?org"), ("?org", "located_in", "?city")],
        ["city"],
        {"n_workers": "count(p)", "n_orgs": "count(distinct org)"},
        having="n_workers >= 2",
    )
    assert rows(out) == [("berlin", 2, 1)]


def test_match_aggregate_global_group(triples):
    from crfsuite_spark.kg.query import match_aggregate

    out = match_aggregate(
        triples,
        [("?p", "works_at", "?org")],
        [],
        {"n": "count(*)", "orgs": "count(distinct org)"},
    )
    assert rows(out) == [(3, 2)]


def test_match_aggregate_unbound_group_raises(triples):
    from crfsuite_spark.kg.query import match_aggregate

    with pytest.raises(ValueError, match="unbound"):
        match_aggregate(triples, [("?p", "works_at", "?org")],
                        ["nope"], {"n": "count(*)"})


# ------------------------------------------- solution modifiers / VALUES

def test_values_restricts_variable(triples):
    out = match_patterns(
        triples,
        [("?p", "works_at", "?org")],
        values={"p": ["ada", "cyd"]},
    )
    assert rows(out) == [("ada", "acme"), ("cyd", "initech")]


def test_values_unbound_variable_raises(triples):
    with pytest.raises(ValueError, match="unbound"):
        match_patterns(triples, [("?p", "works_at", "?org")],
                       values={"nope": ["x"]})


def test_bindings_joint_rows(triples, spark):
    # joint VALUES: only the (p, org) combinations listed survive —
    # ("bob", "initech") matches nothing even though bob and initech
    # each appear in some solution.
    seed = spark.createDataFrame(
        [("ada", "acme"), ("bob", "initech")], ["p", "org"]
    )
    out = match_patterns(
        triples,
        [("?p", "works_at", "?org"), ("?org", "located_in", "?city")],
        bindings=seed,
    )
    assert rows(out) == [("ada", "acme", "berlin")]


def test_bindings_unbound_variable_raises(triples, spark):
    seed = spark.createDataFrame([("x",)], ["nope"])
    with pytest.raises(ValueError, match="unbound"):
        match_patterns(triples, [("?p", "works_at", "?org")],
                       bindings=seed)


def test_order_by_limit_top_k(triples):
    out = match_patterns(
        triples,
        [("?p", "works_at", "?org")],
        order_by=["p DESC"],
        limit=2,
    )
    assert [tuple(r) for r in out.collect()] == [
        ("cyd", "initech"), ("bob", "acme")]


def test_order_by_limit_plan_is_take_ordered(triples):
    """ORDER BY + LIMIT must compile to TakeOrderedAndProject (per-
    partition top-k), not a global Sort followed by a Limit."""
    out = match_patterns(
        triples,
        [("?p", "works_at", "?org")],
        order_by=["p"],
        limit=1,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_aggregate_order_by_limit(triples):
    from crfsuite_spark.kg.query import match_aggregate

    out = match_aggregate(
        triples,
        [("?p", "works_at", "?org")],
        ["org"],
        {"n": "count(p)"},
        order_by=["n DESC", "org"],
        limit=1,
    )
    assert [tuple(r) for r in out.collect()] == [("acme", 2)]


def test_aggregate_values_and_bindings(triples, spark):
    from crfsuite_spark.kg.query import match_aggregate

    out = match_aggregate(
        triples,
        [("?p", "works_at", "?org")],
        ["org"],
        {"n": "count(p)"},
        values={"p": ["ada", "bob", "cyd"]},
        bindings=spark.createDataFrame([("acme",)], ["org"]),
    )
    assert rows(out) == [("acme", 2)]


def test_sequence_path_pattern(triples):
    # p works_at org / org located_in city — the spec's chained-BGP
    # translation, internal ?__seq* variable projected away.
    out = match_patterns(triples, [("?p", "works_at/located_in", "?c")])
    assert out.columns == ["p", "c"]
    assert rows(out) == [
        ("ada", "berlin"), ("bob", "berlin"), ("cyd", "oslo")]


def test_sequence_path_composes_with_inverse(triples):
    # works_at/^works_at = colleague-of (including self): pairs that
    # share an employer.  Each hop of a sequence may be any path term.
    out = match_patterns(triples, [("?p", "works_at/^works_at", "?q")])
    assert rows(out) == [
        ("ada", "ada"), ("ada", "bob"), ("bob", "ada"),
        ("bob", "bob"), ("cyd", "cyd")]


def test_sequence_path_composes_with_closure(triples):
    # works_at/acquired+ : employer's (transitive) acquisitions.
    out = match_patterns(triples, [("?p", "works_at/acquired+", "?o")])
    assert rows(out) == [("ada", "initech"), ("bob", "initech")]


def test_sequence_path_in_optional(triples):
    # OPTIONAL over a sequence path left-joins the group's solutions;
    # cyd's employer acquired nothing so its extension stays NULL.
    out = match_patterns(
        triples,
        [("?p", "works_at", "?org")],
        optional=[("?p", "works_at/acquired", "?sub")],
    )
    assert rows(out) == [
        ("ada", "acme", "initech"),
        ("bob", "acme", "initech"),
        ("cyd", "initech", None),
    ]


def test_sequence_path_bag_multiplicity(spark):
    # SPARQL sequence multiplicity = one solution per distinct
    # intermediate: x reaches berlin through BOTH employers.
    t = spark.createDataFrame(
        [
            ("x", "works_at", "a"),
            ("x", "works_at", "b"),
            ("a", "located_in", "berlin"),
            ("b", "located_in", "berlin"),
        ],
        ["subj", "pred", "obj"],
    )
    out = match_patterns(
        t, [("?p", "works_at/located_in", "?c")], distinct=False)
    assert [tuple(r) for r in out.collect()] == [
        ("x", "berlin"), ("x", "berlin")]
    assert rows(match_patterns(t, [("?p", "works_at/located_in", "?c")])) \
        == [("x", "berlin")]


def test_sequence_path_empty_hop_raises(triples):
    with pytest.raises(ValueError, match="empty hop"):
        match_patterns(triples, [("?p", "works_at/", "?c")])


def test_sequence_path_with_source_override_raises(triples):
    with pytest.raises(ValueError, match="sequence-path"):
        match_patterns(
            triples, [("?p", "works_at/located_in", "?c")],
            sources=[triples],
        )


def test_offset_pages_past_prefix(triples):
    base = dict(order_by=["p", "org"])
    page1 = match_patterns(
        triples, [("?p", "works_at", "?org")], limit=2, **base)
    page2 = match_patterns(
        triples, [("?p", "works_at", "?org")], offset=2, limit=2, **base)
    assert [tuple(r) for r in page1.collect()] == [
        ("ada", "acme"), ("bob", "acme")]
    assert [tuple(r) for r in page2.collect()] == [("cyd", "initech")]


def test_aggregate_offset(triples):
    from crfsuite_spark.kg.query import match_aggregate

    out = match_aggregate(
        triples,
        [("?p", "works_at", "?org")],
        ["org"],
        {"n": "count(p)"},
        order_by=["n DESC", "org"],
        offset=1,
        limit=2,
    )
    assert [tuple(r) for r in out.collect()] == [("initech", 1)]


def test_zero_or_more_path_anchored(triples):
    # acme acquired* ?o : zero-length identity (acme) plus the closure.
    out = match_patterns(triples, [("acme", "acquired*", "?o")])
    assert rows(out) == [("acme",), ("initech",)]


def test_zero_or_more_path_both_vars_identity(triples):
    # ?x acquired* ?x : every graph node matches at zero length.
    out = match_patterns(triples, [("?x", "acquired*", "?x")])
    assert rows(out) == [
        ("acme",), ("ada",), ("berlin",), ("bob",), ("cyd",),
        ("initech",), ("loopy",), ("oslo",)]


def test_zero_or_more_constant_not_in_graph(triples):
    # SPARQL ZeroLengthPath evaluates the term, not the graph: a
    # constant absent from every triple still matches itself.
    out = match_patterns(triples, [("ghost", "acquired*", "?o")])
    assert rows(out) == [("ghost",)]


def test_zero_or_one_path(triples):
    out = match_patterns(triples, [("ada", "visited?", "?w")])
    assert rows(out) == [("ada",), ("oslo",)]


def test_alternation_closure(triples):
    # (acquired|located_in)+ from acme: initech (1 hop), berlin
    # (1 hop), oslo (acme→initech→oslo, 2 hops).
    out = match_patterns(
        triples, [("acme", "acquired|located_in+", "?y")])
    assert rows(out) == [("berlin",), ("initech",), ("oslo",)]


def test_sequence_with_quantified_hop(triples):
    out = match_patterns(triples, [("?p", "works_at/acquired*", "?o")])
    assert rows(out) == [
        ("ada", "acme"), ("ada", "initech"),
        ("bob", "acme"), ("bob", "initech"),
        ("cyd", "initech")]


def test_match_ask(triples, spark):
    from crfsuite_spark.kg.query import match_ask

    assert match_ask(
        triples, [("ada", "works_at", "?o")]).collect()[0].ask is True
    assert match_ask(
        triples, [("ada", "works_at", "initech")]).collect()[0].ask is False
    # joined group
    assert match_ask(
        triples,
        [("?p", "works_at", "?org"), ("?org", "located_in", "oslo")],
    ).collect()[0].ask is True


def test_describe_term(triples):
    from crfsuite_spark.kg.query import describe_term

    out = describe_term(triples, "acme")
    assert rows(out) == [
        ("acme", "acquired", "initech", "out"),
        ("acme", "located_in", "berlin", "out"),
        ("ada", "works_at", "acme", "in"),
        ("bob", "works_at", "acme", "in"),
    ]


def _brute_force_path(tset, path, max_hops=3):
    """Reference path evaluator mirroring the documented semantics:
    hops split on '/', each hop optionally inverted (^), an
    alternation of predicates, and quantified (+ bounded closure,
    * closure plus identity over graph nodes, ? edge plus identity);
    sequence composes the hop relations."""
    nodes = {s for s, _, _ in tset} | {o for _, _, o in tset}

    def hop_pairs(term):
        inv = term.startswith("^")
        if inv:
            term = term[1:]
        quant = None
        if term and term[-1] in "+*?":
            quant, term = term[-1], term[:-1]
        negated = term.startswith("!")
        if negated:
            term = term[1:]
        preds = set(term.split("|"))
        edges = {(s, o) for s, p, o in tset if (p in preds) != negated}
        if inv:
            edges = {(o, s) for s, o in edges}
        if quant in ("+", "*"):
            pairs, frontier = set(edges), set(edges)
            for _ in range(max_hops - 1):
                frontier = {
                    (a, c) for (a, b) in frontier for (b2, c) in edges
                    if b2 == b
                } - pairs
                pairs |= frontier
        else:
            pairs = set(edges)
        if quant in ("*", "?"):
            pairs |= {(n, n) for n in nodes}
        return pairs

    hops = path.split("/")
    rel = hop_pairs(hops[0])
    for h in hops[1:]:
        nxt = hop_pairs(h)
        rel = {(a, c) for (a, b) in rel for (b2, c) in nxt if b2 == b}
    return rel


def test_fuzz_path_algebra_vs_brute_force(spark):
    import random

    rng = random.Random(20260818)
    ents = ["a", "b", "c", "d"]
    preds = ["p", "q", "r"]
    for trial in range(10):
        tset = {
            (rng.choice(ents), rng.choice(preds), rng.choice(ents))
            for _ in range(rng.randint(3, 12))
        }
        t = spark.createDataFrame(sorted(tset), ["subj", "pred", "obj"])

        def rand_hop():
            base = "|".join(
                rng.sample(preds, rng.randint(1, 2)))
            if rng.random() < 0.25:
                base = "!" + base
            if rng.random() < 0.3:
                base = "^" + base
            return base + rng.choice(["", "+", "*", "?"])

        path = "/".join(rand_hop() for _ in range(rng.randint(1, 2)))
        exp = sorted(_brute_force_path(tset, path, max_hops=3))
        out = match_patterns(t, [("?x", path, "?y")], path_hops=3)
        got = rows(out)
        for c in out.pinned_caches:
            c.unpersist()
        assert got == exp, (trial, path, sorted(tset))


def test_negated_property_set(triples):
    # !works_at|located_in : every edge whose predicate is neither.
    out = match_patterns(triples, [("?s", "!works_at|located_in", "?o")])
    assert rows(out) == [
        ("acme", "initech"), ("ada", "oslo"), ("loopy", "loopy")]


def test_negated_property_set_composes(triples):
    # inverse of a negated set, and a negated set under closure
    inv = match_patterns(triples, [("?o", "^!works_at|located_in|knows", "?s")])
    assert rows(inv) == [("initech", "acme"), ("oslo", "ada")]
    out = match_patterns(triples, [("acme", "!works_at+", "?x")])
    # non-works_at edges from acme: located_in->berlin, acquired->
    # initech, then initech's located_in->oslo at hop 2
    assert rows(out) == [("berlin",), ("initech",), ("oslo",)]


def test_subquery_composition_via_bindings(triples, spark):
    """SPARQL sub-SELECT pattern: an inner aggregation's result frame
    feeds the outer query through `bindings` — orgs with ≥2 workers,
    then their locations. The composition stays one declarative plan
    (the inner frame is just a DataFrame)."""
    from crfsuite_spark.kg.query import match_aggregate

    inner = match_aggregate(
        triples, [("?p", "works_at", "?org")], ["org"],
        {"n": "count(p)"}, having="n >= 2",
    ).select("org")
    out = match_patterns(
        triples,
        [("?org", "located_in", "?city")],
        bindings=inner,
    )
    assert rows(out) == [("acme", "berlin")]


def test_filter_exists_semi_join(triples):
    # employees kept only when their org has a located_in edge: all
    # three orgs have one -> drop nothing; a stricter group (org
    # acquired something) keeps only acme's people
    out = match_patterns(
        triples,
        [("?p", "works_at", "?org")],
        exists=[[("?org", "located_in", "?c")]],
    )
    assert rows(out) == [
        ("ada", "acme"), ("bob", "acme"), ("cyd", "initech")]
    out = match_patterns(
        triples,
        [("?p", "works_at", "?org")],
        exists=[[("?org", "acquired", "?x")]],
    )
    assert rows(out) == [("ada", "acme"), ("bob", "acme")]
    # solution rows never widen: EXISTS binds nothing
    assert out.columns == ["p", "org"]


def test_filter_exists_disconnected_probe(triples):
    # a ground/disconnected EXISTS group: non-empty keeps everything,
    # empty annihilates (the dual of the NOT EXISTS probe semantics)
    keep = match_patterns(
        triples,
        [("?p", "works_at", "?org")],
        exists=[[("acme", "located_in", "berlin")]],
    )
    assert len(rows(keep)) == 3
    drop = match_patterns(
        triples,
        [("?p", "works_at", "?org")],
        exists=[[("acme", "located_in", "oslo")]],
    )
    assert rows(drop) == []


def test_bind_computed_variable(triples):
    # BIND feeds FILTER, default projection, and ORDER BY
    out = match_patterns(
        triples,
        [("?p", "works_at", "?org"), ("?org", "located_in", "?city")],
        bind={"tag": "concat(p, '@', city)",
              "tag_len": "length(tag)"},  # later bind sees earlier
        filters=["tag_len >= 9"],
        order_by=["tag"],
    )
    assert out.columns == ["p", "org", "city", "tag", "tag_len"]
    got = [tuple(r) for r in out.collect()]
    # cyd@oslo (length 8) fails the filter on the bound variable
    assert got == [
        ("ada", "acme", "berlin", "ada@berlin", 10),
        ("bob", "acme", "berlin", "bob@berlin", 10),
    ]


def test_bind_shadow_raises(triples):
    with pytest.raises(ValueError, match="shadow"):
        match_patterns(
            triples,
            [("?p", "works_at", "?org")],
            bind={"org": "upper(p)"},
        )
