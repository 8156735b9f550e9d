"""CONSTRUCT + bounded forward chaining (kg/rules.py)."""

import pytest

from crfsuite_spark.kg.rules import Rule, construct, infer, infer_increment


@pytest.fixture(scope="module")
def facts(spark):
    rows = [
        ("ada", "works_at", "acme"),
        ("bob", "works_at", "acme"),
        ("cyd", "works_at", "initech"),
        # acquisition chain a -> b -> c -> d
        ("org_a", "acquired", "org_b"),
        ("org_b", "acquired", "org_c"),
        ("org_c", "acquired", "org_d"),
    ]
    return spark.createDataFrame(rows, ["subj", "pred", "obj"])


COLLEAGUE = Rule(
    body=(("?x", "works_at", "?o"), ("?y", "works_at", "?o")),
    head=("?x", "colleague_of", "?y"),
    filters=("x < y",),
)
SUB_BASE = Rule(
    body=(("?x", "acquired", "?y"),),
    head=("?x", "subsidiary_of", "?y"),
)
SUB_TRANS = Rule(
    body=(("?x", "subsidiary_of", "?y"), ("?y", "subsidiary_of", "?z")),
    head=("?x", "subsidiary_of", "?z"),
)


def test_construct_colleague(facts):
    out = construct(facts, COLLEAGUE.body, COLLEAGUE.head,
                    filters=COLLEAGUE.filters)
    assert sorted(map(tuple, out.collect())) == [
        ("ada", "colleague_of", "bob"),
    ]


def test_infer_transitive_rounds_and_fixpoint(facts):
    out = infer(facts, [SUB_BASE, SUB_TRANS], max_rounds=10,
                include_base=False)
    got = {(r["subj"], r["obj"]): r["round"] for r in out.collect()}
    for c in out.pinned_caches:
        c.unpersist()
    # chain of 4: direct pairs round 1, 2-hops round 2, 3-hop round 3;
    # fixpoint exits before the max_rounds=10 bound
    assert got == {
        ("org_a", "org_b"): 1, ("org_b", "org_c"): 1, ("org_c", "org_d"): 1,
        ("org_a", "org_c"): 2, ("org_b", "org_d"): 2,
        ("org_a", "org_d"): 3,
    }


def test_infer_include_base_and_multi_rule(facts):
    out = infer(facts, [COLLEAGUE, SUB_BASE], max_rounds=2)
    rows = [(r["subj"], r["pred"], r["obj"], r["round"]) for r in out.collect()]
    for c in out.pinned_caches:
        c.unpersist()
    assert ("ada", "works_at", "acme", 0) in rows
    assert ("ada", "colleague_of", "bob", 1) in rows
    assert ("org_a", "subsidiary_of", "org_b", 1) in rows
    # non-recursive heads derive exactly once
    assert len([r for r in rows if r[1] == "colleague_of"]) == 1


def _py_infer(base, rules, max_rounds):
    """Reference: NAIVE datalog with round tagging (semi-naive must
    stage identically)."""
    from tests.test_kg_query import _brute_force_bgp

    total = set(base)
    rounds = {}
    for rnd in range(1, max_rounds + 1):
        new = set()
        for rule in rules:
            for b in _brute_force_bgp(total, rule.body):
                fact = tuple(
                    b[t[1:]] if t.startswith("?") else t for t in rule.head
                )
                if fact not in total:
                    new.add(fact)
        if not new:
            break
        for f in new:
            rounds[f] = rnd
        total |= new
    return rounds


def test_fuzz_infer_vs_naive_datalog(spark):
    import random

    rng = random.Random(987)
    ents = ["a", "b", "c", "d"]
    base_preds = ["p", "q"]
    derived = ["dp", "dq"]
    for trial in range(6):
        base = {
            (rng.choice(ents), rng.choice(base_preds), rng.choice(ents))
            for _ in range(rng.randint(4, 10))
        }
        t = spark.createDataFrame(sorted(base), ["subj", "pred", "obj"])
        rules = []
        for _ in range(rng.randint(1, 3)):
            n_body = rng.randint(1, 2)
            vars_ = ["?x", "?y", "?z"]
            body = []
            for _ in range(n_body):
                body.append(
                    (
                        rng.choice(vars_),
                        rng.choice(base_preds + derived),
                        rng.choice(vars_ + ents[:1]),
                    )
                )
            bound = [T[1:] for pat in body for T in pat if T.startswith("?")]
            if not bound:
                body[0] = ("?x", body[0][1], body[0][2])
                bound = ["x"]
            head = (
                "?" + rng.choice(bound),
                rng.choice(derived),
                "?" + rng.choice(bound),
            )
            rules.append(Rule(body=tuple(body), head=head))
        exp = _py_infer(base, rules, 3)
        out = infer(t, rules, max_rounds=3, include_base=False)
        got = {
            (r["subj"], r["pred"], r["obj"]): r["round"] for r in out.collect()
        }
        for c in out.pinned_caches:
            c.unpersist()
        assert got == exp, (trial, rules, sorted(base))


def _facts(out):
    return {(r["subj"], r["pred"], r["obj"]) for r in out.collect()}


def test_incremental_bridge_edge(spark):
    rules = [SUB_BASE, SUB_TRANS]
    initial = spark.createDataFrame(
        [("a", "acquired", "b"), ("c", "acquired", "d")],
        ["subj", "pred", "obj"],
    )
    late = spark.createDataFrame([("b", "acquired", "c")],
                                 ["subj", "pred", "obj"])
    closed0 = infer(initial, rules, max_rounds=4)
    closed_facts = closed0.select("subj", "pred", "obj")
    inc = infer_increment(closed_facts, late, rules, max_rounds=4)
    got = _facts(inc)
    for c in closed0.pinned_caches + inc.pinned_caches:
        c.unpersist()
    # the bridge connects both chains: everything new flows through it
    assert got == {
        ("b", "subsidiary_of", "c"),
        ("a", "subsidiary_of", "c"),
        ("b", "subsidiary_of", "d"),
        ("a", "subsidiary_of", "d"),
    }


def test_incremental_equals_full_reclose_random(spark):
    import random

    rng = random.Random(55)
    ents = ["a", "b", "c", "d", "e"]
    rules = [SUB_BASE, SUB_TRANS]
    for trial in range(3):
        edges = {
            (rng.choice(ents), "acquired", rng.choice(ents))
            for _ in range(rng.randint(4, 8))
        }
        edges = sorted(edges)
        cut = rng.randint(1, len(edges) - 1)
        A, B = edges[:cut], edges[cut:]
        fa = spark.createDataFrame(A, ["subj", "pred", "obj"])
        fb = spark.createDataFrame(B, ["subj", "pred", "obj"])
        closed = infer(fa, rules, max_rounds=5)
        inc = infer_increment(
            closed.select("subj", "pred", "obj"), fb, rules, max_rounds=5
        )
        maintained = _facts(closed) | set(B) | _facts(inc)
        # full re-close expected set from the pure-Python reference
        expected = set(edges) | set(_py_infer(set(edges), rules, 5))
        for c in closed.pinned_caches + inc.pinned_caches:
            c.unpersist()
        assert maintained == expected, (trial, A, B)


def test_rule_head_must_be_bound():
    with pytest.raises(ValueError, match="not bound"):
        Rule(body=(("?x", "p", "?y"),), head=("?x", "q", "?z"))


def test_mine_path_rules_hand_graph(spark):
    """Hand-built chain graph: support/confidence arithmetic, the
    hub-grounding dedup (a dense middle entity must not multiply
    counts), and threshold pruning."""
    import pytest

    from crfsuite_spark.kg.rules import mine_path_rules

    cols = ["conv_id", "turn_idx", "subj", "pred", "obj"]
    rows = [
        # works_at(a, X) ∧ located_in(X, c1) with head visited(a, c1)
        ("c", 0, "a", "works_at", "X"),
        ("c", 1, "X", "located_in", "c1"),
        ("c", 2, "a", "visited", "c1"),
        # second grounding, no head
        ("c", 3, "b", "works_at", "Y"),
        ("c", 4, "Y", "located_in", "c2"),
        # hub: two parallel works_at paths a->X via DUPLICATE mentions
        ("c", 5, "a", "works_at", "X"),
    ]
    out = mine_path_rules(
        spark.createDataFrame(rows, cols), min_support=1,
        min_confidence=0.0,
    )
    got = {(r["p1"], r["p2"], r["head"]): r for r in out.collect()}
    r = got[("works_at", "located_in", "visited")]
    # groundings: (a,c1), (b,c2) -> n_body 2; head holds for (a,c1)
    assert (r["support"], r["n_body"]) == (1, 2)
    assert r["confidence"] == pytest.approx(0.5)
    # min_support=2 prunes it
    assert mine_path_rules(
        spark.createDataFrame(rows, cols), min_support=2
    ).count() == 0


def test_mined_rules_feed_construct(spark):
    """The discovery→application loop: the top mined rule converts
    directly into a Rule/construct application, and every inferred
    head the rule's own support counted is reproduced. Precision of
    the applied rule on the graph equals the mined confidence."""
    import pytest

    from crfsuite_spark.kg.rules import construct, mine_path_rules
    from pyspark.sql import functions as F
    import os

    fixtures = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "fixtures")
    t = spark.read.parquet(
        os.path.join(fixtures, "gold_triples_synthetic.parquet")
    )
    mined = mine_path_rules(t, min_support=2, min_confidence=0.1)
    top = mined.orderBy(F.desc("confidence"), F.desc("support"),
                        "p1", "p2", "head").first()
    derived = construct(
        t,
        body=[("?x", top["p1"], "?y"), ("?y", top["p2"], "?z")],
        head=("?x", top["head"], "?z"),
    ).distinct()
    n_derived = derived.count()
    assert n_derived == top["n_body"]
    known = t.select(
        F.col("subj"), F.col("pred"), F.col("obj")
    ).distinct()
    n_hit = derived.join(known, ["subj", "pred", "obj"], "inner").count()
    assert n_hit == top["support"]
    assert n_hit / n_derived == pytest.approx(top["confidence"])
