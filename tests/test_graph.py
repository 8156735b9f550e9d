"""Graph analytics over materialized triple tables (kg/graph.py):
exact-value checks against independent numpy/pure-Python references on
a hand-built graph, plus the semantic corners the driver oracle can't
see (min-hop claim on multi-path nodes, sink-node rank leakage,
duplicate-mention collapse)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from crfsuite_spark.kg.graph import (
    entity_degrees,
    k_hop,
    pagerank,
    property_path,
    sample_neighbors,
    triple_support,
)


def _triples(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, subj string, pred string, obj string"
    )


@pytest.fixture(scope="module")
def tiny(spark):
    # a -> b (x2 convs), a -> c, b -> c, c -> d; e isolated as subject
    # of a self-contained edge e -> a (so every node is reachable from a
    # except e itself).
    rows = [
        ("c1", 1, "a", "knows", "b"),
        ("c2", 1, "a", "knows", "b"),  # duplicate mention, second conv
        ("c2", 2, "a", "knows", "c"),
        ("c1", 2, "b", "knows", "c"),
        ("c1", 3, "c", "knows", "d"),
        ("c3", 1, "e", "knows", "a"),
    ]
    return _triples(spark, rows)


def test_triple_support_counts_and_confidence(spark, tiny):
    out = {
        (r["subj"], r["pred"], r["obj"]): r
        for r in triple_support(tiny).collect()
    }
    ab = out[("a", "knows", "b")]
    assert ab["n_mentions"] == 2 and ab["n_convs"] == 2
    # a/knows has 3 mentions total: b twice, c once
    assert ab["confidence"] == pytest.approx(2 / 3)
    assert out[("a", "knows", "c")]["confidence"] == pytest.approx(1 / 3)
    # sole object => confidence 1.0
    assert out[("c", "knows", "d")]["confidence"] == pytest.approx(1.0)
    # per-(subj,pred) confidences sum to 1
    import collections

    sums = collections.defaultdict(float)
    for (s, p, _), r in out.items():
        sums[(s, p)] += r["confidence"]
    assert all(v == pytest.approx(1.0) for v in sums.values())


def test_entity_degrees_vs_reference(spark, tiny):
    got = {r["entity"]: r for r in entity_degrees(tiny).collect()}
    # a: out triples a->b,a->b,a->c = 3; in: e->a = 1
    assert (got["a"]["out_triples"], got["a"]["in_triples"]) == (3, 1)
    assert (got["a"]["out_neighbors"], got["a"]["in_neighbors"]) == (2, 1)
    # d: sink
    assert (got["d"]["out_triples"], got["d"]["out_neighbors"]) == (0, 0)
    assert (got["d"]["in_triples"], got["d"]["in_neighbors"]) == (1, 1)
    # b: in 2 triples (both a->b mentions) but 1 distinct in-neighbor
    assert got["b"]["in_triples"] == 2 and got["b"]["in_neighbors"] == 1


def _numpy_pagerank(edges, n_iters, damping):
    nodes = sorted({u for e in edges for u in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out_deg = {v: 0 for v in nodes}
    for s, _ in edges:
        out_deg[s] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(n_iters):
        nxt = np.full(n, (1.0 - damping) / n)
        for s, d in edges:
            nxt[idx[d]] += damping * r[idx[s]] / out_deg[s]
        r = nxt
    return {v: r[idx[v]] for v in nodes}


def test_pagerank_matches_numpy_power_iteration(spark, tiny):
    # distinct edge set (the duplicate a->b mention collapses)
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "d"), ("e", "a")]
    for iters in (1, 3):
        exp = _numpy_pagerank(edges, iters, 0.85)
        out = pagerank(tiny, n_iters=iters, damping=0.85)
        got = {r["entity"]: r["rank"] for r in out.collect()}
        for c in out.pinned_caches:
            c.unpersist()
        assert set(got) == set(exp)
        for v in exp:
            assert got[v] == pytest.approx(exp[v], abs=1e-12), v
    # sink semantics: d absorbs but never redistributes, so total mass
    # strictly below 1 after an iteration (textbook simple formulation)
    assert sum(got.values()) < 1.0


def test_k_hop_min_hop_claim(spark):
    # diamond + long path: a->b->d, a->c->d, b->e, e->f
    # d reachable at hop 2 via two paths; f at hop 3 (excluded at k=2)
    rows = [
        ("c1", 1, "a", "r", "b"),
        ("c1", 2, "a", "r", "c"),
        ("c1", 3, "b", "r", "d"),
        ("c1", 4, "c", "r", "d"),
        ("c1", 5, "b", "r", "e"),
        ("c1", 6, "e", "r", "f"),
        # back-edge d->a: a is already hop 0, must NOT be re-claimed
        ("c1", 7, "d", "r", "a"),
    ]
    t = _triples(spark, rows)
    seeds = t.sparkSession.createDataFrame([("a",)], "entity string")
    out = k_hop(t, seeds, k=2)
    got = {r["entity"]: r["hop"] for r in out.collect()}
    for c in out.pinned_caches:
        c.unpersist()
    assert got == {"a": 0, "b": 1, "c": 1, "d": 2, "e": 2}


def test_property_path_min_hops_and_pred_isolation(spark):
    # chain a->b->c->d on 'owns'; decoy edge b->z on another predicate
    # must not leak into the closure
    rows = [
        ("c1", 1, "a", "owns", "b"),
        ("c1", 2, "b", "owns", "c"),
        ("c1", 3, "c", "owns", "d"),
        ("c1", 4, "b", "rents", "z"),
        # shortcut a->c makes (a,c) hops=1 and (a,d) hops=2 (min claim)
        ("c1", 5, "a", "owns", "c"),
    ]
    out = property_path(_triples(spark, rows), "owns", max_hops=3)
    got = {(r["src"], r["dst"]): r["hops"] for r in out.collect()}
    for c in out.pinned_caches:
        c.unpersist()
    assert got == {
        ("a", "b"): 1, ("b", "c"): 1, ("c", "d"): 1, ("a", "c"): 1,
        ("a", "d"): 2, ("b", "d"): 2,
    }
    assert ("b", "z") not in got


def test_property_path_cycle_closes_to_self(spark):
    rows = [
        ("c1", 1, "x", "owns", "y"),
        ("c1", 2, "y", "owns", "x"),
    ]
    out = property_path(_triples(spark, rows), "owns", max_hops=2)
    got = {(r["src"], r["dst"]): r["hops"] for r in out.collect()}
    for c in out.pinned_caches:
        c.unpersist()
    assert got == {
        ("x", "y"): 1, ("y", "x"): 1, ("x", "x"): 2, ("y", "y"): 2,
    }


def _fanout_mirror(edges, frontier, lvl, fanout, seed):
    import hashlib

    out = []
    for src in sorted(frontier):
        nbrs = sorted(d for s, d in edges if s == src)
        ranked = sorted(
            nbrs,
            key=lambda d: (
                int(
                    hashlib.md5(f"{src}:{d}:{lvl}:{seed}".encode()).hexdigest()[:8],
                    16,
                ),
                d,
            ),
        )
        out += [(lvl, src, d) for d in ranked[:fanout]]
    return out


def test_sample_neighbors_matches_mirror_and_caps_fanout(spark):
    edges = [("h", f"n{i}") for i in range(1, 7)]
    edges += [("n1", f"m{i}") for i in range(1, 5)]
    edges += [("n2", "m1"), ("n3", "m9")]
    rows = [("c1", i, s, "r", d) for i, (s, d) in enumerate(edges)]
    t = _triples(spark, rows)
    seeds = spark.createDataFrame([("h",)], "entity string")
    out = sample_neighbors(t, seeds, fanouts=(3, 2), seed=5)
    got = sorted((r["layer"], r["src"], r["dst"]) for r in out.collect())
    for c in out.pinned_caches:
        c.unpersist()
    eset = set(edges)
    l1 = _fanout_mirror(eset, {"h"}, 1, 3, 5)
    l2 = _fanout_mirror(eset, {d for _, _, d in l1}, 2, 2, 5)
    assert got == sorted(l1 + l2)
    # caps hold
    assert len([g for g in l1]) == 3
    from collections import Counter

    per_src = Counter((g[1]) for g in l2)
    assert all(v <= 2 for v in per_src.values())


def test_sample_neighbors_deterministic(spark, tiny):
    seeds = tiny.select(F.col("subj").alias("entity")).distinct()
    runs = []
    for _ in range(2):
        out = sample_neighbors(tiny, seeds, (2,), seed=3)
        runs.append(sorted(map(tuple, out.collect())))
        for c in out.pinned_caches:
            c.unpersist()
    assert runs[0] == runs[1]


def test_k_hop_multi_seed_frame(spark, tiny):
    # seeds as a FRAME derived from the data (no collect): all subjects
    # of 'knows' edges whose object is 'c' -> {a, b}
    seeds = (
        tiny.where(F.col("obj") == "c")
        .select(F.col("subj").alias("entity"))
        .distinct()
    )
    out = k_hop(tiny, seeds, k=1)
    got = {r["entity"]: r["hop"] for r in out.collect()}
    for c in out.pinned_caches:
        c.unpersist()
    # a,b seeds; hop1 = union of their successors minus seeds = {c}
    assert got == {"a": 0, "b": 0, "c": 1}


def test_comention_edges(spark, tiny):
    from crfsuite_spark.kg.graph import comention_edges

    out = comention_edges(tiny).toPandas()
    got = {(r.entity_a, r.entity_b): r.n_scopes for r in out.itertuples()}
    # c1 entities {a,b,c,d}; c2 {a,b,c}; c3 {a,e}
    exp = {
        ("a", "b"): 2, ("a", "c"): 2, ("b", "c"): 2,
        ("a", "d"): 1, ("b", "d"): 1, ("c", "d"): 1, ("a", "e"): 1,
    }
    assert got == exp
    # degenerate-scope guard: cap of 2 entities keeps only c3
    capped = comention_edges(tiny, max_entities_per_scope=2).toPandas()
    assert {(r.entity_a, r.entity_b) for r in capped.itertuples()} == {("a", "e")}


def test_triangle_count(spark):
    from crfsuite_spark.kg.graph import triangle_count

    # K4 on {a,b,c,d} = 4 triangles, plus pendant d-e; direction and
    # duplicate/self edges must not matter
    edges = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
             ("c", "d"), ("d", "e"), ("b", "a"), ("c", "c")]
    df = spark.createDataFrame(
        [("c1", 1, s, "r", o) for s, o in edges],
        "conv_id string, turn_idx int, subj string, pred string, obj string",
    )
    assert triangle_count(df).collect()[0]["n_triangles"] == 4


def test_unigram_nll_matches_numpy(spark):
    import numpy as np

    from crfsuite_spark.functions.analysis import unigram_nll

    docs = [(1, "the cat sat"), (2, "the dog sat sat"), (3, "  "), (4, "zebra")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = unigram_nll(df, "doc_id", "text").toPandas().set_index("doc_id")
    # corpus counts: the=2 cat=1 sat=3 dog=1 zebra=1 ; N=8
    def nll(toks, c={"the": 2, "cat": 1, "sat": 3, "dog": 1, "zebra": 1}):
        return float(np.mean([-np.log(c[t] / 8) for t in toks]))

    assert 3 not in out.index  # token-less doc absent
    assert abs(out.loc[1, "nll"] - nll(["the", "cat", "sat"])) < 1e-12
    assert abs(out.loc[2, "nll"] - nll(["the", "dog", "sat", "sat"])) < 1e-12
    assert out.loc[4, "n_tokens"] == 1
    # rare-token doc scores worse than common-token doc
    assert out.loc[4, "nll"] > out.loc[2, "nll"]


def test_top_objects_agg_then_rank(spark, tiny):
    from crfsuite_spark.kg.graph import top_objects

    out = top_objects(tiny, k=2).toPandas()
    # "knows" mention counts: b=2 (a->b twice), c=2 (a->c, b->c), a=1,
    # d=1; b/c tie at 2 -> obj asc puts b first
    knows = out[out["pred"] == "knows"].sort_values("rank")
    assert list(knows["obj"]) == ["b", "c"]
    assert list(knows["n_mentions"]) == [2, 2]
    # the window must rank the AGGREGATED frame: partial aggregation
    # appears before the Window sort in the plan
    plan = top_objects(tiny, k=2)._jdf.queryExecution().executedPlan().toString()
    assert "partial" in plan.lower() and "Window" in plan
    assert plan.lower().index("partial") > plan.index("Window")  # bottom-up print: agg below window


def test_label_propagation_two_cliques_bridge(spark):
    """Two 3-cliques joined by one bridge edge: LPA must give each
    clique its own min-label community (the bridge's single vote never
    outnumbers two intra-clique votes), matching a hand-run of the
    synchronous min-tie-break update."""
    from crfsuite_spark.kg.graph import label_propagation

    rows = [
        ("c1", 1, "a1", "r", "a2"),
        ("c1", 2, "a1", "r", "a3"),
        ("c1", 3, "a2", "r", "a3"),
        ("c1", 4, "b1", "r", "b2"),
        ("c1", 5, "b1", "r", "b3"),
        ("c1", 6, "b2", "r", "b3"),
        ("c1", 7, "a3", "r", "b1"),  # bridge
    ]
    out = label_propagation(_triples(spark, rows), n_iters=4)
    got = {r["entity"]: r["community"] for r in out.collect()}
    for c in out.pinned_caches:
        c.unpersist()
    # the a-clique settles on one community, the b-side (including the
    # bridge node) on another — and the exact labels must match an
    # independent pure-Python run of the same synchronous update:
    assert got["a1"] == got["a2"] == got["a3"]
    assert got["b1"] == got["b2"] == got["b3"]
    assert got["a1"] != got["b1"]
    edges = {("a1","a2"),("a1","a3"),("a2","a3"),
             ("b1","b2"),("b1","b3"),("b2","b3"),("a3","b1")}
    sym = set()
    for a, b in edges:
        sym.add((a, b)); sym.add((b, a))
    nodes = {a for a, _ in sym}
    lab = {n: n for n in nodes}
    for _ in range(4):
        new = {}
        for n in nodes:
            votes = {}
            for a, b in sym:
                if a == n:
                    votes[lab[b]] = votes.get(lab[b], 0) + 1
            best = sorted(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            new[n] = best
        lab = new
    assert got == lab


def test_label_propagation_tie_breaks_min_label(spark):
    """A path x - m - y: m's neighbors vote x and y once each — the
    deterministic rule must pick min(x, y), every iteration, both
    endpoints keep flip-flopping onto m's label."""
    from crfsuite_spark.kg.graph import label_propagation

    rows = [("c1", 1, "m", "r", "x"), ("c1", 2, "m", "r", "y")]
    out = label_propagation(_triples(spark, rows), n_iters=1)
    got = {r["entity"]: r["community"] for r in out.collect()}
    for c in out.pinned_caches:
        c.unpersist()
    # after 1 sync round: m sees {x, y} -> x; x and y each see only m -> m
    assert got == {"m": "x", "x": "m", "y": "m"}


def test_label_propagation_drops_self_loops(spark):
    from crfsuite_spark.kg.graph import label_propagation

    rows = [("c1", 1, "z", "r", "z"), ("c1", 2, "p", "r", "q")]
    out = label_propagation(_triples(spark, rows), n_iters=2)
    got = {r["entity"]: r["community"] for r in out.collect()}
    for c in out.pinned_caches:
        c.unpersist()
    # z only self-loops: it has no neighbors, so it never enters the
    # node set at all (consistent with the oracle CTE chain)
    assert "z" not in got
    # synchronous LPA 2-cycles on a bare edge (p takes q's label while
    # q takes p's, and back): after an even iteration count each node
    # carries its own label again — faithful to the update rule, and
    # the driver oracle replays the identical dynamics
    assert got == {"p": "p", "q": "q"}


def test_link_heuristics_vs_python_mirror(spark):
    """Exact parity with a brute-force pure-Python computation of all
    four heuristics on a hand-built graph with a hub, a triangle, and
    a pendant — plus the exclude-known and max-degree contracts."""
    import math
    from itertools import combinations

    from crfsuite_spark.kg.graph import link_heuristics

    rows = [
        ("c1", 1, "a", "knows", "b"),
        ("c1", 2, "b", "knows", "c"),
        ("c1", 3, "a", "knows", "c"),   # triangle a-b-c
        ("c2", 1, "h", "knows", "a"),
        ("c2", 2, "h", "knows", "b"),
        ("c2", 3, "h", "knows", "c"),
        ("c2", 4, "h", "knows", "d"),   # hub h, pendant d
        ("c3", 1, "a", "knows", "b"),   # duplicate mention collapses
        ("c3", 2, "x", "knows", "x"),   # self-loop drops
    ]
    t = _triples(spark, rows)

    adj = {}
    for _, _, s, _, o in rows:
        if s == o:
            continue
        adj.setdefault(s, set()).add(o)
        adj.setdefault(o, set()).add(s)
    edges = {
        frozenset((u, v)) for u in adj for v in adj[u]
    }

    def mirror(exclude_known, max_degree=None):
        exp = {}
        for u, v in combinations(sorted(adj), 2):
            if exclude_known and frozenset((u, v)) in edges:
                continue
            cn = {
                w for w in adj[u] & adj[v]
                if max_degree is None or len(adj[w]) <= max_degree
            }
            if not cn:
                continue
            # documented contract: the union term is the algebraic
            # deg(u)+deg(v)-CN with the CAPPED CN (degrees uncapped)
            exp[(u, v)] = (
                len(cn),
                len(cn) / (len(adj[u]) + len(adj[v]) - len(cn)),
                sum(1.0 / math.log(len(adj[w])) for w in cn),
                len(adj[u]) * len(adj[v]),
            )
        return exp

    for kw in (
        dict(exclude_known=True),
        dict(exclude_known=False),
        # cap drops hub h (deg 4) as a center; (a,b) keeps cn={c} and
        # its jaccard uses the capped-CN union proxy 1/(3+3-1)
        dict(exclude_known=False, max_degree=3),
    ):
        got = {
            (r["u"], r["v"]): (
                r["common_neighbors"],
                r["jaccard"],
                r["adamic_adar"],
                r["pref_attach"],
            )
            for r in link_heuristics(t, **kw).collect()
        }
        exp = mirror(
            kw["exclude_known"], kw.get("max_degree")
        )
        assert set(got) == set(exp), kw
        for p in exp:
            assert got[p][0] == exp[p][0], (p, kw)
            assert got[p][1] == pytest.approx(exp[p][1]), (p, kw)
            assert got[p][2] == pytest.approx(exp[p][2]), (p, kw)
            assert got[p][3] == exp[p][3], (p, kw)


def test_personalized_pagerank_matches_numpy(spark, tiny):
    """Seeded-teleport PPR equals the literal numpy iteration with
    s = uniform over seeds; seeds outside the graph are ignored and
    an all-unknown seed set raises."""
    seeds = spark.createDataFrame(
        [("a",), ("c",), ("zzz_not_in_graph",)], ["entity"]
    )
    out = pagerank(tiny, n_iters=3, damping=0.85, seeds=seeds)
    got = {r["entity"]: r["rank"] for r in out.collect()}
    for c in out.pinned_caches:
        c.unpersist()

    edges = {("a", "b"), ("a", "c"), ("b", "c"), ("c", "d"), ("e", "a")}
    nodes = sorted({x for p in edges for x in p})
    idx = {v: i for i, v in enumerate(nodes)}
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    s_vec = np.zeros(len(nodes))
    for sd in ("a", "c"):
        s_vec[idx[sd]] = 0.5
    r = s_vec.copy()
    for _ in range(3):
        nxt = 0.15 * s_vec
        for u, v in edges:
            nxt[idx[v]] += 0.85 * r[idx[u]] / outdeg[u]
        r = nxt
    assert set(got) == set(nodes)
    for v in nodes:
        assert got[v] == pytest.approx(r[idx[v]]), v
    # non-seed source nodes hold zero teleport mass
    assert got["e"] == 0.0

    with pytest.raises(ValueError, match="no seed entity"):
        pagerank(tiny, seeds=spark.createDataFrame(
            [("nope",)], ["entity"]))


def test_hits_matches_numpy_iteration(spark, tiny):
    """Fixed-iteration HITS equals the literal numpy mirror with
    per-iteration L2 normalization; sinks keep hub 0, sources
    authority 0."""
    from crfsuite_spark.kg.graph import hits

    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "d"), ("e", "a")]
    nodes = sorted({x for p in edges for x in p})
    idx = {v: i for i, v in enumerate(nodes)}
    for iters in (1, 3):
        h = np.ones(len(nodes))
        a = np.zeros(len(nodes))
        for _ in range(iters):
            a = np.zeros(len(nodes))
            for u, v in edges:
                a[idx[v]] += h[idx[u]]
            a /= np.linalg.norm(a)
            h = np.zeros(len(nodes))
            for u, v in edges:
                h[idx[u]] += a[idx[v]]
            h /= np.linalg.norm(h)
        out = hits(tiny, n_iters=iters)
        got = {r["entity"]: (r["hub"], r["authority"]) for r in out.collect()}
        for c in out.pinned_caches:
            c.unpersist()
        assert set(got) == set(nodes)
        for v in nodes:
            assert got[v][0] == pytest.approx(h[idx[v]], abs=1e-12), v
            assert got[v][1] == pytest.approx(a[idx[v]], abs=1e-12), v
    # d is a pure sink (hub 0); e a pure source (authority 0)
    assert got["d"][0] == 0.0 and got["e"][1] == 0.0


def test_predicate_signatures_profile(spark):
    from crfsuite_spark.kg.graph import predicate_signatures

    rows = [
        ("c1", 1, "per:a", "works_at", "org:x"),
        ("c1", 2, "per:b", "works_at", "org:y"),
        ("c2", 1, "per:c", "works_at", "loc:z"),
        ("c2", 2, "org:x", "based_in", "loc:z"),
        ("c2", 3, "noprefix", "based_in", "loc:z"),
    ]
    t = spark.createDataFrame(
        rows, ["conv_id", "turn_idx", "subj", "pred", "obj"]
    )
    got = {
        (r["pred"], r["subj_type"], r["obj_type"]): (r["n_triples"], r["n_pred"], r["share"])
        for r in predicate_signatures(t).collect()
    }
    assert got[("works_at", "per", "org")] == (2, 3, pytest.approx(2 / 3))
    assert got[("works_at", "per", "loc")] == (1, 3, pytest.approx(1 / 3))
    assert got[("based_in", "org", "loc")] == (1, 2, pytest.approx(0.5))
    # id without a type prefix profiles as the empty type, not a crash
    assert got[("based_in", "", "loc")] == (1, 2, pytest.approx(0.5))
    assert len(got) == 4


def test_entity_salience_matches_hand_computation(spark):
    """Exact TF-ICF values against a hand-built mention stream, and
    the contracts: ubiquitous entity gets icf == 0; salience ranks a
    conversation-specific entity above the ubiquitous one even at
    equal counts; first_turn / n_turns carry position evidence."""
    import math

    from crfsuite_spark.kg.graph import entity_salience

    cols = ["conv_id", "canonical_id", "turn_idx"]
    rows = [
        # 'hub' appears in ALL 3 convs -> icf = ln(3/3) = 0
        ("c1", "hub", 0), ("c1", "hub", 2),
        ("c2", "hub", 1),
        ("c3", "hub", 0),
        # 'rare' only in c1, mentioned twice in the same turn
        ("c1", "rare", 1), ("c1", "rare", 1),
        # 'mid' in two convs
        ("c2", "mid", 0), ("c3", "mid", 5),
    ]
    got = {
        (r["conv_id"], r["entity"]): r
        for r in entity_salience(spark.createDataFrame(rows, cols)).collect()
    }
    assert len(got) == 6
    r = got[("c1", "rare")]
    assert (r["n_mentions"], r["first_turn"], r["n_turns"]) == (2, 1, 1)
    assert r["tf"] == pytest.approx(2 / 4)           # 4 mentions in c1
    assert r["icf"] == pytest.approx(math.log(3 / 1))
    assert r["salience"] == pytest.approx(0.5 * math.log(3.0))
    h = got[("c1", "hub")]
    assert (h["n_mentions"], h["first_turn"], h["n_turns"]) == (2, 0, 2)
    assert h["icf"] == pytest.approx(0.0)
    # equal counts (2 each in c1) but rare is conversation-specific
    assert r["salience"] > h["salience"]
    m = got[("c3", "mid")]
    assert m["tf"] == pytest.approx(1 / 2)           # c3 has 2 mentions
    assert m["icf"] == pytest.approx(math.log(3 / 2))


def test_entity_salience_plan_broadcasts_small_sides(spark):
    """The entity-frequency and N_convs sides broadcast; the mention
    aggregation is partial (map-side combined); no Window sort."""
    from crfsuite_spark.kg.graph import entity_salience

    df = spark.createDataFrame(
        [("c1", "e1", 0)], ["conv_id", "canonical_id", "turn_idx"]
    )
    plan = (
        entity_salience(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "partial" in plan.lower(), plan
    assert "BroadcastExchange" in plan, plan
    assert "Window" not in plan, plan


def test_comention_pmi_hand_values(spark):
    """PMI/NPMI against hand arithmetic on a 3-scope fixture, incl.
    the always-together npmi=1.0 branch and the hub-demotion contract
    (frequent hub pair ranks below exclusive pair under npmi)."""
    import math

    from crfsuite_spark.kg.graph import comention_pmi

    cols = ["conv_id", "turn_idx", "subj", "pred", "obj"]
    rows = [
        # c1: hub-x, hub-y, rare-p, rare-q   c2: hub-x, hub-y
        # c3: hub-x (alone with y)           -> N = 3 scopes
        ("c1", 0, "x", "r", "y"), ("c1", 1, "p", "r", "q"),
        ("c2", 0, "x", "r", "y"),
        ("c3", 0, "x", "r", "y"),
    ]
    got = {
        (r["entity_a"], r["entity_b"]): r
        for r in comention_pmi(spark.createDataFrame(rows, cols)).collect()
    }
    # x,y in all 3 scopes -> pmi = ln(3*3/(3*3)) = 0, npmi = 1.0 branch
    xy = got[("x", "y")]
    assert (xy["n_scopes"], xy["n_a"], xy["n_b"]) == (3, 3, 3)
    assert xy["pmi"] == pytest.approx(0.0)
    assert xy["npmi"] == pytest.approx(1.0)
    # p,q exclusive pair: pmi = ln(3*1/(1*1)) = ln 3,
    # npmi = ln3 / ln(3/1) = 1.0
    pq = got[("p", "q")]
    assert pq["pmi"] == pytest.approx(math.log(3.0))
    assert pq["npmi"] == pytest.approx(1.0)
    # p,x share only c1: pmi = ln(3*1/(1*3)) = 0; npmi = 0
    px = got[("p", "x")]
    assert px["pmi"] == pytest.approx(0.0)
    assert px["npmi"] == pytest.approx(0.0)


def test_local_clustering_triangle_plus_pendant(spark):
    """Known graph: triangle a-b-c plus pendant c-d. Exact degrees,
    per-node triangle counts, and Watts-Strogatz coefficients
    (deg<2 -> 0.0, never NULL)."""
    from crfsuite_spark.kg.graph import local_clustering

    cols = ["conv_id", "turn_idx", "subj", "pred", "obj"]
    rows = [
        ("c", 0, "a", "r", "b"),
        ("c", 1, "b", "r", "c"),
        ("c", 2, "c", "r", "a"),     # reversed orientation still one edge
        ("c", 3, "c", "r", "d"),
        ("c", 4, "a", "r", "b"),     # duplicate mention, edge set unchanged
    ]
    got = {
        r["entity"]: (r["degree"], r["n_triangles"], r["clustering"])
        for r in local_clustering(spark.createDataFrame(rows, cols)).collect()
    }
    assert got["a"] == (2, 1, pytest.approx(1.0))
    assert got["b"] == (2, 1, pytest.approx(1.0))
    assert got["c"][:2] == (3, 1)
    assert got["c"][2] == pytest.approx(1 / 3)
    assert got["d"] == (1, 0, pytest.approx(0.0))


def test_shortest_paths_min_plus_semantics(spark):
    """Bounded Bellman-Ford: a cheap 2-hop path beats an expensive
    direct edge; nodes beyond k relaxation rounds are absent; seed
    dist stays 0; path confidence = exp(-dist) recovers the edge
    product."""
    import math

    from crfsuite_spark.kg.graph import shortest_paths

    edges = spark.createDataFrame(
        [
            ("s", "a", 5.0),          # expensive direct
            ("s", "b", 1.0), ("b", "a", 1.0),   # cheap 2-hop: 2.0
            ("a", "c", 1.0),          # 3 hops via b (dist 3.0)
            ("c", "far", 1.0),        # 4 hops -> absent at k=3
        ],
        ["src", "dst", "cost"],
    )
    seeds = spark.createDataFrame([("s",)], ["entity"])
    out = shortest_paths(edges, seeds, k=3)
    got = {r["entity"]: r["dist"] for r in out.collect()}
    for df in out.pinned_caches:
        df.unpersist()
    assert got["s"] == pytest.approx(0.0)
    assert got["b"] == pytest.approx(1.0)
    assert got["a"] == pytest.approx(2.0)      # not 5.0
    assert got["c"] == pytest.approx(3.0)
    # at k=3 only the 3-edge path s-a-c-far (5+1+1) fits the bound;
    # the cheaper 4-edge path s-b-a-c-far (1+1+1+1) needs round 4
    assert got["far"] == pytest.approx(7.0)
    out4 = shortest_paths(edges, seeds, k=4)
    got4 = {r["entity"]: r["dist"] for r in out4.collect()}
    for df in out4.pinned_caches:
        df.unpersist()
    assert got4["far"] == pytest.approx(4.0)
    # confidence composition: cost=-ln(conf) => exp(-dist) = prod(conf)
    conf_edges = spark.createDataFrame(
        [("s", "x", -math.log(0.5)), ("x", "y", -math.log(0.4))],
        ["src", "dst", "cost"],
    )
    out2 = shortest_paths(conf_edges, seeds, k=2)
    got2 = {r["entity"]: r["dist"] for r in out2.collect()}
    for df in out2.pinned_caches:
        df.unpersist()
    assert math.exp(-got2["y"]) == pytest.approx(0.2)


def test_k_core_unravels_pendant_chain(spark):
    """2-core of triangle + 3-link pendant chain: the chain peels one
    link per round (round 1 removes only its tip), so a single-pass
    degree filter would keep chain interior nodes — after enough
    rounds only the triangle survives, every member at degree 2."""
    from crfsuite_spark.kg.graph import k_core

    cols = ["conv_id", "turn_idx", "subj", "pred", "obj"]
    rows = [
        ("c", 0, "a", "r", "b"), ("c", 1, "b", "r", "t"),
        ("c", 2, "t", "r", "a"),                      # triangle a-b-t
        ("c", 3, "t", "r", "p1"), ("c", 4, "p1", "r", "p2"),
        ("c", 5, "p2", "r", "p3"),                    # pendant chain
    ]
    t = spark.createDataFrame(rows, cols)
    # one round: only the chain tip p3 peels; p1, p2 still in
    out1 = k_core(t, k=2, rounds=1)
    got1 = {r["entity"] for r in out1.collect()}
    for df in out1.pinned_caches:
        df.unpersist()
    assert got1 == {"a", "b", "t", "p1", "p2"}
    # enough rounds: the whole chain unravels, triangle survives at 2
    out = k_core(t, k=2, rounds=4)
    got = {r["entity"]: r["degree"] for r in out.collect()}
    for df in out.pinned_caches:
        df.unpersist()
    assert got == {"a": 2, "b": 2, "t": 2}
    # k=3 empties this graph entirely
    out3 = k_core(t, k=3, rounds=3)
    assert out3.count() == 0
    for df in out3.pinned_caches:
        df.unpersist()


def test_shortest_paths_fuzz_vs_bellman_ford(spark):
    """Randomized graphs vs a pure-Python k-round Bellman-Ford mirror
    (exact float equality: both accumulate left-to-right along each
    path, min over identical candidates)."""
    import random

    rng = random.Random(11)
    from crfsuite_spark.kg.graph import shortest_paths

    for trial in range(4):
        n = rng.randint(4, 9)
        nodes = [f"v{i}" for i in range(n)]
        edges = []
        for _ in range(rng.randint(4, 14)):
            a, b = rng.sample(nodes, 2)
            edges.append((a, b, round(rng.uniform(0.1, 5.0), 3)))
        k = rng.randint(1, 4)
        seeds = rng.sample(nodes, rng.randint(1, 2))
        # python mirror: k relaxation rounds over the full dist map
        dist = {s: 0.0 for s in seeds}
        for _ in range(k):
            nxt = dict(dist)
            for a, b, c in edges:
                if a in dist:
                    cand = dist[a] + c
                    if b not in nxt or cand < nxt[b]:
                        nxt[b] = cand
            dist = nxt
        out = shortest_paths(
            spark.createDataFrame(edges, ["src", "dst", "cost"]),
            spark.createDataFrame([(s,) for s in seeds], ["entity"]),
            k=k,
        )
        got = {r["entity"]: r["dist"] for r in out.collect()}
        for df in out.pinned_caches:
            df.unpersist()
        assert got.keys() == dist.keys(), (trial, got, dist)
        for v in dist:
            assert got[v] == pytest.approx(dist[v], abs=1e-12), (trial, v)


def test_k_core_fuzz_vs_python_peeling(spark):
    """Random graphs vs a pure-Python round-for-round peel mirror
    (fixed rounds, same degree-then-filter order)."""
    import random

    from crfsuite_spark.kg.graph import k_core

    rng = random.Random(31)
    for trial in range(3):
        n = rng.randint(5, 10)
        nodes = [f"v{i}" for i in range(n)]
        eset = set()
        for _ in range(rng.randint(4, 16)):
            a, b = rng.sample(nodes, 2)
            eset.add((min(a, b), max(a, b)))
        k = rng.randint(2, 3)
        rounds = rng.randint(1, 4)
        edges = set(eset)
        deg = {}
        for _ in range(rounds):
            deg = {}
            for a, b in edges:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
            deg = {v: d for v, d in deg.items() if d >= k}
            edges = {(a, b) for a, b in edges if a in deg and b in deg}
        rows = [("c", i, a, "r", b) for i, (a, b) in enumerate(sorted(eset))]
        out = k_core(
            spark.createDataFrame(
                rows, ["conv_id", "turn_idx", "subj", "pred", "obj"]
            ),
            k=k, rounds=rounds,
        )
        got = {r["entity"]: r["degree"] for r in out.collect()}
        for df in out.pinned_caches:
            df.unpersist()
        assert got == deg, (trial, k, rounds, got, deg)


def test_infer_entity_types_signature_voting(spark):
    """Signature votes type the surrogates: works_at's subject slot
    is all-PER among typed entities, so an unk: subject of works_at
    infers per; mixed-slot surrogates take the argmax with a
    deterministic tiebreak; typed entities never appear in output;
    recovery check on masked gold types."""
    import pytest

    from crfsuite_spark.kg.graph import infer_entity_types

    cols = ["conv_id", "turn_idx", "subj", "pred", "obj"]
    rows = [
        ("c", 0, "per:a", "works_at", "org:x"),
        ("c", 1, "per:b", "works_at", "org:y"),
        ("c", 2, "org:x", "located_in", "loc:p"),
        # surrogate appearing as works_at subject twice
        ("c", 3, "unk:mystery", "works_at", "org:x"),
        ("c", 4, "unk:mystery", "works_at", "org:y"),
        # surrogate as located_in OBJECT (loc slot)
        ("c", 5, "org:y", "located_in", "unk:somewhere"),
    ]
    got = {
        r["entity"]: r
        for r in infer_entity_types(
            spark.createDataFrame(rows, cols)
        ).collect()
    }
    assert set(got) == {"unk:mystery", "unk:somewhere"}
    m = got["unk:mystery"]
    assert m["inferred_type"] == "per"
    assert m["n_mentions"] == 2
    assert m["score"] == pytest.approx(2.0)  # share 1.0 per occurrence
    assert got["unk:somewhere"]["inferred_type"] == "loc"


def test_comention_pmi_capped_scope_consistent_universe(spark):
    """Regression (review finding): when a scope exceeds
    max_entities_per_scope, ALL counts (pair, marginal, N) must come
    from the surviving scope universe — mixing universes flipped the
    PMI sign for pairs touching a capped scope."""
    import math

    import pytest

    from crfsuite_spark.kg.graph import comention_pmi

    cols = ["conv_id", "turn_idx", "subj", "pred", "obj"]
    rows = [
        # c_big: 4 entities (exceeds cap of 3) incl. the x,y pair
        ("cbig", 0, "x", "r", "y"), ("cbig", 1, "w", "r", "v"),
        # two small scopes where x,y co-occur
        ("c1", 0, "x", "r", "y"),
        ("c2", 0, "x", "r", "y"),
        # a third small scope with unrelated entities
        ("c3", 0, "p", "r", "q"),
    ]
    got = {
        (r["entity_a"], r["entity_b"]): r
        for r in comention_pmi(
            spark.createDataFrame(rows, cols), max_entities_per_scope=3
        ).collect()
    }
    xy = got[("x", "y")]
    # surviving universe: c1, c2, c3 -> N=3, c_x=c_y=c_xy=2
    assert (xy["n_scopes"], xy["n_a"], xy["n_b"]) == (2, 2, 2)
    assert xy["pmi"] == pytest.approx(math.log(3 * 2 / 4))  # > 0
    assert xy["pmi"] > 0
    # entities seen ONLY in the capped scope contribute nothing
    assert not any("w" in k or "v" in k for k in got)
