"""KG lifecycle operators: temporal scoping, incremental edge merge,
functional-predicate resolution (crfsuite_spark/kg/lifecycle.py).

The load-bearing property: ``merge(agg(A), agg(B)) == agg(A ∪ B)``
bit-for-bit for ANY split of the mention stream into batches and ANY
fold order — the invariant that lets a standing 10^12-edge table absorb
new transcript batches without recomputation. Plus plan-shape checks:
each aggregation partial-aggregates (map-side combine before the
exchange) and resolve_functional never introduces a window sort.
"""

import datetime
import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from crfsuite_spark.kg.lifecycle import (
    edge_deltas,
    merge_edge_deltas,
    resolve_functional,
    temporal_triples,
)


def _pdf(df):
    out = df.toPandas()
    return (
        out[sorted(out.columns)]
        .sort_values(sorted(out.columns))
        .reset_index(drop=True)
    )


@pytest.fixture(scope="module")
def mentions(spark):
    """Mention-level triples with timestamps: deliberately includes
    duplicate edges across convs/turns and a functional-predicate
    conflict (alice located_in two cities with different support)."""
    rng = random.Random(7)
    subjects = ["alice", "bob", "carol", "dave"]
    preds = ["located_in", "works_at", "mentions"]
    objects = ["paris", "tokyo", "acme", "globex", "report"]
    rows = []
    base = datetime.datetime(2024, 1, 1)
    for i in range(400):
        rows.append(
            (
                f"conv{rng.randrange(20)}",
                rng.randrange(12),
                rng.choice(subjects),
                rng.choice(preds),
                rng.choice(objects),
                base + datetime.timedelta(minutes=rng.randrange(100000)),
            )
        )
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, subj string, pred string, obj string, ts timestamp"
    )


def test_temporal_triples_matches_pandas(spark, mentions):
    got = _pdf(temporal_triples(mentions))
    pdf = mentions.toPandas()
    exp = (
        pdf.groupby(["subj", "pred", "obj"])
        .agg(
            n_mentions=("ts", "size"),
            n_convs=("conv_id", "nunique"),
            first_seen=("ts", "min"),
            last_seen=("ts", "max"),
        )
        .reset_index()
    )
    exp = exp[sorted(exp.columns)].sort_values(sorted(exp.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_merge_equals_from_scratch_any_split(spark, mentions):
    """merge(agg(A), agg(B), agg(C)) == agg(A ∪ B ∪ C) bit-for-bit for
    a random 3-way split, both fold orders."""
    full = _pdf(edge_deltas(mentions))
    splits = [
        mentions.where(F.crc32(F.concat_ws("|", "conv_id", "turn_idx")) % 3 == i)
        for i in range(3)
    ]
    deltas = [edge_deltas(s) for s in splits]
    folded = None
    for d in deltas:
        folded = merge_edge_deltas(folded, d)
    pd.testing.assert_frame_equal(_pdf(folded), full, check_dtype=False)
    # reverse fold order — associative+commutative stats are order-free
    folded_rev = None
    for d in reversed(deltas):
        folded_rev = merge_edge_deltas(folded_rev, d)
    pd.testing.assert_frame_equal(_pdf(folded_rev), full, check_dtype=False)


def test_merge_first_batch_is_identity(spark, mentions):
    d = edge_deltas(mentions)
    assert merge_edge_deltas(None, d) is d


def test_resolve_functional_winner_and_determinism(spark, mentions):
    edges = temporal_triples(mentions)
    got = _pdf(resolve_functional(edges, ["located_in", "works_at"]))
    # one winner per (subj, pred); only functional preds survive
    assert set(got["pred"]) <= {"located_in", "works_at"}
    assert not got.duplicated(["subj", "pred"]).any()
    # winner = max by (n_mentions, last_seen, obj) — recompute in pandas
    pdf = _pdf(edges)
    pdf = pdf[pdf["pred"].isin(["located_in", "works_at"])]
    exp = (
        pdf.sort_values(
            ["n_mentions", "last_seen", "obj"], ascending=False, kind="mergesort"
        )
        .drop_duplicates(["subj", "pred"])
    )
    exp = exp[sorted(exp.columns)].sort_values(sorted(exp.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # repartition invariance: same winners from a different physical layout
    got2 = _pdf(resolve_functional(temporal_triples(mentions.repartition(13)), ["located_in", "works_at"]))
    pd.testing.assert_frame_equal(got2, exp, check_dtype=False)


def test_snapshot_asof_no_post_cutoff_leakage(spark, mentions):
    from crfsuite_spark.kg.lifecycle import snapshot_asof

    cutoff = datetime.datetime(2024, 2, 1)
    snap = _pdf(snapshot_asof(mentions, cutoff))
    assert (snap["last_seen"] <= cutoff).all()
    # identical to aggregating only the visible mentions
    exp = _pdf(temporal_triples(mentions.where(F.col("ts") <= F.lit(cutoff))))
    pd.testing.assert_frame_equal(snap, exp, check_dtype=False)
    # and NOT the full-history stats filtered: an edge alive across the
    # cutoff must show a smaller/equal mention count in the snapshot
    full = _pdf(temporal_triples(mentions)).set_index(["subj", "pred", "obj"])
    snap_i = snap.set_index(["subj", "pred", "obj"])
    assert (snap_i["n_mentions"] <= full.loc[snap_i.index]["n_mentions"]).all()


def test_commit_edge_batch_incremental_and_crash_safe(spark, mentions, tmp_path):
    """Three epoch commits equal the from-scratch aggregate; a crash
    before the manifest rename leaves no committed state and the rerun
    converges to the identical table; replaying a folded epoch is a
    no-op."""
    from crfsuite_spark.kg.lifecycle import (
        commit_edge_batch,
        committed_epochs,
        read_edges,
    )

    path = str(tmp_path / "edges")
    batches = [
        mentions.where(F.crc32(F.concat_ws("|", "conv_id", "turn_idx")) % 3 == i)
        for i in range(3)
    ]
    commit_edge_batch(batches[0], path, epoch=0)
    commit_edge_batch(batches[1], path, epoch=1)

    # crash: kill just before the epoch-2 manifest write
    class Boom(RuntimeError):
        pass

    def bomb(epoch):
        raise Boom()

    with pytest.raises(Boom):
        commit_edge_batch(batches[2], path, epoch=2, fault_hook=bomb)
    assert committed_epochs(path) == [0, 1]  # nothing committed
    # replaying epoch 1 after the crash: no-op, no double count
    assert commit_edge_batch(batches[1], path, epoch=1)["skipped"]
    # rerun epoch 2 cleanly
    rep = commit_edge_batch(batches[2], path, epoch=2)
    assert not rep["skipped"] and committed_epochs(path) == [0, 1, 2]

    got = _pdf(read_edges(spark, path).drop("bucket"))
    full = _pdf(edge_deltas(mentions))
    pd.testing.assert_frame_equal(got, full, check_dtype=False)
    # time-travel: epoch-0 snapshot is exactly batch 0's aggregate
    got0 = _pdf(read_edges(spark, path, epoch=0).drop("bucket"))
    pd.testing.assert_frame_equal(got0, _pdf(edge_deltas(batches[0])), check_dtype=False)


def test_lifecycle_plans_partial_aggregate_no_window(spark, mentions):
    """Scale contract: every lifecycle aggregation shows two-phase
    HashAggregate (partial_ before the exchange) and resolve_functional
    never plans a Window sort."""
    edges = temporal_triples(mentions)
    for df in (edges, edge_deltas(mentions),
               merge_edge_deltas(edge_deltas(mentions), edge_deltas(mentions)),
               resolve_functional(edges, ["located_in"])):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "partial_" in plan or "partial" in plan.lower(), plan
        assert "Window" not in plan, plan


def test_snapshot_diff_statuses_and_support(spark):
    from crfsuite_spark.kg.lifecycle import snapshot_diff

    cols = ["conv_id", "turn_idx", "subj", "pred", "obj"]
    old = spark.createDataFrame([
        ("c1", 1, "a", "knows", "b"),
        ("c1", 2, "a", "knows", "b"),   # support 2 in old
        ("c2", 1, "b", "knows", "c"),   # removed in new
    ], cols)
    new = spark.createDataFrame([
        ("c3", 1, "a", "knows", "b"),   # support drops 2 -> 1
        ("c3", 2, "c", "knows", "d"),   # added
    ], cols)
    got = {(r["subj"], r["pred"], r["obj"]):
           (r["n_old"], r["n_new"], r["status"], r["delta"])
           for r in snapshot_diff(old, new).collect()}
    assert got[("a", "knows", "b")] == (2, 1, "retained", -1)
    assert got[("b", "knows", "c")] == (1, 0, "removed", -1)
    assert got[("c", "knows", "d")] == (0, 1, "added", 1)
    assert len(got) == 3


def test_temporal_conflicts_overlap_semantics(spark):
    """Conflicts fire ONLY for overlapping intervals of different
    objects under a functional predicate; a disjoint succession
    (valid history) and non-functional predicates never flag."""
    from crfsuite_spark.kg.lifecycle import temporal_conflicts

    d = datetime.datetime
    cols = ["subj", "pred", "obj", "ts"]
    rows = [
        # overlapping contradiction: acme [Jan, Mar], globex [Feb, Apr]
        ("per:a", "works_at", "org:acme", d(2025, 1, 1)),
        ("per:a", "works_at", "org:acme", d(2025, 3, 1)),
        ("per:a", "works_at", "org:globex", d(2025, 2, 1)),
        ("per:a", "works_at", "org:globex", d(2025, 4, 1)),
        # disjoint succession: hooli [Jan, Feb] then initech [Mar, Apr]
        ("per:b", "works_at", "org:hooli", d(2025, 1, 1)),
        ("per:b", "works_at", "org:hooli", d(2025, 2, 1)),
        ("per:b", "works_at", "org:initech", d(2025, 3, 1)),
        ("per:b", "works_at", "org:initech", d(2025, 4, 1)),
        # non-functional predicate: overlap is fine, must not flag
        ("per:a", "visited", "loc:paris", d(2025, 1, 1)),
        ("per:a", "visited", "loc:rome", d(2025, 1, 15)),
    ]
    got = temporal_conflicts(
        spark.createDataFrame(rows, cols), ["works_at"]
    ).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["subj"], r["pred"]) == ("per:a", "works_at")
    assert (r["obj_a"], r["obj_b"]) == ("org:acme", "org:globex")
    assert (r["a_support"], r["b_support"]) == (2, 2)
    # intersection of [Jan1,Mar1] and [Feb1,Apr1] is [Feb1,Mar1]
    assert r["overlap_from"] == d(2025, 2, 1)
    assert r["overlap_to"] == d(2025, 3, 1)
    # touching endpoints count as overlap (closed intervals)
    touch = [
        ("per:c", "works_at", "org:x", d(2025, 1, 1)),
        ("per:c", "works_at", "org:y", d(2025, 1, 1)),
    ]
    got2 = temporal_conflicts(
        spark.createDataFrame(touch, cols), ["works_at"]
    ).collect()
    assert len(got2) == 1 and got2[0]["overlap_from"] == got2[0]["overlap_to"]


def test_temporal_conflicts_plan_shape(spark):
    """Edge aggregation is partial (map-side combined) and the overlap
    report never plans a Window sort."""
    from crfsuite_spark.kg.lifecycle import temporal_conflicts

    d = datetime.datetime
    df = spark.createDataFrame(
        [("per:a", "works_at", "org:acme", d(2025, 1, 1))],
        ["subj", "pred", "obj", "ts"],
    )
    plan = (
        temporal_conflicts(df, ["works_at"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "partial" in plan.lower(), plan
    assert "Window" not in plan, plan


def test_decayed_support_half_life_arithmetic(spark):
    """Exact 2^(-age/half_life) sums, cutoff exclusion (no post-as_of
    leakage into weight OR last_seen), and the recency contract: a
    fresh minority fact out-scores a stale majority one."""
    from crfsuite_spark.kg.lifecycle import decayed_support

    d = datetime.datetime
    cols = ["subj", "pred", "obj", "ts"]
    as_of = d(2025, 8, 1)
    rows = [
        # stale: 3 mentions exactly 60 days old -> 3 * 2^-2 = 0.75
        *[("per:a", "works_at", "org:old", d(2025, 6, 2))] * 3,
        # fresh: 1 mention exactly 0 days old -> 2^0 = 1.0
        ("per:a", "works_at", "org:new", d(2025, 8, 1)),
        # post-cutoff mention must not count at all
        ("per:a", "works_at", "org:new", d(2025, 9, 1)),
    ]
    got = {
        r["obj"]: r
        for r in decayed_support(
            spark.createDataFrame(rows, cols), as_of, half_life_days=30.0
        ).collect()
    }
    assert got["org:old"]["n_mentions"] == 3
    assert got["org:old"]["decayed_support"] == pytest.approx(0.75)
    assert got["org:new"]["n_mentions"] == 1
    assert got["org:new"]["decayed_support"] == pytest.approx(1.0)
    assert got["org:new"]["last_seen"] == as_of  # Sep 1 excluded
    # continuous current-belief: fresh single beats stale triple
    assert (got["org:new"]["decayed_support"]
            > got["org:old"]["decayed_support"])


def test_entity_timeline_periods_and_roles(spark):
    """Monthly activity: role unpivot counts both slots, n_as_subj
    tracks the subject role, periods split on calendar month, conv
    distinct-count is per (entity, period)."""
    from crfsuite_spark.kg.lifecycle import entity_timeline

    d = datetime.datetime
    cols = ["conv_id", "subj", "pred", "obj", "ts"]
    rows = [
        ("c1", "a", "r", "b", d(2025, 1, 10)),
        ("c2", "a", "r", "c", d(2025, 1, 20)),
        ("c2", "b", "r", "a", d(2025, 2, 5)),
    ]
    got = {
        (r["entity"], r["period"].month): (
            r["n_mentions"], r["n_convs"], r["n_as_subj"])
        for r in entity_timeline(spark.createDataFrame(rows, cols)).collect()
    }
    # Jan: a subj twice (c1, c2); Feb: a obj once (c2)
    assert got[("a", 1)] == (2, 2, 2)
    assert got[("a", 2)] == (1, 1, 0)
    assert got[("b", 1)] == (1, 1, 0)   # obj in Jan
    assert got[("b", 2)] == (1, 1, 1)   # subj in Feb
    assert got[("c", 1)] == (1, 1, 0)
    assert len(got) == 5


def test_entity_bursts_flags_and_ratio(spark):
    """First active period bursts iff it clears min_mentions; later
    periods need ratio x over the previous ACTIVE period; quiet
    entities never flag."""
    from crfsuite_spark.kg.lifecycle import entity_bursts

    d = datetime.datetime
    tl = spark.createDataFrame(
        [
            # spiky: 1 -> 6 (x6 burst), 6 -> 7 (no)
            ("spiky", d(2025, 1, 1), 1, 1, 1),
            ("spiky", d(2025, 2, 1), 6, 3, 4),
            ("spiky", d(2025, 3, 1), 7, 3, 4),
            # newcomer: first period already large -> burst
            ("new", d(2025, 2, 1), 9, 5, 5),
            # quiet: never clears min_mentions
            ("quiet", d(2025, 1, 1), 1, 1, 1),
            ("quiet", d(2025, 2, 1), 4, 2, 2),
        ],
        ["entity", "period", "n_mentions", "n_convs", "n_as_subj"],
    )
    got = {
        (r["entity"], r["period"].month): r
        for r in entity_bursts(tl, ratio=3.0, min_mentions=5).collect()
    }
    assert got[("spiky", 1)]["is_burst"] is False     # below min_mentions
    s2 = got[("spiky", 2)]
    assert s2["is_burst"] is True
    assert s2["burst_ratio"] == pytest.approx(6.0)
    assert s2["prev_mentions"] == 1
    assert s2["prev_period"] == d(2025, 1, 1)
    assert got[("spiky", 3)]["is_burst"] is False     # 7/6 < 3
    n = got[("new", 2)]
    assert n["is_burst"] is True and n["prev_mentions"] is None
    assert got[("quiet", 2)]["is_burst"] is False     # 4 < min_mentions


def test_resolve_functional_decayed_support_col(spark):
    """support_col='decayed_support' flips the winner when a fresh
    minority fact out-weighs a stale majority one — while the default
    n_mentions ranking keeps the stale winner."""
    from crfsuite_spark.kg.lifecycle import decayed_support, resolve_functional

    d = datetime.datetime
    cols = ["subj", "pred", "obj", "ts"]
    rows = [
        *[("per:a", "works_at", "org:old", d(2025, 4, 1))] * 3,  # 122d old
        ("per:a", "works_at", "org:new", d(2025, 7, 31)),        # 1d old
    ]
    edges = decayed_support(
        spark.createDataFrame(rows, cols), d(2025, 8, 1), half_life_days=30.0
    )
    by_decay = resolve_functional(
        edges, ["works_at"], support_col="decayed_support"
    ).collect()
    assert len(by_decay) == 1 and by_decay[0]["obj"] == "org:new"
    by_count = resolve_functional(edges, ["works_at"]).collect()
    assert by_count[0]["obj"] == "org:old"


def test_temporal_conflicts_fuzz_vs_brute_force(spark):
    """Randomized mention streams vs a brute-force interval-overlap
    mirror over every (subj, pred, obj-pair)."""
    import itertools
    import random

    from crfsuite_spark.kg.lifecycle import temporal_conflicts

    rng = random.Random(23)
    d0 = datetime.datetime(2025, 1, 1)
    for trial in range(3):
        rows = []
        for _ in range(rng.randint(10, 40)):
            rows.append((
                f"s{rng.randint(0, 3)}",
                rng.choice(["works_at", "located_in", "visited"]),
                f"o{rng.randint(0, 4)}",
                d0 + datetime.timedelta(days=rng.randint(0, 90)),
            ))
        funcs = ["works_at", "located_in"]
        # brute force
        from collections import defaultdict
        iv = defaultdict(lambda: [None, None, 0])
        for s, p, o, ts in rows:
            if p not in funcs:
                continue
            k = (s, p, o)
            lo, hi, n = iv[k]
            iv[k] = [ts if lo is None or ts < lo else lo,
                     ts if hi is None or ts > hi else hi, n + 1]
        exp = set()
        for (s1, p1, o1), (s2, p2, o2) in itertools.combinations(iv, 2):
            if s1 == s2 and p1 == p2 and o1 != o2:
                a, b = sorted([(o1, iv[(s1, p1, o1)]), (o2, iv[(s2, p2, o2)])])
                if a[1][0] <= b[1][1] and b[1][0] <= a[1][1]:
                    exp.add((s1, p1, a[0], b[0]))
        got = {
            (r["subj"], r["pred"], r["obj_a"], r["obj_b"])
            for r in temporal_conflicts(
                spark.createDataFrame(rows, ["subj", "pred", "obj", "ts"]),
                funcs,
            ).collect()
        }
        assert got == exp, (trial, got ^ exp)
