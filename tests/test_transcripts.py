"""Transcript-operator tests added round 5 (conv_entity_overlap)."""

import pytest


def test_conv_entity_overlap_jaccard_and_hot_guard(spark):
    """Jaccard arithmetic on known sets; hot-entity guard removes the
    ubiquitous entity from candidate generation AND set sizes, so
    pairs sharing only it are missed (documented loss)."""
    from crfsuite_spark.operators.transcripts import conv_entity_overlap

    cols = ["conv_id", "canonical_id", "turn_idx"]
    rows = [
        # c1 {x, y, hub}, c2 {x, y, hub}, c3 {z, hub}
        ("c1", "x", 0), ("c1", "y", 1), ("c1", "hub", 2),
        ("c2", "x", 0), ("c2", "y", 1), ("c2", "hub", 2),
        ("c2", "x", 3),                     # dup mention, set unchanged
        ("c3", "z", 0), ("c3", "hub", 1),
    ]
    m = spark.createDataFrame(rows, cols)
    # no guard: hub counts; c1-c2 jaccard 3/3, c1-c3 & c2-c3 share hub 1/4
    got = {
        (r["conv_a"], r["conv_b"]): r
        for r in conv_entity_overlap(
            m, min_jaccard=0.0, max_entity_convs=None
        ).collect()
    }
    assert got[("c1", "c2")]["jaccard"] == pytest.approx(1.0)
    assert got[("c1", "c3")]["n_shared"] == 1
    assert got[("c1", "c3")]["jaccard"] == pytest.approx(1 / 4)
    # guard at <=2 convs drops hub (3 convs): c3 pairs disappear,
    # c1-c2 now {x,y} vs {x,y} -> 1.0 with n=2
    got2 = {
        (r["conv_a"], r["conv_b"]): r
        for r in conv_entity_overlap(
            m, min_jaccard=0.0, max_entity_convs=2
        ).collect()
    }
    assert set(got2) == {("c1", "c2")}
    assert got2[("c1", "c2")]["n_a"] == 2
    assert got2[("c1", "c2")]["jaccard"] == pytest.approx(1.0)


def test_topic_segments_boundaries(spark):
    """First mention turn is always a boundary; same entities continue
    the segment; a disjoint entity set opens a new one; partial
    overlap above the threshold continues."""
    from crfsuite_spark.operators.transcripts import topic_segments

    cols = ["conv_id", "canonical_id", "turn_idx"]
    rows = [
        ("c1", "a", 0), ("c1", "b", 0),       # {a,b}
        ("c1", "a", 2), ("c1", "b", 2),       # same -> continue (j=1)
        ("c1", "b", 4), ("c1", "c", 4),       # j=1/3 -> continue at 0.2
        ("c1", "x", 6), ("c1", "y", 6),       # disjoint -> boundary
    ]
    got = {
        r["turn_idx"]: r
        for r in topic_segments(
            spark.createDataFrame(rows, cols), jaccard_threshold=0.2
        ).collect()
    }
    assert got[0]["is_boundary"] is True and got[0]["segment"] == 1
    assert got[0]["jaccard_prev"] is None
    assert got[2]["is_boundary"] is False and got[2]["segment"] == 1
    assert got[2]["jaccard_prev"] == 1.0
    assert got[4]["is_boundary"] is False     # 1/3 >= 0.2
    assert got[6]["is_boundary"] is True and got[6]["segment"] == 2
    assert got[6]["jaccard_prev"] == 0.0


def test_topic_segments_null_entities_carry_no_signal(spark):
    """Regression (review finding): a turn whose mentions all failed
    linking (NULL canonical_id) must not force a topic boundary —
    identical entity sets around it stay in one segment."""
    from crfsuite_spark.operators.transcripts import topic_segments

    cols = ["conv_id", "canonical_id", "turn_idx"]
    rows = [
        ("c1", "a", 0), ("c1", "b", 0),
        ("c1", None, 1),                  # unlinked-only turn
        ("c1", "a", 2), ("c1", "b", 2),
    ]
    got = {
        r["turn_idx"]: r
        for r in topic_segments(
            spark.createDataFrame(rows, cols), jaccard_threshold=0.2
        ).collect()
    }
    assert set(got) == {0, 2}            # NULL-only turn emits no row
    assert got[2]["jaccard_prev"] == 1.0
    assert got[2]["is_boundary"] is False
    assert got[0]["segment"] == got[2]["segment"] == 1
