"""KG lifecycle operators: temporal scoping, incremental edge merge,
and functional-predicate conflict resolution.

At 10^12-turn scale the triple graph is never rebuilt from scratch —
new transcript batches arrive, each batch's mentions are aggregated to
edge deltas, and the deltas fold into the standing edge table (on a
real cluster: an Iceberg MERGE over the bucketed layout that
kg/triples.py's manifest protocol mirrors). Everything here is built
around that constraint:

- edge statistics are restricted to the EXACTLY-MERGEABLE ones
  (count / min / max): ``merge(agg(A), agg(B)) == agg(A ∪ B)`` holds
  bit-for-bit, property-tested in tests/test_lifecycle.py. Distinct
  counts (n_convs) are deliberately absent from the incremental schema
  — they don't merge without carrying per-conv grain or a sketch, and
  a silently-approximate default is worse than an explicit join to
  :func:`crfsuite_spark.kg.graph.triple_support` when exact distincts
  are needed on a fresh snapshot.
- every aggregation is a partial-aggregated ``groupBy`` on the uniform
  (subj, pred[, obj]) key — a hot entity's mentions collapse map-side
  before the shuffle; no windows, no collect.

The reference stops at tag/evaluate (bnosac/crfsuite R/crf.R); the
temporal/merge/resolve layer is what a transcript KG needs beyond it.
"""

from __future__ import annotations

import json
import os
import time
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EDGE_KEY = ["subj", "pred", "obj"]


def temporal_triples(
    triples: DataFrame,
    ts_col: str = "ts",
    conv: str = "conv_id",
) -> DataFrame:
    """Collapse mention-level triples to temporally-scoped edges:
    (subj, pred, obj, n_mentions, n_convs, first_seen, last_seen).

    The valid-time convention: an edge is supported from the first
    turn that asserted it to the last. One map-side-combined groupBy on
    the edge key. This is the SNAPSHOT aggregation (exact n_convs
    included); for the incremental path use :func:`edge_deltas` +
    :func:`merge_edge_deltas`, whose schema keeps only mergeable
    statistics."""
    return triples.groupBy(*EDGE_KEY).agg(
        F.count("*").alias("n_mentions"),
        F.countDistinct(conv).alias("n_convs"),
        F.min(ts_col).alias("first_seen"),
        F.max(ts_col).alias("last_seen"),
    )


def edge_deltas(mentions: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Aggregate ONE batch of mention-level triples to the mergeable
    edge-delta schema: (subj, pred, obj, n_mentions, first_seen,
    last_seen). One partial-aggregated groupBy."""
    return mentions.groupBy(*EDGE_KEY).agg(
        F.count("*").alias("n_mentions"),
        F.min(ts_col).alias("first_seen"),
        F.max(ts_col).alias("last_seen"),
    )


def merge_edge_deltas(prev: DataFrame | None, delta: DataFrame) -> DataFrame:
    """Fold a new edge-delta batch into the standing edge table.

    Both inputs carry the :func:`edge_deltas` schema; the result does
    too, so merges chain across arbitrarily many batches. Union +
    one groupBy on the edge key — counts sum, first_seen takes the
    min, last_seen the max. All three are associative+commutative, so
    the fold is batch-order-independent and equals the from-scratch
    aggregate of the union of all mention batches (property-tested).

    ``prev=None`` (first batch) returns ``delta`` unchanged. On a real
    table this groupBy is the computational core of an Iceberg
    MERGE INTO ... ON edge-key: co-partition both sides by the edge
    key (the bucketed layout kg/triples.py writes) and the merge is
    shuffle-free."""
    if prev is None:
        return delta
    return prev.unionByName(delta).groupBy(*EDGE_KEY).agg(
        F.sum("n_mentions").alias("n_mentions"),
        F.min("first_seen").alias("first_seen"),
        F.max("last_seen").alias("last_seen"),
    )


def committed_epochs(path: str) -> list[int]:
    """Epochs with a committed manifest record, ascending."""
    mdir = os.path.join(path, "_manifest")
    if not os.path.isdir(mdir):
        return []
    out = []
    for f in os.listdir(mdir):
        if f.startswith("epoch=") and f.endswith(".json"):
            out.append(int(f[len("epoch="):-len(".json")]))
    return sorted(out)


def read_edges(spark, path: str, epoch: int | None = None) -> DataFrame | None:
    """The committed edge snapshot at ``epoch`` (default: latest);
    None when nothing has been committed yet."""
    eps = committed_epochs(path)
    if not eps:
        return None
    e = eps[-1] if epoch is None else epoch
    if e not in eps:
        raise ValueError(f"epoch {e} not committed (have {eps})")
    return spark.read.parquet(
        os.path.join(path, "snapshots", f"epoch={e}")
    ).drop("bucket")


def commit_edge_batch(
    mentions: DataFrame,
    path: str,
    epoch: int,
    ts_col: str = "ts",
    n_buckets: int = 8,
    fault_hook=None,
) -> dict:
    """Fold one transcript batch's mentions into the standing edge
    table as a crash-atomic, idempotent epoch commit — the incremental
    half of the north rule's resumable graph materialization
    (kg/triples.py carries the per-bucket protocol for the mention-level
    table; this carries the aggregated edge table).

    Copy-on-write snapshot maintenance, exactly the Iceberg commit
    model the sandbox can't run natively:

        <path>/snapshots/epoch=<e>/bucket=<k>/*.parquet
        <path>/_manifest/epoch=<e>.json   # the commit record, written LAST

    - snapshot e = ``merge_edge_deltas(snapshot e-1, edge_deltas(batch))``
      — one union + one partial-aggregated groupBy on the edge key; the
      snapshot is hash-bucketed by ``subj`` so successive merges and
      downstream entity joins co-locate (on Iceberg: a bucket-partitioned
      MERGE INTO, shuffle-free);
    - ``epoch <= last committed`` is a NO-OP (resume semantics: replaying
      an already-folded batch cannot double-count);
    - a kill at any point before the manifest rename leaves only an
      uncommitted snapshot directory, deleted and rewritten on rerun —
      fault-injected in tests/test_lifecycle.py;
    - the manifest carries per-epoch lineage metrics (edges, mentions,
      time bounds) read back from the COMMITTED files, never a second
      upstream evaluation.
    """
    import shutil

    spark = mentions.sparkSession
    eps = committed_epochs(path)
    if eps and epoch <= eps[-1]:
        return {"skipped": True, "epoch": epoch, "latest": eps[-1]}
    mdir = os.path.join(path, "_manifest")
    os.makedirs(mdir, exist_ok=True)
    snap_dir = os.path.join(path, "snapshots", f"epoch={epoch}")
    if os.path.isdir(snap_dir):  # uncommitted leftover from a crash
        shutil.rmtree(snap_dir)
    prev = read_edges(spark, path)
    merged = merge_edge_deltas(prev, edge_deltas(mentions, ts_col=ts_col))
    (
        merged.withColumn(
            "bucket",
            F.pmod(F.xxhash64(F.col("subj")), F.lit(n_buckets)).cast("int"),
        )
        .repartition("bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(snap_dir)
    )
    s = (
        spark.read.parquet(snap_dir)
        .agg(
            F.count("*").alias("n_edges"),
            F.sum("n_mentions").alias("n_mentions"),
            F.min("first_seen").alias("first_seen"),
            F.max("last_seen").alias("last_seen"),
        )
        .first()
    )
    if fault_hook is not None:
        fault_hook(epoch)
    rec = {
        "epoch": epoch,
        "committed_at": time.time(),
        "base_epoch": eps[-1] if eps else None,
        "metrics": {
            "n_edges": int(s["n_edges"]),
            "n_mentions": int(s["n_mentions"]),
            "first_seen": str(s["first_seen"]),
            "last_seen": str(s["last_seen"]),
        },
    }
    tmp = os.path.join(mdir, f".epoch={epoch}.json.tmp")
    with open(tmp, "w") as f:
        json.dump(rec, f)
    os.rename(tmp, os.path.join(mdir, f"epoch={epoch}.json"))
    return {"skipped": False, "epoch": epoch, **rec["metrics"]}


def snapshot_asof(
    mentions: DataFrame,
    as_of,
    ts_col: str = "ts",
    conv: str = "conv_id",
) -> DataFrame:
    """Graph state as of a timestamp: edges supported by at least one
    mention with ``ts <= as_of``, statistics recomputed over exactly the
    mentions visible at that time (NOT the full-history stats filtered —
    last_seen/n_mentions must not leak post-cutoff evidence).

    The cutoff is a pushdown-able comparison on the mention scan, so at
    10^12 turns a time-partitioned table prunes whole partitions before
    any aggregation; the rest is the same one map-side-combined groupBy
    as :func:`temporal_triples`."""
    return temporal_triples(
        mentions.where(F.col(ts_col) <= F.lit(as_of)), ts_col=ts_col, conv=conv
    )


def resolve_functional(
    edges: DataFrame,
    functional_preds: Sequence[str],
    support_col: str = "n_mentions",
) -> DataFrame:
    """Current-belief resolution for FUNCTIONAL predicates (at most one
    true object per subject — located_in, works_at, ...): per
    (subj, pred), the winning object by (support desc, recency desc,
    obj desc — a deterministic total order; the string tiebreak is
    arbitrary but stable).

    Input is any frame with the edge schema (n_mentions + last_seen
    present — :func:`temporal_triples` or a merged delta table).
    Output: one row per (subj, pred in functional_preds) with the full
    winning edge row. Non-functional predicates are filtered out —
    union the untouched remainder back in if a complete graph view is
    needed.

    Shape: ``max_by`` over the whole row keyed by the (n_mentions,
    last_seen, obj) struct — one partial-aggregated groupBy on the
    (subj, pred) key; struct comparison is lexicographic by field, so
    the key IS the documented priority order. No window sort: a
    row_number form would shuffle every candidate row; max_by keeps
    one winner per key per partition before the exchange.

    ``support_col`` swaps the hard mention count for any other
    support statistic — ``decayed_support`` from
    :func:`decayed_support` turns this into RECENCY-CONTINUOUS
    current belief (a fresh minority fact can out-rank a stale
    majority one; the priority order stays (support, recency, obj)).
    """
    row = F.struct(*[F.col(c) for c in edges.columns])
    key = F.struct(
        F.col(support_col).alias("support"),
        F.col("last_seen").alias("recency"),
        F.col("obj").alias("obj"),
    )
    won = (
        edges.where(F.col("pred").isin(list(functional_preds)))
        .groupBy("subj", "pred")
        .agg(F.max_by(row, key).alias("__w"))
    )
    return won.select("__w.*")


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
) -> DataFrame:
    """Edge-level diff between two graph snapshots — the
    crawl-over-crawl monitoring query (what did this ingest add,
    retract, or re-weight). Both inputs are mention-level triple
    frames; each aggregates to per-edge support first, then a single
    full outer join on the (subj, pred, obj) key classifies every
    edge:

        status = 'added'    (new only)
               | 'removed'  (old only)
               | 'retained' (both; delta = support change)

    Scale shape: two partial-aggregated groupBys on the uniform edge
    key collapse mention multiplicity map-side, so the join sees edge
    cardinality, not mention cardinality; the outer join shuffles on
    the SAME key the aggregations just partitioned by, so AQE reuses
    the partitioning. Output: (subj, pred, obj, n_old, n_new, status,
    delta).
    """
    def support(df, name):
        return df.groupBy(
            F.col(subj).alias("subj"),
            F.col(pred).alias("pred"),
            F.col(obj).alias("obj"),
        ).agg(F.count(F.lit(1)).cast("bigint").alias(name))

    o = support(old, "n_old")
    n = support(new, "n_new")
    j = o.join(n, ["subj", "pred", "obj"], "full_outer")
    n_old = F.coalesce(F.col("n_old"), F.lit(0)).cast("bigint")
    n_new = F.coalesce(F.col("n_new"), F.lit(0)).cast("bigint")
    return j.select(
        "subj", "pred", "obj",
        n_old.alias("n_old"),
        n_new.alias("n_new"),
        F.when(n_old == 0, F.lit("added"))
        .when(n_new == 0, F.lit("removed"))
        .otherwise(F.lit("retained"))
        .alias("status"),
        (n_new - n_old).alias("delta"),
    )


def temporal_conflicts(
    triples: DataFrame,
    functional_preds: Sequence[str],
    ts_col: str = "ts",
) -> DataFrame:
    """Temporal-validity conflict detection for FUNCTIONAL predicates:
    pairs of DIFFERENT objects for the same (subj, pred) whose
    observed validity intervals [first_seen, last_seen] OVERLAP.

    :func:`resolve_functional` picks a single current belief;
    ``kg/validate.py`` reports that two objects exist at all. This
    sits between them: two objects are fine if their support is
    temporally disjoint (Alice worked at Acme, THEN at Globex — a
    valid history), but overlapping intervals mean the transcripts
    assert contradictory facts for the same wall-clock period, which
    no resolution policy can paper over — that's an upstream
    extraction or linking error to triage.

    Output, one row per conflicting unordered object pair
    (canonical order ``obj_a < obj_b``):
    (subj, pred, obj_a, obj_b, a_support, b_support,
    a_first, a_last, b_first, b_last, overlap_from, overlap_to)
    where overlap_from/to = the intersection of the two intervals.

    Scale shape: one partial-aggregated groupBy on the edge key
    collapses mention multiplicity map-side FIRST, so the self-join
    sees edge cardinality (distinct objects per subject — small by
    the functional assumption), never mention cardinality; the join
    key (subj, pred) is the key the aggregation just partitioned by,
    so AQE reuses the exchange. The ``obj_a < obj_b`` predicate halves
    the pair space and makes the report deterministic.
    """
    edges = (
        triples.where(F.col("pred").isin(list(functional_preds)))
        .groupBy(*EDGE_KEY)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("support"),
            F.min(ts_col).alias("first_seen"),
            F.max(ts_col).alias("last_seen"),
        )
    )
    a = edges.alias("a")
    b = edges.alias("b")
    return (
        a.join(
            b,
            on=[
                F.col("a.subj") == F.col("b.subj"),
                F.col("a.pred") == F.col("b.pred"),
                F.col("a.obj") < F.col("b.obj"),
                F.col("a.first_seen") <= F.col("b.last_seen"),
                F.col("b.first_seen") <= F.col("a.last_seen"),
            ],
        )
        .select(
            F.col("a.subj").alias("subj"),
            F.col("a.pred").alias("pred"),
            F.col("a.obj").alias("obj_a"),
            F.col("b.obj").alias("obj_b"),
            F.col("a.support").alias("a_support"),
            F.col("b.support").alias("b_support"),
            F.col("a.first_seen").alias("a_first"),
            F.col("a.last_seen").alias("a_last"),
            F.col("b.first_seen").alias("b_first"),
            F.col("b.last_seen").alias("b_last"),
            F.greatest(F.col("a.first_seen"), F.col("b.first_seen")).alias(
                "overlap_from"
            ),
            F.least(F.col("a.last_seen"), F.col("b.last_seen")).alias(
                "overlap_to"
            ),
        )
    )


def decayed_support(
    triples: DataFrame,
    as_of,
    half_life_days: float = 30.0,
    ts_col: str = "ts",
) -> DataFrame:
    """Recency-decayed edge support: each mention contributes
    ``2^(-age/half_life)`` (age measured back from ``as_of``), summed
    per edge — the standard exponential-decay freshness score that
    makes "current belief" ranking continuous instead of the hard
    (support, recency) lexicographic order
    :func:`resolve_functional` uses. A fact asserted 50× last year
    can lose to one asserted 5× this week, with ``half_life_days``
    the explicit trade dial.

    Mentions AFTER the cutoff are excluded (same no-leakage contract
    as :func:`snapshot_asof` — the comparison pushes down to the
    mention scan and prunes time partitions). Output: (subj, pred,
    obj, n_mentions, last_seen, decayed_support).

    Scale shape: the decay weight is a pure Column expression on the
    scan side, and the sum is the same ONE map-side-combined groupBy
    on the edge key as every lifecycle aggregate — decay never forces
    a second pass, because ``sum(2^(-(T-t)/h))`` is associative like
    any sum. (The alternative event-sourcing trick — accumulate
    ``2^(t/h)`` unanchored and normalize by ``2^(T/h)`` at read time —
    lets a STANDING table be maintained incrementally and re-anchored
    to any T without rescanning; at transcript time spans the
    unanchored exponent stays well inside double range, but we keep
    the anchored form here for readability since the cutoff rescan is
    partition-pruned anyway.)"""
    age_days = (
        F.unix_timestamp(F.lit(as_of).cast("timestamp"))
        - F.unix_timestamp(F.col(ts_col))
    ) / F.lit(86400.0)
    w = F.pow(F.lit(2.0), -age_days / F.lit(float(half_life_days)))
    return (
        triples.where(F.col(ts_col) <= F.lit(as_of).cast("timestamp"))
        .groupBy(*EDGE_KEY)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_mentions"),
            F.max(ts_col).alias("last_seen"),
            F.sum(w).alias("decayed_support"),
        )
    )


def entity_timeline(
    triples: DataFrame,
    ts_col: str = "ts",
    conv: str = "conv_id",
    granularity: str = "month",
) -> DataFrame:
    """Per-entity activity timeline: (entity, period, n_mentions,
    n_convs, n_as_subj) at calendar granularity (``month`` default,
    any ``date_trunc`` unit) — the temporal profile behind entity
    lifecycle triage: emergence (first period), dormancy (gaps),
    burst detection (period-over-period ratios are one lag window on
    THIS aggregate, period-cardinality, not mention-cardinality).

    An entity is active in a period if it appears in either slot;
    subject/object roles are tracked via ``n_as_subj``.

    Scale shape: the unpivot is a scan-side union (no shuffle), the
    aggregate ONE map-side-combined groupBy on the uniform (entity,
    period) key; ``date_trunc`` on a time-partitioned table prunes at
    the scan. Output cardinality is entities × active periods — the
    downstream-joinable summary, 10^6× smaller than the mention
    stream."""
    u = triples.select(
        F.col("subj").alias("entity"),
        F.date_trunc(granularity, F.col(ts_col)).alias("period"),
        F.col(conv).alias("__conv"),
        F.lit(1).alias("__is_subj"),
    ).unionByName(
        triples.select(
            F.col("obj").alias("entity"),
            F.date_trunc(granularity, F.col(ts_col)).alias("period"),
            F.col(conv).alias("__conv"),
            F.lit(0).alias("__is_subj"),
        )
    )
    return u.groupBy("entity", "period").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_mentions"),
        F.countDistinct("__conv").alias("n_convs"),
        F.sum("__is_subj").cast("bigint").alias("n_as_subj"),
    )


def entity_bursts(
    timeline: DataFrame,
    ratio: float = 3.0,
    min_mentions: int = 5,
) -> DataFrame:
    """Burst detection over the :func:`entity_timeline` aggregate:
    periods where an entity's mention count jumps ≥ ``ratio``× its
    previous ACTIVE period (first active period compares against 0
    and bursts iff it clears ``min_mentions``) — the emergence /
    news-spike signal KG triage ranks review queues by.

    Output: timeline columns + (prev_period, prev_mentions, burst_ratio,
    is_burst). ``burst_ratio`` is NULL for an entity's first period.

    Scale note: this is a window over the TIMELINE aggregate —
    entity × active-period cardinality, ~10^6× smaller than the
    mention stream — partitioned on the uniform entity key; the
    window-shuffles-everything concern that bans windows on mention
    streams doesn't apply to period-grain summaries. min_mentions
    prunes the long tail BEFORE the ratio flag so a 1→3 blip never
    pages anyone."""
    from pyspark.sql import Window

    w = Window.partitionBy("entity").orderBy("period")
    prev_n = F.lag("n_mentions").over(w)
    r = F.col("n_mentions") / prev_n
    return timeline.select(
        "*",
        F.lag("period").over(w).alias("prev_period"),
        prev_n.alias("prev_mentions"),
        r.alias("burst_ratio"),
        (
            (F.col("n_mentions") >= F.lit(min_mentions))
            & (prev_n.isNull() | (r >= F.lit(float(ratio))))
        ).alias("is_burst"),
    )
