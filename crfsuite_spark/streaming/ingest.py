"""Structured Streaming ingest for the KG pipeline.

The reference is batch-only (SURVEY.md §2.11) — this is the Spark-first
extension for continuously arriving transcripts:

- ``stream_transcripts``: file-source stream over a transcript
  directory (the stand-in for a Kafka/Iceberg CDC source), with a
  watermark on ``ts`` for late-turn tolerance;
- ``streaming_turn_stats``: watermarked sliding-window aggregation of
  turn volume per conversation (the monitoring side-channel);
- ``stream_triples``: ``foreachBatch`` incremental KG extraction —
  each micro-batch runs the SAME batch pipeline (decode → spans →
  link → triples) and commits through the manifest-based materializer,
  so stream restarts are idempotent per (bucket, epoch) exactly like
  batch resume. State lives in the checkpoint dir; reprocessed
  micro-batches skip completed buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def stream_transcripts(
    spark: SparkSession, path: str, max_files_per_trigger: int = 4
) -> DataFrame:
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def streaming_turn_stats(
    transcripts: DataFrame,
    watermark: str = "10 minutes",
    window: str = "5 minutes",
) -> DataFrame:
    """Watermarked tumbling-window turn counts per conversation."""
    return (
        transcripts.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(F.length("text")).alias("n_chars"),
        )
        .select("win.start", "win.end", "conv_id", "n_turns", "n_chars")
    )


def stream_triples(
    transcripts: DataFrame,
    model,
    alias_dict: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    n_buckets: int = 16,
    trigger_available_now: bool = True,
):
    """foreachBatch incremental KG extraction with idempotent commits.

    Returns the started StreamingQuery; caller awaits termination.
    """
    from crfsuite_spark.kg.pipeline import run_pipeline
    from crfsuite_spark.kg.triples import materialize

    def process_batch(batch_df: DataFrame, epoch_id: int):
        if batch_df.isEmpty():
            return
        # run_pipeline takes the fused zero-shuffle extraction path
        # (decode/fused.py emit='relations'), so each micro-batch is
        # one Arrow pass + tiny linking — parity-tested vs the staged
        # chain, and the batch/stream equality test covers it here
        triples = run_pipeline(batch_df, model, alias_dict)
        # bucket manifests are per-epoch subdirs: a replayed epoch is a no-op
        materialize(
            triples, f"{out_path}/epoch={epoch_id}",
            n_buckets=n_buckets, epoch=epoch_id,
        )

    writer = (
        transcripts.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_edge_table(
    transcripts: DataFrame,
    model,
    alias_dict: DataFrame,
    edge_path: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """foreachBatch incremental EDGE-TABLE maintenance: each micro-batch
    runs decode → spans → link → triples, then folds the batch's
    mentions into the standing edge table as one crash-atomic epoch
    commit (kg/lifecycle.py commit_edge_batch, epoch = the stream's
    monotonically-increasing batch id).

    The two idempotence layers compose: Structured Streaming replays a
    micro-batch after a crash with the SAME epoch_id, and
    commit_edge_batch treats ``epoch <= last committed`` as a no-op —
    so a restart can never double-count a batch's mentions, and the
    edge table always equals the one-pass aggregate over every
    transcript ever streamed (asserted in test_streaming.py)."""
    from crfsuite_spark.kg.lifecycle import commit_edge_batch
    from crfsuite_spark.kg.pipeline import run_pipeline

    def process_batch(batch_df: DataFrame, epoch_id: int):
        if batch_df.isEmpty():
            return
        triples = run_pipeline(batch_df, model, alias_dict)
        mentions = triples.join(
            batch_df.select("conv_id", "turn_idx", "ts"),
            ["conv_id", "turn_idx"],
        )
        commit_edge_batch(mentions, edge_path, epoch=epoch_id)

    writer = (
        transcripts.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_inferred_closure(
    transcripts: DataFrame,
    model,
    alias_dict: DataFrame,
    rules,
    closure_path: str,
    checkpoint_dir: str,
    max_rounds: int = 3,
    trigger_available_now: bool = True,
):
    """foreachBatch incremental DEDUCTIVE-CLOSURE maintenance: each
    micro-batch extracts triples through the fused pipeline, then
    ``kg/rules.py:infer_increment`` derives only the consequences the
    batch enables against the standing closure — per-batch cost scales
    with the batch's consequences, never with the accumulated graph
    (the semi-naive invariant, property-tested in test_rules.py).

    Layout: one parquet dir per epoch under ``closure_path`` holding
    the batch's strictly-new facts (extraction facts round=0, derived
    facts round ≥ 1). A replayed micro-batch overwrites its own epoch
    dir with identical content (the extraction and the draw-free
    inference are deterministic), so restarts are idempotent; the
    standing closure is simply the union of epoch dirs.
    """
    import os

    from crfsuite_spark.kg.pipeline import run_pipeline
    from crfsuite_spark.kg.rules import infer, infer_increment

    def read_closure(spark: SparkSession, epoch_id: int):
        # a replayed epoch must NOT see its own earlier (uncommitted)
        # write as prior state — it would then derive nothing and
        # overwrite its epoch dir with an empty frame
        if not os.path.isdir(closure_path):
            return None
        dirs = [
            os.path.join(closure_path, e)
            for e in os.listdir(closure_path)
            if e.startswith("epoch=") and e != f"epoch={epoch_id}"
        ]
        return spark.read.parquet(*dirs) if dirs else None

    def process_batch(batch_df: DataFrame, epoch_id: int):
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        base_new = (
            run_pipeline(batch_df, model, alias_dict)
            .select("subj", "pred", "obj")
            .distinct()
        )
        closed = read_closure(spark, epoch_id)
        if closed is None:
            out = infer(base_new, rules, max_rounds=max_rounds)
            pinned = out.pinned_caches
        else:
            prior = closed.select("subj", "pred", "obj")
            fresh = base_new.join(prior, ["subj", "pred", "obj"], "left_anti")
            derived = infer_increment(
                prior, fresh, rules, max_rounds=max_rounds
            )
            pinned = derived.pinned_caches
            out = fresh.withColumn("round", F.lit(0)).unionByName(
                derived.select("subj", "pred", "obj", "round")
            )
        out.write.mode("overwrite").parquet(
            f"{closure_path}/epoch={epoch_id}"
        )
        for c in pinned:
            c.unpersist()

    writer = (
        transcripts.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    watermark_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup: drop later arrivals whose text digest was
    already seen within the watermark horizon.

    ``dropDuplicatesWithinWatermark`` keys state on the md5 digest (not
    the raw text — fixed-width state entries), and the watermark bounds
    state size: at any moment the store holds one digest per distinct
    document seen in the horizon — the streaming counterpart of the
    batch ``exact_dedup`` hash-groupBy, with the same uniform-key
    no-skew property.
    """
    with_digest = docs.withColumn(
        "__digest", F.md5(F.coalesce(F.col(text_col), F.lit("")))
    ).withWatermark(watermark_col, watermark)
    return with_digest.dropDuplicatesWithinWatermark(["__digest"]).drop("__digest")
