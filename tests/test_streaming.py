"""Structured Streaming ingest: file-source stream → foreachBatch KG
extraction with idempotent manifest commits, and watermarked stats."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from crfsuite_spark.streaming.ingest import (
    stream_transcripts,
    stream_triples,
    streaming_turn_stats,
)


@pytest.fixture(scope="module")
def staged(spark, synth, tmp_path_factory):
    root = tmp_path_factory.mktemp("stream")
    src = str(root / "in")
    tdf = spark.createDataFrame(synth.transcripts)
    # two "arrival" files to force at least two micro-batches
    tdf.where(F.col("conv_id") < "conv_00015").coalesce(1).write.parquet(src)
    tdf.where(F.col("conv_id") >= "conv_00015").coalesce(1).write.mode("append").parquet(src)
    return root, src


def test_stream_triples_foreachbatch(spark, synth, staged):
    from bench import lexicon_model

    root, src = staged
    out = str(root / "triples")
    ckpt = str(root / "ckpt")
    alias = spark.createDataFrame(synth.alias_dict)
    model = lexicon_model()
    stream = stream_transcripts(spark, src, max_files_per_trigger=1)
    q = stream_triples(stream, model, alias, out, ckpt, n_buckets=4)
    q.awaitTermination(300)
    epochs = glob.glob(os.path.join(out, "epoch=*"))
    assert len(epochs) >= 1
    n1 = sum(spark.read.parquet(e + "/data").count() for e in epochs)
    assert n1 > 0
    # idempotent restart: availableNow re-run from the same checkpoint
    # processes nothing new → same totals
    q2 = stream_triples(
        stream_transcripts(spark, src), model, alias, out, ckpt, n_buckets=4
    )
    q2.awaitTermination(120)
    n2 = sum(
        spark.read.parquet(e + "/data").count()
        for e in glob.glob(os.path.join(out, "epoch=*"))
    )
    assert n2 == n1


def test_stream_edge_table_maintenance(spark, synth, staged, tmp_path):
    """foreachBatch edge-table maintenance: after streaming all files
    the standing edge table equals the ONE-PASS aggregate of the batch
    pipeline's mentions over the full transcript set, and a checkpoint
    restart folds nothing twice."""
    from bench import lexicon_model

    from crfsuite_spark.kg.lifecycle import committed_epochs, edge_deltas, read_edges
    from crfsuite_spark.kg.pipeline import extract_triples, tag_transcripts
    from crfsuite_spark.streaming.ingest import stream_edge_table

    root, src = staged
    edges = str(tmp_path / "edges")
    ckpt = str(tmp_path / "eckpt")
    alias = spark.createDataFrame(synth.alias_dict)
    model = lexicon_model()
    q = stream_edge_table(
        stream_transcripts(spark, src, max_files_per_trigger=1),
        model, alias, edges, ckpt,
    )
    q.awaitTermination(300)
    eps = committed_epochs(edges)
    assert len(eps) >= 2  # one commit per micro-batch (2 arrival files)

    got = (
        read_edges(spark, edges)
        .orderBy("subj", "pred", "obj")
        .toPandas()
    )
    full_tr = spark.read.parquet(src)
    full_triples = extract_triples(tag_transcripts(full_tr, model), alias)
    exp = (
        edge_deltas(
            full_triples.join(
                full_tr.select("conv_id", "turn_idx", "ts"),
                ["conv_id", "turn_idx"],
            )
        )
        .orderBy("subj", "pred", "obj")
        .toPandas()
    )
    import pandas as pd

    pd.testing.assert_frame_equal(
        got[exp.columns].reset_index(drop=True), exp.reset_index(drop=True),
        check_dtype=False,
    )
    # restart from the same checkpoint: no new files → no new epochs
    q2 = stream_edge_table(
        stream_transcripts(spark, src), model, alias, edges, ckpt
    )
    q2.awaitTermination(120)
    assert committed_epochs(edges) == eps


def test_streaming_turn_stats_watermark(spark, staged, tmp_path):
    root, src = staged
    stream = stream_transcripts(spark, src)
    stats = streaming_turn_stats(stream, watermark="1 hour", window="30 minutes")
    q = (
        stats.writeStream.format("memory")
        .queryName("turn_stats")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from turn_stats")
    # append mode only emits windows closed by the watermark; schema is the contract
    assert got.columns == ["start", "end", "conv_id", "n_turns", "n_chars"]
    assert got.count() >= 0


def test_stateful_conversation_entity_state(spark, synth, staged, tmp_path):
    """applyInPandasWithState: per-conversation running entity counts
    merged across micro-batches, state keyed and bounded per conv."""
    from crfsuite_spark.datagen.transcripts import PERSONS
    from crfsuite_spark.streaming.ingest import stream_transcripts
    from crfsuite_spark.streaming.stateful import conversation_entity_state

    root, src = staged
    lexicon = {a.split()[0] for aliases in PERSONS.values() for a in aliases}  # first names
    stream = stream_transcripts(spark, src, max_files_per_trigger=1)
    out = conversation_entity_state(stream.select("conv_id", "turn_idx", "text"), lexicon)
    q = (
        out.writeStream.format("memory")
        .queryName("conv_state")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    res = spark.sql(
        "SELECT conv_id, n_turns, max_turn, n_distinct_entities, top_entity "
        "FROM (SELECT *, row_number() OVER "
        "(PARTITION BY conv_id ORDER BY n_turns DESC) AS rn FROM conv_state) "
        "WHERE rn = 1"
    ).toPandas()
    gold = synth.transcripts.groupby("conv_id").agg(
        n=("turn_idx", "size"), mx=("turn_idx", "max")
    )
    assert len(res) == len(gold)
    merged = res.set_index("conv_id").join(gold)
    # final state per conversation saw every turn exactly once
    assert (merged["n_turns"] == merged["n"]).all()
    assert (merged["max_turn"] == merged["mx"]).all()
    assert (res["n_distinct_entities"] > 0).any()


def test_streaming_dedup_drops_repeats(spark, synth, staged, tmp_path):
    """Streaming exact dedup: a repeated text within the watermark
    horizon survives only once; distinct texts all pass."""
    from crfsuite_spark.streaming.ingest import stream_transcripts, streaming_dedup

    _, src = staged
    stream = stream_transcripts(spark, src)
    deduped = streaming_dedup(stream)
    out_dir = str(tmp_path / "dedup_out")
    cp = str(tmp_path / "dedup_cp")
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out_dir).toPandas()
    src_pdf = spark.read.parquet(src).toPandas()
    # one survivor per distinct text
    assert len(got) == src_pdf["text"].fillna("").nunique()
    assert got["text"].fillna("").nunique() == len(got)


def test_stream_inferred_closure_maintenance(spark, synth, staged, tmp_path):
    """foreachBatch deductive-closure maintenance: after streaming all
    files, the union of epoch dirs holds exactly the fact set a batch
    infer over ALL transcripts produces, and a checkpoint restart
    changes nothing."""
    from bench import lexicon_model

    from crfsuite_spark.kg.pipeline import run_pipeline
    from crfsuite_spark.kg.rules import Rule, infer
    from crfsuite_spark.streaming.ingest import stream_inferred_closure

    rules = [
        Rule(body=(("?x", "acquired", "?y"),),
             head=("?x", "subsidiary_of", "?y")),
        Rule(body=(("?x", "subsidiary_of", "?y"),
                   ("?y", "subsidiary_of", "?z")),
             head=("?x", "subsidiary_of", "?z")),
        Rule(body=(("?x", "works_at", "?o"), ("?y", "works_at", "?o")),
             head=("?x", "colleague_of", "?y"), filters=("x < y",)),
    ]
    root, src = staged
    closure = str(tmp_path / "closure")
    ckpt = str(tmp_path / "cckpt")
    alias = spark.createDataFrame(synth.alias_dict)
    model = lexicon_model()
    q = stream_inferred_closure(
        stream_transcripts(spark, src, max_files_per_trigger=1),
        model, alias, rules, closure, ckpt, max_rounds=4,
    )
    q.awaitTermination(300)

    import glob
    import os

    epochs = glob.glob(os.path.join(closure, "epoch=*"))
    assert len(epochs) >= 2
    got = {
        (r["subj"], r["pred"], r["obj"])
        for r in spark.read.parquet(*epochs).collect()
    }
    # strictly-new-per-epoch: no fact appears in two epochs
    n_rows = spark.read.parquet(*epochs).count()
    assert n_rows == len(got)

    full = run_pipeline(
        spark.read.parquet(src), model, alias
    ).select("subj", "pred", "obj")
    exp_out = infer(full, rules, max_rounds=4)
    exp = {(r["subj"], r["pred"], r["obj"]) for r in exp_out.collect()}
    for c in exp_out.pinned_caches:
        c.unpersist()
    assert got == exp

    # idempotent restart from the same checkpoint: nothing reprocessed
    q2 = stream_inferred_closure(
        stream_transcripts(spark, src), model, alias, rules, closure, ckpt,
        max_rounds=4,
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(
        *glob.glob(os.path.join(closure, "epoch=*"))
    ).count() == n_rows


def test_streaming_coref_matches_batch(spark, tmp_path):
    """Streaming pronoun coreference == the batch window resolver, with
    the corpus split MID-conversation across two arrival files so
    antecedent state must survive a micro-batch boundary."""
    import pandas as pd

    from crfsuite_spark.datagen.coref import coref_conversations
    from crfsuite_spark.kg.coref import PRONOUN_TYPES, resolve_pronouns
    from crfsuite_spark.streaming.coref_state import streaming_coref

    toks, spans = coref_conversations(n_convs=10, seed=31)

    # per-turn annotation rows: pronoun and mention arrays
    prons = toks[toks.token.str.lower().isin(PRONOUN_TYPES)]
    rows = {}
    for (c, t), g in toks.groupby(["conv_id", "turn_idx"]):
        rows[(c, t)] = {"conv_id": c, "turn_idx": int(t),
                        "prons": [], "mentions": []}
    for r in prons.itertuples():
        rows[(r.conv_id, int(r.turn_idx))]["prons"].append(
            {"pos": int(r.token_idx), "pronoun": r.token.lower()})
    for r in spans.itertuples():
        rows[(r.conv_id, int(r.turn_idx))]["mentions"].append(
            {"pos": int(r.end_tok), "etype": r.entity_type,
             "surface": r.surface})
    ann = pd.DataFrame(sorted(rows.values(),
                              key=lambda x: (x["conv_id"], x["turn_idx"])))
    schema = ("conv_id string, turn_idx int, "
              "prons array<struct<pos:int,pronoun:string>>, "
              "mentions array<struct<pos:int,etype:string,surface:string>>")
    src = str(tmp_path / "in")
    half = ann.turn_idx.median()
    adf = spark.createDataFrame(
        [(x["conv_id"], x["turn_idx"], x["prons"], x["mentions"])
         for x in rows.values()], schema=schema)
    adf.where(F.col("turn_idx") <= half).coalesce(1).write.parquet(src)
    adf.where(F.col("turn_idx") > half).coalesce(1).write.mode("append").parquet(src)

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (streaming_coref(stream)
         .writeStream.format("memory").queryName("coref_stream")
         .outputMode("append").trigger(availableNow=True)
         .option("checkpointLocation", str(tmp_path / "ckpt_coref"))
         .start())
    q.awaitTermination(180)
    got = (spark.sql("select * from coref_stream")
           .orderBy("conv_id", "turn_idx", "token_idx").toPandas())

    want = (resolve_pronouns(spark.createDataFrame(toks),
                             spark.createDataFrame(spans))
            .orderBy("conv_id", "turn_idx", "token_idx").toPandas())
    assert len(got) == len(want) > 0
    for c in want.columns:
        pd.testing.assert_series_equal(
            got[c].reset_index(drop=True), want[c].reset_index(drop=True),
            check_dtype=False, check_names=False, obj=c)


def test_streaming_asof_matches_batch(spark, tmp_path):
    """Streaming as-of join == batch asof_join when arrival order
    respects event time per key: randomized tagged stream (5 keys,
    globally unique timestamps) split MID-STREAM into two arrival
    files, so the latest-right state must survive a micro-batch
    boundary; strict and tolerance variants too."""
    import random
    from datetime import datetime, timedelta

    import pandas as pd

    from crfsuite_spark.operators.asof import asof_join
    from crfsuite_spark.streaming.asof_state import streaming_asof

    rng = random.Random(7)
    t0 = datetime(2024, 1, 1)
    # small ts range → plenty of equal-ts collisions (left==right ts and
    # right-right ties), the cases that distinguish strict/non-strict
    # and exercise the two-deep right state
    rows = []
    for i in range(300):
        side = 0 if i % 3 == 0 else 1  # every third row is a snapshot
        rows.append((i, rng.randrange(5),
                     t0 + timedelta(seconds=rng.randrange(600)),
                     side, float(i) if side == 0 else None))
    schema = "id long, key long, ts timestamp, side int, value double"
    tagged = spark.createDataFrame(rows, schema)

    src = str(tmp_path / "asof_in")
    cut = t0 + timedelta(seconds=300)
    # arrival order respects event time: earlier-ts file lands first
    tagged.where(F.col("ts") <= cut).coalesce(1).write.parquet(src)
    tagged.where(F.col("ts") > cut).coalesce(1).write.mode("append").parquet(src)

    for strict, tol, qname in [(False, None, "asof_s0"), (True, None, "asof_s2"),
                               (True, 120.0, "asof_s1")]:
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        q = (streaming_asof(stream, tolerance_s=tol, strict=strict)
             .writeStream.format("memory").queryName(qname)
             .outputMode("append").trigger(availableNow=True)
             .option("checkpointLocation", str(tmp_path / f"ckpt_{qname}"))
             .start())
        q.awaitTermination(180)
        got = (spark.sql(f"select * from {qname}")
               .orderBy("id").toPandas())

        left = tagged.where(F.col("side") == 1).select("id", "key", "ts")
        right = tagged.where(F.col("side") == 0).select("id", "key", "ts", "value")
        want = (asof_join(left, right, ["key"], "ts", ["value"], "id",
                          strict=strict, tolerance_s=tol)
                .orderBy("id").toPandas())
        assert len(got) == len(want) > 50
        for c in ["id", "key", "ts", "asof_id", "asof_value", "asof_ts"]:
            pd.testing.assert_series_equal(
                got[c].reset_index(drop=True),
                want[c].reset_index(drop=True),
                check_dtype=False, check_names=False, obj=(c, strict))


def test_streaming_asof_null_key_never_matches(spark, tmp_path):
    """NULL equality keys never match in the streaming as-of either
    (same SQL-join guard as the batch operator): NULL-key right rows
    are dropped before the stateful group, NULL-key left rows are
    emitted unmatched."""
    from datetime import datetime

    from crfsuite_spark.streaming.asof_state import streaming_asof

    t0 = datetime(2024, 1, 1, 0, 0, 0)
    t1 = datetime(2024, 1, 1, 0, 0, 10)
    rows = [
        (0, None, t0, 0, 9.9),   # NULL-key right: must match nothing
        (1, None, t1, 1, None),  # NULL-key left: emitted unmatched
        (2, 1, t0, 0, 1.0),
        (3, 1, t1, 1, None),
    ]
    schema = "id long, key long, ts timestamp, side int, value double"
    src = str(tmp_path / "asof_nullkey")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    q = (streaming_asof(stream)
         .writeStream.format("memory").queryName("asof_nullkey")
         .outputMode("append").trigger(availableNow=True)
         .option("checkpointLocation", str(tmp_path / "ckpt_nullkey"))
         .start())
    q.awaitTermination(120)
    got = {r.id: (r.asof_id, r.asof_value)
           for r in spark.sql("select * from asof_nullkey").collect()}
    assert got[1] == (None, None)
    assert got[3] == (2, 1.0)
