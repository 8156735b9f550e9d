"""Session-level operator-pattern warm-up.

First use of a physical-operator pattern inside a JVM pays one-time
costs the steady state never sees again: classloading of the operator
(WindowExec, ObjectHashAggregateExec, GenerateExec, ...), Janino
compilation of the whole-stage-codegen class, and the first
interpreter-mode executions before C2 JIT kicks in. On a long-lived
cluster those costs are amortized over thousands of queries; in a
fresh session they land entirely on whichever query touches the
pattern first — measured on this host at sf1.0: the first draw of the
DSIR staged-gram pipeline costs 2.5 s vs 0.72 s warm, the first
collect_list/posexplode query (dictionary spans) 3.5 s vs 1.7 s, the
first window lag/lead query 1.3 s vs 0.63 s.

:func:`warm` runs each heavy pattern once, at session construction,
over a few dozen rows of synthetic in-memory data whose schemas mirror
the library's documented table shapes. Nothing here reads the user's
data, nothing is cached or kept (every intermediate the operators pin
is unpersisted and the catalog cache is cleared before returning), and
every result is discarded — this is JVM warm-up, the same thing a
service does at startup so its first request doesn't pay compile
latency. Opt out with ``SPARK_GRAFT_PREWARM=0`` (e.g. for one-shot
scripts where first-query latency doesn't matter and the ~3 s startup
cost does).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_WORDS = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lambda mu nu xi omicron pi rho sigma tau upsilon"
).split()


def _noop(df: DataFrame) -> None:
    df.write.format("noop").mode("overwrite").save()
    for c in getattr(df, "pinned_caches", None) or []:
        c.unpersist()


def _tiny_docs(spark) -> DataFrame:
    # repeated 10-token blocks so the dedup operators have real work
    rows = []
    for i in range(24):
        toks = [_WORDS[(i * 7 + j) % len(_WORDS)] for j in range(30)]
        if i % 3 == 0:  # plant a shared block across documents
            toks[10:20] = _WORDS[:10]
        text = " ".join(toks)
        rows.append((i, text, "en" if i % 2 == 0 else "de", "synth", len(text)))
    return spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).repartition(2)


def _tiny_events(spark) -> DataFrame:
    import datetime

    t0 = datetime.datetime(2020, 1, 1)
    rows = [
        (i, t0 + datetime.timedelta(seconds=i), i % 5,
         ["click", "view", "purchase"][i % 3], float(i), "{}")
        for i in range(30)
    ]
    return spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    ).repartition(2)


def warm(spark) -> None:
    """Run each heavy operator pattern once on tiny synthetic data.

    Idempotent per session; never raises (a failed warm-up must not
    take the session down with it)."""
    if os.environ.get("SPARK_GRAFT_PREWARM", "1") == "0":
        return
    if getattr(spark, "_crfsuite_prewarmed", False):
        return
    spark._crfsuite_prewarmed = True
    sc = spark.sparkContext
    try:
        sc.setJobDescription("prewarm: operator-pattern codegen")
        _warm(spark)
    except Exception:
        pass
    finally:
        try:
            spark.catalog.clearCache()
        except Exception:
            pass
        sc.setJobDescription(None)


def _warm(spark) -> None:
    from crfsuite_spark.functions.text import txt_sprintf

    docs = _tiny_docs(spark)
    events = _tiny_events(spark)

    # window lag/lead + NA-propagating sprintf (WindowExec)
    w = Window.partitionBy("user_id").orderBy("event_id")
    _noop(
        events.select(
            "user_id",
            "event_id",
            F.lag("event_type", 1).over(w).alias("type_lag"),
            F.lead("event_type", 1).over(w).alias("type_lead"),
            txt_sprintf(
                "%s-%s", F.lag("event_type", 1).over(w), F.col("event_type")
            ).alias("bigram"),
        )
    )

    # exact-span / substring / intra-doc dedup (staged tokenizer,
    # rolling md5 windows, min_by canonical cut, ObjectHashAggregate)
    from crfsuite_spark.operators.dedup import (
        intra_doc_span_dedup,
        span_dedup,
        substr_dedup,
    )

    _noop(span_dedup(docs, "doc_id", "text", block_tokens=10))
    _noop(substr_dedup(docs, "doc_id", "text", window_tokens=8))
    _noop(intra_doc_span_dedup(docs, "doc_id", "text", block_tokens=5))

    # DSIR staged-gram fit + scan-local scoring + Gumbel TakeOrdered
    from crfsuite_spark.operators.selection import dsir_select

    sel = dsir_select(
        docs.select("doc_id", "text", "lang"),
        F.col("lang") == "en",
        k=100,
        n_buckets=512,
        seed=7,
        temperature=0.5,
    )
    _noop(
        sel.select(
            "doc_id",
            F.round("logweight", 6).alias("logweight"),
            "n_grams",
            F.round("gumbel_key", 6).alias("gumbel_key"),
        )
    )

    # benchmark-gram broadcast decontamination
    from crfsuite_spark.operators.decontaminate import ngram_overlap

    bench = docs.where(F.pmod(F.col("doc_id"), F.lit(97)) == 0).select("text")
    _noop(ngram_overlap(docs, bench, "doc_id", "text", "text", n=8))

    # concat-then-chunk packing (single-exchange slot window)
    from crfsuite_spark.operators.sampling import pack_documents

    _noop(pack_documents(docs, "doc_id", "text", token_budget=256, n_shards=8))

    # unigram LM NLL (broadcast-vocab join)
    from crfsuite_spark.functions.analysis import unigram_nll

    _noop(
        unigram_nll(docs, "doc_id", "text").select(
            "doc_id", F.round(F.col("nll"), 6).alias("nll"), "n_tokens"
        )
    )

    # per-centroid staged distance codegen
    from crfsuite_spark.operators.clustering import assign_clusters_expr

    emb = spark.createDataFrame(
        [(i, [float((i * j) % 7) for j in range(8)]) for i in range(16)],
        "vec_id bigint, embedding array<double>",
    )
    cents = [[float(j % 7) for j in range(8)] for _ in range(8)]
    _noop(assign_clusters_expr(emb, cents).select("vec_id", "cluster"))

    # token stream → turn arrays → posexplode + broadcast dictionary
    # (collect_list/sort_array/slice/array_join — the dictionary-span
    # pattern), plus the transcript rollup/render windows
    from crfsuite_spark.datagen.transcripts import build_alias_dict, generate
    from crfsuite_spark.functions.tokenize import tokenize
    from crfsuite_spark.kg.mining import dictionary_spans
    from crfsuite_spark.operators.transcripts import chat_examples, conv_stats

    data = generate(n_convs=2, turns_per_conv=4, seed=3)
    t = spark.createDataFrame(data.transcripts)
    alias = spark.createDataFrame(build_alias_dict())
    _noop(dictionary_spans(tokenize(t), alias))
    conv_stats(t).count()
    chat_examples(t).agg(F.sum("n_chars")).collect()

    # iterative graph shape (per-round join + partial aggregate)
    from crfsuite_spark.kg.graph import pagerank

    t3 = spark.createDataFrame(data.triples)
    pr = pagerank(t3, n_iters=3)
    _noop(pr)
