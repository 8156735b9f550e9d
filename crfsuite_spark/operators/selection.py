"""Data selection via importance resampling (DSIR).

Implements the hashed-n-gram importance-resampling recipe of Xie et
al. 2023 ("Data Selection for Language Models via Importance
Resampling"): fit bag-of-hashed-n-gram (unigram + bigram) multinomial
distributions over a small TARGET corpus (the domain you want more of)
and over the RAW pool, score every raw document with its log importance
weight

    log w(x) = sum_{g in grams(x)} [ log p_target(h(g)) - log p_raw(h(g)) ]

(Laplace-smoothed over the fixed bucket domain), then resample without
replacement via the Gumbel-top-k trick — the standard pretraining-data
curation step between heuristic filtering and dedup.

Scale shape (the whole point at 100 TB):

- **Fit is bucket-count jobs** — explode grams → ``groupBy(bucket)``
  over a FIXED domain of ``n_buckets`` keys — partial aggregation
  collapses each task to ≤ n_buckets rows, so the shuffle is
  O(tasks × n_buckets) regardless of corpus size, and the driver
  collects exactly n_buckets longs per corpus (32 KB at the default
  4096). Two jobs when target is a separate frame; ONE when target is
  a predicate over the pool (count vs count_if in the same scan).
- **Scoring is scan-local — ZERO Exchange** (plan-asserted in
  tests/test_selection.py): the smoothed log-ratio vector is embedded as a
  literal double array (n_buckets ≤ 65536 guard) and each document
  folds ``aggregate(grams, 0.0, acc + lr[h(g)])`` inside whole-stage
  codegen. The corpus text never shuffles and never leaves the scan;
  re-scoring 100 TB is one map-only pass.
- **Selection is a TakeOrdered top-k** on (logweight + Gumbel) — no
  global sort; k rows to the driver.

All hashing is the portable first-8-hex-of-md5 idiom
(operators/sampling.py), so weights, Gumbel keys, and the selected set
are bit-reproducible across engines (the DuckDB oracle replays the
whole chain) and across retries/AQE re-plans.

Relation to the reference: the reference (bnosac/crfsuite) curates its
training corpora by hand; this is the operator family a 10^12-turn
transcript pipeline needs to choose WHICH conversations feed the CRF
trainer (SURVEY.md §2 LLM-pipeline extensions).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crfsuite_spark.functions.analysis import _tokens

_U_SCALE = 1_000_000


def _gram_bucket(gram: Column, n_buckets: int, seed: int) -> Column:
    """Portable md5 bucket of a gram STRING (column form of
    sampling.py's _portable_hash_expr, usable inside HOF lambdas)."""
    return F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(gram, F.lit(f":{seed}"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint"),
        F.lit(n_buckets),
    )


def _toks(text_col: str) -> Column:
    """Non-empty lowercased whitespace tokens; NULL text → empty list."""
    return F.filter(
        _tokens(F.coalesce(F.col(text_col), F.lit(""))), lambda t: t != ""
    )


def _grams_of(toks: Column) -> Column:
    """Unigrams ++ space-joined bigrams of an ALREADY-MATERIALIZED token
    array column (bigram i pairs token i with token i+1 via the same
    slice/element_at form functions/analysis.py:bigram_nll uses).

    ``toks`` MUST be a bound column (projected by a child select), not
    the tokenization expression itself: a lambda's ``element_at(toks,
    i+2)`` re-evaluates its argument subtree per element, so passing
    the raw split/filter expression makes tokenization O(n²) per row —
    measured 8× slower on the sf0.1 documents table."""
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(1))),
            lambda x, i: F.concat(
                x, F.lit(" "), F.element_at(toks, i + F.lit(2))
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(toks, bigrams)


def hashed_gram_counts(
    df: DataFrame,
    text_col: str = "text",
    n_buckets: int = 4096,
    seed: int = 42,
    flag: Column | None = None,
) -> DataFrame:
    """Corpus-level hashed-gram bucket histogram: (bucket, cnt), one
    row per OCCUPIED bucket (≤ n_buckets rows total — the fixed-domain
    key is what keeps the fit shuffle O(tasks × n_buckets) at any
    corpus size). With ``flag`` (a boolean Column over ``df``), each
    bucket also carries ``cnt_flagged`` = grams from flagged rows —
    two histograms from ONE scan (the predicate-target fit)."""
    pre = [_toks(text_col).alias("__toks")]
    aggs = [F.count("*").alias("cnt")]
    keep = []
    if flag is not None:
        pre.append(F.when(flag, F.lit(1)).otherwise(F.lit(0)).alias("__t"))
        aggs.append(F.sum("__t").alias("cnt_flagged"))
        keep = ["__t"]
    return (
        df.select(*pre)
        .select(*keep, F.explode(_grams_of(F.col("__toks"))).alias("__g"))
        .select(
            *keep, _gram_bucket(F.col("__g"), n_buckets, seed).alias("bucket")
        )
        .groupBy("bucket")
        .agg(*aggs)
    )


def _bucketed_raw(
    raw: DataFrame,
    text_col: str,
    n_buckets: int,
    seed: int,
    flag: Column | None = None,
) -> DataFrame:
    """``raw`` + ``__buckets`` (int array: the md5 bucket of every
    unigram+bigram, document order) [+ ``__t`` 0/1 when ``flag``].

    This is the shared tokenize→gram→hash pass that BOTH the fit
    histogram and the scoring fold consume: the caller persists it, so
    the corpus pays the per-gram md5 exactly once instead of once per
    pass (fit + score re-tokenized the whole pool before — measured
    77 s → the cache form at sf1.0). Each stage is its own projection
    so no optimizer rule re-inlines the tokenizer into a per-element
    lambda (the O(words²) pushed-filter hazard seen in the r05 plan)."""
    pre = [F.col(c) for c in raw.columns] + [_toks(text_col).alias("__toks")]
    if flag is not None:
        pre.append(F.when(flag, F.lit(1)).otherwise(F.lit(0)).alias("__t"))
    staged = raw.select(*pre).withColumn("__grams", _grams_of(F.col("__toks")))
    buckets = F.transform(
        F.col("__grams"),
        lambda g: _gram_bucket(g, n_buckets, seed).cast("int"),
    )
    return staged.withColumn("__buckets", buckets).drop("__toks", "__grams")


def _fit_log_ratio(
    target: "DataFrame | Column",
    raw_bucketed: DataFrame,
    text_col: str,
    n_buckets: int,
    alpha: float,
    seed: int,
) -> list[float]:
    """Collect both bucket histograms (n_buckets longs each) and return
    the Laplace-smoothed per-bucket log ratio
    log p_target[b] − log p_raw[b] as a plain list for literal
    embedding.

    ``raw_bucketed`` is the persisted :func:`_bucketed_raw` frame — the
    raw histogram explodes its precomputed int bucket arrays (no
    re-tokenization, no per-gram md5). ``target`` as a separate
    DataFrame costs one extra bucket-count job over the target corpus;
    ``target`` as a boolean Column PREDICATE over ``raw`` (the common
    'target is a labeled subset of the pool' case) fits BOTH
    histograms from the same exploded pass — count(*) vs count_if per
    bucket."""
    ct = [0] * n_buckets
    cr = [0] * n_buckets
    if isinstance(target, Column):
        hist = (
            raw_bucketed.select(
                "__t", F.explode("__buckets").alias("bucket")
            )
            .groupBy("bucket")
            .agg(F.count("*").alias("cnt"), F.sum("__t").alias("cnt_flagged"))
        )
        for row in hist.collect():
            cr[row["bucket"]] = row["cnt"]
            ct[row["bucket"]] = int(row["cnt_flagged"])
    else:
        for row in hashed_gram_counts(
            target, text_col, n_buckets, seed
        ).collect():
            ct[row["bucket"]] = row["cnt"]
        hist = (
            raw_bucketed.select(F.explode("__buckets").alias("bucket"))
            .groupBy("bucket")
            .agg(F.count("*").alias("cnt"))
        )
        for row in hist.collect():
            cr[row["bucket"]] = row["cnt"]
    nt, nr = sum(ct), sum(cr)
    zt = math.log(nt + alpha * n_buckets)
    zr = math.log(nr + alpha * n_buckets)
    return [
        (math.log(ct[b] + alpha) - zt) - (math.log(cr[b] + alpha) - zr)
        for b in range(n_buckets)
    ]


def dsir_weights(
    raw: DataFrame,
    target: "DataFrame | Column",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    alpha: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """Per-document DSIR log importance weight of every ``raw`` row
    against the ``target`` distribution. ``target`` is either its own
    DataFrame or a boolean Column predicate over ``raw`` (a labeled
    subset of the pool) — the predicate form fits both histograms in
    ONE corpus scan instead of two (see :func:`_fit_log_ratio`).

    Returns ``raw`` + (logweight, n_grams): ``logweight`` is the sum of
    per-gram smoothed log ratios (0.0 for gram-less documents, which
    the Gumbel stage then treats as distribution-neutral), ``n_grams``
    the gram count (callers wanting a length-invariant score divide —
    the paper's chunked protocol sidesteps length bias by scoring
    fixed-size chunks, which :func:`~crfsuite_spark.operators.sampling.
    chunk_documents` provides).

    The returned frame's plan is scan-local — fit runs bounded count
    jobs eagerly, scoring embeds the log-ratio literal (module
    docstring). The shared tokenize→gram→md5 pass is computed ONCE
    into a persisted int-bucket frame (:func:`_bucketed_raw`) that the
    fit explodes and the scoring fold reads back — identical math
    (same bucket per gram, same left-fold order over the same gram
    sequence), half the corpus passes. The returned frame carries the
    persisted input in ``pinned_caches`` (same release contract as
    operators/minhash.py): callers that materialize the result may
    ``unpersist()`` them."""
    if n_buckets > 65536:
        raise ValueError(
            "n_buckets > 65536 would bloat the embedded literal plan; "
            "hash collisions are part of the DSIR design — use fewer"
        )
    pre = _bucketed_raw(
        raw, text_col, n_buckets, seed,
        flag=target if isinstance(target, Column) else None,
    ).persist()
    lr = _fit_log_ratio(target, pre, text_col, n_buckets, alpha, seed)
    lr_col = F.lit(lr)
    buckets = F.col("__buckets")
    logw = F.aggregate(
        buckets,
        F.lit(0.0),
        lambda acc, b: acc + F.element_at(lr_col, b + F.lit(1)),
    )
    out = (
        pre.withColumn("logweight", logw)
        .withColumn("n_grams", F.size(buckets).cast("bigint"))
        .drop("__buckets", "__t")
    )
    out.pinned_caches = [pre]
    return out


def dsir_select(
    raw: DataFrame,
    target: "DataFrame | Column",
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    alpha: float = 1.0,
    seed: int = 42,
    min_grams: int = 1,
    temperature: float = 1.0,
) -> DataFrame:
    """Gumbel-top-k importance resampling: keep the ``k`` raw documents
    maximizing ``logweight / temperature + Gumbel(id)`` — equivalent to
    sampling k WITHOUT replacement with probability ∝ w(x)^(1/T) (the
    Gumbel-top-k identity), but deterministic: the Gumbel noise comes
    from the portable md5 hash of (id ‖ seed), so the selected set is
    stable under retries, partition changes, and engine swaps.
    ``temperature`` sharpens (T<1) or flattens (T>1) the resampling
    distribution; T→0 degenerates to deterministic top-k by weight —
    useful when per-document weight gaps are small relative to the
    Gumbel noise scale (σ≈1.28), e.g. short documents.

    ``min_grams`` (default 1) drops documents with fewer grams before
    resampling: an empty document's importance weight is the empty
    product — exactly 1, log 0 — which is mathematically consistent but
    BEATS every real document whenever typical log-weights are negative
    (the common regime: most raw grams are off-target), so unguarded
    Gumbel-top-k fills the selection with empty docs first. The paper
    sidesteps this by scoring fixed-length chunks; a document-level
    selector needs the explicit floor.

    Returns the selected rows + (logweight, n_grams, gumbel_key),
    via TakeOrdered (no global sort)."""
    if temperature <= 0:
        # validate BEFORE dsir_weights eagerly runs the corpus-wide fit
        raise ValueError("temperature must be > 0 (use a small value "
                         "like 1e-3 for near-deterministic top-k)")
    weighted = dsir_weights(
        raw, target, id_col, text_col, n_buckets, alpha, seed
    )
    scored = weighted.where(F.col("n_grams") >= int(min_grams))
    # u in (0,1): (h + 0.5) / 1e6 over the SAME portable md5 idiom the
    # whole repo uses (one implementation, one oracle recipe)
    from crfsuite_spark.operators.sampling import _portable_hash_expr

    h = _portable_hash_expr(id_col, _U_SCALE, seed + 1)
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(_U_SCALE))
    gumbel = -F.log(-F.log(u))
    out = scored.withColumn(
        "gumbel_key", F.col("logweight") / F.lit(float(temperature)) + gumbel
    )
    sel = out.orderBy(F.desc("gumbel_key"), F.asc(id_col)).limit(int(k))
    # cache-lifetime contract: the selection plan scans the persisted
    # bucket frame (see dsir_weights) — release after materializing
    sel.pinned_caches = getattr(weighted, "pinned_caches", [])
    return sel
