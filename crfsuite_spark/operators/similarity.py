"""Similarity search over embedding columns (array<float>).

Two paths, per the usual scale split:

- **brute-force cosine top-k** — JVM-side `aggregate`/`zip_with` dot
  product (whole-stage codegen, no Python), global top-k via
  sort+limit (Spark's TakeOrderedAndProject — no full sort);
- **LSH-bucketed ANN** — random-hyperplane (sign) buckets computed
  JVM-side from literal hyperplane arrays; the query probes only its
  bucket(s). At 1000 executors the bucket column doubles as the
  partition key, so a probe touches one partition.

Also: pairwise embedding near-duplicates (cosine ≥ threshold within
buckets) for embedding-based dedup.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )


def cosine_sim(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    emb: DataFrame,
    query: list[float] | np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k against a literal query vector.

    The plan is scan → project (codegen'd dot product) → TakeOrdered:
    no shuffle of the full table, safe at any scale.
    """
    qlit = F.array(*[F.lit(float(x)) for x in np.asarray(query, dtype=float)])
    qnorm = float(np.linalg.norm(query))
    scored = emb.select(
        id_col,
        (_dot(F.col(vec_col).cast("array<double>"), qlit) / (F.lit(qnorm) * _norm(F.col(vec_col).cast("array<double>")))).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def _bucket_bits(v, planes: np.ndarray):
    """Sign-pattern bucket expression for literal hyperplanes (JVM-side)."""
    bucket = None
    for j in range(len(planes)):
        plane = F.array(*[F.lit(float(x)) for x in planes[j]])
        bit = F.when(_dot(v, plane) > 0, F.lit(1 << j)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return bucket


def hyperplane_buckets(
    emb: DataFrame,
    dim: int,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Add an int ``bucket`` column = sign pattern of ``n_planes``
    random hyperplane projections (Charikar cosine LSH), JVM-side."""
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(n_planes, dim))
    v = F.col(vec_col).cast("array<double>")
    return emb.withColumn("bucket", _bucket_bits(v, planes).cast("int"))


def refined_hyperplane_buckets(
    emb: DataFrame,
    dim: int,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_bucket_size: int | None = 50_000,
    refine_planes: int = 8,
    max_rounds: int = 4,
) -> DataFrame:
    """Hyperplane buckets with a POPULATION GUARD: buckets holding more
    than ``max_bucket_size`` rows are re-split on extra seeded planes
    (their bits shifted above the coarse bits, so refined ids never
    collide with unrefined ones), up to ``max_rounds`` times.

    This bounds the within-bucket self-join of
    :func:`embedding_dup_pairs` — without it, one low-variance direction
    in the corpus puts a large fraction of rows in one bucket and the
    join goes quadratic. A bucket of GENUINE near-duplicates is not
    splittable by sign-LSH (near-identical vectors have near-identical
    signs) — but there the OUTPUT itself is quadratic, so no candidate
    bound can help; rounds simply exhaust. Each round costs one count
    aggregation over the bucket column (cheap; no data movement)."""
    b = hyperplane_buckets(emb, dim, n_planes, id_col, vec_col, seed)
    if not max_bucket_size:
        return b
    b = b.withColumn("bucket", F.col("bucket").cast("long"))
    v = F.col(vec_col).cast("array<double>")
    # cache across the count rounds so the scan + n_planes dot products
    # run once, not once per round. Each round's count materializes the
    # CURRENT frame's cache, at which point the predecessor is dead and
    # unpersisted — at most 2 copies pinned at any moment. If no bucket
    # ever overflows (the common case), the cache is dropped before
    # return; when refinement happened, the FINAL frame stays cached —
    # the self-join consumer (embedding_dup_pairs) reads it twice, and
    # replaying several rounds of dot-product lineage twice would cost
    # more than the pinned copy. Callers may .unpersist() when done.
    b = b.persist()
    prev = None
    refined = False
    shift = n_planes
    for round_ in range(max_rounds):
        over = [
            r["bucket"]
            for r in b.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") > max_bucket_size)
            .collect()
        ]
        if prev is not None:
            prev.unpersist()
            prev = None
        if not over:
            break
        refined = True
        rng = np.random.default_rng(seed + 7919 * (round_ + 1))
        planes = rng.normal(size=(refine_planes, dim))
        sub = _bucket_bits(v, planes).cast("long")
        # refined id = coarse id + (sub+1) << shift: the +1 keeps
        # refined ids disjoint from unrefined ones, the growing
        # shift keeps rounds disjoint from each other
        nb = b.withColumn(
            "bucket",
            F.when(
                F.col("bucket").isin(over),
                F.col("bucket") + F.shiftleft(sub + 1, shift),
            ).otherwise(F.col("bucket")),
        ).persist()
        prev, b = b, nb
        shift += refine_planes + 1
    if prev is not None:
        prev.unpersist()
    if not refined:
        b.unpersist()
    return b


def ann_topk(
    emb_bucketed: DataFrame,
    query: list[float] | np.ndarray,
    k: int = 10,
    n_planes: int = 8,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    multiprobe_hamming: int = 1,
) -> DataFrame:
    """IVF/LSH-style ANN: probe the query's bucket plus all buckets
    within ``multiprobe_hamming`` bit flips, then exact cosine top-k
    inside the probed buckets only."""
    q = np.asarray(query, dtype=float)
    dim = dim or len(q)
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(n_planes, dim))
    qbits = int(sum((1 << j) for j in range(n_planes) if planes[j] @ q > 0))
    probes = {qbits}
    if multiprobe_hamming >= 1:
        probes |= {qbits ^ (1 << j) for j in range(n_planes)}
    if multiprobe_hamming >= 2:
        probes |= {
            qbits ^ (1 << i) ^ (1 << j)
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        }
    cand = emb_bucketed.where(F.col("bucket").isin(list(probes)))
    return cosine_topk(cand, q, k, id_col, vec_col)


def ann_join(
    queries: DataFrame,
    emb_bucketed: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 6,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    multiprobe_hamming: int = 2,
) -> DataFrame:
    """Batch ANN: top-k neighbours for EVERY row of a query table —
    (query_id, vec_id, cosine, rank).

    Defaults tuned on the recall/cost curve (BENCH/BASELINE.md §ANN):
    for top-k SEARCH (as opposed to near-dup PAIRS, where neighbours are
    very close), fewer planes + deeper multiprobe wins — on
    near-orthogonal embeddings (sign-LSH's worst case) 4-6 planes with
    multiprobe 2 clears recall@3 ≥ 0.9; 8+ planes with multiprobe 1
    drops below 0.5. On clustered real embeddings the same settings cost
    far less (candidates concentrate in the query's own bucket).
    NOTE: ``multiprobe_hamming=2`` only pays off at LOW plane counts —
    with 8+ planes it multiplies probe cost several-fold yet recall@3
    stays below 0.8 (the bench table); hence the matching default
    ``n_planes=6``. For the cheapest path at equal recall see
    :func:`ann_join_multitable`.

    Both sides get the same hyperplane sign buckets (JVM-side literal
    planes, no Python); each query is exploded to its multiprobe bucket
    set (1 + n_planes [+ C(n_planes,2)] probes) and equi-joined to the
    corpus on ``bucket``, so the corpus side never fans out and the
    shuffle key is the uniform bucket hash. Exact cosine + per-query
    top-k (row_number window over the candidate set) finish the job.
    At cluster scale pre-partition the corpus by bucket and the join is
    co-located."""
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(n_planes, dim))
    qv = F.col(query_vec_col).cast("array<double>")
    qbits = None
    for j in range(n_planes):
        plane = F.array(*[F.lit(float(x)) for x in planes[j]])
        bit = F.when(_dot(qv, plane) > 0, F.lit(1 << j)).otherwise(F.lit(0))
        qbits = bit if qbits is None else qbits + bit
    probe_deltas = [0]
    if multiprobe_hamming >= 1:
        probe_deltas += [1 << j for j in range(n_planes)]
    if multiprobe_hamming >= 2:
        probe_deltas += [
            (1 << i) | (1 << j)
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        ]
    probes = F.array(*[qbits.bitwiseXOR(F.lit(d)) for d in probe_deltas])
    q = queries.select(
        query_id_col,
        qv.alias("__qv"),
        F.explode(probes).alias("bucket"),
    )
    cand = q.join(emb_bucketed, "bucket").select(
        query_id_col,
        id_col,
        cosine_sim(F.col("__qv"), F.col(vec_col).cast("array<double>")).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def _multitable_planes(
    dim: int, n_tables: int, n_planes: int, seed: int
) -> np.ndarray:
    """The [n_tables, n_planes, dim] hyperplane tensor shared by corpus
    bucketing and query probing — both sides MUST derive it from the
    same (dim, n_tables, n_planes, seed) or buckets don't line up."""
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n_tables, n_planes, dim))


def _multitable_bits_expr(planes: np.ndarray, v, tbl: int):
    n_planes = planes.shape[1]
    bucket = None
    for j in range(n_planes):
        plane = F.array(*[F.lit(float(x)) for x in planes[tbl][j]])
        bit = F.when(_dot(v, plane) > 0, F.lit(1 << j)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return bucket


def multitable_buckets(
    emb: DataFrame,
    dim: int,
    n_tables: int = 4,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """The exploded (id, __cv, tbl, bucket) corpus frame behind
    :func:`ann_join_multitable` — L = ``n_tables`` rows per vector, the
    L hash tables of classic LSH.

    Computing it costs L×``n_planes`` dot products per corpus vector,
    so at cluster scale it is built ONCE, written partitioned by
    (tbl, bucket), and every batch of queries joins the stored frame —
    pass the result as ``emb_bucketed=`` to :func:`ann_join_multitable`
    (with the SAME dim/n_tables/n_planes/seed, or query probes hash
    into different buckets and recall silently collapses)."""
    planes = _multitable_planes(dim, n_tables, n_planes, seed)
    cv = F.col(vec_col).cast("array<double>")
    return emb.select(
        id_col,
        cv.alias("__cv"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(t).alias("tbl"),
                    _multitable_bits_expr(planes, cv, t).alias("bucket"),
                )
                for t in range(n_tables)
            ])
        ).alias("__tb"),
    ).select(
        id_col, "__cv",
        F.col("__tb.tbl").alias("tbl"), F.col("__tb.bucket").alias("bucket"),
    )


def ann_join_multitable(
    queries: DataFrame,
    emb: DataFrame | None,
    dim: int,
    k: int = 10,
    n_tables: int = 4,
    n_planes: int = 6,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    multiprobe_hamming: int = 0,
    emb_bucketed: DataFrame | None = None,
) -> DataFrame:
    """Multi-table LSH batch ANN: ``n_tables`` INDEPENDENT hyperplane
    sets, candidates = union of same-bucket matches over all tables —
    (query_id, vec_id, cosine, rank).

    The classic LSH amplification (Indyk-Motwani OR-construction): a
    true neighbour is missed only if it disagrees with the query in
    EVERY table, so recall ≈ 1 − (1 − p^b)^L rises with L while the
    candidate set stays the UNION of L small buckets — much cheaper
    than one table with deep multiprobe at equal recall
    (BENCH/BASELINE.md §ANN: 4×6 tables reach the same recall@3 ≥ 0.9
    as 4-planes/probe-2 at under half the probed fraction).

    Plan shape: the corpus is exploded to (table, bucket) — L rows per
    vector, the L hash tables of classic LSH, written/bucketed once at
    cluster scale — and each query probes one bucket per table (plus
    optional Hamming-``multiprobe_hamming`` neighbours within each
    table). The join key (table, bucket) is uniform; duplicate
    candidates surviving in several tables are merged by a map-side
    combined groupBy BEFORE the top-k window, so a vector never counts
    twice in the ranking.

    Corpus side: pass either the RAW embedding frame (``emb`` — the L
    bucket sets are computed inline) or, at cluster scale, a
    pre-computed :func:`multitable_buckets` frame via ``emb_bucketed``
    (built/written once, reused across query batches; must share
    dim/n_tables/n_planes/seed with this call)."""
    planes = _multitable_planes(dim, n_tables, n_planes, seed)

    def bits_expr(v, tbl):
        return _multitable_bits_expr(planes, v, tbl)

    if emb_bucketed is not None:
        corpus = emb_bucketed
    elif emb is not None:
        corpus = multitable_buckets(
            emb, dim, n_tables, n_planes, id_col, vec_col, seed
        )
    else:
        raise ValueError("pass either emb or emb_bucketed")

    probe_deltas = [0]
    if multiprobe_hamming >= 1:
        probe_deltas += [1 << j for j in range(n_planes)]
    if multiprobe_hamming >= 2:
        probe_deltas += [
            (1 << i) | (1 << j)
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        ]
    qv = F.col(query_vec_col).cast("array<double>")
    probes = F.array(*[
        F.struct(
            F.lit(t).alias("tbl"),
            bits_expr(qv, t).bitwiseXOR(F.lit(d)).alias("bucket"),
        )
        for t in range(n_tables)
        for d in probe_deltas
    ])
    q = queries.select(
        query_id_col,
        qv.alias("__qv"),
        F.explode(probes).alias("__tb"),
    ).select(query_id_col, "__qv", F.col("__tb.tbl").alias("tbl"), F.col("__tb.bucket").alias("bucket"))

    cand = (
        q.join(corpus, ["tbl", "bucket"])
        .select(
            query_id_col,
            id_col,
            cosine_sim(F.col("__qv"), F.col("__cv")).alias("cosine"),
        )
        # a pair found in several tables collapses to one row (cosine is
        # identical across occurrences; max is a pure dedup with partial agg)
        .groupBy(query_id_col, id_col)
        .agg(F.max("cosine").alias("cosine"))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def ivf_train(
    emb: DataFrame,
    n_cells: int = 16,
    vec_col: str = "embedding",
    sample_rows: int = 10000,
    n_iters: int = 10,
    seed: int = 42,
    id_col: str = "vec_id",
) -> np.ndarray:
    """Train an IVF coarse quantizer: k-means centroids [n_cells, dim]
    from a driver-side sample (the standard IVF recipe — the quantizer
    is tiny and trains on a bounded sample regardless of corpus size;
    at 100 TB you sample ~10^5 vectors, never the table).

    The sample is a UNIFORM deterministic hash-sample on ``id_col``
    (operators/sampling.py), NOT ``.limit(sample_rows)``: limit takes
    the first partitions in scan order, so on a corpus written
    clustered (sorted by topic/source — the normal case for a curated
    table) the quantizer would train on one region of the space and
    probe recall on the rest quietly degrades
    (tests/test_dedup.py::test_ivf_train_clustered_corpus_unbiased).
    The slight over-draw (1.2×) plus a deterministic id-ordered
    truncation makes the collected sample exactly reproducible."""
    from crfsuite_spark.operators.sampling import hash_sample

    n = emb.count()
    frac = min(1.0, 1.2 * sample_rows / max(n, 1))
    picked = hash_sample(emb.select(id_col, vec_col), id_col, frac, seed)
    if frac < 1.0:
        picked = picked.orderBy(id_col).limit(sample_rows)
    sample = np.array(
        [r[0] for r in picked.select(vec_col).collect()],
        dtype=np.float64,
    )
    rng = np.random.default_rng(seed)
    cents = sample[rng.choice(len(sample), size=min(n_cells, len(sample)), replace=False)]
    for _ in range(n_iters):
        d = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cents)):
            m = assign == c
            if m.any():
                cents[c] = sample[m].mean(axis=0)
    return cents


def ivf_assign(
    emb: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
) -> DataFrame:
    """Add a ``cell`` column = nearest centroid id, via one Arrow-batched
    pandas UDF doing a [batch, dim] @ [dim, C] matmul (no per-row
    Python). At cluster scale the corpus is written partitioned by
    ``cell`` once, and probes read only their cells (partition pruning)."""
    from pyspark.sql.functions import pandas_udf

    spark = emb.sparkSession
    c_bc = spark.sparkContext.broadcast(np.asarray(centroids, dtype=np.float64))

    @pandas_udf("int")
    def cell_of(vs: pd.Series) -> pd.Series:
        C = c_bc.value
        X = np.array(vs.tolist(), dtype=np.float64)
        # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; ||x||^2 constant per row
        d = -2.0 * (X @ C.T) + (C * C).sum(axis=1)[None, :]
        return pd.Series(d.argmin(axis=1).astype(np.int32))

    return emb.withColumn("cell", cell_of(F.col(vec_col).cast("array<double>")))


def ivf_topk(
    emb_assigned: DataFrame,
    centroids: np.ndarray,
    query: list[float] | np.ndarray,
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN point query: probe the ``n_probe`` nearest cells, exact
    cosine top-k inside them only (scan of n_probe/n_cells of the data)."""
    q = np.asarray(query, dtype=np.float64)
    C = np.asarray(centroids, dtype=np.float64)
    d = ((C - q[None, :]) ** 2).sum(axis=1)
    probes = [int(c) for c in d.argsort()[:n_probe]]
    cand = emb_assigned.where(F.col("cell").isin(probes))
    return cosine_topk(cand, q, k, id_col, vec_col)


def embedding_dup_pairs(
    emb: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_bucket_size: int | None = 50_000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via bucketed self-join:
    (id_a, id_b, cosine) with cosine ≥ threshold, id_a < id_b.

    Only pairs falling in the same hyperplane bucket are compared —
    the standard recall/cost trade; raise n_planes for cheaper, lower
    recall. Buckets over ``max_bucket_size`` are re-split on extra
    planes (:func:`refined_hyperplane_buckets`) so one hot bucket can't
    make the self-join quadratic; at or below the cap, output is
    identical to the unguarded join."""
    b = refined_hyperplane_buckets(
        emb, dim, n_planes, id_col, vec_col, seed,
        max_bucket_size=max_bucket_size,
    )
    left = b.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"), "bucket")
    right = b.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"), "bucket")
    out = (
        left.join(right, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine",
            cosine_sim(F.col("__va").cast("array<double>"), F.col("__vb").cast("array<double>")),
        )
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
    # expose the (possibly cached) bucketed frame so long-lived drivers
    # can release it once the pair join is materialized: repeated guarded
    # calls otherwise accumulate one pinned cache per refinement
    # (evictable, but never explicitly freed). Usage:
    #   pairs = embedding_dup_pairs(...); pairs.count()
    #   pairs.bucketed_frame.unpersist()
    out.bucketed_frame = b
    return out


def semantic_dedup(
    emb: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_bucket_size: int | None = 50_000,
) -> DataFrame:
    """Semantic deduplication (SemDeDup, Abbas et al. 2023): drop every
    document whose embedding is cosine-≥-threshold to a LOWER-id
    document in the same hyperplane bucket; the min-id representative
    of each near-duplicate chain discovered survives. Returns the
    surviving rows of ``emb`` (all columns).

    The greedy greater-id drop is the SlimPajama rule — deterministic,
    no connected components — applied in embedding space: candidate
    pairs come from :func:`embedding_dup_pairs` (bucketed self-join
    with the hot-bucket refinement guard), and the drop set joins back
    ``left_anti`` on the uniform id key. No broadcast assumption on
    the drop set: at corpus scale the semantic-duplicate fraction is
    tens of percent (the SemDeDup paper prunes 50 % of LAION), far
    beyond driver memory, and the anti-join sort-merges and spills.

    Carries ``bucketed_frame`` (the possibly-cached bucket frame from
    the pair join) — long-lived drivers should unpersist it once the
    survivors are materialized.
    """
    pairs = embedding_dup_pairs(
        emb, dim, threshold=threshold, n_planes=n_planes, id_col=id_col,
        vec_col=vec_col, seed=seed, max_bucket_size=max_bucket_size,
    )
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    out = emb.join(losers, id_col, "left_anti")
    out.bucketed_frame = pairs.bucketed_frame
    return out
