"""MinHash + LSH banding as pure DataFrame operations.

From-scratch Spark-first implementation of the classic
shingle → minhash → band → bucket-join pipeline (Broder '97 /
Leskovec-Rajaraman-Ullman ch.3, public algorithms):

- character-k-gram shingling via JVM-side ``transform(sequence(...))``
  (no Python UDF), hashed to int64 immediately so no string arrays
  ever cross a shuffle,
- ``n_hashes`` universal hash functions ``(a_j * h + b_j) mod p`` over
  the shingle hashes, minimized **map-side** with
  ``array_min(transform(...))`` — signature computation is
  embarrassingly parallel, zero shuffle (at 100 TB the scan partitions
  stream straight through whole-stage codegen),
- LSH banding: signatures split into ``bands`` groups of rows, band
  key = hash of the group → candidate pairs share a bucket,
- Jaccard verification on the hashed shingle sets via
  ``array_intersect`` / ``array_union`` (int64 arrays; collision
  probability over a 2^31 space at ~10^3 shingles/doc is negligible
  and only perturbs the 3rd decimal of an estimate that LSH already
  quantizes).

The only shuffle in the whole pipeline is the band-bucket join, on
keys that are uniform by construction (hash values) — no skew handling
needed, and the candidate side is orders of magnitude smaller than the
corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Mersenne-31 modulus: with h, a, b < 2^31, h*a + b < 2^62 stays inside
# int64 under ANSI arithmetic (Spark 4 default)
MERSENNE = (1 << 31) - 1

# exact-stats broadcast cap for the screen/verify join sides (bytes of
# array payload). 256 MB framed (~1-2 GB as built hash relations when
# two sides qualify at once) sits inside guide-§3.1's "a few hundred
# MB is usually fine" at 4+ GB/core and far under the 8 GB hard cap,
# and — because the decision uses EXACT measured sizes, never planner
# estimates — the spill-safe sort-merge fallback engages unchanged
# past it. Raising 48 MB → 256 MB moved the sf10 regime (500k docs:
# 140 MB signature-vector side, 112 MB band side) from sort-merge over
# the 13M-row candidate stream to map-side broadcast probes:
# dedup_minhash 31.9/41.2 s → 25.0/22.7 s over interleaved reps,
# identical pairs; sf ≤ 1 sides were already under 48 MB (no change).
_BROADCAST_CAP = 256 * 1024 * 1024


def char_shingles(col: str, k: int = 3):
    """Distinct character k-gram array, JVM-side."""
    return F.array_distinct(
        F.expr(
            f"CASE WHEN length({col}) < {k} THEN array({col}) "
            f"ELSE transform(sequence(0, length({col}) - {k}), "
            f"i -> substr({col}, i + 1, {k})) END"
        )
    )


def shingle_hashes(col: str, k: int = 3, hash_fn: str = "xxhash64"):
    """Distinct hashed char k-grams — int64 array in [0, 2^31).

    Hashing before ``array_distinct`` keeps every downstream operator
    (signature min, Jaccard verify) on fixed-width ints instead of
    string arrays.

    ``hash_fn``: 'xxhash64' (default, one JVM hash op) or 'md5_32'
    (first 8 hex chars of md5 → int, reproducible in any engine with
    md5() — the DuckDB oracle uses this variant).
    """
    if hash_fn == "md5_32":
        one = f"pmod(CAST(conv(substr(md5({{s}}), 1, 8), 16, 10) AS BIGINT), {MERSENNE}L)"
    else:
        one = f"pmod(xxhash64({{s}}), {MERSENNE}L)"
    return F.array_distinct(
        F.expr(
            f"CASE WHEN length({col}) < {k} "
            f"THEN array({one.format(s=col)}) "
            f"ELSE transform(sequence(0, length({col}) - {k}), "
            f"i -> {one.format(s=f'substr({col}, i + 1, {k})')}) END"
        )
    )


def _hash_params(n_hashes: int, seed: int) -> list[tuple[int, int]]:
    import numpy as np

    rng = np.random.default_rng(seed)
    return [
        (int(rng.integers(1, MERSENNE - 1)), int(rng.integers(0, MERSENNE - 1)))
        for _ in range(n_hashes)
    ]


def minhash_signature(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 16,
    shingle_size: int = 3,
    seed: int = 42,
    keep_shingles: bool = True,
    num_partitions: int | None = None,
    hash_fn: str = "xxhash64",
    impl: str = "auto",
) -> DataFrame:
    """One row per id with mh0..mh{n-1} signature columns
    (+ ``__hs``, the hashed shingle set, when ``keep_shingles``).

    Entirely map-side — no explode, no groupBy, no shuffle — in one of
    three bit-identical impls (parity-tested in test_minhash_local.py):
    ``"hof"`` pure-JVM ``array_min(transform(h, h -> (a*h+b) mod p))``,
    ``"arrow"`` JVM shingle hashes + numpy affine mins, ``"numpy"``
    everything vectorized inside one mapInPandas (xxhash64 only).
    ``"auto"`` (default) picks numpy for xxhash64 — the HOF form
    evaluates ~(len + n_hashes·n_shingles) interpreted closures per
    document and the signature stage dominated the sf10 dedup run
    (43.0 s vs 6.8 s warm, 500k docs / 32 hashes) — and hof otherwise
    (md5_32 keeps the JVM form the DuckDB oracle mirrors).

    ``num_partitions``: explicitly widen the input first. Use when the
    source collapses to fewer splits than cores (small local files; at
    cluster scale the scan is already wide and this should stay None —
    probing the partition count of a derived plan would force AQE to
    materialize it).
    """
    if num_partitions:
        df = df.repartition(num_partitions)
    if impl == "auto":
        impl = "numpy" if hash_fn == "xxhash64" else "hof"
    if impl == "numpy":
        # Full-numpy signature stage: shingling + XXH64 + affine mins
        # all inside one mapInPandas, no HOF lambdas. The HOF path
        # evaluates ~(len + n_hashes·n_shingles) interpreted closures
        # per document (~8,500 for a 300-char doc at 32 hashes) at
        # ~300 ns each — measured 41 s of a 44 s dedup_minhash run at
        # sf10 — while the vectorized XXH64 (minhash_local.xxh64_windows,
        # bit-identical, parity-tested) hashes every shingle of a
        # document in a few array passes. xxhash64 only (md5_32 keeps
        # the HOF form the DuckDB oracle mirrors); non-ASCII rows fall
        # back to the scalar per-shingle hash (code-point substr
        # semantics), NULL texts drop exactly like the HOF filter.
        if hash_fn != "xxhash64":
            raise ValueError("impl='numpy' supports hash_fn='xxhash64' only")
        import numpy as np

        from crfsuite_spark.operators.minhash_local import shingle_hash_array

        np_params = _hash_params(n_hashes, seed)
        a_vec = np.array([a for a, _ in np_params], dtype=np.int64)
        b_vec = np.array([b for _, b in np_params], dtype=np.int64)
        id_dtype = dict(df.dtypes)[id_col]
        schema = f"{id_col} {id_dtype}"
        if keep_shingles:
            schema += ", __hs array<bigint>"
        schema += ", " + ", ".join(f"mh{j} bigint" for j in range(n_hashes))
        k = shingle_size

        def np_sig_fn(batches):
            memo: dict = {}
            for pdf in batches:
                texts = pdf["__mh_text"]
                keep = texts.notna().to_numpy()
                if not keep.any():
                    continue
                sub = pdf.loc[keep]
                hss = [
                    shingle_hash_array(t, k, memo) for t in sub["__mh_text"]
                ]
                mh = np.empty((len(sub), n_hashes), dtype=np.int64)
                for i, hs in enumerate(hss):
                    mh[i] = ((hs[:, None] * a_vec[None, :] + b_vec) % MERSENNE).min(axis=0)
                out = sub[[id_col]].copy()
                if keep_shingles:
                    out["__hs"] = [h.tolist() for h in hss]
                for j in range(n_hashes):
                    out[f"mh{j}"] = mh[:, j]
                yield out

        # text aliased to a private name so id_col == text_col (e.g.
        # minhash_join signing a bare key column) stays unambiguous in
        # the pandas batch
        sel = df.select(F.col(id_col).alias(id_col),
                        F.col(text_col).alias("__mh_text"))
        return sel.mapInPandas(np_sig_fn, schema)
    base = df.select(
        id_col, shingle_hashes(text_col, shingle_size, hash_fn).alias("__hs")
    ).where(F.size("__hs") > 0)
    params = _hash_params(n_hashes, seed)
    if impl == "arrow":
        # one Arrow-batched numpy pass: [n_shingles, n_hashes] affine
        # broadcast + column-min per row, bit-identical to the HOF path
        # (same params, same modulus — parity-tested). Spark HOF lambdas
        # are interpreted per element, so this trades an Arrow hop for
        # vectorized math; measured at sf0.1/32 hashes the SIGNATURE
        # stage is ~25% faster here (3.9 s vs 5.1 s warm), but the full
        # self-pairs path is a wash because the downstream band join
        # then pays the Arrow hop back — pick whichever side of the
        # JVM/Python boundary the surrounding pipeline already lives on.
        import numpy as np
        import pandas as pd

        a_vec = np.array([a for a, _ in params], dtype=np.int64)
        b_vec = np.array([b for _, b in params], dtype=np.int64)
        id_dtype = dict(base.dtypes)[id_col]
        schema = f"{id_col} {id_dtype}"
        if keep_shingles:
            schema += ", __hs array<bigint>"
        schema += ", " + ", ".join(f"mh{j} bigint" for j in range(n_hashes))

        def sig_fn(batches):
            for pdf in batches:
                n = len(pdf)
                if n == 0:
                    continue
                mh = np.empty((n, n_hashes), dtype=np.int64)
                for i, hs in enumerate(pdf["__hs"]):
                    h = np.asarray(hs, dtype=np.int64)
                    # h, a < 2^31 -> h*a + b < 2^62: stays inside int64
                    mh[i] = ((h[:, None] * a_vec[None, :] + b_vec) % MERSENNE).min(axis=0)
                out = pdf[[id_col] + (["__hs"] if keep_shingles else [])].copy()
                for j in range(n_hashes):
                    out[f"mh{j}"] = mh[:, j]
                yield out

        return base.mapInPandas(sig_fn, schema)
    sig_cols = [
        F.expr(
            f"array_min(transform(__hs, h -> pmod(h * {a}L + {b}L, {MERSENNE}L)))"
        ).alias(f"mh{j}")
        for j, (a, b) in enumerate(params)
    ]
    keep = ["__hs"] if keep_shingles else []
    return base.select(id_col, *keep, *sig_cols)


def lsh_band_buckets(
    sig: DataFrame, id_col: str, n_hashes: int, bands: int
) -> DataFrame:
    """Explode a signature frame to (id, band_idx, bucket) rows."""
    r = n_hashes // bands
    assert bands * r == n_hashes, "bands must divide n_hashes"
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(*[F.col(f"mh{b * r + i}") for i in range(r)]).alias("bucket"),
        )
        for b in range(bands)
    ]
    return sig.select(
        id_col,
        F.explode(F.array(*band_cols)).alias("__band"),
    ).select(id_col, F.col("__band.band").alias("band"), F.col("__band.bucket").alias("bucket"))


def jaccard(col_a, col_b):
    return F.size(F.array_intersect(col_a, col_b)) / F.size(F.array_union(col_a, col_b))


def minhash_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    n_hashes: int = 16,
    bands: int = 8,
    shingle_size: int = 3,
    jaccard_threshold: float = 0.5,
    seed: int = 42,
    broadcast_right: bool = True,
) -> DataFrame:
    """Fuzzy join: rows of ``left`` to rows of ``right`` whose text
    Jaccard (char shingles) ≥ threshold, found via LSH blocking.

    Returns left's columns + right's columns + ``jaccard``.
    ``broadcast_right``: the right side is a dictionary, orders of
    magnitude smaller than the corpus — ship its band buckets and
    shingle sets to every executor so the left side never shuffles.
    """
    # signatures feed both the band explode and the verification join —
    # persist so the shingle chain runs once per side
    lsig = minhash_signature(left, left_col, left_col, n_hashes, shingle_size, seed).persist()
    rsig = minhash_signature(right.select(right_col).distinct(), right_col, right_col, n_hashes, shingle_size, seed).persist()
    bcast = F.broadcast if broadcast_right else (lambda x: x)
    lb = lsh_band_buckets(lsig, left_col, n_hashes, bands)
    rb = lsh_band_buckets(rsig, right_col, n_hashes, bands)
    cand = (
        lb.join(bcast(rb), ["band", "bucket"])
        .select(left_col, right_col)
        .distinct()
    )
    lsh_l = lsig.select(left_col, F.col("__hs").alias("__sh_l"))
    lsh_r = rsig.select(right_col, F.col("__hs").alias("__sh_r"))
    # the left (corpus-side) shingle frame must never be auto-broadcast
    # (its size is invisible to the planner behind the HOF projection)
    # nor hash-built; sort-merge spills — see minhash_self_pairs
    verified = (
        cand.hint("merge").join(lsh_l, left_col)
        .join(bcast(lsh_r), right_col)
        .withColumn("jaccard", jaccard(F.col("__sh_l"), F.col("__sh_r")))
        .where(F.col("jaccard") >= jaccard_threshold)
        .drop("__sh_l", "__sh_r")
    )
    out = verified.join(bcast(right), right_col)
    # cache-lifetime contract (same shape as similarity.embedding_dup_
    # pairs.bucketed_frame): the returned plan SCANS these persisted
    # signature frames, so they must stay cached until the caller's
    # final evaluation — but no longer. A caller that materializes the
    # result (count/collect/write) should then release them:
    #   for c in out.pinned_caches: c.unpersist()
    # Left unreleased they stay pinned until LRU eviction — harmless
    # for one-shot jobs, a leak for long-lived sessions.
    out.pinned_caches = [lsig, rsig]
    return out


def minhash_pairs_against(
    new: DataFrame,
    ref: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 32,
    bands: int = 8,
    shingle_size: int = 5,
    jaccard_threshold: float = 0.8,
    seed: int = 42,
    num_partitions: int | None = None,
    hash_fn: str = "xxhash64",
    impl: str = "auto",
    estimate_margin: float | None = 0.25,
) -> DataFrame:
    """Cross-corpus near-duplicate pairs: (id_new, id_ref, jaccard)
    with Jaccard ≥ threshold, LSH-blocked between TWO tables — the
    incremental-crawl primitive (``ref`` = yesterday's corpus, ``new``
    = today's crawl). Same two-stage verify as
    :func:`minhash_self_pairs` (band-bucket candidates → signature-
    estimate screen → exact shingle Jaccard), same sort-merge pinning
    for the array-carrying joins, and the same per-row determinism: a
    document's signature does not depend on which table it sits in, so
    results equal the self-pairs chain over the union restricted to
    cross-side pairs. Neither corpus is assumed small — nothing is
    broadcast (for a dictionary-sized right side use
    :func:`minhash_join` instead)."""
    import math

    sig_n = minhash_signature(
        new, id_col, text_col, n_hashes, shingle_size, seed,
        num_partitions=num_partitions, hash_fn=hash_fn, impl=impl,
    ).persist()
    sig_r = minhash_signature(
        ref, id_col, text_col, n_hashes, shingle_size, seed,
        num_partitions=num_partitions, hash_fn=hash_fn, impl=impl,
    ).persist()
    bn = lsh_band_buckets(sig_n, id_col, n_hashes, bands).select(
        F.col(id_col).alias("id_new"), "band", "bucket"
    )
    br = lsh_band_buckets(sig_r, id_col, n_hashes, bands).select(
        F.col(id_col).alias("id_ref"), "band", "bucket"
    )
    # exact-stats join strategy (see minhash_self_pairs note): one agg
    # per persisted signature frame yields true byte sizes; each screen
    # /verify side broadcasts iff it actually fits
    def _stats(sig):
        row = sig.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.size("__hs")).alias("sh_total"),
        ).collect()[0]
        n, sh_total = row["n"], row["sh_total"] or 0
        mv_ok = n * (8 * n_hashes + 24) < _BROADCAST_CAP
        sh_ok = sh_total * 8 + n * 24 < _BROADCAST_CAP
        band_ok = n * bands * 28 < _BROADCAST_CAP
        return (
            F.broadcast if mv_ok else (lambda f: f.hint("merge")),
            F.broadcast if sh_ok else (lambda f: f.hint("merge")),
            F.broadcast if band_ok else (lambda f: f.hint("merge")),
        )

    mv_n_side, sh_n_side, _ = _stats(sig_n)
    mv_r_side, sh_r_side, band_r_side = _stats(sig_r)
    cand = (
        bn.join(band_r_side(br), ["band", "bucket"])
        .select("id_new", "id_ref")
        .distinct()
    )
    if estimate_margin is not None:
        min_eq = max(
            0, math.ceil((jaccard_threshold - estimate_margin) * n_hashes - 1e-9)
        )
        if min_eq > 0:
            mv_n = sig_n.select(
                F.col(id_col).alias("id_new"),
                F.array(*[F.col(f"mh{j}") for j in range(n_hashes)]).alias("__mv_a"),
            )
            mv_r = sig_r.select(
                F.col(id_col).alias("id_ref"),
                F.array(*[F.col(f"mh{j}") for j in range(n_hashes)]).alias("__mv_b"),
            )
            n_eq = F.expr(
                "size(filter(zip_with(__mv_a, __mv_b, (x, y) -> x = y), v -> v))"
            )
            cand = (
                cand.join(mv_n_side(mv_n), "id_new")
                .join(mv_r_side(mv_r), "id_ref")
                .where(n_eq >= F.lit(min_eq))
                .select("id_new", "id_ref")
            )
    out = (
        cand
        .join(sh_n_side(sig_n.select(F.col(id_col).alias("id_new"), F.col("__hs").alias("__sh_a"))), "id_new")
        .join(sh_r_side(sig_r.select(F.col(id_col).alias("id_ref"), F.col("__hs").alias("__sh_b"))), "id_ref")
        .withColumn("jaccard", jaccard(F.col("__sh_a"), F.col("__sh_b")))
        .where(F.col("jaccard") >= jaccard_threshold)
        .select("id_new", "id_ref", "jaccard")
    )
    # cache-lifetime contract: see minhash_self_pairs
    out.pinned_caches = [sig_n, sig_r]
    return out


def minhash_self_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 16,
    bands: int = 8,
    shingle_size: int = 3,
    jaccard_threshold: float = 0.8,
    seed: int = 42,
    num_partitions: int | None = None,
    hash_fn: str = "xxhash64",
    impl: str = "auto",
    estimate_margin: float | None = 0.25,
) -> DataFrame:
    """Near-duplicate candidate pairs within one table:
    (id_a, id_b, jaccard) with id_a < id_b, Jaccard ≥ threshold.

    ``estimate_margin``: two-stage verification (the LRU ch.3 design).
    Band-join candidates are first screened on the SIGNATURE estimate
    Ĵ = (#equal minhash components)/n — a fixed-width 8·n_hashes-byte
    comparison — and only pairs with
    #equal ≥ ceil((threshold − margin)·n_hashes) proceed to the exact
    shingle-set Jaccard. Templated corpora make band candidates ~25×
    the corpus size (measured: 13M candidates over 500k docs at sf10);
    without the screen the exact verify gathers two ~10^4-byte shingle
    arrays per candidate (~0.5 TB of shuffle at sf10), with it the big
    arrays move only for screened survivors. The screen is
    deterministic given the signatures, so the DuckDB oracle reproduces
    it bit-for-bit; it drops a true ≥-threshold pair only when its
    estimate falls ``margin`` below the true Jaccard (≥3σ at the
    defaults, P ≈ 10^-4 — on top of LSH banding's own probabilistic
    recall). ``None`` disables the screen (exact behavior of the
    single-stage verify)."""
    import math

    sig = minhash_signature(
        df, id_col, text_col, n_hashes, shingle_size, seed,
        num_partitions=num_partitions, hash_fn=hash_fn, impl=impl,
    ).persist()
    b = lsh_band_buckets(sig, id_col, n_hashes, bands)
    ba = b.select(F.col(id_col).alias("id_a"), "band", "bucket")
    bb = b.select(F.col(id_col).alias("id_b"), "band", "bucket")
    # Join strategy (r06): decided HERE from EXACT stats, not estimates.
    # The initial planner cannot size frames downstream of HOF/Arrow
    # projections — its tiny input-proportional estimate auto-broadcast
    # the shingle-set frame (500k docs × ~10^2 shingles ≫ driver memory)
    # and aborted the sf10 bench, which is why r05 pinned every join to
    # spillable sort-merge. But the signature frame is persisted anyway,
    # so ONE aggregate over the cache (which also fills it) yields the
    # TRUE byte sizes of both join sides: the fixed-width 8·n_hashes
    # signature-vector frame and the variable shingle-set frame each
    # broadcast iff their exact footprint fits, otherwise keep the old
    # sort-merge shape. At sf1.0 this turns the estimate screen from a
    # 6.3 s double sort of 6.1M candidate rows into a broadcast probe
    # (~1 s); at sf10 the sides exceed the cap and nothing regresses.
    stats = sig.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.size("__hs")).alias("sh_total"),
    ).collect()[0]
    n_docs, sh_total = stats["n"], stats["sh_total"] or 0
    mv_small = n_docs * (8 * n_hashes + 24) < _BROADCAST_CAP
    sh_small = sh_total * 8 + n_docs * 24 < _BROADCAST_CAP
    band_small = n_docs * bands * 28 < _BROADCAST_CAP
    mv_side = F.broadcast if mv_small else (lambda f: f.hint("merge"))
    sh_side = F.broadcast if sh_small else (lambda f: f.hint("merge"))
    band_side = F.broadcast if band_small else (lambda f: f.hint("merge"))
    cand = (
        ba.join(band_side(bb), ["band", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    # screen-broadcast regime: the per-band duplicate candidate rows
    # cost only extra hash probes, so the pair-dedup moves AFTER the
    # screen (distinct over the tiny survivor set) instead of a full
    # exchange + aggregate over the 10^6-row raw candidate stream;
    # sort-merge regime keeps the early distinct (fewer sorted rows)
    defer_distinct = mv_small and estimate_margin is not None
    if not defer_distinct:
        cand = cand.distinct()
    if estimate_margin is not None:
        min_eq = max(
            0, math.ceil((jaccard_threshold - estimate_margin) * n_hashes - 1e-9)
        )
        if min_eq > 0:
            mv = sig.select(
                id_col,
                F.array(*[F.col(f"mh{j}") for j in range(n_hashes)]).alias("__mv"),
            )
            n_eq = F.expr(
                "size(filter(zip_with(__mv_a, __mv_b, (x, y) -> x = y), v -> v))"
            )
            cand = (
                cand
                .join(mv_side(mv.select(F.col(id_col).alias("id_a"), F.col("__mv").alias("__mv_a"))), "id_a")
                .join(mv_side(mv.select(F.col(id_col).alias("id_b"), F.col("__mv").alias("__mv_b"))), "id_b")
                .where(n_eq >= F.lit(min_eq))
                .select("id_a", "id_b")
            )
        elif defer_distinct:
            cand = cand.distinct()
            defer_distinct = False
    if defer_distinct:
        cand = cand.distinct()
    sh = sig.select(id_col, "__hs")
    out = (
        cand
        .join(sh_side(sh.select(F.col(id_col).alias("id_a"), F.col("__hs").alias("__sh_a"))), "id_a")
        .join(sh_side(sh.select(F.col(id_col).alias("id_b"), F.col("__hs").alias("__sh_b"))), "id_b")
        .withColumn("jaccard", jaccard(F.col("__sh_a"), F.col("__sh_b")))
        .where(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )
    # cache-lifetime contract: the returned plan scans the persisted
    # signature frame (band explode + estimate screen + exact verify all
    # feed off it), so it must stay cached until the caller's final
    # evaluation. Callers that materialize the result should release it:
    #   for c in out.pinned_caches: c.unpersist()
    out.pinned_caches = [sig]
    return out
