"""Entity linking: broadcast alias-dictionary join + MinHash-LSH
fuzzy candidate blocking for misses.

North-star stage J5 (SURVEY.md §2.4): mentions link to canonical
entity ids through

1. surface normalization (lowercase, punctuation strip) — JVM-side,
2. an **equi-join against the broadcast alias dictionary** (dictionaries
   are small relative to the mention stream: always broadcast, never
   shuffle the 10^12-row side),
3. for unmatched mentions, MinHash-LSH blocking over character
   3-gram shingles (operators/minhash.py) against the alias dictionary,
   verified by exact Jaccard, accepted above a threshold,
4. disambiguation: highest dictionary weight, then lexicographic
   canonical_id (deterministic).

Unlinkable mentions get a deterministic surrogate id
``unk:<normalized surface>`` so downstream canonicalization can still
cluster repeat mentions of the same unseen entity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def normalize_surface(col) -> "F.Column":
    """lower + drop every non-[a-z0-9 ] char + trim.

    Runs on the full mention stream at operator level, so the deletion
    goes through ``translate`` with the negated-class regex only as the
    non-ASCII fallback (octet_length == char_length detects ASCII
    without a regex) — identical output, and the common-case row never
    touches the pathologically slow negated-class matcher
    (functions/analysis.py _fp_normalized documents the measurement)."""
    from crfsuite_spark.functions.analysis import _FP_ASCII_BAD

    c = F.col(col) if isinstance(col, str) else col
    ascii_clean = F.translate(F.lower(c), _FP_ASCII_BAD, "")
    return F.trim(
        F.when(
            F.octet_length(ascii_clean) == F.length(ascii_clean), ascii_clean
        ).otherwise(F.regexp_replace(ascii_clean, r"[^a-z0-9 ]+", ""))
    )


def link_mentions(
    mentions: DataFrame,
    alias_dict: DataFrame,
    surface_col: str = "surface",
    fuzzy: bool = True,
    jaccard_threshold: float = 0.5,
    fuzzy_collect_threshold: int = 100_000,
) -> DataFrame:
    """Attach ``canonical_id`` (+ ``link_method``) to every mention row.

    ``alias_dict``: (alias, canonical_id, canonical_name, entity_type,
    weight) — alias already normalized.
    """
    spark = mentions.sparkSession
    m = mentions.withColumn("__norm", normalize_surface(surface_col))
    # normalize the dictionary side with the SAME normalizer as mentions
    # (aliases may carry punctuation, e.g. "ms. johnson"); NULL weights are
    # coerced to -inf so they lose every tie-break instead of winning the
    # ascending struct comparison.
    #
    # Disambiguation of multi-entity aliases (max weight, then
    # lexicographic id) happens on the DICTIONARY side, collapsing it to
    # ONE row per normalized alias BEFORE the broadcast join: min_by over
    # (-weight, id) in a partial-aggregated groupBy over dictionary-scale
    # data. The join is then 1:1, so every mention row — including exact
    # duplicate rows, a legitimate input for a public API — survives with
    # its own identity, and the 10^12-row mention stream never shuffles
    # at all. (An earlier revision grouped the JOINED frame by
    # mentions.columns, which both shuffled the full stream and silently
    # collapsed duplicate mention rows.)
    d_best = (
        alias_dict.select(
            normalize_surface("alias").alias("__norm"),
            "canonical_id",
            F.coalesce(F.col("weight").cast("double"), F.lit(float("-inf"))).alias("__w"),
        )
        .groupBy("__norm")
        .agg(
            F.min_by(
                "canonical_id",
                F.struct((-F.col("__w")).alias("nw"), F.col("canonical_id").alias("id")),
            ).alias("canonical_id")
        )
    )
    exact = m.join(F.broadcast(d_best), "__norm", "left")
    # fuzzy link table: one row per distinct missed surface. Deriving it
    # re-runs a column-pruned pass over the mention scan + broadcast join
    # (cheap: the scan reads only the surface column) instead of persisting
    # the full exact frame — persists here leaked across calls and pinned the whole
    # mention stream in cache. While the link table stays dictionary-scale
    # it is collected (bounded by a limit probe, never an unbounded
    # collect) and re-broadcast — exactly what the broadcast join would
    # ship anyway; on an open-domain corpus where distinct missed surfaces
    # can be ~10^8, the probe overflows ``fuzzy_collect_threshold``, the
    # table stays distributed and the attach is a plain shuffle join on
    # the uniform __norm key. NOT persisted: the lazy join evaluates the
    # fuzzy chain exactly once per downstream action, and callers that
    # consume the linked frame repeatedly (kg/pipeline.py) persist THAT
    # result — persisting here leaked a large cache per call.
    best = None
    best_distributed = False
    if fuzzy:
        miss_norms = (
            exact.where(F.col("canonical_id").isNull())
            .select("__norm").where(F.length("__norm") > 0).distinct()
        )
        # Small path: when the DISTINCT missed surfaces fit the collect
        # threshold (probed with limit, never unbounded), the whole LSH
        # chain runs driver-side in numpy — bit-exact vs the distributed
        # path (operators/minhash_local.py, parity-tested), one Spark
        # job (the column-pruned miss collect) instead of ~10. The
        # dictionary side is by contract broadcast-small (it is ALWAYS
        # broadcast above), so collecting its three link columns is the
        # same bound the broadcast already pays.
        miss_head = miss_norms.limit(fuzzy_collect_threshold + 1).collect()
        local_best = None
        if not miss_head:
            local_best = []
        elif len(miss_head) <= fuzzy_collect_threshold:
            from crfsuite_spark.operators.minhash_local import local_fuzzy_best

            dict_rows = [
                (r["__a"], r["canonical_id"], r["__w"])
                for r in alias_dict.select(
                    normalize_surface("alias").alias("__a"),
                    "canonical_id",
                    F.coalesce(
                        F.col("weight").cast("double"), F.lit(float("-inf"))
                    ).alias("__w"),
                ).where(F.length("__a") > 0).distinct().collect()
            ]
            local_best = local_fuzzy_best(
                [r["__norm"] for r in miss_head], dict_rows,
                jaccard_threshold=jaccard_threshold,
            )
        if local_best is not None:
            if local_best:
                best = spark.createDataFrame(
                    local_best, "__norm string, __fuzzy_id string"
                )
        else:
            # candidate budget overflow (local_fuzzy_best -> None) or
            # miss set over threshold: distributed, spillable chain
            best_df = _fuzzy_best(miss_norms, alias_dict, jaccard_threshold)
            head = best_df.limit(fuzzy_collect_threshold + 1).collect()
            if len(head) <= fuzzy_collect_threshold:
                if head:
                    best = spark.createDataFrame(head, "__norm string, __fuzzy_id string")
            else:
                best = best_df
                best_distributed = True
    out = exact
    if best is not None:
        out = out.join(best if best_distributed else F.broadcast(best), "__norm", "left")
    else:
        out = out.withColumn("__fuzzy_id", F.lit(None).cast("string"))
    return (
        out.withColumn(
            "link_method",
            F.when(F.col("canonical_id").isNotNull(), F.lit("exact"))
            .when(F.col("__fuzzy_id").isNotNull(), F.lit("fuzzy"))
            .otherwise(F.lit("surrogate")),
        )
        .withColumn(
            "canonical_id",
            F.coalesce(
                F.col("canonical_id"),
                F.col("__fuzzy_id"),
                F.concat(F.lit("unk:"), F.col("__norm")),
            ),
        )
        .drop("__norm", "__fuzzy_id")
    )


def canonicalize_surrogates(
    linked: DataFrame,
    jaccard_threshold: float = 0.85,
    driver_threshold: int = 20_000,
) -> DataFrame:
    """North-star canonicalization stage: cluster surrogate ids
    (``unk:<surface>`` — mentions the dictionary could not link) whose
    surfaces are near-duplicates, via MinHash-LSH similarity edges →
    connected components (kg/canonicalize.py). Dictionary-linked ids
    are already canonical and pass through untouched.

    Input: (surface, canonical_id, link_method) from
    :func:`link_mentions`. Returns the same frame with ``canonical_id``
    rewritten to the cluster representative (min id) for surrogates.
    """
    from crfsuite_spark.kg.canonicalize import connected_components
    from crfsuite_spark.operators.minhash import minhash_self_pairs

    unk = linked.where(F.col("link_method") == "surrogate").select(
        "canonical_id"
    ).distinct()
    # Small path: the surrogate set is bounded by DISTINCT unlinked
    # surfaces — dictionary scale on transcript corpora. Below the
    # probed threshold the LSH self-pairs + union-find run driver-side
    # (operators/minhash_local.py, bit-exact vs the distributed chain;
    # union-by-min = the CC min-label convention), one job instead of
    # ~15. Over the threshold, or if the candidate-pair budget blows up
    # (local_self_pairs -> None), the distributed path below runs
    # unchanged. ``driver_threshold=0`` disables the small path.
    if driver_threshold:
        head = unk.limit(driver_threshold + 1).collect()
        if len(head) <= driver_threshold:
            from crfsuite_spark.operators.minhash_local import local_self_pairs

            ids = [r["canonical_id"] for r in head]
            pairs_pdf = local_self_pairs(
                ids, [i[4:] for i in ids],
                n_hashes=32, bands=8, shingle_size=3,
                jaccard_threshold=jaccard_threshold,
            )
            if pairs_pdf is not None:
                if len(pairs_pdf) == 0:
                    return linked
                parent: dict = {}

                def find(x):
                    r = x
                    while parent[r] != r:
                        r = parent[r]
                    while parent[x] != r:
                        parent[x], x = r, parent[x]
                    return r

                for a, b in zip(pairs_pdf["id_a"], pairs_pdf["id_b"]):
                    parent.setdefault(a, a)
                    parent.setdefault(b, b)
                    ra, rb = find(a), find(b)
                    if ra != rb:
                        lo, hi = (ra, rb) if ra < rb else (rb, ra)
                        parent[hi] = lo
                remap_rows = [
                    (n, find(n)) for n in parent if find(n) != n
                ]
                if not remap_rows:
                    return linked
                spark = linked.sparkSession
                remap = F.broadcast(
                    spark.createDataFrame(
                        remap_rows, "canonical_id string, __canon string"
                    )
                )
                return (
                    linked.join(remap, "canonical_id", "left")
                    .withColumn(
                        "canonical_id", F.coalesce("__canon", "canonical_id")
                    )
                    .drop("__canon")
                )
    # persist + count() BEFORE connected_components, so the expensive
    # minhash pipeline over the surrogate set is materialized exactly
    # once and every downstream reference (the emptiness probe, CC's
    # symmetrized union) reads the cache. count() as the probe is
    # deliberate: unlike take(1), it materializes EVERY partition, so
    # CC starts from a complete cache (contract-asserted in
    # tests/test_kg.py::test_canonicalize_surrogates_edges_cached).
    # Measured honestly: on this Spark version AQE's exchange reuse
    # already skips most of the recompute even without the persist
    # (instrumented source-scan counts are identical), but that is an
    # engine heuristic over shared exchange subtrees — the persist pins
    # the one-LSH-pass guarantee explicitly, version- and
    # plan-shape-independently, for the cost of caching a narrow
    # (src, dst) frame bounded by the distinct unlinked surfaces. CC
    # eagerly materializes everything it returns (collect or
    # localCheckpoint), so the cache is dropped as soon as it finishes.
    pairs = minhash_self_pairs(
        unk.withColumn("__s", F.expr("substring(canonical_id, 5)")),
        "canonical_id", "__s",
        n_hashes=32, bands=8, shingle_size=3,
        jaccard_threshold=jaccard_threshold,
    )
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).persist()
    try:
        n_edges = edges.count()
        # edges is now fully materialized — the minhash internals'
        # pinned signature cache has served its purpose; release it so
        # repeated canonicalization calls don't accrete cached frames
        for c in getattr(pairs, "pinned_caches", []):
            c.unpersist()
        if n_edges == 0:
            return linked
        cc = connected_components(edges)
    finally:
        edges.unpersist()
    remap = F.broadcast(
        cc.select(F.col("node").alias("canonical_id"),
                  F.col("component").alias("__canon"))
    )
    return (
        linked.join(remap, "canonical_id", "left")
        .withColumn("canonical_id", F.coalesce("__canon", "canonical_id"))
        .drop("__canon")
    )


def _fuzzy_best(
    miss_norms: DataFrame, alias_dict: DataFrame, threshold: float
) -> DataFrame:
    """MinHash-LSH candidate blocking + exact-Jaccard verify for distinct
    normalized surfaces the dictionary missed.

    The dictionary side is normalized with the SAME normalizer as the
    query side (an alias like "Ms. Johnson" must shed its punctuation
    before shingling, or the Jaccard against the normalized mention is
    deflated and fuzzy recall drops). Returns (__norm, __fuzzy_id)."""
    from crfsuite_spark.operators.minhash import minhash_join

    d = (
        alias_dict.select(
            normalize_surface("alias").alias("__a"),
            "canonical_id",
            F.coalesce(F.col("weight").cast("double"), F.lit(float("-inf"))).alias("weight"),
        )
        .where(F.length("__a") > 0)
        .distinct()
    )
    cands = minhash_join(
        miss_norms.select(F.col("__norm").alias("__q")),
        d,
        left_col="__q",
        right_col="__a",
        n_hashes=16,
        bands=8,
        shingle_size=3,
        jaccard_threshold=threshold,
    )
    # best candidate per query: jaccard desc, weight desc, id asc
    w = Window.partitionBy("__q").orderBy(
        F.desc("jaccard"), F.desc("weight"), F.asc("canonical_id")
    )
    return (
        cands.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(F.col("__q").alias("__norm"), F.col("canonical_id").alias("__fuzzy_id"))
    )
