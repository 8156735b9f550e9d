"""Deduplication operators for large-scale training-data pipelines.

All pure DataFrame ops designed for the 100 TB shape:

- **exact**: hash-groupBy on a text digest — one shuffle on a uniform
  key (md5), no skew;
- **MinHash + LSH near-dup**: shingle → minhash → band → bucket join
  (operators/minhash.py) → exact-Jaccard verify → connected components
  → keep cluster representative;
- **SimHash**: 32-bit sign-of-weighted-token-hash fingerprint computed
  with JVM-side bit arithmetic (one explode + one groupBy); near-dups
  = same fingerprint (or small Hamming distance via band rotation);
- **n-gram Jaccard**: sparse similarity join — explode word shingles,
  self-join on shingle, count co-occurrences, Jaccard from set sizes.
  The join key is a shingle (uniform-ish); a stopword-like hot shingle
  is the classic skew risk, so shingles above ``max_shingle_df`` are
  dropped (standard prefix-filtering trick).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep the min-id row per exact text duplicate group.

    Same map-side-combined shape as :func:`exact_dedup_keep_best`: one
    partial-aggregated ``groupBy(md5).agg(min_by(row, id))`` — each
    partition pre-collapses its duplicate rows before the shuffle, so
    only one candidate row per (partition, digest) crosses the wire.
    The previous ``row_number() OVER (PARTITION BY digest)`` form had
    identical semantics but shuffled EVERY full row (window functions
    have no partial aggregation), which at 100 TB moves the entire
    corpus text; plan-asserted in tests/test_plans.py
    (``test_exact_dedup_partial_agg_no_window``)."""
    row = F.struct(*[F.col(c) for c in df.columns])
    best = (
        df.withColumn("__digest", F.md5(F.col(text_col)))
        .groupBy("__digest")
        .agg(F.min_by(row, F.col(id_col)).alias("__best"))
    )
    return best.select("__best.*")


def exact_dedup_keep_best(
    df: DataFrame, id_col: str, text_col: str, score_col: str
) -> DataFrame:
    """Exact dedup keeping the BEST-scoring row per duplicate group
    (ties: min id) — the keep-best policy production corpus dedup uses
    (drop the low-quality mirror, keep the canonical copy) instead of
    :func:`exact_dedup`'s keep-min-id.

    One partial-aggregated groupBy on the md5 digest (map-side combine,
    uniform key — no window sort), min_by over the whole row keyed by
    (-score, id)."""
    row = F.struct(*[F.col(c) for c in df.columns])
    key = F.struct((-F.col(score_col)).alias("ns"), F.col(id_col).alias("id"))
    best = (
        df.withColumn("__digest", F.md5(F.col(text_col)))
        .groupBy("__digest")
        .agg(F.min_by(row, key).alias("__best"))
    )
    return best.select("__best.*")


def exact_dup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(digest, n_dups, keep_id, dup_ids) for exact duplicate groups."""
    return (
        df.select(F.md5(F.col(text_col)).alias("digest"), F.col(id_col))
        .groupBy("digest")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min(id_col).alias("keep_id"),
            F.sort_array(F.collect_list(id_col)).alias("dup_ids"),
        )
        .where(F.col("n_dups") > 1)
    )


def minhash_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 16,
    bands: int = 8,
    shingle_size: int = 5,
    jaccard_threshold: float = 0.8,
) -> DataFrame:
    """Near-duplicate removal: LSH candidate pairs → connected
    components → keep min-id representative per cluster."""
    from crfsuite_spark.kg.canonicalize import connected_components
    from crfsuite_spark.operators.minhash import minhash_self_pairs

    pairs = minhash_self_pairs(
        df, id_col, text_col, n_hashes, bands, shingle_size, jaccard_threshold
    )
    cc = connected_components(pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")))
    drop = cc.where(F.col("node") != F.col("component")).select(F.col("node").alias(id_col))
    return df.join(drop, id_col, "left_anti")


def simhash(
    df: DataFrame, id_col: str, text_col: str, bits: int = 32,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id, simhash) 32-bit token-level SimHash fingerprint.

    Classic Charikar simhash: each token votes ±1 per bit of its hash;
    fingerprint bit = sign of the vote sum. One explode + one groupBy.

    ``hash_fn``: 'xxhash64' (default, fastest — one JVM hash call) or
    'md5_32' (first 8 hex chars of md5 as a 32-bit int — bit-for-bit
    reproducible in any engine with md5(), which is what the DuckDB
    oracle checks).
    """
    toks = df.select(
        id_col, F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("__t")
    ).where(F.col("__t") != "")
    if hash_fn == "md5_32":
        h = F.conv(F.substring(F.md5("__t"), 1, 8), 16, 10).cast("long")
    else:
        h = F.pmod(F.xxhash64("__t"), F.lit(1 << bits))
    toks = toks.withColumn("__h", h)
    votes = [
        F.sum(
            F.when(F.col("__h").bitwiseAND(F.lit(1 << j)) > 0, 1).otherwise(-1)
        ).alias(f"b{j}")
        for j in range(bits)
    ]
    agg = toks.groupBy(id_col).agg(*votes)
    fp = None
    for j in range(bits):
        bit = F.when(F.col(f"b{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        fp = bit if fp is None else fp + bit
    return agg.select(id_col, fp.cast("long").alias("simhash"))


def simhash_dup_pairs(df: DataFrame, id_col: str, text_col: str, bits: int = 32) -> DataFrame:
    """Pairs with identical simhash fingerprints (id_a < id_b)."""
    s = simhash(df, id_col, text_col, bits)
    a = s.select(F.col(id_col).alias("id_a"), "simhash")
    b = s.select(F.col(id_col).alias("id_b"), "simhash")
    return a.join(b, "simhash").where(F.col("id_a") < F.col("id_b")).select("id_a", "id_b", "simhash")


def simhash_near_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 32,
    max_hamming: int = 3,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Near-duplicate pairs at Hamming distance ≤ ``max_hamming`` between
    SimHash fingerprints: (id_a, id_b, hamming), id_a < id_b.

    Pigeonhole banding (the standard Manku/Jain/Das Sarma trick): split
    the ``bits``-bit fingerprint into ``max_hamming + 1`` contiguous
    bands — two fingerprints within distance k must agree EXACTLY on at
    least one band — join candidates per (band, band_value) bucket, then
    verify with ``bit_count(a XOR b) ≤ k``. The only shuffle is the
    band-bucket join on uniform hash-derived keys; no all-pairs product.
    """
    n_bands = max_hamming + 1
    widths = [bits // n_bands + (1 if j < bits % n_bands else 0) for j in range(n_bands)]
    los = [sum(widths[:j]) for j in range(n_bands)]
    s = simhash(df, id_col, text_col, bits, hash_fn=hash_fn)
    band_cols = [
        F.struct(
            F.lit(j).alias("band"),
            F.shiftright(F.col("simhash"), los[j])
            .bitwiseAND(F.lit((1 << widths[j]) - 1))
            .alias("val"),
        )
        for j in range(n_bands)
    ]
    bands = s.select(
        id_col, "simhash", F.explode(F.array(*band_cols)).alias("__b")
    ).select(
        id_col, "simhash",
        F.col("__b.band").alias("band"), F.col("__b.val").alias("val"),
    )
    a = bands.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("__fa"), "band", "val")
    b = bands.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("__fb"), "band", "val")
    return (
        a.join(b, ["band", "val"])
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", F.bit_count(F.col("__fa").bitwiseXOR(F.col("__fb"))))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .distinct()
    )


def word_shingles(col: str, n: int = 3):
    """Word n-gram array (distinct), JVM-side."""
    toks = F.split(F.lower(F.col(col)), r"\s+")
    return F.array_distinct(
        F.when(
            F.size(toks) < n, F.array(F.concat_ws(" ", toks))
        ).otherwise(
            F.expr(
                f"transform(sequence(0, size(split(lower({col}), '\\\\s+')) - {n}), "
                f"i -> concat_ws(' ', slice(split(lower({col}), '\\\\s+'), i + 1, {n})))"
            )
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = 1000,
) -> DataFrame:
    """Exact word-n-gram Jaccard similarity join: (id_a, id_b, jaccard).

    Sparse join on exploded shingles; hot shingles above
    ``max_shingle_df`` document frequency are dropped to bound fan-out
    (prefix-filter trick — may miss pairs that ONLY share hot shingles).
    """
    sh = df.select(id_col, F.explode(word_shingles(text_col, n)).alias("sh"))
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    if max_shingle_df:
        hot = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df")).where(
            F.col("df") > max_shingle_df
        )
        sh = sh.join(F.broadcast(hot.select("sh")), "sh", "left_anti")
    a = sh.select(F.col(id_col).alias("id_a"), "sh")
    b = sh.select(F.col(id_col).alias("id_b"), "sh")
    common = (
        a.join(b, "sh")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def span_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_tokens: int = 20,
) -> DataFrame:
    """Corpus-wide exact SPAN dedup (the C4 repeated-span / Dolma exact
    paragraph-dedup family, on fixed token blocks): split every
    document into consecutive ``block_tokens``-word blocks; a block
    whose exact text occurs elsewhere in the corpus survives only at
    its canonical occurrence — the minimal (id, block_idx) — and is
    cut from every other document. Returns one row per input document:
    (``*id``, text: surviving blocks rejoined by ' ', n_blocks,
    n_kept). A fully-deduplicated document keeps an empty text.

    Scale shape (r06): the block stream exists ONCE — a persisted
    narrow (id, idx, 16-byte binary md5 key) frame; block TEXT never
    enters any shuffle. Canonical selection is one map-side-combined
    groupBy on the uniform key + ``min_by`` (no window sort); the
    non-canonical occurrences join the CACHED narrow frame against the
    duplicated-key winners (broadcast when small) and reduce to
    per-document removed-index lists; documents are rebuilt map-side
    from their own staged token arrays (the r05 form recomputed the
    block explode for the winner join and shuffled block text into
    both the join and the reassembly groupBy). The tokenizer is staged
    as a bound column so the per-block lambda slices an array instead
    of re-splitting the document (the O(words²) hazard). Whitespace is
    normalized to single spaces by the split/rejoin (documented
    contract — span dedup rewrites documents by nature). The returned
    frame scans the persisted block frame (``pinned_caches`` release
    contract, as operators/minhash.py)."""
    bt = int(block_tokens)
    c = F.coalesce(F.col(text_col), F.lit(""))
    words = F.split(F.trim(c), r"\s+")
    nw = F.when(F.trim(c) == "", F.lit(0)).otherwise(F.size(words))
    n_blocks = F.ceil(nw / F.lit(bt)).cast("int")
    base = df.select(id_col, words.alias("__words"), n_blocks.alias("__nb"))
    blocks_arr = F.when(
        F.col("__nb") <= 0, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.col("__nb") - 1),
            lambda i: F.array_join(
                F.slice(F.col("__words"), i * bt + 1, bt), " "
            ),
        )
    )
    blocks = (
        base.select(id_col, F.posexplode(blocks_arr).alias("__idx", "__block"))
        .select(id_col, "__idx", F.unhex(F.md5(F.col("__block"))).alias("__key"))
        .persist()
    )
    # count-only corpus aggregation (primitive HashAggregate), min_by
    # restricted to the duplicated-key subset — see substr_dedup
    dup_keys = (
        blocks.groupBy("__key")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .where(F.col("__cnt") > 1)
        .select("__key")
    )
    dup_occ = blocks.join(dup_keys, "__key")
    winners = dup_occ.groupBy("__key").agg(
        F.min_by(
            F.struct(F.col(id_col).alias("id"), F.col("__idx").alias("idx")),
            F.struct(F.col(id_col).alias("id"), F.col("__idx").alias("idx")),
        ).alias("__w"),
    )
    removed = (
        dup_occ.join(winners, "__key")
        .where(
            (F.col("__w.id") != F.col(id_col)) | (F.col("__w.idx") != F.col("__idx"))
        )
        .groupBy(id_col)
        .agg(F.collect_list("__idx").alias("__rem"))
    )
    staged = (
        base.join(removed, id_col, "left")
        .withColumn(
            "__rem", F.coalesce(F.col("__rem"), F.array().cast("array<int>"))
        )
        .withColumn(
            "__kept",
            F.when(
                F.col("__nb") <= 0, F.array().cast("array<string>")
            ).otherwise(
                F.filter(
                    blocks_arr,
                    lambda b, i: ~F.array_contains(F.col("__rem"), i),
                )
            ),
        )
    )
    out = staged.select(
        id_col,
        F.array_join(F.col("__kept"), " ").alias(text_col),
        F.col("__nb").cast("bigint").alias("n_blocks"),
        F.size("__kept").cast("bigint").alias("n_kept"),
    )
    out.pinned_caches = [blocks]
    return out


def dedup_against(
    new: DataFrame,
    ref: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    near: bool = False,
    n_hashes: int = 32,
    bands: int = 8,
    shingle_size: int = 5,
    jaccard_threshold: float = 0.8,
    seed: int = 42,
    num_partitions: int | None = None,
    hash_fn: str = "xxhash64",
    estimate_margin: float | None = 0.25,
) -> DataFrame:
    """Cross-corpus dedup — the incremental-crawl primitive: drop rows
    of ``new`` whose text already exists in ``ref`` (yesterday's
    corpus / an upstream shard), returning the surviving ``new`` rows
    with all their columns.

    ``near=False`` (exact): anti-join on md5(text) — both sides reduce
    to narrow digests before the shuffle, ref digests are
    map-side-combined distinct, text never crosses the wire. A
    NULL-text new row is always kept (SQL equality semantics).
    ``near=True``: a new row is dropped when ANY ref row's char-shingle
    Jaccard ≥ threshold (via :func:`minhash_pairs_against` — LSH
    blocking + signature screen + exact verify; subsumes exact matches
    of ≥ shingle-length texts since identical text has Jaccard 1).
    Neither side is broadcast — both corpora may be large."""
    if near:
        from crfsuite_spark.operators.minhash import minhash_pairs_against

        pairs = minhash_pairs_against(
            new, ref, id_col, text_col, n_hashes, bands, shingle_size,
            jaccard_threshold, seed, num_partitions, hash_fn,
            estimate_margin=estimate_margin,
        )
        matched = pairs.select(F.col("id_new").alias(id_col)).distinct()
        out = new.join(matched, id_col, "left_anti")
        out.pinned_caches = pairs.pinned_caches
        return out
    ref_keys = (
        ref.select(F.md5(F.col(text_col)).alias("__ref_digest"))
        .where(F.col("__ref_digest").isNotNull())
        .distinct()
    )
    return (
        new.withColumn("__digest", F.md5(F.col(text_col)))
        .join(
            ref_keys,
            F.col("__digest") == F.col("__ref_digest"),
            "left_anti",
        )
        .drop("__digest")
    )


def substr_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window_tokens: int = 10,
) -> DataFrame:
    """Corpus-wide exact SUBSTRING dedup at ARBITRARY alignment (the
    ExactSubstr family — Lee et al. 2022, "Deduplicating Training Data
    Makes Language Models Better"): every ``window_tokens``-word window
    of every document (stride 1) is hashed; a token is cut iff some
    window covering it has the exact text of a window at an earlier
    corpus position — so each duplicated region ≥ ``window_tokens``
    words survives only at its canonical (minimal (id, pos))
    occurrence, even when the copy sits mid-document at an alignment
    the fixed-block :func:`span_dedup` cannot see. Duplicates shorter
    than ``window_tokens`` words are kept by definition (the paper's
    length threshold). Returns one row per input document:
    (``*id``, text, n_tokens, n_kept).

    Scale shape: Lee et al. build a single-node suffix array; the
    distributed analogue is this rolling-window hash join. The
    stride-1 explode is |corpus tokens| rows of narrow (id, pos,
    32-char md5) triples — window TEXT never leaves the map side, and
    document text never shuffles at all. Canonical selection is one
    map-side-combined groupBy on the uniform hash key (count +
    ``min_by``, no window sort); the winner join re-shuffles the same
    narrow triples on the same key and keeps only duplicated,
    non-canonical windows (near-dup-scale, not corpus-scale, from
    there on); the removal sets group on the id. Per-doc token
    filtering is a Column HOF over the scan, O(n_tokens ×
    removed_windows) compares bounded by document length. The md5 key
    is 128-bit because at 10^12 windows a 64-bit key is past its
    birthday bound; the hex string also replays bit-identically in the
    DuckDB oracle."""
    k = int(window_tokens)
    if k < 1:
        raise ValueError(f"window_tokens must be >= 1, got {window_tokens}")
    c = F.coalesce(F.col(text_col), F.lit(""))
    words = F.split(F.trim(c), r"\s+")
    nw = F.when(F.trim(c) == "", F.lit(0)).otherwise(F.size(words))
    base = df.select(
        id_col, words.alias("__words"), nw.cast("int").alias("__nw")
    )
    n_win = F.col("__nw") - F.lit(k) + 1
    win_arr = F.when(n_win <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), n_win - 1),
            lambda i: F.array_join(F.slice(F.col("__words"), i + 1, k), " "),
        )
    )
    # r06: the stride-1 window stream exists ONCE — persisted narrow
    # (id, pos, 16-byte binary md5) triples feed BOTH the canonical
    # groupBy and the non-canonical-occurrence join (the r05 form
    # recomputed the explode+md5 for the winner join and shuffled the
    # 32-char hex keys twice); unhex halves the key bytes in the one
    # corpus-scale exchange, with identical grouping (hex→binary is a
    # bijection)
    windows = (
        base.select(id_col, F.posexplode(win_arr).alias("__pos", "__wtext"))
        .select(id_col, "__pos", F.unhex(F.md5(F.col("__wtext"))).alias("__key"))
        .persist()
    )
    # canonical cut in two grades: the CORPUS-scale aggregation is a
    # count-only groupBy (primitive buffers → HashAggregate with
    # map-side combine — min_by's struct buffer would force a
    # SortAggregate over the whole window stream); the min_by runs only
    # over occurrences of DUPLICATED keys (a near-dup-scale subset that
    # AQE broadcast-joins back against the cached windows when small,
    # falling back to a shuffle join at open-web duplication rates)
    dup_keys = (
        windows.groupBy("__key")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .where(F.col("__cnt") > 1)
        .select("__key")
    )
    dup_occ = windows.join(dup_keys, "__key")
    winners = dup_occ.groupBy("__key").agg(
        F.min_by(
            F.struct(F.col(id_col).alias("id"), F.col("__pos").alias("pos")),
            F.struct(F.col(id_col).alias("id"), F.col("__pos").alias("pos")),
        ).alias("__w"),
    )
    removed = (
        dup_occ.join(winners, "__key")
        .where(
            (F.col("__w.id") != F.col(id_col))
            | (F.col("__w.pos") != F.col("__pos"))
        )
        .groupBy(id_col)
        .agg(F.collect_list("__pos").alias("__rem"))
    )
    # stage __kept ONCE as a named column before fanning out to
    # array_join/size (same Spark 4.1 duplicated-lambda-tree hazard as
    # intra_doc_span_dedup above)
    staged = (
        base.join(removed, id_col, "left")
        .withColumn(
            "__rem", F.coalesce(F.col("__rem"), F.array().cast("array<int>"))
        )
        .withColumn(
            "__kept",
            F.when(
                F.col("__nw") <= 0, F.array().cast("array<string>")
            ).otherwise(
                F.filter(
                    F.col("__words"),
                    lambda w, i: ~F.exists(
                        F.col("__rem"),
                        lambda p: (p <= i) & (i < p + F.lit(k)),
                    ),
                )
            ),
        )
    )
    out = staged.select(
        id_col,
        F.array_join(F.col("__kept"), " ").alias(text_col),
        F.col("__nw").cast("bigint").alias("n_tokens"),
        F.size("__kept").cast("bigint").alias("n_kept"),
    )
    # cache-lifetime contract: the plan scans the persisted window frame
    out.pinned_caches = [windows]
    return out


def intra_doc_span_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_tokens: int = 20,
    hash_blocks: bool = True,
) -> DataFrame:
    """WITHIN-document repeated-span removal (the RefinedWeb /
    intra-document line-dedup family, on fixed token blocks): inside
    each document, a block identical to an EARLIER block of the same
    document is dropped; first occurrence wins. Returns one row per
    document: (``*id``, text, n_blocks, n_kept).

    Unlike :func:`span_dedup` (corpus-wide canonical occurrence, two
    uniform-key shuffles) this is a pure Column-HOF projection — ZERO
    shuffle, scales like a map over the scan. The per-document filter
    is O(blocks²) compares, bounded by document length.
    Whitespace is normalized to single spaces by the split/rejoin.

    ``hash_blocks`` (default): the quadratic first-occurrence test runs
    over 60-bit portable block hashes (first 15 md5 hex chars → bigint)
    instead of the block strings — int64 equality instead of ~5-token
    string equality, measured 5× faster at block_tokens=5 where the
    per-doc block count (and its square) is largest. Hash equality ≡
    string equality absent a collision (P ≈ blocks²/2^61 per doc,
    ~10⁻¹⁵; the hash is deterministic md5, so any engine reproduces the
    identical result either way — the DuckDB oracle keeps the plain
    string form and stays green). ``hash_blocks=False`` keeps the
    string compares."""
    c = F.coalesce(F.col(text_col), F.lit(""))
    words = F.split(F.trim(c), r"\s+")
    nw = F.when(F.trim(c) == "", F.lit(0)).otherwise(F.size(words))
    n_blocks = F.ceil(nw / F.lit(block_tokens)).cast("int")
    blocks = F.when(n_blocks <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), n_blocks - 1),
            lambda i: F.array_join(
                F.slice(words, i * block_tokens + 1, block_tokens), " "
            ),
        )
    )
    if hash_blocks:
        # stage blocks → hashes → index filter as SEPARATE projections:
        # duplicating nested-lambda trees inside one projection mis-binds
        # lambda variables under Spark 4.1's resolver (see below)
        staged = df.select(
            id_col,
            blocks.alias("__blocks"),
            n_blocks.cast("bigint").alias("n_blocks"),
        ).withColumn(
            "__bh",
            F.expr(
                "transform(__blocks, b -> "
                "CAST(conv(substr(md5(b), 1, 15), 16, 10) AS BIGINT))"
            ),
        ).withColumn(
            "__kept",
            F.expr(
                "filter(arrays_zip(__blocks, __bh), "
                "(s, i) -> array_position(__bh, s.__bh) == i + 1)"
            ),
        )
        return staged.select(
            id_col,
            F.expr("array_join(transform(__kept, s -> s.__blocks), ' ')").alias(text_col),
            "n_blocks",
            F.size("__kept").cast("bigint").alias("n_kept"),
        )
    # first-occurrence-wins via array_position (first 1-based index of
    # the value): keep block i iff its first occurrence IS i. One JVM
    # builtin scan per element — measured ~2× faster at 500k docs than
    # the equivalent slice+array_contains per element, same semantics
    kept = F.filter(
        blocks,
        lambda b, i: F.array_position(blocks, b) == i + 1,
    )
    # materialize ``kept`` ONCE as a named column before fanning out to
    # join/size: duplicating this nested-lambda tree (a filter whose
    # lambda slices the same transform it filters) inside one projection
    # mis-binds the lambda variables in one of the copies under Spark
    # 4.1's resolver (observed: size() counting the unfiltered array) —
    # and single evaluation is cheaper anyway
    staged = df.select(
        id_col,
        kept.alias("__kept"),
        n_blocks.cast("bigint").alias("n_blocks"),
    )
    return staged.select(
        id_col,
        F.array_join(F.col("__kept"), " ").alias(text_col),
        "n_blocks",
        F.size("__kept").cast("bigint").alias("n_kept"),
    )
