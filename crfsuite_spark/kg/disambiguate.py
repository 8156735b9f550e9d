"""Context-based entity disambiguation for ambiguous aliases.

The reference's linking step is a dictionary join (one alias -> one
canonical id); at open-domain transcript scale aliases collide
("Smith", "Acme", "Springfield") and the join must SCORE candidates
instead of assuming uniqueness. This module ranks candidates by the
dot product of integer hashed bag-of-words embeddings of the mention's
turn context vs each candidate's profile text — the feature-hashing
trick (Weinberger et al. 2009) with the repo's portable md5 idiom
(md5(token:k:seed) % 21 - 10), so every score is an exact small-integer
sum DuckDB reproduces bit-identically.

Scale shape: alias dictionary and entity profiles are dictionary-sized
-> broadcast joins; the mention stream is embedded map-side with one
nested-HOF expression (no per-row Python); candidate rows collapse via
a map-side-combined min_by groupBy. The mention text crosses the wire
once, already reduced to (key, choice, score).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_embedding(text_col: str, dim: int = 16, seed: int = 7) -> Column:
    """Integer hashed bag-of-words embedding of a text column:
    component k is the sum over tokens of md5(token:k:seed) % 21 - 10.
    One expression, JVM-side; exact integers -> cross-engine portable
    (DuckDB: ('0x' || substr(md5(t || ':' || k || ':seed'), 1, 8))::BIGINT)."""
    return F.expr(
        f"transform(sequence(0, {dim - 1}), k -> "
        f"  aggregate(split(lower({text_col}), ' '), 0L, (acc, t) -> "
        f"    acc + (cast(conv(substr(md5(concat(t, ':', k, ':{seed}')), 1, 8),"
        f"                    16, 10) as bigint) % 21 - 10)))"
    )


def disambiguate_mentions(
    mentions: DataFrame,
    alias_dict: DataFrame,
    profiles: DataFrame,
    key_cols: tuple[str, ...] = ("mention_id",),
    surface_col: str = "surface",
    context_col: str = "context",
    dim: int = 16,
    seed: int = 7,
) -> DataFrame:
    """Resolve each mention to the candidate canonical id whose profile
    embedding best matches the mention-context embedding.

    ``mentions``: *key_cols, surface_col, context_col.
    ``alias_dict``: (alias, canonical_id) — ambiguous aliases repeat.
    ``profiles``: (canonical_id, profile) — profile text per entity.

    Output: *key_cols, surface, canonical_id, score, n_candidates.
    Ties break to the lexicographically smallest canonical_id.
    Mentions whose surface has no dictionary entry are dropped (the
    exact-link stage upstream owns unknown-surface policy).
    """
    keys = list(key_cols)
    ctx = mentions.select(
        *keys,
        F.col(surface_col).alias("surface"),
        hash_embedding(context_col, dim, seed).alias("__ctx"),
    )
    prof = profiles.select(
        "canonical_id", hash_embedding("profile", dim, seed).alias("__prof")
    )
    cand = (
        ctx.join(
            F.broadcast(alias_dict.select(F.col("alias").alias("surface"),
                                          "canonical_id")),
            "surface",
        )
        .join(F.broadcast(prof), "canonical_id")
        .withColumn(
            "score",
            F.expr(
                "aggregate(zip_with(__ctx, __prof, (a, b) -> a * b), 0L,"
                "          (acc, v) -> acc + v)"
            ),
        )
    )
    pick = F.struct(F.negate(F.col("score")), F.col("canonical_id"))
    return (
        cand.groupBy(*keys, "surface")
        .agg(
            F.min_by(F.struct("canonical_id", "score"), pick).alias("__best"),
            F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
        )
        .select(
            *keys,
            "surface",
            F.col("__best.canonical_id").alias("canonical_id"),
            F.col("__best.score").alias("score"),
            "n_candidates",
        )
    )
