"""Deterministic negative sampling for KG-embedding training data.

The corrupt-tail protocol from the public TransE line of work (Bordes
et al. 2013, "Translating Embeddings..."): each positive (subj, pred,
obj) gets ``k`` negatives (subj, pred, neg_obj) with neg_obj drawn from
the entity pool — here TYPE-CONSISTENTLY (same ``prefix:`` type as the
true object, e.g. only ``loc:*`` replaces a ``loc:*``), which is the
variant that produces hard negatives instead of trivially-typed ones.

Scale + determinism design:

- The draw is a portable md5 hash (same first-8-hex-digits → bigint
  idiom as ``operators/sampling.py``) over (subj, pred, obj, rank,
  seed) — reproducible across engines and across retries/AQE replans,
  which ``rand()`` is not. Duplicate mentions of the same triple get
  the same negatives by construction (triple-level draw); provenance
  columns pass through untouched.
- The true object is EXCLUDED by the classic skip trick: draw from
  n-1 slots and shift indices ≥ the true object's slot up by one — no
  rejection loop, exactly uniform over the n-1 wrong entities.
- Only the DISTINCT entity pool is ever sorted (one row_number window
  over entities, orders of magnitude smaller than the mention table);
  the mention-side work is two equi-joins against that pool plus one
  broadcast join against the per-type counts. Types with a single
  entity yield no negatives (nothing wrong to draw).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _draw_expr(n_col: str, seed: int) -> F.Column:
    """md5(subj:pred:obj:rank:seed) → uniform bigint in [0, n_col)."""
    return F.expr(
        "pmod(CAST(conv(substr(md5(concat_ws(':', subj, pred, obj, "
        f"CAST(neg_rank AS STRING), '{seed}')), 1, 8), 16, 10) AS BIGINT), "
        f"{n_col})"
    )


def negative_samples(
    triples: DataFrame,
    k: int = 2,
    seed: int = 42,
    type_sep: str = ":",
) -> DataFrame:
    """k type-consistent corrupt-tail negatives per input row.

    Returns the input columns plus ``neg_rank`` (0..k-1) and
    ``neg_obj``; rows whose object's type has no alternative entity are
    dropped. Requires ``subj``/``pred``/``obj`` string columns; the
    object type is the prefix before the first ``type_sep``.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    etype = F.expr(f"split_part(obj, '{type_sep}', 1)")
    pool = (
        triples.select(F.col("obj").alias("ent"))
        .distinct()
        .withColumn("etype", F.expr(f"split_part(ent, '{type_sep}', 1)"))
        .withColumn(
            "idx",
            F.row_number().over(Window.partitionBy("etype").orderBy("ent")) - 1,
        )
    )
    counts = pool.groupBy("etype").agg(F.count("*").alias("n"))

    base = (
        triples.withColumn("etype", etype)
        .join(F.broadcast(counts), "etype")
        .filter(F.col("n") > 1)
        .join(
            pool.select(
                "etype", F.col("ent").alias("obj"), F.col("idx").alias("true_idx")
            ),
            ["etype", "obj"],
        )
        .withColumn("neg_rank", F.explode(F.sequence(F.lit(0), F.lit(k - 1))))
    )
    raw = _draw_expr("n - 1", seed)
    picked = base.withColumn(
        "neg_idx", raw + F.when(raw >= F.col("true_idx"), F.lit(1)).otherwise(F.lit(0))
    )
    out = picked.join(
        pool.select(
            "etype", F.col("idx").alias("neg_idx"), F.col("ent").alias("neg_obj")
        ),
        ["etype", "neg_idx"],
    )
    return out.select(*triples.columns, "neg_rank", "neg_obj")

