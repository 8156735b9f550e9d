"""Train/valid/test splitting for KG-embedding datasets.

The public FB15k/WN18 preparation protocol (Bordes et al. 2013 and the
line of work after it): split DISTINCT triples into train/valid/test,
then keep only evaluation triples whose BOTH endpoints appear in the
training graph — an embedding model cannot score an entity it never
saw, so unfiltered splits silently inflate error on untrainable rows.

Determinism + scale:

- The split is a portable md5 draw over (subj, pred, obj, seed) — the
  same first-8-hex idiom as ``operators/sampling.py`` — so duplicate
  provenance mentions of one triple land in the SAME split (no
  train/test leakage through duplicates), retries/AQE replans can't
  reshuffle rows, and the DuckDB oracle replays it bit-for-bit.
- The training-entity closure is two broadcast-friendly semi-joins of
  the evaluation slices against the DISTINCT train endpoint set
  (vocabulary-sized, orders of magnitude below the triple table); the
  triple table itself is touched map-side only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCALE = 1_000_000


def split_triples(
    triples: DataFrame,
    weights: tuple[float, float, float] = (0.8, 0.1, 0.1),
    seed: int = 42,
) -> DataFrame:
    """Assign each triple to train/valid/test and drop evaluation rows
    with an endpoint missing from the training graph.

    Returns the input columns plus ``split``; requires
    ``subj``/``pred``/``obj`` string columns. ``weights`` need not sum
    to 1 — they are normalized.
    """
    total = sum(weights)
    if total <= 0 or min(weights) < 0:
        raise ValueError(f"weights must be non-negative, got {weights}")
    t_train = int(weights[0] / total * _SCALE)
    t_valid = t_train + int(weights[1] / total * _SCALE)
    draw = F.expr(
        "pmod(CAST(conv(substr(md5(concat_ws(':', subj, pred, obj, "
        f"'{seed}')), 1, 8), 16, 10) AS BIGINT), {_SCALE})"
    )
    tagged = triples.withColumn(
        "split",
        F.when(draw < t_train, F.lit("train"))
        .when(draw < t_valid, F.lit("valid"))
        .otherwise(F.lit("test")),
    )
    train = tagged.filter(F.col("split") == "train")
    ents = (
        train.select(F.col("subj").alias("ent"))
        .unionByName(train.select(F.col("obj").alias("ent")))
        .distinct()
    )
    eval_rows = (
        tagged.filter(F.col("split") != "train")
        .join(ents.withColumnRenamed("ent", "subj"), "subj", "left_semi")
        .join(ents.withColumnRenamed("ent", "obj"), "obj", "left_semi")
    )
    return train.unionByName(eval_rows.select(*train.columns))
