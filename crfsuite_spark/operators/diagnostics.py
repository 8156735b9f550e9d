"""Data-distribution diagnostics for shuffle planning.

Before a 100 TB join or aggregation ships, the first question is
"what does the key distribution look like" — a handful of heavy keys
is the difference between a clean sort-merge and a straggler that
never finishes. These operators are the measurement half of the
skew playbook this repo applies elsewhere (hot-shingle guards in
n-gram Jaccard, ``max_entities_per_scope`` in co-mention, salting /
AQE skew-join at execution): cheap, partial-aggregated profiles a
pipeline runs BEFORE choosing a join strategy.

The reference (bnosac/crfsuite) has no analogue — its data fits one
R process; key-skew measurement only exists at cluster scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def key_skew_profile(
    df: DataFrame,
    key_cols: list[str] | str,
    top_n: int = 20,
) -> DataFrame:
    """Heavy-key profile for a prospective shuffle key: the ``top_n``
    key values by row count with (n_rows, share, cum_share, rank) —
    the numbers that decide broadcast vs sort-merge vs salt.

    Reading it: ``share`` ≥ ~1/shuffle_partitions means that single
    key overflows an average reducer (salt it or let AQE skew-split);
    a tiny ``cum_share`` over the whole top-N means the key is
    uniform and nothing special is needed.

    Scale shape: ONE map-side-combined groupBy on the key (the
    profile costs the same as the cheapest possible aggregation on
    that key — if THIS is slow, the real shuffle would be worse); the
    total is a 1-row aggregate of the counts frame crossJoin-broadcast
    back; top-N + rank is a TakeOrdered/window over the top slice
    only, with a deterministic (count desc, key asc) order."""
    from pyspark.sql import Window

    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    counts = df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    )
    total = counts.agg(F.sum("n_rows").alias("__total"))
    order = [F.col("n_rows").desc()] + [F.col(k).asc() for k in keys]
    top = counts.orderBy(*order).limit(top_n)
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    return (
        top.crossJoin(F.broadcast(total))
        .select(
            *keys,
            "n_rows",
            (F.col("n_rows") / F.col("__total")).alias("share"),
            (F.sum("n_rows").over(w) / F.col("__total")).alias("cum_share"),
            F.row_number().over(Window.orderBy(*order)).alias("rank"),
        )
    )
