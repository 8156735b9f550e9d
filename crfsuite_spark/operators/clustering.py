"""Distributed corpus clustering: exact elementwise centroids,
codegen cluster assignment, and full-corpus Lloyd's k-means.

Complements operators/similarity.py's IVF recipe (ivf_train trains a
coarse quantizer on a bounded driver-side SAMPLE — right for ANN cell
routing). Here the clustering itself is the product — topic balancing,
cluster-stratified sampling, SemDeDup-style bucket curation — so the
statistics must come from EVERY row, at any corpus size:

- :func:`group_centroids`: elementwise mean vector per group as one
  ``posexplode → groupBy(group, pos)`` — map-side partial aggregation,
  shuffle volume ``O(partitions × groups × dim)``, never row count;
- :func:`assign_clusters_expr`: nearest-centroid id via pure JVM
  Column expressions (whole-stage codegen, zero Python) against a
  literal centroid list — the oracle-able assignment step;
- :func:`kmeans_fit`: Lloyd's over the FULL corpus — Arrow-batched
  matmul assignment (similarity.ivf_assign) + the group_centroids
  shuffle per iteration; only ``k × dim`` floats ever reach the
  driver per iteration, so the same job shape runs at 100 TB.

Each step keeps the deterministic tie-break (lowest cluster id on
equal distance) so reruns and cross-engine oracles agree.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_centroids(
    emb: DataFrame,
    group_col: str,
    vec_col: str = "embedding",
    flat: bool = True,
) -> DataFrame:
    """Elementwise mean vector per group.

    ``flat=True`` (default): one row per (group, pos, mean) — the
    shape the cross-engine oracle hashes (``pos`` is 1-based to match
    SQL ``generate_subscripts``). ``flat=False``: reassembled
    ``array<double>`` per group (ordered by position)."""
    flat_df = (
        emb.select(group_col, F.posexplode(F.col(vec_col)).alias("__p", "__v"))
        .groupBy(group_col, "__p")
        .agg(F.avg(F.col("__v").cast("double")).alias("mean"))
        .select(group_col, (F.col("__p") + 1).alias("pos"), "mean")
    )
    if flat:
        return flat_df
    return (
        flat_df.groupBy(group_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "mean"))
            ).alias("__pm")
        )
        .select(group_col, F.col("__pm.mean").alias("centroid"))
    )


def assign_clusters_expr(
    emb: DataFrame,
    centroids: list[list[float]] | np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "cluster",
) -> DataFrame:
    """Nearest-centroid assignment as pure Column expressions: squared
    L2 to each centroid via ``aggregate(zip_with(...))``, argmin with
    the FIRST minimum (lowest cluster id) on ties.

    Right for a literal centroid list (k ≲ 64: the expressions embed
    k × dim double literals). For large k or hot loops use the
    Arrow-batched matmul in similarity.ivf_assign — this variant's
    value is whole-stage codegen and an exact SQL mirror.

    Each per-centroid distance is staged as its OWN top-level column
    before being arrayed: duplicating nested-HOF lambda expressions
    inside one ``array()`` trips Spark 4.1's lambda-variable resolver
    (same hazard documented at operators/dedup.py intra-doc notes)."""
    C = np.asarray(centroids, dtype=np.float64)
    staged = emb
    dcols = []
    for ci, c in enumerate(C):
        lit = "array(" + ", ".join(f"CAST({x!r} AS DOUBLE)" for x in c) + ")"
        dcols.append(f"__d{ci}")
        staged = staged.withColumn(
            f"__d{ci}",
            F.expr(
                f"aggregate(zip_with(CAST({vec_col} AS ARRAY<DOUBLE>), {lit}, "
                f"(x, y) -> (x - y) * (x - y)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
            ),
        )
    darr = F.array(*[F.col(c) for c in dcols])
    staged = staged.withColumn("__darr", darr)
    return (
        staged.withColumn(
            out_col,
            (F.array_position(F.col("__darr"), F.array_min("__darr")) - 1).cast("int"),
        )
        .drop("__darr", *dcols)
    )


def kmeans_fit(
    emb: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_iters: int = 20,
    tol: float = 1e-6,
    init: np.ndarray | None = None,
) -> tuple[np.ndarray, list[float]]:
    """Full-corpus Lloyd's k-means. Returns (centroids [k, dim],
    per-iteration max centroid shifts).

    - init: embeddings of the k smallest ``id_col`` values by default
      (deterministic, rerun-stable; pass an array to override — e.g.
      ivf_train's sampled estimate as a warm start);
    - assignment: Arrow-batched matmul (similarity.ivf_assign);
    - update: the group_centroids shuffle — partial sums map-side, the
      driver only ever sees k × dim floats;
    - empty clusters keep their previous centroid (standard Lloyd's
      degenerate-case convention)."""
    from crfsuite_spark.operators.similarity import ivf_assign

    if init is None:
        rows = (
            emb.select(id_col, vec_col)
            .orderBy(id_col)
            .limit(k)
            .collect()
        )
        cents = np.array([list(r[1]) for r in rows], dtype=np.float64)
    else:
        cents = np.asarray(init, dtype=np.float64).copy()
    dim = cents.shape[1]
    base = emb.select(id_col, vec_col)
    shifts: list[float] = []
    for _ in range(n_iters):
        assigned = ivf_assign(base, cents, vec_col=vec_col)
        stats = (
            assigned.select("cell", F.posexplode(F.col(vec_col)).alias("__p", "__v"))
            .groupBy("cell", "__p")
            .agg(
                F.sum(F.col("__v").cast("double")).alias("s"),
                F.count("*").alias("n"),
            )
            .collect()
        )
        new = cents.copy()
        sums = np.zeros((k, dim))
        cnts = np.zeros(k)
        for r in stats:
            sums[r["cell"], r["__p"]] = r["s"]
            cnts[r["cell"]] = r["n"]
        nonempty = cnts > 0
        new[nonempty] = sums[nonempty] / cnts[nonempty, None]
        shift = float(np.abs(new - cents).max())
        shifts.append(shift)
        cents = new
        if shift < tol:
            break
    return cents, shifts
