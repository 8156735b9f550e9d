"""Distributed clustering operators (operators/clustering.py): exact
centroids, codegen assignment, full-corpus Lloyd's."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from crfsuite_spark.operators.clustering import (
    assign_clusters_expr,
    group_centroids,
    kmeans_fit,
)


@pytest.fixture(scope="module")
def blobs(spark):
    """Three well-separated gaussian blobs, float32 like the real table."""
    rng = np.random.default_rng(11)
    centers = np.array([[5.0, 0.0, 0.0, 0.0], [0.0, 5.0, 0.0, 0.0], [0.0, 0.0, 5.0, 0.0]])
    rows = []
    for i in range(300):
        g = i % 3
        v = (centers[g] + rng.normal(0, 0.3, 4)).astype(np.float32)
        rows.append((i, [float(x) for x in v], g))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int"), centers


def test_group_centroids_matches_numpy(spark, blobs):
    df, centers = blobs
    got = group_centroids(df, "label").toPandas().sort_values(["label", "pos"])
    pdf = df.toPandas()
    for g in range(3):
        X = np.array(pdf[pdf["label"] == g]["embedding"].tolist(), dtype=np.float64)
        exp = X.mean(axis=0)
        sub = got[got["label"] == g]
        assert list(sub["pos"]) == [1, 2, 3, 4]
        np.testing.assert_allclose(sub["mean"].to_numpy(), exp, rtol=1e-9)


def test_group_centroids_array_form(spark, blobs):
    df, _ = blobs
    out = group_centroids(df, "label", flat=False).toPandas()
    assert len(out) == 3 and all(len(c) == 4 for c in out["centroid"])
    flat = group_centroids(df, "label").toPandas()
    for _, r in out.iterrows():
        sub = flat[flat["label"] == r["label"]].sort_values("pos")
        np.testing.assert_allclose(list(r["centroid"]), sub["mean"].to_numpy())


def test_assign_clusters_expr_matches_numpy(spark, blobs):
    df, centers = blobs
    got = assign_clusters_expr(df, centers).select("vec_id", "cluster").toPandas()
    pdf = df.toPandas().set_index("vec_id")
    X = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    d = ((X[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
    exp = d.argmin(axis=1)  # numpy argmin = first min = lowest id
    assign = dict(zip(got["vec_id"], got["cluster"]))
    for i, vid in enumerate(pdf.index):
        assert assign[vid] == exp[i]


def test_assign_clusters_expr_tie_breaks_low_id(spark):
    # two identical centroids: every row must land on cluster 0
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    out = assign_clusters_expr(df, [[1.0, 1.0], [1.0, 1.0]]).toPandas()
    assert set(out["cluster"]) == {0}


def test_kmeans_recovers_blobs(spark, blobs):
    df, centers = blobs
    cents, shifts = kmeans_fit(df, k=3, n_iters=15, tol=1e-9)
    # converged (last shift tiny) and decreasing overall
    assert shifts[-1] < 1e-6
    # each true center has a learned centroid within 0.2
    d = ((cents[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2) ** 0.5
    assert (d.min(axis=0) < 0.2).all(), d
    # purity: assignment agrees with true labels up to permutation
    out = assign_clusters_expr(df, cents).select("label", "cluster").toPandas()
    tab = out.groupby(["label", "cluster"]).size().unstack(fill_value=0)
    assert (tab.max(axis=1) / tab.sum(axis=1)).min() == 1.0


def test_clustering_plan_shapes(spark, blobs):
    df, centers = blobs
    plan = (
        group_centroids(df, "label")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "partial" in plan.lower(), plan  # map-side combine before exchange
    aplan = (
        assign_clusters_expr(df, centers)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in aplan, aplan  # assignment is map-side only
