"""Distributed k-means (operators/clustering.py)."""

from __future__ import annotations

import numpy as np
import pytest


def _blobs(seed=7, k=3, per=120, dim=8, spread=0.05):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(k, dim)) * 3.0
    pts = np.concatenate(
        [c + rng.normal(scale=spread, size=(per, dim)) for c in centers]
    )
    return centers, pts


def _df(spark, pts):
    return spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(pts)],
        "vec_id long, embedding array<double>",
    )


def test_assign_matches_numpy_reference(spark):
    from neuscraper_spark.operators.clustering import (
        ROUND_DECIMALS,
        kmeans_assign,
    )

    rng = np.random.default_rng(11)
    pts = rng.normal(size=(200, 16))
    cents = rng.normal(size=(5, 16))
    got = {
        r["vec_id"]: (r["cluster"], r["dist2"])
        for r in kmeans_assign(_df(spark, pts), cents).collect()
    }
    d2 = ((pts[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    d2 = np.round(d2, ROUND_DECIMALS) + 0.0
    want_cl = d2.argmin(axis=1)
    for i in range(len(pts)):
        assert got[i][0] == want_cl[i]
        assert got[i][1] == pytest.approx(d2[i, want_cl[i]], abs=1e-9)


def test_assign_is_zero_shuffle(spark):
    from neuscraper_spark.operators.clustering import kmeans_assign

    rng = np.random.default_rng(3)
    df = _df(spark, rng.normal(size=(50, 4)))
    plan = (
        kmeans_assign(df, rng.normal(size=(2, 4)))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # embarrassingly parallel map stage


def test_fit_recovers_blob_centers(spark):
    from neuscraper_spark.operators.clustering import kmeans_assign, kmeans_fit

    centers, pts = _blobs()
    df = _df(spark, pts)
    # seed = first k rows (one per blob since blobs are concatenated in
    # order... pts[0], pts[120], pts[240] would be cleaner; use explicit
    # init from one point per blob to keep the test about convergence)
    init = pts[[0, 120, 240]]
    fitted, iters = kmeans_fit(df, k=3, init=init, max_iter=20, tol=1e-9)
    # each fitted centroid ~ a true center (order preserved by init)
    d = np.sqrt(((fitted - centers) ** 2).sum(axis=1))
    assert d.max() < 0.05
    assert iters <= 20
    # every point lands with its own blob's centroid
    got = kmeans_assign(df, fitted).toPandas()
    want = np.repeat([0, 1, 2], 120)
    assert (got.sort_values("vec_id")["cluster"].to_numpy() == want).all()


def test_fit_keeps_empty_cluster_centroid(spark):
    from neuscraper_spark.operators.clustering import kmeans_fit

    pts = np.zeros((10, 2)) + [1.0, 1.0]
    far = np.array([[1.0, 1.0], [100.0, 100.0]])
    df = _df(spark, pts)
    fitted, _ = kmeans_fit(df, k=2, init=far, max_iter=3)
    assert fitted[0] == pytest.approx([1.0, 1.0])
    assert fitted[1] == pytest.approx([100.0, 100.0])  # empty: unchanged


def test_assign_tie_breaks_to_smaller_centroid_id(spark):
    from neuscraper_spark.operators.clustering import kmeans_assign

    dup = np.array([[2.0, 2.0], [2.0, 2.0]])  # identical centroids
    df = _df(spark, np.array([[1.0, 1.0]]))
    rows = kmeans_assign(df, dup).collect()
    assert rows[0]["cluster"] == 0


def test_fit_default_init_and_validation(spark):
    from neuscraper_spark.operators.clustering import kmeans_fit

    _, pts = _blobs(per=20)
    df = _df(spark, pts)
    fitted, _ = kmeans_fit(df, k=3, max_iter=2)  # default smallest-id init
    assert fitted.shape == (3, 8)
    with pytest.raises(ValueError):
        kmeans_fit(df.limit(2), k=3, max_iter=1)
