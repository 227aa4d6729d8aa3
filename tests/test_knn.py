"""kNN / radius joins vs exact numpy brute-force oracles."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from codem_spark import synth
from codem_spark.operators import knn
from tests.conftest import EXTENT


def _brute_nn(A: np.ndarray, B: np.ndarray, b_ids: np.ndarray):
    d2 = ((A[:, None, :] - B[None, :, :]) ** 2).sum(2)
    order = np.lexsort((np.broadcast_to(b_ids, d2.shape), d2), axis=1)[:, 0]
    return b_ids[order], np.sqrt(d2[np.arange(len(A)), order])


def test_knn_complete_matches_bruteforce(spark):
    before = synth.point_cloud(spark, 3000).select("pid", "x", "y", "z")
    after = synth.point_cloud(spark, 2000, jitter=1.0).select(
        (F.col("pid") + 1_000_000).alias("pid"), "x", "y", "z"
    )
    res = knn.knn_join_complete(after, before, EXTENT, radius=2000.0).toPandas()
    bp = before.toPandas().sort_values("pid").reset_index(drop=True)
    ap = after.toPandas().sort_values("pid").reset_index(drop=True)
    exp_nn, exp_d = _brute_nn(
        ap[["x", "y", "z"]].values, bp[["x", "y", "z"]].values, bp.pid.values
    )
    assert len(res) == len(ap)
    got = res.set_index("pid")
    assert (got.loc[ap.pid.values, "n_pid"].values == exp_nn).all()
    assert np.allclose(got.loc[ap.pid.values, "nn_dist"].values, exp_d, atol=1e-9)


def test_knn_radius_bound_respected(spark):
    a = synth.point_cloud(spark, 500).select("pid", "x", "y", "z")
    b = synth.point_cloud(spark, 500).select((F.col("pid") + 10_000).alias("pid"), "x", "y", "z")
    res = knn.knn_join(a, b, EXTENT, radius=800.0, k=3).toPandas()
    assert (res.nn_dist <= 800.0).all()
    assert res.groupby("pid").size().max() <= 3


def test_radius_join_matches_bruteforce(spark, blob_points):
    df = spark.createDataFrame(blob_points)
    ext = (0.0, 0.0, 1000.0, 1000.0)
    got = knn.radius_join(df, df, ext, radius=3.0).toPandas()
    P = blob_points[["x", "y", "z"]].values
    d2 = ((P[:, None, :] - P[None, :, :]) ** 2).sum(2)
    ii, jj = np.nonzero(d2 <= 9.0)
    exp = set(zip(blob_points.pid.values[ii], blob_points.pid.values[jj]))
    assert set(zip(got.pid, got.n_pid)) == exp


def test_knn_deterministic_across_runs(spark):
    a = synth.point_cloud(spark, 1000).select("pid", "x", "y", "z")
    b = synth.point_cloud(spark, 1000).select((F.col("pid") + 10_000).alias("pid"), "x", "y", "z")
    r1 = knn.knn_join(a, b, EXTENT, radius=3000.0, k=2).toPandas().sort_values(["pid", "nn_rank"])
    r2 = knn.knn_join(a.repartition(7), b.repartition(3), EXTENT, radius=3000.0, k=2).toPandas().sort_values(["pid", "nn_rank"])
    assert (r1.n_pid.values == r2.n_pid.values).all()
