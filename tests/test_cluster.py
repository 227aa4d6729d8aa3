"""Euclidean clustering vs exact single-machine union-find oracle."""

from __future__ import annotations

import numpy as np

from codem_spark.operators import cluster
from tests.conftest import SMALL_EXTENT, union_find_oracle


def test_cluster_matches_union_find_oracle(spark, blob_points):
    df = spark.createDataFrame(blob_points)
    got = (
        cluster.euclidean_cluster(df, SMALL_EXTENT, tolerance=3.0, min_points=2)
        .toPandas()
        .sort_values("pid")
        .reset_index(drop=True)
    )
    P = blob_points.sort_values("pid")[["x", "y", "z"]].values
    pids = blob_points.sort_values("pid").pid.values
    roots = union_find_oracle(P, 3.0)
    # oracle labels -> min pid per component
    comp_min = {}
    for i, r in enumerate(roots):
        comp_min[r] = min(comp_min.get(r, pids[i]), pids[i])
    exp_label = np.array([comp_min[r] for r in roots])
    sizes = {r: (roots == r).sum() for r in set(roots)}
    exp = np.where(np.array([sizes[r] for r in roots]) >= 2, exp_label, -1)
    assert (got.cluster_id.values == exp).all()


def test_cluster_min_points_filter(spark, blob_points):
    df = spark.createDataFrame(blob_points)
    got = cluster.euclidean_cluster(df, SMALL_EXTENT, tolerance=3.0, min_points=30).toPandas()
    labelled = got[got.cluster_id >= 0]
    counts = labelled.groupby("cluster_id").size()
    assert (counts >= 30).all()
    assert len(counts) == 3  # the three blobs (isolated stragglers culled)
