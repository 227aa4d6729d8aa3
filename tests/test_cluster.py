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


def test_dense_blob_emits_no_interior_edges(spark):
    """A dense blob strictly inside one tile contributes ZERO cross-tile
    edge rows (was ~m^2 before cross_tile_only): the in-tile kernel resolves
    it alone, so the edge pass stays O(boundary) at scale."""
    import pandas as pd
    from codem_spark.functions import cells
    from codem_spark.operators import knn

    rng = np.random.default_rng(3)
    m = 2000
    tol = 3.0
    level = 4  # 16x16 tiles of 62.5 m over SMALL_EXTENT
    size = cells.cell_size(SMALL_EXTENT, level)
    # blob centered mid-tile, radius << distance to any border
    cx = 5 * size + size / 2
    pdf = pd.DataFrame(
        {
            "pid": np.arange(m),
            "x": cx + rng.uniform(-5, 5, m),
            "y": cx + rng.uniform(-5, 5, m),
            "z": np.zeros(m),
        }
    )
    df = spark.createDataFrame(pdf)
    tiled = cells.with_cell(df, "x", "y", SMALL_EXTENT, level)
    border = cells.border_band(tiled, SMALL_EXTENT, level, tol).select("pid", "x", "y", "z")
    assert border.count() == 0  # interior blob: nothing near a tile border
    edges = knn.radius_join(
        border, border, SMALL_EXTENT, radius=tol, level=level, cross_tile_only=True
    )
    assert edges.count() == 0
    # and the full operator still clusters the blob exactly as one component
    got = cluster.euclidean_cluster(df, SMALL_EXTENT, tolerance=tol, min_points=2).toPandas()
    assert (got.cluster_id == 0).all()


def test_cross_tile_chain_still_connects(spark):
    """A chain of points crossing a tile border must still merge into one
    cluster through the border-band edge pass."""
    import pandas as pd
    from codem_spark.functions import cells

    level_size = cells.cell_size(SMALL_EXTENT, 4)
    xb = 3 * level_size  # a tile border
    xs = np.arange(xb - 10, xb + 10, 1.0)
    pdf = pd.DataFrame({"pid": np.arange(len(xs)), "x": xs, "y": np.full(len(xs), 40.0), "z": 0.0})
    got = (
        cluster.euclidean_cluster(
            spark.createDataFrame(pdf), SMALL_EXTENT, tolerance=1.5, min_points=2
        )
        .toPandas()
        .sort_values("pid")
    )
    assert (got.cluster_id == 0).all()


def test_distributed_label_cc_fallback_matches_driver_path(spark, blob_points):
    """driver_cc_max_edges=0 forces the distributed min-label loop over the
    contracted label graph; labels must be identical to the driver-resolved
    capacity path (deterministic min-pid labels either way)."""
    df = spark.createDataFrame(blob_points)
    a = (
        cluster.euclidean_cluster(df, SMALL_EXTENT, tolerance=8.0, min_points=5)
        .toPandas()
        .sort_values("pid")
        .reset_index(drop=True)
    )
    b = (
        cluster.euclidean_cluster(
            df, SMALL_EXTENT, tolerance=8.0, min_points=5, driver_cc_max_edges=0
        )
        .toPandas()
        .sort_values("pid")
        .reset_index(drop=True)
    )
    assert (a.pid == b.pid).all() and (a.cluster_id == b.cluster_id).all()
    assert (a.cluster_id >= 0).sum() > 0


def test_cross_tile_chain_distributed_fallback(spark):
    """The border-crossing chain through the distributed label-CC loop."""
    import pandas as pd
    from codem_spark.functions import cells

    level_size = cells.cell_size(SMALL_EXTENT, 4)
    xb = 3 * level_size
    xs = np.arange(xb - 10, xb + 10, 1.0)
    pdf = pd.DataFrame({"pid": np.arange(len(xs)), "x": xs, "y": np.full(len(xs), 40.0), "z": 0.0})
    got = (
        cluster.euclidean_cluster(
            spark.createDataFrame(pdf), SMALL_EXTENT, tolerance=1.5, min_points=2,
            driver_cc_max_edges=0,
        )
        .toPandas()
        .sort_values("pid")
    )
    assert (got.cluster_id == 0).all()


def test_cluster_duplicate_pids_preserve_cardinality(spark):
    """Inputs may carry repeated pids (the bench's lineitem-derived cloud
    does): the per-label size table must stay one-row-per-label (the kernel
    marks a single representative row even when the min pid repeats), so
    the final broadcast join cannot fan out rows."""
    import pandas as pd

    rng = np.random.default_rng(7)
    base = pd.DataFrame(
        {
            "pid": np.arange(40),
            "x": rng.uniform(10, 90, 40),
            "y": rng.uniform(10, 90, 40),
            "z": 0.0,
        }
    )
    dup = pd.concat([base, base.iloc[:15]], ignore_index=True)  # repeated pids
    got = (
        cluster.euclidean_cluster(
            spark.createDataFrame(dup), SMALL_EXTENT, tolerance=3.0, min_points=2
        )
        .toPandas()
        .sort_values(["pid", "cluster_id"])
        .reset_index(drop=True)
    )
    assert len(got) == len(dup)  # no fan-out, no loss
    # duplicate pid rows agree with their originals
    per_pid = got.groupby("pid").cluster_id.nunique()
    assert (per_pid == 1).all()
