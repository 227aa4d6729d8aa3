"""Euclidean clustering (J8) — distributed connected components.

Reference analog: PDAL filters.cluster groups points within ``tolerance``
(2.0 m) into ClusterID, keeping clusters with >= min_points members
(vcd/preprocessing/preprocess.py:234-249). Single-machine PDAL walks one
KD-tree; at 10^12 rows the engine instead:

1. tiles points by cell (cell edge >= tolerance) and runs a vectorized
   union-find *inside* each tile (applyInPandas kernel — grid-hash buckets,
   pairwise distance checks only between adjacent sub-buckets);
2. finds cross-tile edges with the tile+halo kNN machinery (pairs within
   tolerance whose members live in different tiles);
3. resolves global labels by iterated label propagation over the edge set
   (min-label joins to fixpoint — O(log(diameter)) rounds, each one shuffle
   keyed by label), the standard Spark connected-components-without-GraphX
   pattern.

Labels are deterministic: a cluster's id is the minimum point id it
contains; singleton/small clusters get id -1 (the reference's convention:
ClusterID -1/0 are culled, preprocess.py:228-231).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from codem_spark.functions import cells
from codem_spark.operators import knn

Extent = tuple[float, float, float, float]


def _tile_union_find(tolerance: float):
    tol2 = tolerance * tolerance

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        pids = pdf["pid"].to_numpy()
        if n == 0:
            return pd.DataFrame({"pid": [], "label": []})
        pts = pdf[["x", "y", "z"]].to_numpy(np.float64)
        parent = np.arange(n)

        def find(i: int) -> int:
            root = i
            while parent[root] != root:
                root = parent[root]
            while parent[i] != root:
                parent[i], i = root, parent[i]
            return root

        # grid-hash into tolerance-sized sub-buckets; only adjacent buckets
        # can contain pairs within tolerance
        gx = np.floor(pts[:, 0] / tolerance).astype(np.int64)
        gy = np.floor(pts[:, 1] / tolerance).astype(np.int64)
        keys = np.stack([gx, gy], axis=1)
        uniq, inv = np.unique(keys, axis=0, return_inverse=True)
        order = np.argsort(inv, kind="stable")
        starts = np.searchsorted(inv[order], np.arange(len(uniq)))
        ends = np.append(starts[1:], n)
        bucket_of = {
            (int(uniq[i, 0]), int(uniq[i, 1])): order[starts[i] : ends[i]]
            for i in range(len(uniq))
        }
        for (bx, by), idx_a in bucket_of.items():
            for dx in (0, 1):
                for dy in (-1, 0, 1):
                    if dx == 0 and dy < 0:
                        continue
                    nb = (bx + dx, by + dy)
                    idx_b = bucket_of.get(nb)
                    if idx_b is None:
                        continue
                    a_pts = pts[idx_a]
                    b_pts = pts[idx_b]
                    d2 = ((a_pts[:, None, :] - b_pts[None, :, :]) ** 2).sum(2)
                    ii, jj = np.nonzero(d2 <= tol2)
                    for i_, j_ in zip(idx_a[ii], idx_b[jj]):
                        if i_ == j_:
                            continue
                        ri, rj = find(int(i_)), find(int(j_))
                        if ri != rj:
                            parent[max(ri, rj)] = min(ri, rj)
        roots = np.array([find(int(i)) for i in range(n)])
        # tile-local label = min pid in component (globally meaningful seed)
        lab = np.empty(n, dtype=np.int64)
        for r in np.unique(roots):
            members = roots == r
            lab[members] = pids[members].min()
        return pd.DataFrame({"pid": pids, "label": lab})

    return kernel


def euclidean_cluster(
    points: DataFrame,
    extent: Extent,
    tolerance: float = 2.0,
    min_points: int = 30,
    max_rounds: int = 20,
) -> DataFrame:
    """points(pid, x, y, z) -> (pid, cluster_id); cluster_id = min pid of the
    cluster, or -1 for clusters smaller than min_points."""
    # consumed three times below (tiling, both radius-join sides): persist so
    # an expensive upstream (e.g. a kNN-dZ output) is not recomputed
    points = points.select("pid", "x", "y", "z").persist()
    level = knn.auto_level(extent, tolerance, points.count())
    tiled = cells.with_cell(points.select("pid", "x", "y", "z"), "x", "y", extent, level)
    local = (
        tiled.drop("_ix", "_iy")
        .groupBy("cell_id")
        .applyInPandas(
            lambda _k, pdf: _tile_union_find(tolerance)(pdf),
            schema="pid long, label long",
        )
    )
    # cross-tile edges: ALL pairs within tolerance (radius join); symmetrize
    # so min-labels flow both directions during propagation
    half = (
        knn.radius_join(
            points.select("pid", "x", "y", "z"),
            points.select("pid", "x", "y", "z"),
            extent,
            radius=tolerance,
            lid="pid",
            rid="pid",
            level=level,
        )
        .filter(F.col("pid") < F.col("n_pid"))
        .select(F.col("pid").alias("a"), F.col("n_pid").alias("b"))
    )
    edges = half.unionByName(
        half.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=True)
    labels = local.select("pid", "label").localCheckpoint(eager=True)
    # Min-label propagation with group shortcutting (alternating "neighbor
    # min" and "label-group min" — the hash-to-min CC pattern): neighbor-min
    # alone needs O(graph diameter) rounds; the shortcut step lets an entire
    # label group jump to the smallest label any member saw, giving
    # O(log diameter) rounds, each a bounded shuffle keyed by pid / label.
    for _ in range(max_rounds):
        la = labels.withColumnsRenamed({"pid": "a", "label": "la"})
        lb = labels.withColumnsRenamed({"pid": "b", "label": "lb"})
        prop = (
            edges.join(la, "a").join(lb, "b")
            .select(F.col("a").alias("pid"), F.least("la", "lb").alias("nl"))
            .groupBy("pid")
            .agg(F.min("nl").alias("nl"))
        )
        stepped = labels.join(prop, "pid", "left").select(
            "pid",
            F.col("label").alias("old_label"),
            F.least(F.col("label"), F.coalesce("nl", F.col("label"))).alias("nl"),
        )
        lmap = stepped.groupBy("old_label").agg(F.min("nl").alias("gmin"))
        new_labels = (
            stepped.join(lmap, "old_label")
            .select("pid", F.least("nl", "gmin").alias("label"))
            .localCheckpoint(eager=True)
        )
        # Convergence via a monotone scalar: min-label propagation can only
        # decrease the label sum; fixpoint <=> sum unchanged. (A join-based
        # old-vs-new compare would hit the shared-lineage attribute collapse
        # — see operators/knn.py — and silently always 'converge'.)
        old_sum = labels.agg(F.sum("label")).collect()[0][0]
        new_sum = new_labels.agg(F.sum("label")).collect()[0][0]
        labels = new_labels
        if old_sum == new_sum:
            break
    # size filter: clusters below min_points -> -1 (reference culls them)
    sized = labels.groupBy("label").agg(F.count("*").alias("n"))
    return (
        labels.join(sized, "label")
        .select(
            "pid",
            F.when(F.col("n") >= min_points, F.col("label")).otherwise(F.lit(-1)).alias("cluster_id"),
        )
    )
