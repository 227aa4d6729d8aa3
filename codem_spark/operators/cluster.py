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


def components_np(n: int, ii: np.ndarray, jj: np.ndarray) -> np.ndarray:
    """Connected components over ``n`` nodes and edges (ii, jj) — fully
    vectorized min-label propagation with pointer-doubling shortcuts
    (hash-to-min): labels only decrease, each round is O(E + n), and the
    shortcut step (label <- label of label) gives O(log diameter) rounds.
    Returns the component root index per node (min node index)."""
    lab = np.arange(n, dtype=np.int64)
    if len(ii) == 0:
        return lab
    a = np.concatenate([ii, jj])
    b = np.concatenate([jj, ii])
    while True:
        l2 = lab.copy()
        np.minimum.at(l2, a, lab[b])
        l2 = np.minimum(l2, l2[l2])
        l2 = np.minimum(l2, l2[l2])
        if np.array_equal(l2, lab):
            return lab
        lab = l2


def _tile_union_find(tolerance: float):
    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        pids = pdf["pid"].to_numpy()
        if n == 0:
            return pd.DataFrame({"pid": [], "label": []})
        pts = pdf[["x", "y", "z"]].to_numpy(np.float64)
        # within-tolerance pairs via the shared grid-hash radius kernel
        # (linear in candidate volume); then vectorized component labels —
        # no per-pair Python loop
        li, ri, _d, _rk = knn.grid_topk(pts, pts, np.arange(n), tolerance, k=None)
        m = li != ri
        roots = components_np(n, li[m], ri[m])
        # tile-local label = min pid in component (globally meaningful seed)
        comp_min = np.full(n, np.iinfo(np.int64).max)
        np.minimum.at(comp_min, roots, pids.astype(np.int64))
        return pd.DataFrame({"pid": pids, "label": comp_min[roots]})

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
    par = points.sparkSession.sparkContext.defaultParallelism
    level = knn.auto_level(extent, tolerance, points.count(), parallelism=par)
    tiled = cells.with_cell(points.select("pid", "x", "y", "z"), "x", "y", extent, level)
    local = (
        tiled.drop("_ix", "_iy")
        .groupBy("cell_id")
        .applyInPandas(
            lambda _k, pdf: _tile_union_find(tolerance)(pdf),
            schema="pid long, label long",
        )
    )
    # cross-tile edges ONLY: intra-tile connectivity is already resolved by
    # the kernel above, so (a) both radius-join sides pre-filter to the
    # border band (points within tolerance of a tile border — everything
    # deeper cannot form a cross-tile pair) and (b) the join keeps only
    # pairs whose endpoints live in different tiles. A dense m-point blob in
    # a tile interior now contributes ZERO edge rows (was ~m²); symmetrize
    # so min-labels flow both directions during propagation.
    border = cells.border_band(tiled, extent, level, tolerance).select(
        "pid", "x", "y", "z"
    )
    half = (
        knn.radius_join(
            border,
            border,
            extent,
            radius=tolerance,
            lid="pid",
            rid="pid",
            level=level,
            cross_tile_only=True,
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
    prev_sum = None  # label-sum of `labels`; carried across rounds so each
    # round costs ONE scalar agg (the old sum is last round's new sum)
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
        if prev_sum is None:
            prev_sum = labels.agg(F.sum("label")).collect()[0][0]
        new_sum = new_labels.agg(F.sum("label")).collect()[0][0]
        labels = new_labels
        if prev_sum == new_sum:
            break
        prev_sum = new_sum
    # size filter: clusters below min_points -> -1 (reference culls them)
    sized = labels.groupBy("label").agg(F.count("*").alias("n"))
    return (
        labels.join(sized, "label")
        .select(
            "pid",
            F.when(F.col("n") >= min_points, F.col("label")).otherwise(F.lit(-1)).alias("cluster_id"),
        )
    )
