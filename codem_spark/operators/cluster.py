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
3. contracts the graph to LABEL-level edges (one row per adjacent pair of
   tile-local components — orders of magnitude fewer than points) and
   resolves components on the contracted graph: exactly on the driver via
   the vectorized hash-to-min when the edge count is small (capacity
   switch, like the reference's brute-force->FLANN descriptor-match
   switch), else by distributed min-label propagation with group
   shortcutting (O(log diameter) rounds over label rows, the standard
   Spark connected-components-without-GraphX pattern); the resulting root
   map joins back to points in ONE pass (broadcast when driver-resolved).

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
        cols = ["pid", "label", "lab_n", "x", "y", "z", "is_border"]
        if n == 0:
            return pd.DataFrame({c: [] for c in cols})
        pts = pdf[["x", "y", "z"]].to_numpy(np.float64)
        # within-tolerance pairs via the shared grid-hash radius kernel
        # (linear in candidate volume); unordered_pairs halves the DRAM-bound
        # candidate/distance volume — components_np symmetrizes internally,
        # so one orientation per pair is enough. Then vectorized component
        # labels — no per-pair Python loop.
        li, ri, _d, _rk = knn.grid_topk(
            pts, pts, np.arange(n), tolerance, k=None, unordered_pairs=True
        )
        roots = components_np(n, li, ri)
        # tile-local label = min pid in component (globally meaningful seed).
        # Coordinates and the border flag ride along so the cross-tile edge
        # join can run DIRECTLY on labeled border rows — the old plan joined
        # the full label table back onto the edge endpoints, two full-table
        # shuffles per run (guide §8: carry the small annotation with the
        # row instead of joining it back later).
        pids64 = pids.astype(np.int64)
        comp_min = np.full(n, np.iinfo(np.int64).max)
        np.minimum.at(comp_min, roots, pids64)
        # label sizes are FULLY known here — labels are tile-local (min pid
        # of the tile component), so the global per-label count is this
        # component's size. It is emitted on exactly ONE representative row
        # per component (first row carrying the min pid — input pids may
        # repeat) and 0 elsewhere, so the caller reads the (label, n) table
        # with a narrow lab_n > 0 filter instead of a groupBy shuffle, and
        # the final broadcast join stays one-row-per-label by construction.
        comp_n = np.bincount(roots, minlength=n)
        cand = np.flatnonzero(pids64 == comp_min[roots])
        rep_idx = np.full(n, n, dtype=np.int64)
        np.minimum.at(rep_idx, roots[cand], cand)
        lab_n = np.zeros(n, dtype=np.int64)
        sel = rep_idx[rep_idx < n]
        lab_n[sel] = comp_n[roots[sel]]
        return pd.DataFrame(
            {
                "pid": pids,
                "label": comp_min[roots],
                "lab_n": lab_n,
                "x": pts[:, 0],
                "y": pts[:, 1],
                "z": pts[:, 2],
                "is_border": pdf["_border"].to_numpy(),
            }
        )

    return kernel


def euclidean_cluster(
    points: DataFrame,
    extent: Extent,
    tolerance: float = 2.0,
    min_points: int = 30,
    max_rounds: int = 20,
    driver_cc_max_edges: int = 1 << 21,
) -> DataFrame:
    """points(pid, x, y, z) -> (pid, cluster_id); cluster_id = min pid of the
    cluster, or -1 for clusters smaller than min_points."""
    # The input has exactly ONE data consumer (the tile kernel — border rows
    # and labels all derive from the checkpointed kernel output), so no
    # persist: a cache pass here is a pure extra materialization.
    # n_points only feeds parallelism and capacity knobs, where a
    # plan-statistics estimate is enough (an overestimate errs toward more
    # tiles / the shuffle join, both correct).
    from codem_spark.util import approx_row_count

    points = points.select("pid", "x", "y", "z")
    par = points.sparkSession.sparkContext.defaultParallelism
    n_points = approx_row_count(points)
    level = knn.auto_level(extent, tolerance, n_points, parallelism=par)
    tiled = cells.with_cell(points.select("pid", "x", "y", "z"), "x", "y", extent, level)
    # border-band membership is decided BEFORE the kernel (same predicate
    # as cells.border_band) and carried through it, so the labeled frame
    # already knows which rows can participate in cross-tile edges
    size = cells.cell_size(extent, level)
    fx = F.col("x") - (F.col("_ix").cast("double") * F.lit(size) + F.lit(extent[0]))
    fy = F.col("y") - (F.col("_iy").cast("double") * F.lit(size) + F.lit(extent[1]))
    rtol = F.lit(float(tolerance))
    border_pred = (
        (fx <= rtol) | ((F.lit(size) - fx) <= rtol)
        | (fy <= rtol) | ((F.lit(size) - fy) <= rtol)
    )
    local = (
        tiled.withColumn("_border", border_pred)
        .drop("_ix", "_iy")
        .groupBy("cell_id")
        .applyInPandas(
            lambda _k, pdf: _tile_union_find(tolerance)(pdf),
            schema="pid long, label long, lab_n long, "
            "x double, y double, z double, is_border boolean",
        )
    )
    labeled = local.localCheckpoint(eager=True)
    labels = labeled.select("pid", "label")
    # cross-tile edges ONLY: intra-tile connectivity is already resolved by
    # the kernel above, so (a) both radius-join sides pre-filter to the
    # border band (points within tolerance of a tile border — everything
    # deeper cannot form a cross-tile pair) and (b) the join keeps only
    # pairs whose endpoints live in different tiles. A dense m-point blob in
    # a tile interior now contributes ZERO edge rows (was ~m²).
    # Two-level connected components: contract the point graph to LABEL
    # edges — the radius join runs on LABELED border rows, so each
    # within-tolerance cross-tile pair emits its (label_a, label_b) edge
    # directly. (The previous plan joined the 600k-row label table onto the
    # edge endpoints — two full-table shuffles to annotate a few thousand
    # edges, because the cogroup outputs carry no size statistics and never
    # auto-broadcast.) Distinct label pairs are orders of magnitude fewer
    # than points, so the iterative part of CC runs on the contracted
    # graph, never on the 10^12-row point set.
    border = labeled.filter(F.col("is_border")).select(
        F.col("label").alias("lab"), "x", "y", "z"
    )
    # Capacity switch #1 (the common path): the border band is a thin
    # fraction of the cloud, so under the probe cap the whole cross-tile
    # edge computation runs in numpy on the DRIVER with the same grid_topk
    # kernel the tiles use. Any within-tolerance pair in the SAME tile is
    # same-label by construction (the tile kernel unioned it), so filtering
    # driver pairs to label_a != label_b yields exactly the cross-tile label
    # edge set — replacing a cogroup radius join + distinct shuffle + edge
    # probe (several driver round-trips of pure plumbing for a few thousand
    # edges) with one bounded collect. Above the cap, the distributed
    # radius-join edge path below is unchanged.
    edges_np = None
    ledges = None
    bp = border.limit(driver_cc_max_edges + 1).toPandas()
    if len(bp) <= driver_cc_max_edges:
        bpts = bp[["x", "y", "z"]].to_numpy(np.float64)
        blab = bp["lab"].to_numpy(np.int64)
        nb = len(bp)
        rix = np.arange(nb)

        # exclude_same_group: same-label border pairs (the dense within-blob
        # bulk) are rejected by an integer compare at candidate level —
        # only genuinely cross-component candidates pay the 3-D distance.
        # Large border bands are split into left-slices across driver
        # threads (numpy releases the GIL on the bulk ops; l_offset keeps
        # the candidate-level unordered mask exact per slice, so the union
        # of slice outputs IS the single-call pair set).
        def _edge_slice(s: int, e: int) -> tuple[np.ndarray, np.ndarray]:
            bi, bj, _d, _rk = knn.grid_topk(
                bpts[s:e],
                bpts,
                rix,
                tolerance,
                k=None,
                unordered_pairs=True,
                exclude_same_group=(blab[s:e], blab),
                l_offset=s,
            )
            return blab[bi + s], blab[bj]

        nthr = min(8, max(1, nb // 65536))
        if nthr <= 1:
            ea_np, eb_np = _edge_slice(0, nb)
        else:
            from concurrent.futures import ThreadPoolExecutor

            bounds = np.linspace(0, nb, nthr + 1).astype(np.int64)
            with ThreadPoolExecutor(nthr) as pool:
                parts = list(
                    pool.map(
                        lambda i: _edge_slice(int(bounds[i]), int(bounds[i + 1])),
                        range(nthr),
                    )
                )
            ea_np = np.concatenate([p[0] for p in parts])
            eb_np = np.concatenate([p[1] for p in parts])
        # duplicates are fine: components_np is idempotent over repeated
        # edges, and the arrays are already in memory
        edges_np = (ea_np, eb_np)
    else:
        # unordered_ids: each cross-tile pair is generated in both
        # orientations (once per endpoint's home tile) and same-label pairs
        # carry no connectivity — the kernel-side lab < n_lab mask halves
        # the rows reaching this distinct(); the driver CC and the
        # distributed fallback both symmetrize, so one orientation per edge
        # is sufficient.
        ledges = (
            knn.radius_join(
                border,
                border,
                extent,
                radius=tolerance,
                lid="lab",
                rid="lab",
                level=level,
                cross_tile_only=True,
                unordered_ids=True,
            )
            .select(F.col("lab").alias("la"), F.col("n_lab").alias("lb"))
            .distinct()
        )
        # Capacity switch #2, like the brute-force->LSH descriptor-match
        # switch (registration/coarse.py): a contracted graph under ~2^21
        # edges is resolved exactly on the driver with the vectorized
        # hash-to-min (components_np — the same routine the tile kernels
        # run). The limit(cap+1) PROBE (same pattern as similarity.py's
        # matmul top-k) is the only materialization of the edge frame:
        # <= cap rows back means the probe IS the complete edge set. Larger
        # graphs fall through to distributed min-label propagation with
        # group shortcutting over the contracted edges — O(log diameter)
        # rounds, each a bounded shuffle over LABEL rows, not point rows.
        ep = ledges.limit(driver_cc_max_edges + 1).toPandas()
        if len(ep) <= driver_cc_max_edges:
            edges_np = (ep["la"].to_numpy(np.int64), ep["lb"].to_numpy(np.int64))
    spark = points.sparkSession
    nodes = node_root = None
    rootmap = None
    if edges_np is not None and len(edges_np[0]) == 0:
        pass
    elif edges_np is not None:
        ea, eb = edges_np
        nodes = np.unique(np.concatenate([ea, eb]))
        idx = {int(v): i for i, v in enumerate(nodes)}
        ii = np.array([idx[int(v)] for v in ea], dtype=np.int64)
        jj = np.array([idx[int(v)] for v in eb], dtype=np.int64)
        roots = components_np(len(nodes), ii, jj)
        # component root = min LABEL in component (labels are min pids, so
        # this is exactly the global min-pid label)
        comp_min = np.full(len(nodes), np.iinfo(np.int64).max)
        np.minimum.at(comp_min, roots, nodes)
        node_root = comp_min[roots]
    else:
        sym = (
            ledges.unionByName(
                ledges.select(F.col("lb").alias("la"), F.col("la").alias("lb"))
            ).localCheckpoint(eager=True)
        )
        rm = (
            sym.groupBy("la").agg(F.min("lb").alias("root"))
            .select("la", F.least("la", "root").alias("root"))
            .localCheckpoint(eager=True)
        )
        prev_sum = None
        for _ in range(max_rounds):
            ra = rm.withColumnsRenamed({"la": "a_", "root": "ra"})
            rb = rm.withColumnsRenamed({"la": "lb", "root": "rb"})
            prop = (
                sym.join(ra, sym.la == ra.a_)
                .join(rb, "lb")
                .select(F.col("la"), F.least("ra", "rb").alias("nr"))
                .groupBy("la")
                .agg(F.min("nr").alias("nr"))
            )
            stepped = rm.join(prop, "la", "left").select(
                "la",
                F.col("root").alias("old_root"),
                F.least(F.col("root"), F.coalesce("nr", F.col("root"))).alias("nr"),
            )
            gmap = stepped.groupBy("old_root").agg(F.min("nr").alias("gmin"))
            new_rm = (
                stepped.join(gmap, "old_root")
                .select("la", F.least("nr", "gmin").alias("root"))
                .localCheckpoint(eager=True)
            )
            # Convergence via a monotone scalar: roots only decrease, so
            # fixpoint <=> root-sum unchanged. (A join-based old-vs-new
            # compare would hit the shared-lineage attribute collapse — see
            # operators/knn.py — and silently always 'converge'.)
            if prev_sum is None:
                prev_sum = rm.agg(F.sum("root")).collect()[0][0]
            new_sum = new_rm.agg(F.sum("root")).collect()[0][0]
            rm = new_rm
            if prev_sum == new_sum:
                break
            prev_sum = new_sum
        rootmap = rm.withColumnsRenamed({"la": "label"})
    # Size filter folded into a LABEL-level map (VERDICT r4 item 4). Labels
    # are tile-local, so the kernel already computed every label's global
    # size — the (label, n) table is read off the single representative row
    # per label the kernel marked (lab_n > 0) with a narrow checkpoint
    # filter, no groupBy shuffle. On the common path (driver-resolved roots AND label
    # table under the probe cap) root resolution and the min_points cull
    # run in numpy on the DRIVER from that one probe — replacing the
    # label-level join/agg/join chain with zero extra shuffles — and the
    # single point-level join broadcasts by construction, keyed on the
    # actual LABEL count rather than the point count (labels are bounded
    # by tiles × components-per-tile, so at 10× rows the old n_points-based
    # switch forced a full point shuffle for a map of a few thousand rows).
    lsize = labeled.filter(F.col("lab_n") > 0).select(
        "label", F.col("lab_n").alias("n")
    )
    lp = None
    if rootmap is None:  # no edges, or roots already resolved on the driver
        lp = lsize.limit(driver_cc_max_edges + 1).toPandas()
        if len(lp) > driver_cc_max_edges:
            lp = None
    if lp is not None:
        labs = lp["label"].to_numpy(np.int64)
        ns = lp["n"].to_numpy(np.int64)
        if nodes is None:
            root = labs
        else:
            pos = np.minimum(np.searchsorted(nodes, labs), len(nodes) - 1)
            hit = nodes[pos] == labs
            root = np.where(hit, node_root[pos], labs)
        uroot, inv = np.unique(root, return_inverse=True)
        tot = np.bincount(inv, weights=ns).astype(np.int64)
        cluster_id = np.where(tot[inv] >= min_points, root, np.int64(-1))
        final_map = F.broadcast(
            spark.createDataFrame(
                pd.DataFrame({"label": labs, "cluster_id": cluster_id})
            )
        )
        return labels.join(final_map, "label").select("pid", "cluster_id")
    # fallback: label table over the probe cap (sparse dust can make every
    # isolated point its own label) — distributed label-level resolution
    if rootmap is None and nodes is not None:
        rootmap = F.broadcast(
            spark.createDataFrame(pd.DataFrame({"label": nodes, "root": node_root}))
        )
    if rootmap is None:
        labmap = lsize.select("label", F.col("label").alias("root"), "n")
    else:
        labmap = lsize.join(rootmap, "label", "left").select(
            "label", F.coalesce("root", "label").alias("root"), "n"
        )
    rsize = labmap.groupBy("root").agg(F.sum("n").alias("tot"))
    final_map = labmap.join(rsize, "root").select(
        "label",
        F.when(F.col("tot") >= min_points, F.col("root"))
        .otherwise(F.lit(-1))
        .alias("cluster_id"),
    )
    # capacity switch for the one point-level join: broadcast only when the
    # label map is provably small; here the label count exceeded the probe
    # cap, so fall back to the n_points heuristic
    if n_points <= 5_000_000:
        final_map = F.broadcast(final_map)
    return labels.join(final_map, "label").select("pid", "cluster_id")
