"""Distributed kNN correspondence join — tile + halo pattern (SURVEY.md §2.4).

Reference analogs: J2 radius-bounded nearest fixed point per moving point
(scipy cKDTree, icp.py:132-140), J3 VCD dZ3d nearest-before join
(vcd/preprocessing/preprocess.py:196-199), J4 k-neighborhood for normals
(preprocess.py:317-350). The reference builds one in-RAM KD-tree; that can't
exist at 10^12 rows, so the engine:

1. picks a cell level whose cell edge >= search radius (so a 1-ring halo
   provably covers every true neighbor within radius — same role as the
   reference's ``distance_upper_bound`` pruning, icp.py:133-135);
2. partitions the query side by its own cell, duplicates the data side into
   each cell's (2r+1)^2 neighbor ring (bounded shuffle fan-out);
3. cogroups the two sides per cell and runs a vectorized numpy kernel
   (chunked pairwise distances + argpartition top-k) via applyInPandas —
   Arrow batches, no per-row Python;
4. (optional completeness pass) queries that found no neighbor inside the
   radius re-run at an escalated radius — a driver loop over a shrinking
   residual set, the distributed replacement for an unbounded KD-tree query.

Determinism: ties in distance break by ascending data-point id, so output
rows are identical run-to-run and partitioning-to-partitioning (a north-rule
requirement: join output rows must match the reference / the oracle).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from codem_spark.functions import cells

Extent = tuple[float, float, float, float]


def level_for_radius(extent: Extent, radius: float, max_level: int = 16) -> int:
    """Finest level whose cell edge >= radius (1-ring halo covers radius)."""
    span = max(extent[2] - extent[0], extent[3] - extent[1])
    level = int(math.floor(math.log2(max(span / max(radius, 1e-12), 1.0))))
    return max(1, min(max_level, level))


def _topk_kernel_builder(
    k: int,
    radius: float,
    dims: tuple[str, ...],
    lid: str,
    rid: str,
    l_carry: list[str],
    r_carry: list[str],
):
    """Build the per-tile cogroup kernel. Chunked so a dense tile never
    materializes more than ~4M pairwise distances at once."""
    r2 = radius * radius if radius > 0 else float("inf")

    def kernel(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        out_cols = (
            [lid, "n_" + rid, "nn_dist", "nn_rank"]
            + ["l_" + c for c in l_carry]
            + ["r_" + c for c in r_carry]
        )
        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame({c: [] for c in out_cols})
        lpts = np.column_stack([left[d].to_numpy(np.float64) for d in dims])
        rpts = np.column_stack([right[d].to_numpy(np.float64) for d in dims])
        rids = right[rid].to_numpy()
        n_l, n_r = len(lpts), len(rpts)
        chunk = max(1, int(4_000_000 // max(n_r, 1)))
        li_all: list[np.ndarray] = []
        ri_all: list[np.ndarray] = []
        d_all: list[np.ndarray] = []
        rk_all: list[np.ndarray] = []
        cand = min(n_r, k + 8)  # extra candidates to resolve ties by rid
        for s in range(0, n_l, chunk):
            lc = lpts[s : s + chunk]
            # (c, n_r) squared distances, fully vectorized
            d2 = ((lc[:, None, :] - rpts[None, :, :]) ** 2).sum(axis=2)
            if cand < n_r:
                part = np.argpartition(d2, cand - 1, axis=1)[:, :cand]
            else:
                part = np.broadcast_to(np.arange(n_r), (len(lc), n_r))
            rows = np.arange(len(lc))[:, None]
            d2c = d2[rows, part]
            # stable per-row order by (distance, data id) — determinism
            idc = rids[part]
            order = np.lexsort((idc, d2c), axis=1)[:, :k]
            sel = part[rows[:, : order.shape[1]], order]
            seld = d2[np.arange(len(lc))[:, None], sel]
            within = seld <= r2
            n_sel = order.shape[1]
            li = np.repeat(np.arange(s, s + len(lc)), n_sel).reshape(len(lc), n_sel)
            rk = np.broadcast_to(np.arange(1, n_sel + 1), (len(lc), n_sel))
            li_all.append(li[within])
            ri_all.append(sel[within])
            d_all.append(np.sqrt(seld[within]))
            rk_all.append(rk[within])
        li = np.concatenate(li_all)
        ri = np.concatenate(ri_all)
        data = {
            lid: left[lid].to_numpy()[li],
            "n_" + rid: rids[ri],
            "nn_dist": np.concatenate(d_all),
            "nn_rank": np.concatenate(rk_all).astype(np.int32),
        }
        for c in l_carry:
            data["l_" + c] = left[c].to_numpy()[li]
        for c in r_carry:
            data["r_" + c] = right[c].to_numpy()[ri]
        return pd.DataFrame(data)

    return kernel


def knn_join(
    left: DataFrame,
    right: DataFrame,
    extent: Extent,
    radius: float,
    k: int = 1,
    dims: tuple[str, ...] = ("x", "y", "z"),
    lid: str = "pid",
    rid: str = "pid",
    l_carry: tuple[str, ...] = (),
    r_carry: tuple[str, ...] = (),
    ring: int = 1,
    level: int | None = None,
) -> DataFrame:
    """Radius-bounded k-nearest-neighbor join (left row -> up to k nearest
    right rows within ``radius`` in ``dims``-space; xy drives tiling).

    Output columns: lid, n_<rid>, nn_dist, nn_rank, l_<carry...>, r_<carry...>.
    """
    if level is None:
        level = level_for_radius(extent, radius / max(ring, 1))
    lc = cells.with_cell(left, "x", "y", extent, level).drop("_ix", "_iy")
    rc = cells.with_cell(right, "x", "y", extent, level)
    rh = cells.explode_halo(rc, level, ring=ring, out="halo_cell").drop("_ix", "_iy", "cell_id")

    l_cols = [lid, *dims, *[c for c in l_carry if c not in dims and c != lid]]
    r_cols = [rid, *dims, *[c for c in r_carry if c not in dims and c != rid]]
    lsel = lc.select("cell_id", *dict.fromkeys(l_cols))
    # Alias right-side columns to fresh names: a self-join (left is right, or
    # shares lineage) otherwise resolves both cogroup children to the SAME
    # attribute ids and Catalyst prunes the right side down to the key.
    rsel = rh.select(
        F.col("halo_cell").alias("cell_id"),
        *[F.col(c).alias(f"_r_{c}") for c in dict.fromkeys(r_cols)],
    )

    kernel = _topk_kernel_builder(k, radius, dims, lid, rid, list(l_carry), list(r_carry))

    def run(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        r = r.rename(columns={c: c[3:] for c in r.columns if c.startswith("_r_")})
        return kernel(l, r)

    # Build the output schema explicitly from the input schemas.
    lf = {f.name: f.dataType.simpleString() for f in left.schema.fields}
    rf = {f.name: f.dataType.simpleString() for f in right.schema.fields}
    parts = [f"{lid} {lf[lid]}", f"n_{rid} {rf[rid]}", "nn_dist double", "nn_rank int"]
    parts += [f"l_{c} {lf[c]}" for c in l_carry]
    parts += [f"r_{c} {rf[c]}" for c in r_carry]
    out_schema = ", ".join(parts)

    return (
        lsel.groupBy("cell_id")
        .cogroup(rsel.groupBy("cell_id"))
        .applyInPandas(lambda _key, l, r: run(l, r), schema=out_schema)
    )


def radius_join(
    left: DataFrame,
    right: DataFrame,
    extent: Extent,
    radius: float,
    dims: tuple[str, ...] = ("x", "y", "z"),
    lid: str = "pid",
    rid: str = "pid",
    ring: int = 1,
    level: int | None = None,
) -> DataFrame:
    """ALL pairs within ``radius`` (not top-k) — the distance-join used for
    clustering edges (J8) and IDW neighborhoods. Same tile+halo plan as
    knn_join; kernel emits every within-radius pair exactly once (each right
    row lands in a given halo cell once, each left row has one home cell)."""
    if level is None:
        level = level_for_radius(extent, radius / max(ring, 1))
    r2 = radius * radius
    lc = cells.with_cell(left, "x", "y", extent, level).drop("_ix", "_iy")
    rc = cells.with_cell(right, "x", "y", extent, level)
    rh = cells.explode_halo(rc, level, ring=ring, out="halo_cell").drop("_ix", "_iy", "cell_id")
    lsel = lc.select("cell_id", lid, *dims)
    rsel = rh.select(
        F.col("halo_cell").alias("cell_id"),
        *[F.col(c).alias(f"_r_{c}") for c in dict.fromkeys([rid, *dims])],
    )

    def kernel(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        rpdf = rpdf.rename(columns={c: c[3:] for c in rpdf.columns if c.startswith("_r_")})
        if len(lpdf) == 0 or len(rpdf) == 0:
            return pd.DataFrame({lid: [], "n_" + rid: [], "nn_dist": []})
        lp = np.column_stack([lpdf[d].to_numpy(np.float64) for d in dims])
        rp = np.column_stack([rpdf[d].to_numpy(np.float64) for d in dims])
        lids_ = lpdf[lid].to_numpy()
        rids_ = rpdf[rid].to_numpy()
        chunk = max(1, int(4_000_000 // max(len(rp), 1)))
        li_all, ri_all, d_all = [], [], []
        for s in range(0, len(lp), chunk):
            d2 = ((lp[s : s + chunk, None, :] - rp[None, :, :]) ** 2).sum(2)
            ii, jj = np.nonzero(d2 <= r2)
            li_all.append(ii + s)
            ri_all.append(jj)
            d_all.append(np.sqrt(d2[ii, jj]))
        li = np.concatenate(li_all)
        ri = np.concatenate(ri_all)
        return pd.DataFrame(
            {lid: lids_[li], "n_" + rid: rids_[ri], "nn_dist": np.concatenate(d_all)}
        )

    lf = {f.name: f.dataType.simpleString() for f in left.schema.fields}
    rf = {f.name: f.dataType.simpleString() for f in right.schema.fields}
    out_schema = f"{lid} {lf[lid]}, n_{rid} {rf[rid]}, nn_dist double"
    return (
        lsel.groupBy("cell_id")
        .cogroup(rsel.groupBy("cell_id"))
        .applyInPandas(lambda _k, l, r: kernel(l, r), schema=out_schema)
    )


def knn_join_complete(
    left: DataFrame,
    right: DataFrame,
    extent: Extent,
    radius: float,
    max_rounds: int = 6,
    escalate: float = 4.0,
    **kw,
) -> DataFrame:
    """Unbounded nearest-neighbor (k=1) join: radius-bounded rounds with
    escalating radius over the unmatched residual — distributed stand-in for
    the reference's unbounded KDTree.query (icp.py:235-241). Each round the
    residual shrinks (typically exponentially), so total cost ~ one bounded
    join plus noise."""
    lid = kw.get("lid", "pid")
    kw = {**kw, "k": 1}
    result = None
    residual = left
    r = radius
    for _ in range(max_rounds):
        matched = knn_join(residual, right, extent, r, **kw)
        result = matched if result is None else result.unionByName(matched)
        residual = residual.join(matched.select(lid), on=lid, how="left_anti")
        # localCheckpoint keeps the lineage flat across driver-loop rounds
        residual = residual.localCheckpoint(eager=True)
        if residual.isEmpty():
            return result
        r *= escalate
    return result
