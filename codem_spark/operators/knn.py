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


def auto_level(
    extent: Extent,
    radius: float,
    n_rows: int | None,
    target_per_tile: int = 1500,
    max_level: int = 16,
    parallelism: int | None = None,
) -> int:
    """Tile level for a kNN/radius join: bounded above by the radius rule
    (cell edge >= radius so a 1-ring halo provably covers the search ball)
    AND by the data size (≈target_per_tile rows per tile), with a floor of
    ~4x ``parallelism`` tiles so the cogroup stage can actually use every
    task slot (rows permitting).

    The count bound matters: a level chosen from radius alone can produce
    far more tiles than rows, and per-tile kernel overhead (one Arrow batch
    + pandas invocation per cogroup key) then dominates (observed 37 s vs
    ~2 s on an 18k-point join). The parallelism floor matters just as much
    the other way: at level L there are at most 4^L tiles, and a level
    chosen from row count alone can strand most of a cluster (observed:
    level 1 -> 4 cogroup groups on 32 cores). Any level <= the radius bound
    is CORRECT — this only tunes parallelism vs per-tile overhead.
    """
    lr = level_for_radius(extent, radius, max_level)
    if not n_rows or n_rows <= 0:
        return lr
    lc = max(1, int(0.5 * math.log2(max(n_rows / target_per_tile, 1.0))))
    if parallelism and parallelism > 0:
        # enough tiles to fill 4x the task slots, but never so fine that
        # average occupancy drops below ~64 rows/tile
        lp = int(math.ceil(0.5 * math.log2(max(4.0 * parallelism, 1.0))))
        lcap = int(0.5 * math.log2(max(n_rows / 64.0, 1.0)))
        lc = max(lc, min(lp, lcap))
    return min(lr, lc)


_EMPTY = (
    np.empty(0, dtype=np.int64),
    np.empty(0, dtype=np.int64),
    np.empty(0, dtype=np.float64),
    np.empty(0, dtype=np.int64),
)


def grid_topk(
    lpts: np.ndarray,
    rpts: np.ndarray,
    rids: np.ndarray,
    radius: float,
    k: int | None,
    # Candidate generation allocates ~56 B/pair of temporaries (index
    # arrays + the (chunk, 3) diff). 1M-pair chunks = ~56 MB of streaming
    # temps PER worker — DRAM-bound, and this box's aggregate copy
    # bandwidth scales only ~3.3x for 4x cores, which capped the kNN stage
    # at 2.75x core-scaling (BENCH r4 run 1). 128k-pair chunks keep the
    # working set ~7 MB (L2/L3-resident): with the k=1 reduceat path below,
    # the 7.3M-pt harness stage measured 245.9 -> 105.6 s at 1 core and
    # 89.4 -> 30.8 s at 4 (2.75x -> 3.43x core-scaling), identical output.
    pair_chunk: int = 131_072,
    # unordered_pairs=True (self-join connectivity mode; REQUIRES lpts and
    # rpts to be the same array in the same order, and k=None): keep each
    # unordered pair once (right index > left index), masked BEFORE the
    # distance evaluation — halves the candidate volume of the DRAM-bound
    # diff/einsum step. Self-pairs are excluded by construction. Callers
    # that symmetrize downstream (the union-find kernels) lose nothing.
    unordered_pairs: bool = False,
    # exclude_same_group=(lgroup, rgroup) (k=None mode): drop candidate
    # pairs whose group ids match, BEFORE the distance evaluation. The CC
    # edge callers pass component labels here — same-label pairs carry no
    # connectivity, and on dense data they are the overwhelming majority of
    # the candidate volume (every within-blob pair), so one integer compare
    # replaces the 3-D distance evaluation for ~all of them.
    exclude_same_group: tuple[np.ndarray, np.ndarray] | None = None,
    # l_offset (unordered_pairs mode): lpts is the contiguous slice
    # rpts[l_offset : l_offset + n_l] — the unordered mask compares global
    # indices (ri > li + l_offset), so a caller can split the left side
    # into slices (e.g. across driver threads) and the union of the slice
    # outputs is exactly the single-call unordered pair set. Returned left
    # indices stay slice-local.
    l_offset: int = 0,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized radius-bounded (top-k or all-pairs) neighbor search.

    The tile-kernel core: bin the right side into (radius/2)-sized xy
    buckets (sorted by bucket key once); for every left row expand the 5x5
    bucket ring into candidate pairs with searchsorted segment arithmetic
    (NO per-bucket Python loop), after pruning ring cells whose minimum
    distance to the query point already exceeds the radius; compute
    distances only on surviving candidates; rank per left row by
    (distance, right id). Cost is O(n_l * ball_density + rank) — linear in
    the true candidate volume, independent of tile size, so the tile level
    only tunes parallelism.

    Bucket granularity: radius-sized buckets with a 3x3 ring cover
    (3r)^2/(pi r^2) = 2.86x the search disk; half-radius buckets with a
    pruned 5x5 ring cover ~1.8x (measured: 0.607x the candidate volume and
    0.70x the kernel time — 55.7 -> 39.2 ms — on a harness-density tile,
    identical output vs brute force in k=1/k=9/k=None modes) — a win since
    per-ring-cell bookkeeping (two searchsorted per cell) is negligible
    against the avoided distance evaluations.

    Returns (left_idx, right_idx, dist, rank) with rank starting at 1;
    k=None keeps every within-radius pair (the radius-join mode) and
    reports rank 0 for every pair (no ranking is computed — the radius-join
    callers discard it).
    """
    n_l, n_r = len(lpts), len(rpts)
    if (unordered_pairs or exclude_same_group is not None) and k is not None:
        raise ValueError(
            "grid_topk: unordered_pairs/exclude_same_group require k=None"
        )
    if n_l == 0 or n_r == 0:
        return _EMPTY
    r2 = radius * radius
    # bucket both sides on xy at radius/sub granularity
    sub = 2
    ring = 2 * sub + 1
    bs = radius / sub
    x0 = min(lpts[:, 0].min(), rpts[:, 0].min())
    y0 = min(lpts[:, 1].min(), rpts[:, 1].min())
    lbx = np.floor((lpts[:, 0] - x0) / bs).astype(np.int64)
    lby = np.floor((lpts[:, 1] - y0) / bs).astype(np.int64)
    rbx = np.floor((rpts[:, 0] - x0) / bs).astype(np.int64)
    rby = np.floor((rpts[:, 1] - y0) / bs).astype(np.int64)
    m = max(lby.max(initial=0), rby.max(initial=0)) + ring + 1
    rkey = rbx * m + rby
    rorder = np.lexsort((rids, rkey))  # deterministic within-bucket order
    rkey_s = rkey[rorder]

    li_parts: list[np.ndarray] = []
    ri_parts: list[np.ndarray] = []
    d_parts: list[np.ndarray] = []
    rk_parts: list[np.ndarray] = []

    # chunk left rows so the expanded candidate set stays bounded
    est_per_left = max(
        1.0, ring * ring * 0.66 * n_r / max(len(np.unique(rkey_s)), 1)
    )
    lchunk = max(1, int(pair_chunk / est_per_left))
    for s in range(0, n_l, lchunk):
        lsl = slice(s, min(s + lchunk, n_l))
        nlc = lsl.stop - lsl.start
        # in-bucket offsets drive the per-cell min-distance prune
        fx = lpts[lsl, 0] - x0 - lbx[lsl] * bs
        fy = lpts[lsl, 1] - y0 - lby[lsl] * bs
        seg_starts = np.empty((nlc, ring * ring), dtype=np.int64)
        seg_ends = np.empty((nlc, ring * ring), dtype=np.int64)
        oi = 0
        for dx in range(-sub, sub + 1):
            # min x-gap from the query point to the cell dx columns away
            if dx > 0:
                gx = dx * bs - fx
            elif dx < 0:
                gx = fx + (-dx - 1) * bs
            else:
                gx = 0.0
            for dy in range(-sub, sub + 1):
                if dy > 0:
                    gy = dy * bs - fy
                elif dy < 0:
                    gy = fy + (-dy - 1) * bs
                else:
                    gy = 0.0
                key = (lbx[lsl] + dx) * m + (lby[lsl] + dy)
                st = np.searchsorted(rkey_s, key, side="left")
                en = np.searchsorted(rkey_s, key, side="right")
                if dx != 0 or dy != 0:
                    reach = gx * gx + gy * gy <= r2
                    en = np.where(reach, en, st)  # prune: empty segment
                seg_starts[:, oi] = st
                seg_ends[:, oi] = en
                oi += 1
        lens = (seg_ends - seg_starts).ravel()  # (nlc*ring^2,)
        total = int(lens.sum())
        if total == 0:
            continue
        # expand segments -> candidate index arrays, fully vectorized
        li_rep = np.repeat(np.repeat(np.arange(lsl.start, lsl.stop), ring * ring), lens)
        starts_rep = np.repeat(seg_starts.ravel(), lens)
        offs = np.arange(total) - np.repeat(np.cumsum(lens) - lens, lens)
        ri_sorted_idx = starts_rep + offs
        ri_glob = rorder[ri_sorted_idx]
        if unordered_pairs or exclude_same_group is not None:
            if unordered_pairs:
                keep = ri_glob > li_rep + l_offset if l_offset else ri_glob > li_rep
                if exclude_same_group is not None:
                    lg, rg = exclude_same_group
                    keep &= lg[li_rep] != rg[ri_glob]
            else:
                lg, rg = exclude_same_group
                keep = lg[li_rep] != rg[ri_glob]
            li_rep = li_rep[keep]
            ri_glob = ri_glob[keep]
            if len(li_rep) == 0:
                continue
        diff = lpts[li_rep] - rpts[ri_glob]
        d2 = np.einsum("ij,ij->i", diff, diff)
        within = d2 <= r2
        if not within.any():
            continue
        li_w = li_rep[within]
        ri_w = ri_glob[within]
        d2_w = d2[within]
        # candidates are generated grouped by left row (li_rep repeats each
        # left across its 9 segments consecutively; the within-filter keeps
        # that order), so per-left segment boundaries come from one diff
        if k is None:
            # radius-join mode: every within-radius pair, no ranking — the
            # callers (radius_join, IDW neighborhoods) ignore rank, so the
            # lexsort the generic path pays is pure waste here
            li_parts.append(li_w)
            ri_parts.append(ri_w)
            d_parts.append(np.sqrt(d2_w))
            rk_parts.append(np.zeros(len(li_w), dtype=np.int64))
        elif k == 1:
            # nearest-neighbor mode (the flagship dZ join + ICP loop):
            # segmented argmin by (d2, rid) via three minimum.reduceat
            # passes — sequential streaming, no O(p log p) random-access
            # lexsort; bit-identical selection (exact d2 equality ties
            # break by ascending rid, as in the sort path)
            newgrp = np.empty(len(li_w), dtype=bool)
            newgrp[0] = True
            newgrp[1:] = li_w[1:] != li_w[:-1]
            starts = np.flatnonzero(newgrp)
            lens = np.diff(starts, append=len(li_w))
            dmin = np.minimum.reduceat(d2_w, starts)
            is_min = d2_w == np.repeat(dmin, lens)
            r_ids = rids[ri_w]
            big = np.iinfo(np.int64).max
            rmin = np.minimum.reduceat(np.where(is_min, r_ids, big), starts)
            sel = np.where(
                is_min & (r_ids == np.repeat(rmin, lens)),
                np.arange(len(li_w)),
                len(li_w),
            )
            pick = np.minimum.reduceat(sel, starts)
            li_parts.append(li_w[pick])
            ri_parts.append(ri_w[pick])
            d_parts.append(np.sqrt(d2_w[pick]))
            rk_parts.append(np.ones(len(pick), dtype=np.int64))
        else:
            ord_ = np.lexsort((rids[ri_w], d2_w, li_w))
            li_o = li_w[ord_]
            # rank within each left group (groups are contiguous after sort)
            newgrp = np.empty(len(li_o), dtype=bool)
            newgrp[0] = True
            newgrp[1:] = li_o[1:] != li_o[:-1]
            grp_start = np.maximum.accumulate(np.where(newgrp, np.arange(len(li_o)), 0))
            rank = np.arange(len(li_o)) - grp_start + 1
            keep = rank <= k
            li_parts.append(li_o[keep])
            ri_parts.append(ri_w[ord_][keep])
            d_parts.append(np.sqrt(d2_w[ord_][keep]))
            rk_parts.append(rank[keep])
    if not li_parts:
        return _EMPTY
    return (
        np.concatenate(li_parts),
        np.concatenate(ri_parts),
        np.concatenate(d_parts),
        np.concatenate(rk_parts),
    )


def _topk_kernel_builder(
    k: int,
    radius: float,
    dims: tuple[str, ...],
    lid: str,
    rid: str,
    l_carry: list[str],
    r_carry: list[str],
    emit_unmatched: bool = False,
):
    """Build the per-tile cogroup kernel around grid_topk.

    ``emit_unmatched=True`` additionally emits one row per left point that
    found NO neighbor inside the radius, marked ``nn_rank = 0`` with
    sentinel neighbor fields (n_<rid> = -1, nn_dist/r_* = NaN) — the
    escalation loop (knn_join_complete) reads its residual straight off
    these rows instead of running a separate anti-join per round. Each left
    row lives in exactly one home tile, so no duplicates arise."""

    def kernel(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        out_cols = (
            [lid, "n_" + rid, "nn_dist", "nn_rank"]
            + ["l_" + c for c in l_carry]
            + ["r_" + c for c in r_carry]
        )
        if len(left) == 0 or len(right) == 0:
            if emit_unmatched and len(left):
                data = {
                    lid: left[lid].to_numpy(),
                    "n_" + rid: np.full(len(left), -1, dtype=np.int64),
                    "nn_dist": np.full(len(left), np.nan),
                    "nn_rank": np.zeros(len(left), dtype=np.int32),
                }
                for c in l_carry:
                    data["l_" + c] = left[c].to_numpy()
                for c in r_carry:
                    data["r_" + c] = np.full(len(left), np.nan)
                return pd.DataFrame(data)
            return pd.DataFrame({c: [] for c in out_cols})
        lpts = np.column_stack([left[d].to_numpy(np.float64) for d in dims])
        rpts = np.column_stack([right[d].to_numpy(np.float64) for d in dims])
        rids = right[rid].to_numpy()
        li, ri, dist, rank = grid_topk(lpts, rpts, rids, radius, k)
        data = {
            lid: left[lid].to_numpy()[li],
            "n_" + rid: rids[ri],
            "nn_dist": dist,
            "nn_rank": rank.astype(np.int32),
        }
        for c in l_carry:
            data["l_" + c] = left[c].to_numpy()[li]
        for c in r_carry:
            data["r_" + c] = right[c].to_numpy()[ri]
        if emit_unmatched:
            un = np.ones(len(left), dtype=bool)
            un[li] = False
            if un.any():
                extra = {
                    lid: left[lid].to_numpy()[un],
                    "n_" + rid: np.full(int(un.sum()), -1, dtype=np.int64),
                    "nn_dist": np.full(int(un.sum()), np.nan),
                    "nn_rank": np.zeros(int(un.sum()), dtype=np.int32),
                }
                for c in l_carry:
                    extra["l_" + c] = left[c].to_numpy()[un]
                for c in r_carry:
                    extra["r_" + c] = np.full(int(un.sum()), np.nan)
                return pd.concat(
                    [pd.DataFrame(data), pd.DataFrame(extra)], ignore_index=True
                )
        return pd.DataFrame(data)

    return kernel


def tile_right(
    right: DataFrame,
    extent: Extent,
    radius: float,
    level: int,
    dims: tuple[str, ...] = ("x", "y", "z"),
    rid: str = "pid",
    r_carry: tuple[str, ...] = (),
    ring: int = 1,
) -> DataFrame:
    """Pre-tile the data side of :func:`knn_join` — with_cell + halo
    explosion + the ``_r_`` column aliasing — for reuse across REPEATED
    joins against the same fixed frame (the ICP loop joins the moving cloud
    against one fixed cloud up to 100 times; re-tiling + re-shuffling the
    fixed side per iteration was the dominant per-iteration cost).

    The caller should ``.repartition('cell_id').persist()`` the result: the
    cached hash partitioning satisfies the cogroup's clustered-distribution
    requirement, so each subsequent ``knn_join(..., right_tiled=...)``
    exchanges ONLY the left side (asserted in tests/test_plans.py)."""
    rc = cells.with_cell(right, "x", "y", extent, level)
    rh = cells.explode_halo(
        rc, level, ring=ring, out="halo_cell", extent=extent, radius=radius
    ).drop("_ix", "_iy", "cell_id")
    r_cols = [rid, *dims, *[c for c in r_carry if c not in dims and c != rid]]
    return rh.select(
        F.col("halo_cell").alias("cell_id"),
        *[F.col(c).alias(f"_r_{c}") for c in dict.fromkeys(r_cols)],
    )


def knn_join(
    left: DataFrame,
    right: DataFrame | None,
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
    n_left: int | None = None,
    right_tiled: DataFrame | None = None,
    post: "Callable[[pd.DataFrame], pd.DataFrame] | None" = None,
    post_schema: str | None = None,
    emit_unmatched: bool = False,
) -> DataFrame:
    """Radius-bounded k-nearest-neighbor join (left row -> up to k nearest
    right rows within ``radius`` in ``dims``-space; xy drives tiling).

    Output columns: lid, n_<rid>, nn_dist, nn_rank, l_<carry...>, r_<carry...>.

    ``level=None`` sizes tiles from the left-side row count, which costs a
    count() job — loop callers should pass ``level`` (the ICP loop does) or
    the ``n_left`` hint when the count is already known.

    ``right_tiled``: a pre-tiled data side from :func:`tile_right` (built at
    the SAME level/radius/ring); ``right`` is then ignored. Loop callers
    cache it once so only the left side shuffles per join.

    ``post``: a per-tile reducer applied to the kNN kernel's output pandas
    frame INSIDE the cogroup (output schema ``post_schema``). Iterative
    solvers (the ICP loop) fuse their partial-sums kernel here, so one
    Python stage per iteration both matches correspondences and reduces
    them to a constant-size partial row — no full correspondence frame ever
    crosses a stage boundary.
    """
    if level is None:
        par = left.sparkSession.sparkContext.defaultParallelism
        if n_left is None:
            n_left = left.count()
        level = auto_level(extent, radius / max(ring, 1), n_left, parallelism=par)
    lc = cells.with_cell(left, "x", "y", extent, level).drop("_ix", "_iy")
    if right_tiled is not None:
        rsel = right_tiled
        rf = {
            f.name[3:]: f.dataType.simpleString()
            for f in right_tiled.schema.fields
            if f.name.startswith("_r_")
        }
    else:
        rc = cells.with_cell(right, "x", "y", extent, level)
        rh = cells.explode_halo(
            rc, level, ring=ring, out="halo_cell", extent=extent, radius=radius
        ).drop("_ix", "_iy", "cell_id")
        r_cols = [rid, *dims, *[c for c in r_carry if c not in dims and c != rid]]
        # Alias right-side columns to fresh names: a self-join (left is
        # right, or shares lineage) otherwise resolves both cogroup children
        # to the SAME attribute ids and Catalyst prunes the right side down
        # to the key.
        rsel = rh.select(
            F.col("halo_cell").alias("cell_id"),
            *[F.col(c).alias(f"_r_{c}") for c in dict.fromkeys(r_cols)],
        )
        rf = {f.name: f.dataType.simpleString() for f in right.schema.fields}

    l_cols = [lid, *dims, *[c for c in l_carry if c not in dims and c != lid]]
    lsel = lc.select("cell_id", *dict.fromkeys(l_cols))

    kernel = _topk_kernel_builder(
        k, radius, dims, lid, rid, list(l_carry), list(r_carry),
        emit_unmatched=emit_unmatched,
    )

    def run(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        r = r.rename(columns={c: c[3:] for c in r.columns if c.startswith("_r_")})
        out = kernel(l, r)
        return post(out) if post is not None else out

    # Build the output schema explicitly from the input schemas.
    lf = {f.name: f.dataType.simpleString() for f in left.schema.fields}
    parts = [f"{lid} {lf[lid]}", f"n_{rid} {rf[rid]}", "nn_dist double", "nn_rank int"]
    parts += [f"l_{c} {lf[c]}" for c in l_carry]
    parts += [f"r_{c} {rf[c]}" for c in r_carry]
    out_schema = post_schema if post is not None else ", ".join(parts)

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
    cross_tile_only: bool = False,
    unordered_ids: bool = False,
) -> DataFrame:
    """ALL pairs within ``radius`` (not top-k) — the distance-join used for
    clustering edges (J8) and IDW neighborhoods. Same tile+halo plan as
    knn_join; kernel emits every within-radius pair exactly once (each right
    row lands in a given halo cell once, each left row has one home cell).

    cross_tile_only=True keeps only pairs whose endpoints live in DIFFERENT
    tiles — the connected-components edge mode: intra-tile connectivity is
    already resolved by the in-tile kernel, so emitting intra-tile pairs
    again would make a dense m-point blob cost m² edge rows at the shuffle.

    unordered_ids=True (for self-joins whose consumer symmetrizes, i.e. the
    CC edge phase) keeps only pairs with lid < rid, masked in the kernel
    before the Arrow boundary: a cross-tile pair is produced in BOTH
    orientations (once per endpoint's home tile), and same-id pairs carry no
    connectivity, so this halves the rows crossing the shuffle (and drops
    the dense same-label border traffic) without changing the edge set the
    downstream distinct() + symmetrization sees.
    """
    if level is None:
        par = left.sparkSession.sparkContext.defaultParallelism
        level = auto_level(extent, radius / max(ring, 1), left.count(), parallelism=par)
    lc = cells.with_cell(left, "x", "y", extent, level).drop("_ix", "_iy")
    rc = cells.with_cell(right, "x", "y", extent, level)
    rh = cells.explode_halo(
        rc, level, ring=ring, out="halo_cell", extent=extent, radius=radius
    ).drop("_ix", "_iy")
    lsel = lc.select("cell_id", lid, *dims)
    home = [F.col("cell_id").alias("_r_home")] if cross_tile_only else []
    rsel = rh.select(
        F.col("halo_cell").alias("cell_id"),
        *home,
        *[F.col(c).alias(f"_r_{c}") for c in dict.fromkeys([rid, *dims])],
    )

    def kernel(key, lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if cross_tile_only and len(rpdf):
            rpdf = rpdf[rpdf["_r_home"].to_numpy() != key[0]]
        rpdf = rpdf.rename(columns={c: c[3:] for c in rpdf.columns if c.startswith("_r_")})
        if len(lpdf) == 0 or len(rpdf) == 0:
            return pd.DataFrame({lid: [], "n_" + rid: [], "nn_dist": []})
        lp = np.column_stack([lpdf[d].to_numpy(np.float64) for d in dims])
        rp = np.column_stack([rpdf[d].to_numpy(np.float64) for d in dims])
        lids_ = lpdf[lid].to_numpy()
        rids_ = rpdf[rid].to_numpy()
        excl = (lids_, rids_) if unordered_ids else None
        li, ri, dist, _rank = grid_topk(
            lp, rp, rids_, radius, k=None, exclude_same_group=excl
        )
        if unordered_ids:
            keep = lids_[li] < rids_[ri]
            li, ri, dist = li[keep], ri[keep], dist[keep]
        return pd.DataFrame({lid: lids_[li], "n_" + rid: rids_[ri], "nn_dist": dist})

    lf = {f.name: f.dataType.simpleString() for f in left.schema.fields}
    rf = {f.name: f.dataType.simpleString() for f in right.schema.fields}
    out_schema = f"{lid} {lf[lid]}, n_{rid} {rf[rid]}, nn_dist double"
    return (
        lsel.groupBy("cell_id")
        .cogroup(rsel.groupBy("cell_id"))
        .applyInPandas(kernel, schema=out_schema)
    )


def knn_join_complete(
    left: DataFrame,
    right: DataFrame,
    extent: Extent,
    radius: float,
    max_rounds: int = 8,
    escalate: float = 4.0,
    adaptive_factor: float | None = 3.0,
    **kw,
) -> DataFrame:
    """Unbounded nearest-neighbor (k=1) join: radius-bounded rounds with
    escalating radius over the unmatched residual — distributed stand-in for
    the reference's unbounded KDTree.query (icp.py:235-241). Each round the
    residual shrinks (typically exponentially), so total cost ~ one bounded
    join plus noise.

    ``radius`` is the FIRST round's search radius — a pure performance knob
    (escalation makes the result radius-unbounded). Small starting radii win
    twice: the halo duplication is narrow AND the radius rule admits a fine
    tile level (high kernel parallelism); late rounds run on tiny residuals
    where a wide halo is cheap.

    Round plumbing (optimization round r6): each round runs the kNN cogroup
    with ``emit_unmatched=True`` and ONE localCheckpoint — matched rows and
    the next round's residual are both filters over that checkpointed frame
    (nn_rank 1 vs 0), so the per-round anti-join + second checkpoint of the
    old formulation is gone, as is the left-side pre-checkpoint (each
    residual generation is consumed exactly once). Only the right side is
    checkpointed (it feeds every round's halo explode). Measured at sf0.1:
    21 driver jobs -> 8, knn_dz 2.9 s -> ~1.7 s, identical rows.
    """
    lid = kw.get("lid", "pid")
    dims = kw.get("dims", ("x", "y", "z"))
    l_carry = tuple(kw.get("l_carry", ()))
    r_carry = tuple(kw.get("r_carry", ()))
    # the residual is rebuilt from l_<col> outputs: carry the join dims too
    l_carry_full = tuple(dict.fromkeys([*dims, *l_carry]))
    kw = {**kw, "k": 1, "l_carry": l_carry_full}
    par = left.sparkSession.sparkContext.defaultParallelism
    from codem_spark.util import approx_row_count

    right = right.localCheckpoint(eager=True)
    n_right = right.count()
    # Density-adaptive FIRST radius (scale-holding, guide §2.3): the
    # caller's radius is a constant, but the right cloud's density is not —
    # at 10x the bench rows the same 2.5 km start meant ~300 candidate
    # pairs per query point (measured 36 s at 6M rows). Shrink round 1 to
    # ``adaptive_factor`` x the mean point spacing (never grow past the
    # caller's radius): for near-uniform data P(no neighbor) ~ e^(-pi f^2)
    # is negligible at f = 3, and any stragglers are exactly what the
    # escalation rounds are for — the RESULT is radius-unbounded either
    # way, only the work changes.
    if adaptive_factor and n_right > 0:
        area = max((extent[2] - extent[0]) * (extent[3] - extent[1]), 1e-12)
        spacing = math.sqrt(area / n_right)
        radius = min(radius, max(adaptive_factor * spacing, 1e-9))
    residual = left
    n_res = approx_row_count(left)  # parallelism knob only — no count job
    rounds: list[DataFrame] = []
    r = radius
    for _ in range(max_rounds):
        # halo-covers-radius invariant: even a caller-pinned level must
        # coarsen as the radius escalates (cell edge >= radius/ring)
        lr = level_for_radius(extent, r / max(kw.get("ring", 1), 1))
        level = min(
            kw.get("level")
            or auto_level(extent, r / max(kw.get("ring", 1), 1), n_res, parallelism=par),
            lr,
        )
        out = knn_join(
            residual, right, extent, r,
            **{**kw, "level": level, "emit_unmatched": True},
        ).localCheckpoint(eager=True)
        rounds.append(out.filter(F.col("nn_rank") == 1))
        n_res = out.filter(F.col("nn_rank") == 0).count()
        if n_res == 0 or n_right == 0:
            break
        residual = out.filter(F.col("nn_rank") == 0).select(
            lid, *[F.col(f"l_{c}").alias(c) for c in l_carry_full]
        )
        r *= escalate
    result = rounds[0]
    for m in rounds[1:]:
        result = result.unionByName(m)
    # restore the caller's contract columns (drop the internal dim carries)
    keep = (
        [lid, f"n_{kw.get('rid', 'pid')}", "nn_dist", "nn_rank"]
        + [f"l_{c}" for c in l_carry]
        + [f"r_{c}" for c in r_carry]
    )
    return result.select(*keep)
