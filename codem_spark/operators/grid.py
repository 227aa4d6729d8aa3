"""Grid aggregation family — the engine's "GROUP BY" operators (SURVEY.md §2.3).

Every operator here is a stock-Catalyst DataFrame plan: hash aggregation with
map-side partial combine, pushed-down scans, no Python in the loop. At 100 TB
these are single-shuffle jobs keyed by cell id; the DSM build is the
row-reducing first stage the reference also leans on ("higher density data is
resampled to match the lower", reference docs/details.md:12, early
downsample main.py:595-612).

Reference analogs:
  G1 rasterize-max   — PDAL writers.gdal output_type=max, preprocess.py:667-675
  G2 hexbin density  — filters.hexbin, preprocess.py:681-727
  G3 rasterize-IDW   — apply.py:185-204, vcd/preprocessing/preprocess.py:313-320
  G4 void infill     — GeoData._infill, preprocess.py:236-259
  G5 quantize        — percentile clip + uint8, preprocess.py:278-283
  G6 cluster sizes   — groupby.transform('count'), vcd/preprocessing/preprocess.py:253-256
  G9 bounds          — bbox aggregation, preprocess.py:858-933
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from codem_spark.functions import cells

Extent = tuple[float, float, float, float]


def grid_max(
    df: DataFrame,
    extent: Extent,
    resolution: float,
    x: str = "x",
    y: str = "y",
    z: str = "z",
) -> DataFrame:
    """G1: points -> DSM grid of max elevation at ``resolution`` (meters).

    Output: (gx, gy, z) long-format raster — gx/gy are global pixel indices.
    One shuffle (hash agg on ~rows/density keys), map-side combine makes the
    shuffle payload one row per touched cell per input partition.
    """
    gx = F.floor((F.col(x) - F.lit(extent[0])) / F.lit(resolution)).cast("long")
    gy = F.floor((F.col(y) - F.lit(extent[1])) / F.lit(resolution)).cast("long")
    return (
        df.select(gx.alias("gx"), gy.alias("gy"), F.col(z).alias("z"))
        .groupBy("gx", "gy")
        .agg(F.max("z").alias("z"))
    )


def grid_max_sql(points_sql: str, extent: Extent, resolution: float) -> str:
    """DuckDB oracle twin of grid_max."""
    return f"""
    SELECT cast(floor((x - {extent[0]!r}) / {resolution!r}) as bigint) AS gx,
           cast(floor((y - {extent[1]!r}) / {resolution!r}) as bigint) AS gy,
           max(z) AS z
    FROM ({points_sql})
    GROUP BY 1, 2
    """


def grid_idw(
    points: DataFrame,
    extent: Extent,
    resolution: float,
    radius_cells: int = 1,
    power: float = 2.0,
    x: str = "x",
    y: str = "y",
    z: str = "z",
) -> DataFrame:
    """G3: inverse-distance-weighted rasterization.

    Each point contributes to every cell whose *center* lies within the
    (2r+1)x(2r+1) neighborhood of the point's own cell — the halo-exchange
    pattern: explode points into neighbor cells (bounded shuffle fan-out =
    (2r+1)^2), then one hash agg of sum(w*z)/sum(w), w = 1/d^power with the
    reference's convention that a point inside the cell at d<eps contributes
    with weight capped at 1/eps^p.
    """
    eps = 1e-9
    offs = [
        (dx, dy)
        for dx in range(-radius_cells, radius_cells + 1)
        for dy in range(-radius_cells, radius_cells + 1)
    ]
    px = F.col(x)
    py = F.col(y)
    gx0 = F.floor((px - F.lit(extent[0])) / F.lit(resolution)).cast("long")
    gy0 = F.floor((py - F.lit(extent[1])) / F.lit(resolution)).cast("long")
    base = points.select(
        px.alias("px"), py.alias("py"), F.col(z).alias("pz"), gx0.alias("gx0"), gy0.alias("gy0")
    )
    off = F.explode(
        F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy")) for dx, dy in offs])
    )
    e = base.withColumn("_o", off)
    gx = (F.col("gx0") + F.col("_o.dx")).alias("gx")
    gy = (F.col("gy0") + F.col("_o.dy")).alias("gy")
    cxc = (F.col("gx0") + F.col("_o.dx") + F.lit(0.5)) * F.lit(resolution) + F.lit(extent[0])
    cyc = (F.col("gy0") + F.col("_o.dy") + F.lit(0.5)) * F.lit(resolution) + F.lit(extent[1])
    d2 = (F.col("px") - cxc) * (F.col("px") - cxc) + (F.col("py") - cyc) * (F.col("py") - cyc)
    w = F.lit(1.0) / F.pow(F.sqrt(d2) + F.lit(eps), F.lit(power))
    return (
        e.select(gx, gy, (w * F.col("pz")).alias("wz"), w.alias("w"))
        .groupBy("gx", "gy")
        .agg((F.sum("wz") / F.sum("w")).alias("z"))
    )


def grid_idw_sql(
    points_sql: str, extent: Extent, resolution: float, radius_cells: int = 1, power: float = 2.0
) -> str:
    offs = [
        (dx, dy)
        for dx in range(-radius_cells, radius_cells + 1)
        for dy in range(-radius_cells, radius_cells + 1)
    ]
    vals = ", ".join(f"({dx}, {dy})" for dx, dy in offs)
    return f"""
    WITH pts AS ({points_sql}),
    base AS (
      SELECT x AS px, y AS py, z AS pz,
             cast(floor((x - {extent[0]!r}) / {resolution!r}) as bigint) AS gx0,
             cast(floor((y - {extent[1]!r}) / {resolution!r}) as bigint) AS gy0
      FROM pts
    ),
    ex AS (
      SELECT base.*, o.dx, o.dy FROM base, (VALUES {vals}) AS o(dx, dy)
    ),
    wgt AS (
      SELECT gx0 + dx AS gx, gy0 + dy AS gy, pz,
             1.0 / pow(sqrt(pow(px - ((gx0 + dx + 0.5) * {resolution!r} + {extent[0]!r}), 2)
                          + pow(py - ((gy0 + dy + 0.5) * {resolution!r} + {extent[1]!r}), 2)) + 1e-9,
                       {power!r}) AS w
      FROM ex
    )
    SELECT gx, gy, sum(w * pz) / sum(w) AS z FROM wgt GROUP BY gx, gy
    """


def cell_pyramid(
    df: DataFrame,
    extent: Extent,
    level: int,
    coarsest: int,
    x: str = "x",
    y: str = "y",
    z: str = "z",
    num_partitions: int | None = None,
    persist_shuffled: bool = False,
) -> DataFrame:
    """Multi-resolution cell aggregation — the DSM pyramid (G1 at every
    level of the cell hierarchy, reference 'resampled to match the lower'
    docs/details.md:12 generalized to raster overviews).

    ONE shuffle for the whole pyramid: rows are hash-partitioned by their
    COARSEST-level ancestor cell (``_ck``), and because Morton parent = 2-bit
    shift, every level from ``level`` down to ``coarsest`` nests inside that
    ancestor — HashPartitioning(_ck) satisfies ClusteredDistribution([_ck,
    cell]), so Catalyst plans the finest aggregation AND every rollup with
    zero further Exchanges (asserted in tests). This is the Iceberg
    cell-bucketed table layout reused across the pyramid: at 100 TB the
    repartition is the table's native clustering, i.e. free.

    The returned frame unions one branch per level, each reading the same
    shuffled input; AQE exchange-reuse dedupes the shuffle at runtime, and
    ``persist_shuffled=True`` makes the sharing explicit by caching the
    post-shuffle cells (measured best: interleaved A/B on 7.3M pts, pinned
    cores — r3's 4 independent grid aggs 26.0 s -> 7.6 s (1 -> 4 cores,
    3.41x); this operator with persist 20.3 s -> 5.26 s (3.86x)). The
    caller owns the cache lifecycle: unpersist via the frame attached as
    ``result._codem_persisted`` when done.

    Returns (level, cell, z_max, n) long-format pyramid.
    """
    if not (0 <= coarsest <= level):
        raise ValueError(f"need 0 <= coarsest ({coarsest}) <= level ({level})")
    shift = 2 * (level - coarsest)
    c = cells.cell_encode_col(F.col(x), F.col(y), extent, level)
    pre = df.select(
        F.shiftright(c, shift).alias("_ck"), c.alias("cell"), F.col(z).alias("z")
    )
    pre = (
        pre.repartition(num_partitions, "_ck") if num_partitions else pre.repartition("_ck")
    )
    if persist_shuffled:
        pre = pre.persist()
    cur = pre.groupBy("_ck", "cell").agg(
        F.max("z").alias("z_max"), F.count("*").alias("n")
    )
    out = cur.withColumn("level", F.lit(level))
    for lv in range(level - 1, coarsest - 1, -1):
        cur = cur.groupBy("_ck", F.shiftright("cell", 2).alias("cell")).agg(
            F.max("z_max").alias("z_max"), F.sum("n").alias("n")
        )
        out = out.unionByName(cur.withColumn("level", F.lit(lv)))
    result = out.select("level", "cell", "z_max", "n")
    if persist_shuffled:
        result._codem_persisted = pre  # type: ignore[attr-defined]
    return result


def cell_pyramid_sql(points_sql: str, extent: Extent, level: int, coarsest: int) -> str:
    """DuckDB oracle twin of cell_pyramid (recursive rollup unrolled)."""
    cell = cells.cell_encode_sql("x", "y", extent, level)
    parts = [
        f"l{level} AS (SELECT {cell} AS cell, max(z) AS z_max, count(*) AS n "
        f"FROM pts GROUP BY 1)"
    ]
    for lv in range(level - 1, coarsest - 1, -1):
        parts.append(
            f"l{lv} AS (SELECT cell >> 2 AS cell, max(z_max) AS z_max, "
            f"sum(n) AS n FROM l{lv + 1} GROUP BY 1)"
        )
    selects = " UNION ALL ".join(
        f"SELECT {lv} AS level, cell, z_max, CAST(n AS BIGINT) AS n FROM l{lv}"
        for lv in range(level, coarsest - 1, -1)
    )
    return f"WITH pts AS ({points_sql}), {', '.join(parts)} {selects}"


def density(df: DataFrame, extent: Extent, level: int, x: str = "x", y: str = "y") -> DataFrame:
    """G2: per-cell point count — input to the average-spacing estimate."""
    cell = cells.cell_encode_col(F.col(x), F.col(y), extent, level)
    return df.select(cell.alias("cell_id")).groupBy("cell_id").agg(
        F.count("*").alias("n_points")
    )


def estimate_resolution(
    df: DataFrame, extent: Extent, level: int = 10, x: str = "x", y: str = "y"
) -> float:
    """S6: average point spacing ~ sqrt(cell_area / avg points per occupied
    cell) — the reference estimates this with 25 m hexbins
    (preprocess.py:681-727); one agg job here."""
    size = cells.cell_size(extent, level)
    row = (
        density(df, extent, level, x, y)
        .agg(F.avg("n_points").alias("avg_n"))
        .collect()[0]
    )
    avg_n = row["avg_n"] or 1.0
    return math.sqrt(size * size / avg_n)


def bounds(df: DataFrame, x: str = "x", y: str = "y") -> tuple[float, float, float, float]:
    """G9: dataset bbox (one agg job; drives clip windows / partition
    pruning like reference clip_data preprocess.py:858-933)."""
    r = df.agg(
        F.min(x).alias("x0"), F.min(y).alias("y0"), F.max(x).alias("x1"), F.max(y).alias("y1")
    ).collect()[0]
    return (r["x0"], r["y0"], r["x1"], r["y1"])


def bbox_overlap(
    a: tuple[float, float, float, float],
    b: tuple[float, float, float, float],
    factor: float = 1.5,
) -> tuple[float, float, float, float]:
    """J6: overlap of two bboxes grown by ``factor`` about their centers
    (reference computes a 1.5x-oversized clip window,
    compute_clipped_bounds preprocess.py:936-968); raises if disjoint
    (preprocess.py:915-916 errors on non-overlapping data)."""

    def grow(bb):
        cx, cy = (bb[0] + bb[2]) / 2, (bb[1] + bb[3]) / 2
        hw, hh = (bb[2] - bb[0]) / 2 * factor, (bb[3] - bb[1]) / 2 * factor
        return (cx - hw, cy - hh, cx + hw, cy + hh)

    ga, gb = grow(a), grow(b)
    x0, y0 = max(ga[0], gb[0]), max(ga[1], gb[1])
    x1, y1 = min(ga[2], gb[2]), min(ga[3], gb[3])
    if x0 >= x1 or y0 >= y1:
        raise ValueError("Foundation and AOI bounding boxes do not overlap.")
    return (x0, y0, x1, y1)


def clip_bbox(df: DataFrame, bbox: tuple[float, float, float, float], x: str = "x", y: str = "y") -> DataFrame:
    """Clip to bbox — a pushed-down predicate; on a cell-partitioned table
    this prunes partitions before the scan."""
    return df.filter(
        (F.col(x) >= bbox[0]) & (F.col(x) < bbox[2]) & (F.col(y) >= bbox[1]) & (F.col(y) < bbox[3])
    )


def exact_percentiles(
    df: DataFrame,
    col: str,
    probs: "list[float]",
    bins: int = 8192,
    collect_cap: int = 262_144,
    max_rounds: int = 8,
) -> "list[float]":
    """Exact percentiles (Spark ``percentile()`` / DuckDB ``quantile_cont``
    semantics, bit-for-bit) via distributed histogram refinement.

    Spark's built-in exact ``percentile`` aggregate buffers EVERY distinct
    value in a per-partition OpenHashMap and sorts the merged multiset on
    one reducer — measured 1.8-4.5 s alone on a 600k-row column at sf0.1
    (the whole quantize query's dominant cost), and at 10^12 rows the
    single-reducer sort is a scale wall. This routine keeps exactness with
    map-side-combinable work only (guide §2.3 "aggregate before you
    shuffle"):

    1. one agg: count / min / max;
    2. per round: an integer histogram over the active range (groupBy of a
       bounded bucket id — tiny shuffle), locating the bucket holding each
       needed order statistic;
    3. when the values containing the needed order stats number
       <= ``collect_cap``, collect just those and take the order stats
       exactly; otherwise narrow the range and repeat (value-skewed data
       terminates via the degenerate-range shortcut).

    Interpolation mirrors Percentile.scala exactly
    (``position = p*(n-1)``; ``lowerValue*(higher-position) +
    higherValue*(position-lower)``) so results are interchangeable with the
    built-in aggregate — asserted in tests/test_grid.py.

    The input is persisted for the duration (2-3 passes over one projected
    column; MEMORY_AND_DISK, released before returning). Callers that
    already persist ``df`` pay nothing extra.
    """
    vals = df.select(F.col(col).cast("double").alias("_v")).filter(
        F.col("_v").isNotNull()
    )
    vals = vals.persist()
    try:
        r = vals.agg(
            F.count("_v").alias("n"), F.min("_v").alias("lo"), F.max("_v").alias("hi")
        ).collect()[0]
        n = int(r["n"])
        if n == 0:
            return [float("nan")] * len(probs)
        glo, ghi = float(r["lo"]), float(r["hi"])
        positions = [p * (n - 1) for p in probs]
        needed = sorted(
            {int(math.floor(pos)) for pos in positions}
            | {int(math.ceil(pos)) for pos in positions}
        )
        import numpy as np

        stats: dict[int, float] = {}

        def _collect_ranges(terminal) -> None:
            # ONE collect job for every terminal range of this round
            pred = None
            for lo, hi, _base, _cnt, _idxs in terminal:
                p_ = (F.col("_v") >= lo) & (F.col("_v") <= hi)
                pred = p_ if pred is None else (pred | p_)
            arr = np.sort(
                np.array(
                    [row["_v"] for row in vals.filter(pred).collect()],
                    dtype=np.float64,
                )
            )
            for lo, hi, base, _cnt, idxs in terminal:
                seg = arr[(arr >= lo) & (arr <= hi)]
                for i in idxs:
                    stats[i] = float(seg[i - base])

        # active ranges: (value_lo, value_hi, rank_of_first_value_in_range,
        # count_in_range, indices needing resolution inside)
        ranges = [(glo, ghi, 0, n, needed)]
        for round_no in range(max_rounds + 1):
            if not ranges:
                break
            terminal, refine = [], []
            for rng_ in ranges:
                lo, hi, base, cnt, idxs = rng_
                if lo == hi:
                    for i in idxs:
                        stats[i] = lo
                elif cnt <= collect_cap or round_no == max_rounds:
                    terminal.append(rng_)
                else:
                    refine.append(rng_)
            if terminal:
                _collect_ranges(terminal)
            nxt = []
            for lo, hi, base, cnt, idxs in refine:
                width = hi - lo
                b = F.least(
                    F.lit(bins - 1),
                    F.floor(
                        (F.col("_v") - F.lit(lo)) / F.lit(width) * F.lit(bins)
                    ).cast("int"),
                )
                hist = (
                    vals.filter((F.col("_v") >= lo) & (F.col("_v") <= hi))
                    .groupBy(b.alias("_b"))
                    .agg(
                        F.count("*").alias("_c"),
                        F.min("_v").alias("_lo"),
                        F.max("_v").alias("_hi"),
                    )
                    .collect()
                )
                hist.sort(key=lambda row: row["_b"])
                cum = base
                bucket_meta = {}
                for row in hist:
                    bucket_meta[row["_b"]] = (
                        cum, int(row["_c"]), float(row["_lo"]), float(row["_hi"]),
                    )
                    cum += int(row["_c"])
                by_bucket: dict[int, list[int]] = {}
                for i in idxs:
                    for bid, (first, c, _blo, _bhi) in bucket_meta.items():
                        if first <= i < first + c:
                            by_bucket.setdefault(bid, []).append(i)
                            break
                for bid, bidx in by_bucket.items():
                    first, c, blo, bhi = bucket_meta[bid]
                    nxt.append((blo, bhi, first, c, bidx))
            ranges = nxt
        out = []
        for pos in positions:
            lower, higher = int(math.floor(pos)), int(math.ceil(pos))
            if lower == higher:
                out.append(stats[lower])
            else:
                out.append(
                    stats[lower] * (higher - pos) + stats[higher] * (pos - lower)
                )
        return out
    finally:
        vals.unpersist(False)


def quantize_normalize(
    df: DataFrame, col: str = "z", lo_q: float = 0.01, hi_q: float = 0.99, exact: bool = False,
    bounds: "tuple[float, float] | None" = None,
) -> DataFrame:
    """G5: percentile clip -> uint8 [1, 255] (0 reserved for nodata), the
    reference's DSM normalization (preprocess.py:278-283: clip to 1st/99th
    percentile then scale). approxQuantile for the 100 TB path; exact
    percentile for oracle parity. ``bounds`` short-circuits the percentile
    job with caller-supplied (lo, hi) — callers quantizing several columns
    of one frame batch all percentiles into ONE agg (registration
    _prep_dsm) instead of one job per column."""
    if bounds is not None:
        lo, hi = float(bounds[0]), float(bounds[1])
    elif exact:
        # histogram-refined exact percentiles: identical values to the
        # built-in percentile() aggregate (asserted in tests) at a fraction
        # of its cost — see exact_percentiles
        lo, hi = exact_percentiles(df, col, [lo_q, hi_q])
    else:
        lo, hi = df.approxQuantile(col, [lo_q, hi_q], 0.001)
    rng = max(hi - lo, 1e-12)
    clipped = F.least(F.lit(hi), F.greatest(F.lit(lo), F.col(col)))
    q = (F.round((clipped - F.lit(lo)) / F.lit(rng) * F.lit(254.0)) + F.lit(1.0)).cast("int")
    return df.withColumn(f"{col}_u8", q)


def cluster_sizes(df: DataFrame, cluster_col: str = "cluster_id") -> DataFrame:
    """G6: append per-cluster count as a column — window agg, the exact
    semantics of pandas groupby.transform('count')
    (vcd/preprocessing/preprocess.py:253-256)."""
    w = Window.partitionBy(cluster_col)
    return df.withColumn("cluster_size", F.count("*").over(w))


def tile_explode(df: DataFrame, tile_px: int, halo: int, carry=("z",)) -> DataFrame:
    """Duplicate each raster cell (gx, gy) into every ``tile_px``-pixel tile
    whose ``halo``-widened window contains it: home tile always; a neighbor
    tile only when within ``halo`` pixels of the border facing it (the
    raster-space twin of functions/cells.explode_halo). Output columns:
    (htx, hty, gx, gy, *carry)."""
    tx = F.floor(F.col("gx") / F.lit(tile_px)).cast("long")
    ty = F.floor(F.col("gy") / F.lit(tile_px)).cast("long")
    fx = F.col("gx") - tx * F.lit(tile_px)  # in-tile pixel offset [0, tile_px)
    fy = F.col("gy") - ty * F.lit(tile_px)

    def near(dv: int, f):
        if dv == 0:
            return F.lit(True)
        if dv < 0:
            return f < F.lit(halo)
        return f >= F.lit(tile_px - halo)

    structs = []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            structs.append(
                F.when(
                    near(dx, fx) & near(dy, fy),
                    F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy")),
                )
            )
    off = F.explode(F.filter(F.array(*structs), lambda s: s.isNotNull()))
    return (
        df.withColumn("_tx", tx)
        .withColumn("_ty", ty)
        .withColumn("_o", off)
        .select(
            (F.col("_tx") + F.col("_o.dx")).alias("htx"),
            (F.col("_ty") + F.col("_o.dy")).alias("hty"),
            "gx", "gy", *carry,
        )
    )


def infill(
    dsm: DataFrame,
    extent: Extent,
    resolution: float,
    tile_level: int | None = None,
    max_rounds: int = 8,
    tile_px: int = 128,
) -> DataFrame:
    """G4: iterative void infill. The reference loops rasterio.fillnodata
    until no nodata pixels remain (preprocess.py:236-259): each round fills
    empty cells that have >=1 filled neighbor with the IDW of their filled
    8-neighborhood. Input/output: (gx, gy, z) with voids simply *absent*
    (sparse representation — nulls never stored).

    ONE Spark job, not a driver loop: cells are tiled into ``tile_px``-pixel
    squares with a ``max_rounds``-pixel halo (a round-k fill depends only on
    original cells within Chebyshev distance k, so a halo of max_rounds
    pixels makes every in-tile iteration exact), and a per-tile kernel runs
    the whole fill iteration on a dense local array. The previous
    formulation — a driver loop of (explode-join + anti-join + count) per
    round — cost dozens of tiny jobs and ~25 s of the coarse-registration
    stage; this is one shuffle keyed by tile. Voids wider than 2*max_rounds
    pixels stay void, exactly like the capped loop.
    """
    filled = dsm.select("gx", "gy", "z")
    b = filled.agg(
        F.min("gx").alias("x0"), F.max("gx").alias("x1"),
        F.min("gy").alias("y0"), F.max("gy").alias("y1"),
    ).collect()[0]
    if b["x0"] is None:
        return filled
    bb = (int(b["x0"]), int(b["x1"]), int(b["y0"]), int(b["y1"]))
    H = int(max_rounds)
    exploded = tile_explode(filled, tile_px, H)

    def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        htx, hty = int(key[0]), int(key[1])
        x0 = htx * tile_px - H
        y0 = hty * tile_px - H
        w = tile_px + 2 * H
        arr = np.zeros((w, w))
        have = np.zeros((w, w), dtype=bool)
        ix = (pdf["gx"].to_numpy() - x0).astype(np.int64)
        iy = (pdf["gy"].to_numpy() - y0).astype(np.int64)
        arr[ix, iy] = pdf["z"].to_numpy(np.float64)
        have[ix, iy] = True
        # cells outside the global raster bbox must never fill
        gxs = x0 + np.arange(w)
        gys = y0 + np.arange(w)
        in_bb = (
            ((gxs >= bb[0]) & (gxs <= bb[1]))[:, None]
            & ((gys >= bb[2]) & (gys <= bb[3]))[None, :]
        )
        offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1) if (dx, dy) != (0, 0)]
        for _ in range(H):
            num = np.zeros((w, w))
            den = np.zeros((w, w))
            for dx, dy in offs:
                wgt = 1.0 / float(dx * dx + dy * dy)
                src_x = slice(max(dx, 0), w + min(dx, 0))
                src_y = slice(max(dy, 0), w + min(dy, 0))
                dst_x = slice(max(-dx, 0), w + min(-dx, 0))
                dst_y = slice(max(-dy, 0), w + min(-dy, 0))
                hv = have[src_x, src_y]
                num[dst_x, dst_y] += np.where(hv, arr[src_x, src_y], 0.0) * wgt
                den[dst_x, dst_y] += hv * wgt
            newly = (~have) & (den > 0) & in_bb
            if not newly.any():
                break
            arr[newly] = num[newly] / den[newly]
            have |= newly
        core = np.zeros((w, w), dtype=bool)
        core[H : H + tile_px, H : H + tile_px] = True
        ex, ey = np.nonzero(have & core)
        return pd.DataFrame(
            {"gx": ex + x0, "gy": ey + y0, "z": arr[ex, ey]}
        )

    return exploded.groupBy("htx", "hty").applyInPandas(
        kernel, schema="gx long, gy long, z double"
    )


def resample_raster(
    dsm: DataFrame,
    extent: Extent,
    res_in: float,
    res_out: float,
    method: str = "cubic",
    tile_px: int = 128,
) -> DataFrame:
    """S2: raster -> raster resample to a new resolution with a Catmull-Rom
    bicubic kernel (a = -0.5, the GDAL/rasterio `cubic` kernel the reference
    uses to bring rasters to pipeline resolution, preprocess.py:409-441).

    Output cell centers map into input pixel space (u = (ogx+0.5)*r - 0.5,
    r = res_out/res_in); each takes a 4x4 tap neighborhood. Distributed as
    one job: input cells are exploded into every OUTPUT tile whose support
    window touches them (JVM sequence-explode, fan-out ~(1 + 4*res_in/
    res_out/tile_px)^2), then a per-tile kernel evaluates all output pixels
    vectorized. Taps are mask-normalized, so edge pixels and pixels next to
    voids renormalize over available taps (voids stay absent when NO tap
    exists). `method="bilinear"` uses the 2x2 linear kernel instead.
    """
    if method not in ("cubic", "bilinear"):
        raise ValueError(f"unknown method {method!r}")
    r = res_out / res_in
    support = 2 if method == "cubic" else 1
    # output-pixel index range influenced by input cell gx:
    # u in [gx-support, gx+support] -> ogx in [(gx-support+0.5)/? ...]
    lo_f = lambda g: (g - support + 0.5) / r - 0.5  # noqa: E731
    hi_f = lambda g: (g + support + 0.5) / r - 0.5  # noqa: E731
    tx0 = F.floor(F.ceil(lo_f(F.col("gx"))) / F.lit(tile_px)).cast("long")
    tx1 = F.floor(F.floor(hi_f(F.col("gx"))) / F.lit(tile_px)).cast("long")
    ty0 = F.floor(F.ceil(lo_f(F.col("gy"))) / F.lit(tile_px)).cast("long")
    ty1 = F.floor(F.floor(hi_f(F.col("gy"))) / F.lit(tile_px)).cast("long")
    exploded = (
        dsm.select("gx", "gy", "z", tx0.alias("_tx0"), tx1.alias("_tx1"),
                   ty0.alias("_ty0"), ty1.alias("_ty1"))
        .withColumn("htx", F.explode(F.sequence("_tx0", "_tx1")))
        .withColumn("hty", F.explode(F.sequence("_ty0", "_ty1")))
        .select("htx", "hty", "gx", "gy", "z")
    )

    def cm_weights(t: np.ndarray) -> tuple[np.ndarray, ...]:
        # Catmull-Rom (a=-0.5) weights for taps at offsets -1, 0, +1, +2
        # of the fractional position t in [0, 1)
        a = -0.5
        t2, t3 = t * t, t * t * t
        w0 = a * t3 - 2 * a * t2 + a * t
        w1 = (a + 2) * t3 - (a + 3) * t2 + 1
        w2 = -(a + 2) * t3 + (2 * a + 3) * t2 - a * t
        w3 = -a * t3 + a * t2
        return w0, w1, w2, w3

    def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        htx, hty = int(key[0]), int(key[1])
        ogx = np.arange(htx * tile_px, (htx + 1) * tile_px)
        ogy = np.arange(hty * tile_px, (hty + 1) * tile_px)
        u = (ogx + 0.5) * r - 0.5  # input-pixel coords per output x index
        v = (ogy + 0.5) * r - 0.5
        bu = np.floor(u).astype(np.int64)
        bv = np.floor(v).astype(np.int64)
        fu = u - bu
        fv = v - bv
        # dense local input array over the taps this tile needs
        gx = pdf["gx"].to_numpy(np.int64)
        gy = pdf["gy"].to_numpy(np.int64)
        x0, y0 = gx.min(), gy.min()
        w_ = gx.max() - x0 + 1
        h_ = gy.max() - y0 + 1
        arr = np.zeros((w_, h_))
        m = np.zeros((w_, h_))
        arr[gx - x0, gy - y0] = pdf["z"].to_numpy(np.float64)
        m[gx - x0, gy - y0] = 1.0
        if method == "cubic":
            wu = np.stack(cm_weights(fu), axis=1)  # (T, 4) offsets -1..2
            wv = np.stack(cm_weights(fv), axis=1)
            offs = (-1, 0, 1, 2)
        else:
            wu = np.stack([1.0 - fu, fu], axis=1)
            wv = np.stack([1.0 - fv, fv], axis=1)
            offs = (0, 1)
        num = np.zeros((tile_px, tile_px))
        den = np.zeros((tile_px, tile_px))
        for i, du in enumerate(offs):
            ix = np.clip(bu + du - x0, -1, w_)  # -1 / w_ mark out-of-array
            okx = (ix >= 0) & (ix < w_)
            ixc = np.clip(ix, 0, w_ - 1)
            for j, dv in enumerate(offs):
                iy = np.clip(bv + dv - y0, -1, h_)
                oky = (iy >= 0) & (iy < h_)
                iyc = np.clip(iy, 0, h_ - 1)
                tap_m = m[np.ix_(ixc, iyc)] * okx[:, None] * oky[None, :]
                tap_v = arr[np.ix_(ixc, iyc)]
                w2d = wu[:, i : i + 1] * wv[None, :, j].reshape(1, -1)
                num += w2d * tap_m * tap_v
                den += w2d * tap_m
        # full-support Catmull-Rom weights sum to exactly 1; partial-support
        # sums can be small or negative (negative lobes), where renormalizing
        # would explode — require most of the kernel mass to be present
        ok = den > 0.5
        ex, ey = np.nonzero(ok)
        return pd.DataFrame(
            {
                "gx": ogx[ex],
                "gy": ogy[ey],
                "z": num[ok] / den[ok],
            }
        )

    return exploded.groupBy("htx", "hty").applyInPandas(
        kernel, schema="gx long, gy long, z double"
    )


def _gauss_kernel1d(sigma: float) -> np.ndarray:
    r = max(1, int(math.ceil(4.0 * sigma)))
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return k / k.sum()


def _sep_conv(a: np.ndarray, k: np.ndarray) -> np.ndarray:
    """Separable 2D convolution with zero padding (mask-normalized by the
    caller, so the padding convention washes out)."""
    r = (len(k) - 1) // 2
    ap = np.pad(a, ((r, r), (0, 0)))
    out = np.zeros_like(a)
    for i, w in enumerate(k):
        out += w * ap[i : i + a.shape[0], :]
    ap = np.pad(out, ((0, 0), (r, r)))
    out2 = np.zeros_like(a)
    for i, w in enumerate(k):
        out2 += w * ap[:, i : i + a.shape[1]]
    return out2


def band_pass(
    dsm: DataFrame,
    weak_sigma_px: float,
    strong_sigma_px: float,
    tile_px: int = 256,
) -> DataFrame:
    """Gaussian band-pass of a (gx, gy, z) raster: weak-blur minus
    strong-blur, the reference's _normalize pre-step (preprocess.py:272-279:
    ``bandpassed = weak_filtered - strong_filtered`` with sigmas =
    filter-size / pixel-scale). Suppresses long-wavelength topography so
    keypoints don't all collapse onto ridgelines.

    Distributed as one tiled kernel job (tile + 4*sigma_strong halo — a
    Gaussian truncated at 4 sigma is exact within the halo); blurs are
    mask-normalized so raster edges and any residual voids renormalize over
    valid pixels instead of bleeding zeros. Output: (gx, gy, z, bp).
    """
    halo = max(1, int(math.ceil(4.0 * strong_sigma_px)) + 1)
    kw = _gauss_kernel1d(weak_sigma_px)
    ks = _gauss_kernel1d(strong_sigma_px)
    exploded = tile_explode(dsm.select("gx", "gy", "z"), tile_px, halo)

    def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        htx, hty = int(key[0]), int(key[1])
        x0 = htx * tile_px - halo
        y0 = hty * tile_px - halo
        w = tile_px + 2 * halo
        arr = np.zeros((w, w))
        m = np.zeros((w, w))
        ix = (pdf["gx"].to_numpy() - x0).astype(np.int64)
        iy = (pdf["gy"].to_numpy() - y0).astype(np.int64)
        z = pdf["z"].to_numpy(np.float64)
        arr[ix, iy] = z
        m[ix, iy] = 1.0
        out = {}
        for name, k in (("wk", kw), ("st", ks)):
            num = _sep_conv(arr * m, k)
            den = _sep_conv(m, k)
            out[name] = np.where(den > 1e-12, num / np.maximum(den, 1e-12), 0.0)
        bp = out["wk"] - out["st"]
        core = (ix >= halo) & (ix < halo + tile_px) & (iy >= halo) & (iy < halo + tile_px)
        return pd.DataFrame(
            {
                "gx": pdf["gx"].to_numpy()[core],
                "gy": pdf["gy"].to_numpy()[core],
                "z": z[core],
                "bp": bp[ix[core], iy[core]],
            }
        )

    return exploded.groupBy("htx", "hty").applyInPandas(
        kernel, schema="gx long, gy long, z double, bp double"
    )


def infill_band_pass(
    dsm: DataFrame,
    extent: Extent,
    resolution: float,
    weak_sigma_px: float,
    strong_sigma_px: float,
    tile_px: int = 256,
    max_rounds: int = 8,
) -> DataFrame:
    """Fused G4+band-pass: void infill followed by the Gaussian band-pass in
    ONE tile kernel (optimization round r6) — the registration preprocess
    chain ran them as two applyInPandas stages with a full shuffle between
    (measured ~0.7 s of the coarse stage per DSM side at sf0.1; at scale it
    is a whole extra pass over the raster).

    Exactness argument: with halo = H_bp + H_inf, every infill result
    within (tile + H_bp) of the core equals the global infill (a round-k
    fill depends only on cells within Chebyshev k <= H_inf), and the
    band-pass at any core cell only reads infilled cells within H_bp — so
    core outputs are bit-identical to infill() -> band_pass() (asserted in
    tests/test_grid.py). Output: (gx, gy, z, bp) over all filled core
    cells, exactly like band_pass(infill(dsm))."""
    filled = dsm.select("gx", "gy", "z")
    b = filled.agg(
        F.min("gx").alias("x0"), F.max("gx").alias("x1"),
        F.min("gy").alias("y0"), F.max("gy").alias("y1"),
    ).collect()[0]
    if b["x0"] is None:
        return filled.withColumn("bp", F.lit(0.0))
    bb = (int(b["x0"]), int(b["x1"]), int(b["y0"]), int(b["y1"]))
    h_inf = int(max_rounds)
    h_bp = max(1, int(math.ceil(4.0 * strong_sigma_px)) + 1)
    halo = h_inf + h_bp
    kw = _gauss_kernel1d(weak_sigma_px)
    ks = _gauss_kernel1d(strong_sigma_px)
    exploded = tile_explode(filled, tile_px, halo)

    def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        htx, hty = int(key[0]), int(key[1])
        x0 = htx * tile_px - halo
        y0 = hty * tile_px - halo
        w = tile_px + 2 * halo
        arr = np.zeros((w, w))
        have = np.zeros((w, w), dtype=bool)
        ix = (pdf["gx"].to_numpy() - x0).astype(np.int64)
        iy = (pdf["gy"].to_numpy() - y0).astype(np.int64)
        arr[ix, iy] = pdf["z"].to_numpy(np.float64)
        have[ix, iy] = True
        gxs = x0 + np.arange(w)
        gys = y0 + np.arange(w)
        in_bb = (
            ((gxs >= bb[0]) & (gxs <= bb[1]))[:, None]
            & ((gys >= bb[2]) & (gys <= bb[3]))[None, :]
        )
        offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1) if (dx, dy) != (0, 0)]
        for _ in range(h_inf):
            num = np.zeros((w, w))
            den = np.zeros((w, w))
            for dx, dy in offs:
                wgt = 1.0 / float(dx * dx + dy * dy)
                src_x = slice(max(dx, 0), w + min(dx, 0))
                src_y = slice(max(dy, 0), w + min(dy, 0))
                dst_x = slice(max(-dx, 0), w + min(-dx, 0))
                dst_y = slice(max(-dy, 0), w + min(-dy, 0))
                hv = have[src_x, src_y]
                num[dst_x, dst_y] += np.where(hv, arr[src_x, src_y], 0.0) * wgt
                den[dst_x, dst_y] += hv * wgt
            newly = (~have) & (den > 0) & in_bb
            if not newly.any():
                break
            arr[newly] = num[newly] / den[newly]
            have |= newly
        m = have.astype(np.float64)
        out = {}
        for name, k in (("wk", kw), ("st", ks)):
            num = _sep_conv(arr * m, k)
            den = _sep_conv(m, k)
            out[name] = np.where(den > 1e-12, num / np.maximum(den, 1e-12), 0.0)
        bp = out["wk"] - out["st"]
        core = np.zeros((w, w), dtype=bool)
        core[halo : halo + tile_px, halo : halo + tile_px] = True
        ex, ey = np.nonzero(have & core)
        return pd.DataFrame(
            {
                "gx": ex + x0,
                "gy": ey + y0,
                "z": arr[ex, ey],
                "bp": bp[ex, ey],
            }
        )

    return exploded.groupBy("htx", "hty").applyInPandas(
        kernel, schema="gx long, gy long, z double, bp double"
    )


def colormap_encode(
    df: DataFrame, col: str = "dz", vmin: float = -5.0, vcenter: float = 0.0, vmax: float = 5.0
) -> DataFrame:
    """A11: diverging two-slope colormap -> uint16 RGB columns (reference
    vcd/preprocessing/preprocess.py:330-355 uses matplotlib TwoSlopeNorm +
    RdBu; here the piecewise-linear norm and a blue-white-red ramp are plain
    column expressions). Cosmetic output parity: channels in [0, 65535]."""
    v = F.col(col)
    lo = F.when(v < vcenter, (v - F.lit(vmin)) / F.lit(max(vcenter - vmin, 1e-12)) * 0.5)
    norm = lo.otherwise(F.lit(0.5) + (v - F.lit(vcenter)) / F.lit(max(vmax - vcenter, 1e-12)) * 0.5)
    norm = F.least(F.lit(1.0), F.greatest(F.lit(0.0), norm))
    # blue (0) -> white (0.5) -> red (1)
    red = F.when(norm <= 0.5, norm * 2.0).otherwise(F.lit(1.0))
    blue = F.when(norm >= 0.5, (F.lit(1.0) - norm) * 2.0).otherwise(F.lit(1.0))
    green = F.when(norm <= 0.5, norm * 2.0).otherwise((F.lit(1.0) - norm) * 2.0)
    to16 = lambda c: F.round(c * 65535.0).cast("int")  # noqa: E731
    return (
        df.withColumn("red", to16(red))
        .withColumn("green", to16(green))
        .withColumn("blue", to16(blue))
    )


def dsm_to_points(
    dsm: DataFrame, extent: Extent, resolution: float, area_or_point: str = "Area"
) -> DataFrame:
    """Raster -> point cloud at cell centers (the reference's _dsm2pc,
    preprocess.py:285-315, incl. the half-pixel AREA_OR_POINT shift
    preprocess.py:304-306: Area-tagged rasters shift +0.5 px so the sample
    point is the cell center; Point-tagged are already centered)."""
    shift = 0.5 if area_or_point.lower() == "area" else 0.0
    x = (F.col("gx").cast("double") + F.lit(shift)) * F.lit(resolution) + F.lit(extent[0])
    y = (F.col("gy").cast("double") + F.lit(shift)) * F.lit(resolution) + F.lit(extent[1])
    return dsm.select(x.alias("x"), y.alias("y"), F.col("z"))
