"""Grid aggregation family vs DuckDB / pandas oracles."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from codem_spark import synth
from codem_spark.operators import grid
from tests.conftest import EXTENT


def test_grid_max_vs_duckdb(spark, duck):
    pc = synth.point_cloud(spark, 5000)
    got = (
        grid.grid_max(pc, EXTENT, 1000.0)
        .toPandas()
        .sort_values(["gx", "gy"])
        .reset_index(drop=True)
    )
    pdf = pc.select("x", "y", "z").toPandas()
    duck.register("pts_gm", pdf)
    exp = duck.sql(grid.grid_max_sql("SELECT * FROM pts_gm", EXTENT, 1000.0) + " ORDER BY gx, gy").df()
    assert len(got) == len(exp)
    assert (got.gx.values == exp.gx.values).all()
    assert np.allclose(got.z.values, exp.z.values, atol=1e-12)


def test_grid_idw_vs_duckdb(spark, duck):
    pc = synth.point_cloud(spark, 2000)
    got = (
        grid.grid_idw(pc, EXTENT, 2000.0, radius_cells=1)
        .toPandas()
        .sort_values(["gx", "gy"])
        .reset_index(drop=True)
    )
    pdf = pc.select("x", "y", "z").toPandas()
    duck.register("pts_idw", pdf)
    exp = (
        duck.sql(grid.grid_idw_sql("SELECT * FROM pts_idw", EXTENT, 2000.0, 1) + " ORDER BY gx, gy")
        .df()
    )
    assert len(got) == len(exp)
    assert np.allclose(got.z.values, exp.z.values, rtol=1e-9)


def test_density_and_resolution(spark):
    pc = synth.point_cloud(spark, 10000)
    res = grid.estimate_resolution(pc, EXTENT, level=6)
    # 10k points over 100km x 100km -> ~1km spacing
    assert 500 < res < 2000


def test_bounds_and_bbox(spark):
    pc = synth.point_cloud(spark, 1000)
    b = grid.bounds(pc)
    assert b[0] >= 0 and b[2] <= 100_000
    ov = grid.bbox_overlap((0, 0, 10, 10), (5, 5, 20, 20))
    assert ov[0] < ov[2] and ov[1] < ov[3]
    with pytest.raises(ValueError):
        grid.bbox_overlap((0, 0, 1, 1), (100, 100, 101, 101))


def test_clip_bbox_pushdown(spark):
    pc = synth.point_cloud(spark, 2000)
    clipped = grid.clip_bbox(pc, (10_000, 10_000, 50_000, 50_000))
    pdf = clipped.select("x", "y").toPandas()
    assert ((pdf.x >= 10_000) & (pdf.x < 50_000)).all()
    # filter must appear in the physical plan (pushed toward the scan)
    plan = clipped._jdf.queryExecution().executedPlan().toString()
    assert "Filter" in plan or "filter" in plan


def test_quantize_normalize(spark):
    pc = synth.point_cloud(spark, 3000)
    q = grid.quantize_normalize(pc, "z", exact=True).select("z_u8").toPandas()
    assert q.z_u8.between(1, 255).all()
    assert q.z_u8.nunique() > 100  # spread across the range


def test_cluster_sizes_window(spark):
    df = spark.createDataFrame(
        [(i, i % 3) for i in range(30)], "pid long, cluster_id int"
    )
    got = grid.cluster_sizes(df).toPandas()
    assert (got.cluster_size == 10).all()


def test_infill_fills_all_interior_voids(spark):
    # 10x10 grid with a 2x2 hole: infill must fill it with neighbor IDW
    rows = [(gx, gy, float(gx + gy)) for gx in range(10) for gy in range(10)
            if not (4 <= gx <= 5 and 4 <= gy <= 5)]
    dsm = spark.createDataFrame(rows, "gx long, gy long, z double")
    filled = grid.infill(dsm, (0, 0, 10, 10), 1.0, tile_level=2)
    pdf = filled.toPandas()
    assert len(pdf) == 100
    hole = pdf[(pdf.gx.between(4, 5)) & (pdf.gy.between(4, 5))]
    exp = hole.gx + hole.gy
    assert np.allclose(hole.z.values, exp.values, atol=1.0)


def test_infill_band_pass_fused_equals_sequential(spark):
    """The fused infill+band-pass kernel (optimization r6) must be
    bit-identical to the sequential infill() -> band_pass() chain, voids,
    raster edges and tile borders included."""
    rng = np.random.default_rng(7)
    rows = [
        (gx, gy, float(np.sin(gx * 0.3) * 5 + gy * 0.1 + rng.normal(0, 0.2)))
        for gx in range(70) for gy in range(60)
        # punch a few holes, including one on a tile border (tile_px=32)
        if not ((10 <= gx <= 12 and 20 <= gy <= 22) or (31 <= gx <= 33 and 5 <= gy <= 6))
    ]
    dsm = spark.createDataFrame(rows, "gx long, gy long, z double")
    seq = grid.band_pass(
        grid.infill(dsm, (0, 0, 70, 60), 1.0, tile_px=32),
        weak_sigma_px=1.0, strong_sigma_px=2.5, tile_px=32,
    ).toPandas().sort_values(["gx", "gy"]).reset_index(drop=True)
    fus = grid.infill_band_pass(
        dsm, (0, 0, 70, 60), 1.0, weak_sigma_px=1.0, strong_sigma_px=2.5, tile_px=32,
    ).toPandas().sort_values(["gx", "gy"]).reset_index(drop=True)
    assert len(seq) == len(fus)
    assert (seq.gx.values == fus.gx.values).all() and (seq.gy.values == fus.gy.values).all()
    assert np.array_equal(seq.z.values, fus.z.values)
    assert np.allclose(seq.bp.values, fus.bp.values, atol=1e-12)


def test_exact_percentiles_matches_builtin(spark):
    """exact_percentiles (histogram refinement) must reproduce the builtin
    percentile() aggregate bit-for-bit, interpolated and exact-index probs,
    duplicates included."""
    rng = np.random.default_rng(3)
    vals = np.concatenate([rng.normal(50, 20, 40_000), np.full(5_000, 42.0)])
    df = spark.createDataFrame([(float(v),) for v in vals], "z double")
    probs = [0.0, 0.01, 0.05, 0.5, 0.99, 1.0]
    ref = df.agg(
        *[F.expr(f"percentile(z, {p})").alias(f"p{i}") for i, p in enumerate(probs)]
    ).collect()[0]
    # small collect_cap forces at least one histogram refinement round
    got = grid.exact_percentiles(df, "z", probs, collect_cap=2_000)
    for i in range(len(probs)):
        assert got[i] == ref[f"p{i}"], (probs[i], got[i], ref[f"p{i}"])


def test_dsm_to_points_area_point_shift(spark):
    dsm = spark.createDataFrame([(2, 3, 7.0)], "gx long, gy long, z double")
    a = grid.dsm_to_points(dsm, (0, 0, 10, 10), 1.0, "Area").collect()[0]
    p = grid.dsm_to_points(dsm, (0, 0, 10, 10), 1.0, "Point").collect()[0]
    # reference semantics (preprocess.py:304-306): Area shifts +0.5 px
    assert a["x"] - p["x"] == pytest.approx(0.5)
    assert a["y"] - p["y"] == pytest.approx(0.5)


def test_resample_raster_identity_and_linear(spark):
    """S2 cubic resample (reference preprocess.py:409-441): identity-ratio
    resample reproduces the input exactly; a downsample of a linear surface
    is exact at output cell centers (Catmull-Rom reproduces degree<=1)."""
    rows = [(gx, gy, 2.0 * gx - 3.0 * gy + 7.0) for gx in range(40) for gy in range(40)]
    dsm = spark.createDataFrame(rows, "gx long, gy long, z double")
    ident = grid.resample_raster(dsm, (0, 0, 40, 40), 1.0, 1.0).toPandas()
    src = {(gx, gy): z for gx, gy, z in rows}
    assert len(ident) == 1600
    for _, r in ident.sample(min(100, len(ident)), random_state=0).iterrows():
        assert abs(r.z - src[(r.gx, r.gy)]) < 1e-9
    # 2x downsample: output center (ogx+0.5)*2-0.5 in input px
    down = grid.resample_raster(dsm, (0, 0, 40, 40), 1.0, 2.0).toPandas()
    interior = down[(down.gx >= 1) & (down.gx <= 18) & (down.gy >= 1) & (down.gy <= 18)]
    assert len(interior) > 200
    u = (interior.gx + 0.5) * 2.0 - 0.5
    v = (interior.gy + 0.5) * 2.0 - 0.5
    exp = 2.0 * u - 3.0 * v + 7.0
    assert np.allclose(interior.z.values, exp.values, atol=1e-9)


def test_resample_raster_upsample_interpolates(spark):
    """2x upsample of a linear surface: Catmull-Rom is exact for degree<=1
    at ANY fractional position, so every full-support output pixel matches
    the plane; bilinear mode agrees on the same surface."""
    rows = [(gx, gy, 0.5 * gx + 1.25 * gy - 3.0) for gx in range(20) for gy in range(20)]
    dsm = spark.createDataFrame(rows, "gx long, gy long, z double")
    for method in ("cubic", "bilinear"):
        up = grid.resample_raster(dsm, (0, 0, 20, 20), 1.0, 0.5, method=method).toPandas()
        u = (up.gx + 0.5) * 0.5 - 0.5
        v = (up.gy + 0.5) * 0.5 - 0.5
        interior = up[(u >= 2) & (u <= 17) & (v >= 2) & (v <= 17)]
        ui = (interior.gx + 0.5) * 0.5 - 0.5
        vi = (interior.gy + 0.5) * 0.5 - 0.5
        exp = 0.5 * ui + 1.25 * vi - 3.0
        assert len(interior) > 500, method
        assert np.allclose(interior.z.values, exp.values, atol=1e-9), method


def test_cell_pyramid_matches_per_level_aggs_one_exchange(spark, duck):
    """cell_pyramid: values equal independent per-level aggs AND the whole
    pyramid plans with exactly ONE Exchange (the coarse-ancestor
    repartition) — the single-shuffle property the 100 TB design rests on."""
    from codem_spark.functions import cells

    pc = synth.point_cloud(spark, 8000)
    pyr = grid.cell_pyramid(pc, EXTENT, level=10, coarsest=7, num_partitions=8)
    # single-shuffle property: every level is one branch of a union, and
    # each branch's whole agg chain plans exactly ONE Exchange (the
    # ancestor repartition); the union's identical exchanges dedupe at
    # runtime via AQE stage reuse. Assert on the deepest chain (finest agg
    # + all three rollups, no union in the way).
    c = grid.cells.cell_encode_col(F.col("x"), F.col("y"), EXTENT, 10)
    pre = pc.select(
        F.shiftright(c, 6).alias("_ck"), c.alias("cell"), F.col("z").alias("z")
    ).repartition(8, "_ck")
    chain = pre.groupBy("_ck", "cell").agg(F.max("z").alias("z_max"), F.count("*").alias("n"))
    for _ in range(3):
        chain = chain.groupBy("_ck", F.shiftright("cell", 2).alias("cell")).agg(
            F.max("z_max").alias("z_max"), F.sum("n").alias("n")
        )
    plan = chain._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    got = pyr.toPandas().sort_values(["level", "cell"]).reset_index(drop=True)
    # oracle 1: independent per-level direct aggregations
    for lv in (10, 9, 8, 7):
        cell = cells.cell_encode_col(F.col("x"), F.col("y"), EXTENT, lv)
        exp = (
            pc.select(cell.alias("cell"), "z")
            .groupBy("cell")
            .agg(F.max("z").alias("z_max"), F.count("*").alias("n"))
            .toPandas()
            .sort_values("cell")
            .reset_index(drop=True)
        )
        g = got[got.level == lv].reset_index(drop=True)
        assert len(g) == len(exp), lv
        assert (g.cell.values == exp.cell.values).all()
        assert np.allclose(g.z_max.values, exp.z_max.values)
        assert (g.n.values == exp.n.values).all()
    # oracle 2: the DuckDB SQL twin used by the correctness contract
    pdf = pc.select("x", "y", "z").toPandas()
    duck.register("pts_pyr", pdf)
    exp = duck.sql(
        grid.cell_pyramid_sql("SELECT * FROM pts_pyr", EXTENT, 10, 7)
        + " ORDER BY level, cell"
    ).df().sort_values(["level", "cell"]).reset_index(drop=True)
    assert len(exp) == len(got)
    assert (got.cell.values == exp.cell.values).all()
    assert np.allclose(got.z_max.values, exp.z_max.values)
    assert (got.n.values == exp.n.values).all()


def test_cell_pyramid_validates_levels(spark):
    pc = synth.point_cloud(spark, 10)
    with pytest.raises(ValueError, match="coarsest"):
        grid.cell_pyramid(pc, EXTENT, level=5, coarsest=6)
