"""End-to-end registration recovery — the engine's port of the reference
test matrix (reference tests/test_registration.py:39-115: AOIs derived from
the foundation by clipping + known rigid perturbations; the pipeline must
recover the inverse within the demonstrated RMSE envelope,
docs/details.md:88-123: coarse 3D RMSE ~1.9 m, fine ~0.6 m at demo scale).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from codem_spark.config import EngineConfig
from codem_spark.functions.geo import decompose_similarity, similarity_matrix
from codem_spark.registration import pipeline as P

EXT = (0.0, 0.0, 1000.0, 1000.0)
RES = 4.0


def _surface(x, y):
    """Terrain + building grid (pitch 80 m, size 30 m) — distinctive local
    geometry for the feature detector (analog of the reference demo scene,
    docs/details.md:30-46)."""
    z = 10 * np.sin(x * 2 * np.pi / 700 + 0.3) * np.cos(y * 2 * np.pi / 900 - 1.7)
    z += 5 * np.sin(x * 2 * np.pi / 260) * np.cos(y * 2 * np.pi / 330)
    gx = np.floor(x / 80).astype(np.int64)
    gy = np.floor(y / 80).astype(np.int64)
    fx = x - gx * 80
    fy = y - gy * 80
    inside = (fx > 25) & (fx < 55) & (fy > 25) & (fy < 55)
    h = ((gx * 73856093 + gy * 19349663) % 97) / 97.0 * 18 + 4
    return z + np.where(inside, h, 0.0) + 50.0


def _about_center(m3: np.ndarray, c=(500.0, 500.0, 0.0)) -> np.ndarray:
    t = np.eye(4)
    t[:3, 3] = c
    ti = np.eye(4)
    ti[:3, 3] = -np.asarray(c)
    return t @ m3 @ ti


# The reference's five perturbation cases (test_registration.py:41-61),
# expressed about the AOI center so points stay in-extent.
CASES = {
    "identity": np.eye(4),
    "rot360": _about_center(similarity_matrix(1.0, 0, 0, 360.0)),
    "translate_x10": similarity_matrix(1.0, 0, 0, 0.0, (10.0, 0.0, 0.0)),
    "rot180": _about_center(similarity_matrix(1.0, 0, 0, 180.0)),
    "rot90_translate": (
        lambda m: (lambda s: s @ m)(np.array([[1, 0, 0, 40.0], [0, 1, 0, 25.0], [0, 0, 1, 2.0], [0, 0, 0, 1]], dtype=float))
    )(_about_center(similarity_matrix(1.0, 0, 0, 90.0))),
}


@pytest.fixture(scope="module")
def clouds():
    rng = np.random.default_rng(11)
    n = 100_000
    fx = rng.uniform(0, 1000, n)
    fy = rng.uniform(0, 1000, n)
    fz = _surface(fx, fy) + rng.normal(0, 0.05, n)
    fnd = pd.DataFrame({"pid": np.arange(n), "x": fx, "y": fy, "z": fz})
    m = (fx > 200) & (fx < 800) & (fy > 200) & (fy < 800)
    return fnd, fnd[m].reset_index(drop=True)


def _perturb(aoi: pd.DataFrame, M: np.ndarray) -> pd.DataFrame:
    A = np.column_stack([aoi.x, aoi.y, aoi.z, np.ones(len(aoi))]) @ M.T
    return pd.DataFrame({"pid": aoi.pid.values, "x": A[:, 0], "y": A[:, 1], "z": A[:, 2]})


# ---------------------------------------------------------------------------
# The reference's FULL registration matrix (tests/test_registration.py:66-115)
# is 3 foundation input types x (5 point-cloud perturbations + 1 raster AOI)
# = 18 cases. The engine twins: foundation as a raw point table, as a DSM
# tile table (gx, gy, z -> dsm_to_points, the DEM-foundation analog), and as
# a declarative pipeline JSON spec (the Pipeline-foundation analog,
# tests/point_cloud.py:85-103); AOI as the 5 perturbed clouds or as a
# rasterized tile table (the dem_aoi analog).


@pytest.fixture(scope="module")
def foundation_sources(spark, clouds, tmp_path_factory):
    from codem_spark.operators import grid
    from codem_spark.plans import pipeline_json as PJ

    fnd, _aoi0 = clouds
    pq = str(tmp_path_factory.mktemp("regmat") / "fnd.parquet")
    spark.createDataFrame(fnd).write.mode("overwrite").parquet(pq)

    def points():
        return spark.read.parquet(pq)

    def raster():
        dsm = grid.grid_max(spark.read.parquet(pq), EXT, RES)
        return grid.dsm_to_points(dsm, EXT, RES, area_or_point="Area")

    def pipeline():
        spec = [
            pq,
            {"type": "filters.range", "limits": "Z[0:]"},
            {"type": "filters.assign", "assignment": "Classification[:]=2"},
            {"type": "writers.gdal", "resolution": RES, "filename": "out.tif"},
        ]
        df, writers = PJ.pipeline_from_json(spark, spec)
        assert len(writers) == 1  # stripped like reference preprocess.py:628
        return df.select("pid", "x", "y", "z")

    return {"points": points, "raster": raster, "pipeline": pipeline}


@pytest.mark.parametrize("foundation_kind", ["points", "raster", "pipeline"])
@pytest.mark.parametrize(
    "case",
    ["identity", "rot360", "translate_x10", "rot180", "rot90_translate", "raster_aoi"],
)
def test_coarse_recovers_inverse(spark, clouds, foundation_sources, foundation_kind, case):
    fnd, aoi0 = clouds
    if case == "raster_aoi":
        # dem_aoi analog: the AOI itself is a rasterized tile table
        from codem_spark.operators import grid

        M = np.eye(4)
        aoi_df = grid.dsm_to_points(
            grid.grid_max(spark.createDataFrame(aoi0), EXT, RES), EXT, RES
        )
    else:
        M = CASES[case]
        aoi_df = spark.createDataFrame(_perturb(aoi0, M))
    cfg = EngineConfig(min_resolution=RES)
    prep = P.preprocess(
        foundation_sources[foundation_kind](), aoi_df, extent=EXT, cfg=cfg, resolution=RES
    )
    c = P.coarse_registration(prep, cfg)
    prep.fnd_dsm.unpersist()
    prep.aoi_dsm.unpersist()
    got = np.array(c.matrix)
    resid = got @ M  # ~ identity if recovered
    d = decompose_similarity(resid)
    assert c.n_pairs >= 5
    assert c.rmse_3d < 2.5  # reference coarse envelope ~1.9 m at demo scale
    assert abs(d["scale"] - 1.0) < 0.01
    for a in ("omega", "phi", "kappa"):
        assert abs(d[a]) < 1.0, f"{a}={d[a]}"
    for t in ("trans_x", "trans_y", "trans_z"):
        assert abs(d[t]) < 2.0 * RES, f"{t}={d[t]}"


def test_fine_refines_to_subresolution(spark, clouds):
    # full-density mode: AOI points are EXACT foundation subsets, so ICP can
    # snap near-exactly — the engine-extra exactness pin. The default
    # DSM-derived path (the reference's _dsm2pc early downsample) is pinned
    # separately in test_fine_dsm_path_recovers_transform.
    fnd, aoi0 = clouds
    M = CASES["rot90_translate"]
    aoi = _perturb(aoi0, M)
    cfg = EngineConfig(min_resolution=RES, icp_max_iter=15, icp_full_density=True)
    prep = P.preprocess(
        spark.createDataFrame(fnd), spark.createDataFrame(aoi), extent=EXT, cfg=cfg, resolution=RES
    )
    c = P.coarse_registration(prep, cfg)
    f = P.fine_registration_stage(prep, c, cfg)
    prep.fnd_dsm.unpersist()
    prep.aoi_dsm.unpersist()
    # AOI points are exact foundation subsets: ICP must snap near-exactly
    assert f.rmse_3d < 0.1
    resid = np.array(f.matrix) @ M
    d = decompose_similarity(resid)
    assert abs(d["scale"] - 1.0) < 1e-3
    for a in ("omega", "phi", "kappa"):
        assert abs(d[a]) < 0.05
    for t in ("trans_x", "trans_y", "trans_z"):
        assert abs(d[t]) < 0.5
    # parity fields present (reference registration.txt, dsm.py:434-466)
    assert f.n_pairs > 1000


def test_fine_dsm_path_recovers_transform(spark, clouds):
    """DEFAULT fine path (the reference's _dsm2pc early downsample,
    preprocess.py:285-315): ICP runs on the pipeline-resolution DSM-derived
    clouds, so per-iteration row count is bounded by CELL count. Recovery
    envelope mirrors the reference's demo numbers (fine 3D RMSE ~0.6 m at
    1 m res, docs/details.md:119-123) scaled to this scene's resolution."""
    fnd, aoi0 = clouds
    M = CASES["rot90_translate"]
    aoi = _perturb(aoi0, M)
    cfg = EngineConfig(min_resolution=RES, icp_max_iter=15)
    assert not cfg.icp_full_density  # DSM path IS the default
    prep = P.preprocess(
        spark.createDataFrame(fnd), spark.createDataFrame(aoi), extent=EXT, cfg=cfg, resolution=RES
    )
    c = P.coarse_registration(prep, cfg)
    f = P.fine_registration_stage(prep, c, cfg)
    prep.fnd_dsm.unpersist()
    prep.aoi_dsm.unpersist()
    resid = np.array(f.matrix) @ M
    d = decompose_similarity(resid)
    assert abs(d["scale"] - 1.0) < 0.01
    for a in ("omega", "phi", "kappa"):
        assert abs(d[a]) < 0.5, f"{a}={d[a]}"
    # sub-cell translation recovery on grid-sampled clouds
    for t in ("trans_x", "trans_y", "trans_z"):
        assert abs(d[t]) < 0.5 * RES, f"{t}={d[t]}"
    # residual RMSE is DSM-sampling-bounded, not exact-subset-bounded
    assert f.rmse_3d < RES
    # DSM pair count ~ cell count, far below the 360k raw AOI rows — the
    # early-downsample contract this test exists to pin
    assert 1000 < f.n_pairs < 60_000


def test_apply_registration_roundtrip(spark, clouds):
    fnd, aoi0 = clouds
    M = CASES["translate_x10"]
    aoi = _perturb(aoi0, M)
    from codem_spark.config import RegistrationParameters

    params = RegistrationParameters(matrix=np.linalg.inv(M).tolist())
    out = P.apply_registration(spark.createDataFrame(aoi), params).toPandas()
    merged = out.merge(aoi0, on="pid", suffixes=("_r", "_o"))
    assert np.allclose(merged[["x_r", "y_r", "z_r"]].values, merged[["x_o", "y_o", "z_o"]].values, atol=1e-9)


def test_register_feet_aoi_recovers_in_native_units(spark, clouds):
    """F3 (reference preprocess.py:486-512 + apply.py:116-123): an AOI
    delivered in feet registers against a meters foundation; the returned
    matrix_native maps feet -> foundation meters directly."""
    fnd, aoi0 = clouds
    M = CASES["translate_x10"]
    aoi_m = _perturb(aoi0, M)
    ft = 0.3048
    aoi_ft = aoi_m.copy()
    for c in ("x", "y", "z"):
        aoi_ft[c] = aoi_ft[c] / ft
    cfg = EngineConfig(min_resolution=RES, icp_max_iter=10)
    c, f, out = P.register(
        spark.createDataFrame(fnd),
        spark.createDataFrame(aoi_ft),
        extent=EXT,
        cfg=cfg,
        resolution=RES,
        fnd_units="m",
        aoi_units="ft",
    )
    assert f.matrix_native is not None
    # native matrix applied to the feet AOI must land on the meters truth
    native = np.array(f.matrix_native)
    A = np.column_stack([aoi_ft.x, aoi_ft.y, aoi_ft.z, np.ones(len(aoi_ft))]) @ native.T
    err = np.sqrt(((A[:, :3] - aoi0[["x", "y", "z"]].values) ** 2).sum(1))
    # sub-resolution in meters (0.2*RES = 0.8 m): this test pins the F3 unit
    # plumbing, not ICP precision — the default DSM-path fine lands ~0.13*RES
    assert np.median(err) < 0.2 * RES
    # and the returned DataFrame is already in foundation units
    got = out.toPandas().sort_values("pid").reset_index(drop=True)
    exp = aoi0.sort_values("pid").reset_index(drop=True)
    assert np.median(np.abs(got.x.values - exp.x.values)) < 0.2 * RES


def test_area_point_transforms_differ_by_half_pixel(spark, clouds):
    """A4 end-to-end (reference tests/test_registration.py:233-257): the
    SAME AOI raster interpreted Area vs Point yields coarse+fine transforms
    whose translations differ by exactly the half-pixel shift dsm_to_points
    applies (+0.5 px in x and y — preprocess.py:304-306)."""
    from codem_spark.operators import grid

    fnd, aoi0 = clouds
    shift = np.eye(4)
    shift[:3, 3] = (12.0, -8.0, 1.0)
    aoi = _perturb(aoi0, shift)
    raster = grid.grid_max(
        spark.createDataFrame(aoi), EXT, RES
    ).persist()
    cfg = EngineConfig(min_resolution=RES, icp_max_iter=10)
    results = {}
    for tag in ("Area", "Point"):
        pts = grid.dsm_to_points(raster, EXT, RES, tag).withColumn(
            "pid", F.xxhash64("x", "y", "z")
        )
        # full density: the half-pixel tagging distinction lives in the raw
        # point coordinates; the DSM-path fine stage re-rasterizes (both
        # taggings bin to the identical DSM) and would erase it by design
        cfg = EngineConfig(min_resolution=RES, icp_max_iter=10, icp_full_density=True)
        prep = P.preprocess(
            spark.createDataFrame(fnd), pts, extent=EXT, cfg=cfg, resolution=RES
        )
        c = P.coarse_registration(prep, cfg)
        f = P.fine_registration_stage(prep, c, cfg)
        prep.fnd_dsm.unpersist()
        prep.aoi_dsm.unpersist()
        results[tag] = (np.array(c.matrix), np.array(f.matrix))
    raster.unpersist()
    half = 0.5 * RES
    # Engine-adapted contract: both taggings rasterize to the IDENTICAL DSM
    # (grid_max re-bins the points onto the same cells), so the coarse
    # matrices are bit-identical; the half-pixel difference surfaces in the
    # FINE stage, which sees the actual point coordinates — Area points =
    # Point points + (half, half), so the fine translations differ by
    # exactly that vector (the reference's one-pixel assertion, expressed
    # for a point-cloud-input pipeline).
    d_coarse = results["Point"][0][:2, 3] - results["Area"][0][:2, 3]
    assert np.allclose(d_coarse, [0.0, 0.0], atol=1e-9), d_coarse
    d_fine = results["Point"][1][:2, 3] - results["Area"][1][:2, 3]
    assert np.allclose(d_fine, [half, half], atol=0.25), d_fine


def test_bandpass_keeps_keypoints_under_big_relief(spark):
    """The reason _normalize exists (reference preprocess.py:261-283): on a
    scene with large low-frequency relief, quantizing raw z squashes local
    structure into a handful of codes and keypoints collapse onto
    ridgelines. With the band-pass detection plane, keypoint counts on a
    200 m-relief scene stay comparable to the flat scene."""
    from codem_spark.registration import features

    rng = np.random.default_rng(13)
    n = 80_000
    x = rng.uniform(0, 1000, n)
    y = rng.uniform(0, 1000, n)
    flat = _surface(x, y)
    relief = flat + 200.0 * np.sin(x * 2 * np.pi / 1500.0) * np.cos(y * 2 * np.pi / 1800.0)
    cfg = EngineConfig(min_resolution=RES)
    counts = {}
    for name, z in (("flat", flat), ("relief", relief)):
        pts = spark.createDataFrame(pd.DataFrame({"pid": np.arange(n), "x": x, "y": y, "z": z}))
        dsm = P._prep_dsm(pts, EXT, RES, cfg)
        counts[name] = features.extract_features(dsm, EXT, RES).count()
    assert counts["relief"] >= 0.5 * counts["flat"], counts
    assert counts["relief"] > 200, counts


def test_capture_plane_collect_is_capped(spark):
    """The match-viz DSM capture must not collect unboundedly many cells to
    the driver (VERDICT r5 'weak'): above the cap the plane is block-max
    reduced to fit; below it the exact plane comes back unchanged."""
    import pandas as pd

    from codem_spark.registration import pipeline as P

    small = spark.createDataFrame(
        pd.DataFrame({"gx": [1, 2, 3], "gy": [4, 5, 6], "z_u8": [10, 20, 30]})
    )
    exact = P._capped_u8_plane(small)
    assert sorted(exact.z_u8.tolist()) == [10, 20, 30]

    gx, gy = np.meshgrid(np.arange(100), np.arange(100))
    big = spark.createDataFrame(
        pd.DataFrame(
            {"gx": gx.ravel(), "gy": gy.ravel(),
             "z_u8": (gx.ravel() + gy.ravel()) % 255}
        )
    )
    capped = P._capped_u8_plane(big, viz_max_cells=2500)
    # factor = ceil(sqrt(10000/2500)) = 2 -> 50x50 blocks
    assert len(capped) <= 2500
    assert capped.gx.max() == 49 and capped.gy.max() == 49


def test_render_match_image_geometry_and_lines():
    """Pure-numpy unit test of the match visualization (reference
    _save_match_img, dsm.py:276-333): canvas layout, green inlier lines
    between the planted pair coordinates, red transformed-bbox outline on
    the foundation half, and gray DSM pixels in both halves."""
    import pandas as pd

    from codem_spark.registration import viz

    ext = (0.0, 0.0, 100.0, 100.0)
    res = 10.0  # 10 x 10 px per half
    cells = pd.DataFrame(
        {"gx": [1, 2, 3], "gy": [1, 2, 3], "z_u8": [100, 150, 200]}
    )
    pairs = pd.DataFrame(
        {"ax": [15.0, 25.0], "ay": [15.0, 25.0], "az": [0.0, 0.0],
         "fx": [35.0, 45.0], "fy": [15.0, 25.0], "fz": [0.0, 0.0]}
    )
    inl = np.array([True, False])
    canvas = viz.render_match_image(
        cells, cells, pairs, inl, np.eye(4), ext, res
    )
    assert canvas.shape == (10, 24, 3)  # 10 + 4 gap + 10 wide
    # gray DSM pixels present in both halves (gy row, gx col; (2,2) is
    # interior — neither the row-1 match line nor the bbox outline hits it)
    assert canvas[2, 2, 0] == 150 and canvas[2, 14 + 2, 0] == 150
    # inlier line endpoints green: aoi (15,15) -> px (1,1) rounds to (1,1);
    # fnd (35,15) -> px 3 -> col 14+3
    assert (canvas[1, 1] == (0, 255, 0)).all()
    assert (canvas[1, 14 + 3] == (0, 255, 0)).all()
    # the outlier pair's fnd endpoint (45,25) -> px (4,2) col 14+4: NOT green
    assert not (canvas[2, 14 + 4] == (0, 255, 0)).all()
    # red outline exists on the foundation half only
    red = (canvas[:, :, 0] == 255) & (canvas[:, :, 1] == 0) & (canvas[:, :, 2] == 0)
    assert red[:, 14:].sum() > 0 and red[:, :10].sum() == 0
