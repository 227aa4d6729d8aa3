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


@pytest.mark.parametrize("case", ["identity", "rot360", "translate_x10", "rot180", "rot90_translate"])
def test_coarse_recovers_inverse(spark, clouds, case):
    fnd, aoi0 = clouds
    M = CASES[case]
    aoi = _perturb(aoi0, M)
    cfg = EngineConfig(min_resolution=RES)
    prep = P.preprocess(
        spark.createDataFrame(fnd), spark.createDataFrame(aoi), extent=EXT, cfg=cfg, resolution=RES
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
    fnd, aoi0 = clouds
    M = CASES["rot90_translate"]
    aoi = _perturb(aoi0, M)
    cfg = EngineConfig(min_resolution=RES, icp_max_iter=15)
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


def test_apply_registration_roundtrip(spark, clouds):
    fnd, aoi0 = clouds
    M = CASES["translate_x10"]
    aoi = _perturb(aoi0, M)
    from codem_spark.config import RegistrationParameters

    params = RegistrationParameters(matrix=np.linalg.inv(M).tolist())
    out = P.apply_registration(spark.createDataFrame(aoi), params).toPandas()
    merged = out.merge(aoi0, on="pid", suffixes=("_r", "_o"))
    assert np.allclose(merged[["x_r", "y_r", "z_r"]].values, merged[["x_o", "y_o", "z_o"]].values, atol=1e-9)
