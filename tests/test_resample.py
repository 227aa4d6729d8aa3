"""Raster<->vector resampling: exact on planar fields, NODATA outside radius."""

from __future__ import annotations

import numpy as np
import pandas as pd

from codem_spark.operators import resample
from tests.conftest import SMALL_EXTENT


def _plane_samples(n=5000, seed=3):
    rng = np.random.default_rng(seed)
    sp = pd.DataFrame({"x": rng.uniform(0, 1000, n), "y": rng.uniform(0, 1000, n)})
    sp["z"] = 2.0 * sp.x + 1.0 * sp.y
    return sp


def test_plane_interpolation_exact(spark):
    sp = _plane_samples()
    rng = np.random.default_rng(4)
    qp = pd.DataFrame({"pid": np.arange(100), "x": rng.uniform(100, 900, 100), "y": rng.uniform(100, 900, 100)})
    got = resample.resample_to_points(
        spark.createDataFrame(sp), spark.createDataFrame(qp), SMALL_EXTENT, radius=50.0, method="plane"
    ).toPandas()
    assert np.abs(got.z - (2.0 * got.x + 1.0 * got.y)).max() < 1e-6


def test_idw_interpolation_close(spark):
    sp = _plane_samples()
    rng = np.random.default_rng(5)
    qp = pd.DataFrame({"pid": np.arange(100), "x": rng.uniform(100, 900, 100), "y": rng.uniform(100, 900, 100)})
    got = resample.resample_to_points(
        spark.createDataFrame(sp), spark.createDataFrame(qp), SMALL_EXTENT, radius=50.0, method="idw"
    ).toPandas()
    assert np.abs(got.z - (2.0 * got.x + 1.0 * got.y)).max() < 50.0


def test_nodata_outside_radius(spark):
    sp = pd.DataFrame({"x": [100.0], "y": [100.0], "z": [5.0]})
    qp = pd.DataFrame({"pid": [0, 1], "x": [101.0, 900.0], "y": [100.0, 900.0]})
    got = (
        resample.resample_to_points(
            spark.createDataFrame(sp), spark.createDataFrame(qp), SMALL_EXTENT, radius=10.0
        )
        .toPandas()
        .set_index("pid")
    )
    assert got.loc[0, "z"] != resample.NODATA
    assert got.loc[1, "z"] == resample.NODATA
