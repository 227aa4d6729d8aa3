"""Delaunay TIN (J7/A10 — reference hag_delaunay + matplotlib.tri path)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from codem_spark.operators import tin
from tests.conftest import SMALL_EXTENT


def _brute_delaunay_check(p: np.ndarray, tris: np.ndarray) -> None:
    """Empty-circumcircle property: no point strictly inside any triangle's
    circumcircle (the defining Delaunay invariant)."""
    cc, r2 = tin._circumcircles(p, tris)
    for t in range(len(tris)):
        d2 = ((p - cc[t]) ** 2).sum(1)
        inside = d2 < r2[t] * (1.0 - 1e-9)
        inside[tris[t]] = False
        assert not inside.any(), f"triangle {t} circumcircle contains a point"


def test_delaunay_property_random():
    rng = np.random.default_rng(4)
    p = rng.uniform(0, 100, (60, 2))
    tris = tin.delaunay_np(p)
    assert len(tris) > 0
    _brute_delaunay_check(p, tris)
    # Euler: for n points with h hull vertices, triangles = 2n - h - 2
    from codem_spark.operators.hull import convex_hull_2d

    h = len(convex_hull_2d(p))
    assert len(tris) == 2 * len(p) - h - 2


def test_delaunay_grid_points():
    xs, ys = np.meshgrid(np.arange(8.0), np.arange(8.0))
    p = np.column_stack([xs.ravel(), ys.ravel()])
    # perturb to break cocircular degeneracy deterministically
    rng = np.random.default_rng(1)
    p = p + rng.uniform(-1e-3, 1e-3, p.shape)
    tris = tin.delaunay_np(p)
    _brute_delaunay_check(p, tris)


def test_tin_interpolation_exact_on_linear():
    rng = np.random.default_rng(7)
    p = rng.uniform(0, 50, (500, 2))
    z = 2.0 * p[:, 0] - 0.5 * p[:, 1] + 3.0
    q = rng.uniform(5, 45, (300, 2))
    zi = tin.tin_interpolate_np(p, z, q)
    assert np.isfinite(zi).all()
    assert np.allclose(zi, 2.0 * q[:, 0] - 0.5 * q[:, 1] + 3.0, atol=1e-8)
    # outside the hull -> NaN
    zo = tin.tin_interpolate_np(p, z, np.array([[1000.0, 1000.0]]))
    assert np.isnan(zo[0])


def test_resample_tin_method(spark):
    """Distributed TIN resample: exact on a linear surface in the interior;
    NODATA far outside the data."""
    from codem_spark.operators import resample

    rng = np.random.default_rng(9)
    n = 20_000
    sx = rng.uniform(0, 1000, n)
    sy = rng.uniform(0, 1000, n)
    sz = 0.1 * sx + 0.2 * sy + 5.0
    samples = spark.createDataFrame(pd.DataFrame({"x": sx, "y": sy, "z": sz}))
    qx = rng.uniform(100, 900, 300)
    qy = rng.uniform(100, 900, 300)
    queries = spark.createDataFrame(
        pd.DataFrame({"pid": np.arange(300), "x": qx, "y": qy})
    )
    out = (
        resample.resample_to_points(
            samples, queries, SMALL_EXTENT, radius=100.0, method="tin"
        )
        .toPandas()
        .sort_values("pid")
    )
    exp = 0.1 * out.x.values + 0.2 * out.y.values + 5.0
    ok = out.z.values != resample.NODATA
    assert ok.mean() > 0.98  # a few queries may sit in halo-edge gaps
    assert np.allclose(out.z.values[ok], exp[ok], atol=1e-6)
