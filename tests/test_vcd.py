"""VCD change-detection pipeline: planted building appears/disappears."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from codem_spark import vcd
from codem_spark.operators import hull

EXT = (0.0, 0.0, 1000.0, 1000.0)


@pytest.fixture(scope="module")
def before_after(spark):
    rng = np.random.default_rng(21)
    n = 40_000
    x = rng.uniform(0, 1000, n)
    y = rng.uniform(0, 1000, n)
    z = 5 * np.sin(x / 90) * np.cos(y / 110) + 20
    before = pd.DataFrame({"pid": np.arange(n), "x": x, "y": y, "z": z})
    # after: same field, but one 40x40 building appears at (300,300) (+8 m)
    # and one at (700,600) disappears (-6 m)
    z2 = z.copy()
    new_b = (x > 300) & (x < 340) & (y > 300) & (y < 340)
    fled = (x > 700) & (x < 740) & (y > 600) & (y < 640)
    z2[new_b] += 8.0
    z2[fled] -= 6.0
    after = pd.DataFrame({"pid": np.arange(n) + 10**6, "x": x, "y": y, "z": z2})
    return spark.createDataFrame(before), spark.createDataFrame(after), new_b.sum(), fled.sum()


def test_vcd_detects_planted_changes(spark, before_after):
    before, after, n_new, n_fled = before_after
    cfg = vcd.VcdConfig(ground_height=1.0, tolerance=15.0, min_points=10, resolution=20.0, knn_radius=30.0)
    clustered, summaries, prods = vcd.run_vcd(before, after, EXT, cfg)
    s = summaries.toPandas()
    # a sparse blob may legitimately split into >1 cluster at the chosen
    # tolerance — aggregate by status (New = raised, Fled = lowered)
    by_status = s.groupby("status").agg(n=("n_points", "sum"), dz=("mean_dz", "mean"))
    assert set(by_status.index) == {"New", "Fled"}
    assert abs(by_status.loc["New", "dz"] - 8.0) < 0.2
    assert abs(by_status.loc["Fled", "dz"] + 6.0) < 0.2
    # total clustered populations match the planted memberships
    assert abs(by_status.loc["New", "n"] - n_new) <= 3
    assert abs(by_status.loc["Fled", "n"] - n_fled) <= 3
    # footprint: union of hull areas ~ the 40x40 planted box
    assert 800 < s[s.status == "New"].area.sum() < 2000
    # product rasters cover the change cells
    assert prods["raised"].count() > 0 and prods["lowered"].count() > 0
    clustered.unpersist()


def test_convex_hull_matches_known():
    pts = np.array([[0, 0], [2, 0], [2, 2], [0, 2], [1, 1], [0.5, 0.5]])
    h = hull.convex_hull_2d(pts)
    assert len(h) == 4
    assert hull.polygon_area(h) == pytest.approx(4.0)


def test_vcd_config_validation():
    with pytest.raises(ValueError):
        vcd.VcdConfig(ground_height=0.0)
    with pytest.raises(ValueError):
        vcd.VcdConfig(min_points=0)
