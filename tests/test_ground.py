"""SMRF-style ground segmentation: planted buildings on smooth terrain."""

from __future__ import annotations

import numpy as np
import pandas as pd


def test_smrf_flags_buildings(spark):
    from codem_spark.operators import ground

    rng = np.random.default_rng(31)
    n = 60_000
    x = rng.uniform(0, 1000, n)
    y = rng.uniform(0, 1000, n)
    terrain = 5 * np.sin(x / 150) * np.cos(y / 180) + 50
    z = terrain + rng.normal(0, 0.05, n)
    bmask = np.zeros(n, dtype=bool)
    for bx, by in [(200, 300), (600, 700), (800, 200)]:
        m = (x > bx) & (x < bx + 50) & (y > by) & (y < by + 50)
        z[m] += 12.0  # flat roofs 12 m above terrain
        bmask |= m
    df = spark.createDataFrame(pd.DataFrame({"pid": np.arange(n), "x": x, "y": y, "z": z}))
    out = ground.smrf_ground(df, (0, 0, 1000, 1000), resolution=4.0, max_window=60.0).toPandas()
    got = out.set_index("pid")
    roof_flagged = (~got.loc[bmask[got.index.values.astype(int)].nonzero()[0], "is_ground"]).mean() if False else None
    m = pd.Series(bmask, index=np.arange(n))
    merged = got.join(m.rename("is_roof"))
    # nearly all roof points non-ground; nearly all terrain points ground
    assert (~merged[merged.is_roof].is_ground).mean() > 0.9
    assert (merged[~merged.is_roof].is_ground).mean() > 0.9
    # height above ground ~12 m on roofs
    assert abs(merged[merged.is_roof].hag.median() - 12.0) < 2.0
