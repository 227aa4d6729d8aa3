"""The brute-force -> LSH descriptor-match capacity switch (reference
dsm.py:175-183): the LSH path must find essentially the same putative
matches as the broadcast brute-force path on the same keypoints."""

from __future__ import annotations

import numpy as np
import pandas as pd

from codem_spark.registration import coarse


def _kp_frame(spark, n, seed, jitter_bits=0):
    rng = np.random.default_rng(seed)
    d = rng.integers(-(2**62), 2**62, size=(n, 4), dtype=np.int64)
    pdf = pd.DataFrame(
        {
            "x": rng.uniform(0, 1000, n),
            "y": rng.uniform(0, 1000, n),
            "z": rng.uniform(0, 100, n),
            "d0": d[:, 0], "d1": d[:, 1], "d2": d[:, 2], "d3": d[:, 3],
        }
    )
    return pdf


def test_lsh_match_agrees_with_bruteforce(spark):
    fnd_pdf = _kp_frame(spark, 400, seed=3)
    # AOI descriptors = 200 foundation descriptors with a couple of bit flips
    rng = np.random.default_rng(4)
    idx = rng.choice(400, 200, replace=False)
    aoi_pdf = fnd_pdf.iloc[idx].reset_index(drop=True).copy()
    for lane in ("d0", "d1"):
        flips = np.int64(1) << rng.integers(0, 63, size=200)
        aoi_pdf[lane] = aoi_pdf[lane].to_numpy() ^ flips
    aoi_pdf["x"] = rng.uniform(0, 1000, 200)
    aoi_pdf["y"] = rng.uniform(0, 1000, 200)

    fnd = spark.createDataFrame(fnd_pdf)
    aoi = spark.createDataFrame(aoi_pdf)
    bf = coarse.match_features(fnd, aoi, lowes_ratio=0.8)  # capacity not hit
    lsh = coarse.match_features(fnd, aoi, lowes_ratio=0.8, capacity=10)  # force LSH
    # both must recover the planted correspondences (match rate high; LSH
    # recall may drop a handful)
    assert len(bf) >= 190
    assert len(lsh) >= 0.9 * len(bf)
    bfk = set(zip(bf.fx.round(6), bf.ax.round(6)))
    lshk = set(zip(lsh.fx.round(6), lsh.ax.round(6)))
    assert len(bfk & lshk) >= 0.9 * len(bfk)
