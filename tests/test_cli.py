"""CLI entry point (reference ``codem fnd aoi`` / ``vcd before after``,
src/codem/main.py:182-396, src/vcd/main.py:351-360): artifacts + resume."""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd
import pytest

from codem_spark import main as cli
from tests.test_registration import _surface


@pytest.fixture(scope="module")
def scene(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    rng = np.random.default_rng(17)
    n = 40_000
    x = rng.uniform(0, 1000, n)
    y = rng.uniform(0, 1000, n)
    z = _surface(x, y) + rng.normal(0, 0.05, n)
    fnd = pd.DataFrame({"pid": np.arange(n), "x": x, "y": y, "z": z})
    m = (x > 200) & (x < 800) & (y > 200) & (y < 800)
    aoi = fnd[m].copy()
    aoi["x"] += 10.0
    aoi["z"] += 1.5
    fnd_p = str(root / "fnd.parquet")
    aoi_p = str(root / "aoi.parquet")
    spark.createDataFrame(fnd).write.parquet(fnd_p)
    spark.createDataFrame(aoi).write.parquet(aoi_p)
    return root, fnd_p, aoi_p


def test_cli_register_writes_artifacts_and_resumes(spark, scene):
    root, fnd_p, aoi_p = scene
    out_dir = str(root / "run1")
    rc = cli.main(
        ["register", fnd_p, aoi_p, "--output-dir", out_dir,
         "--min-resolution", "4.0", "--resolution", "4.0", "--icp-max-iter", "10"],
        spark=spark,
    )
    assert rc == 0
    assert os.path.exists(os.path.join(out_dir, "config.json"))
    with open(os.path.join(out_dir, "registration.json")) as fh:
        rec = json.load(fh)
    # the planted shift is (+10, 0, +1.5): the fine transform must undo it
    assert rec["fine"]["trans_x"] == pytest.approx(-10.0, abs=1.0)
    assert rec["fine"]["trans_z"] == pytest.approx(-1.5, abs=0.5)
    assert os.path.isdir(os.path.join(out_dir, "registered_aoi"))
    # resume: a second invocation must skip the solve (fast, same record)
    t0 = time.time()
    rc = cli.main(
        ["register", fnd_p, aoi_p, "--output-dir", out_dir,
         "--min-resolution", "4.0", "--resolution", "4.0", "--icp-max-iter", "10"],
        spark=spark,
    )
    assert rc == 0
    assert time.time() - t0 < 10.0


def test_cli_vcd_writes_products(spark, scene):
    root, fnd_p, aoi_p = scene
    out_dir = str(root / "vcd1")
    rc = cli.main(
        ["vcd", fnd_p, aoi_p, "--output-dir", out_dir,
         "--ground-height", "1.0", "--tolerance", "25.0",
         "--min-points", "5", "--resolution", "20.0", "--knn-radius", "30.0"],
        spark=spark,
    )
    assert rc == 0
    for stage in ("clustered", "summaries", "product_raised", "product_lowered", "product_all"):
        assert os.path.isdir(os.path.join(out_dir, stage)), stage
    manifests = [f for f in os.listdir(out_dir) if f.startswith("stage_")]
    assert len(manifests) == 5
