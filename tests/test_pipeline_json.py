"""§2.6 declarative pipeline: the reference's PDAL JSON vocabulary drives
the engine's filters (reference tests/data/pipeline.json + PipelineReader,
preprocess.py:601-635)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from codem_spark.plans import pipeline_json as PJ

EXT = (0.0, 0.0, 100_000.0, 100_000.0)


@pytest.fixture(scope="module")
def cloud_path(spark, tmp_path_factory):
    from codem_spark import synth

    p = str(tmp_path_factory.mktemp("pj") / "pc.parquet")
    synth.point_cloud(spark, 20_000, EXT).write.mode("overwrite").parquet(p)
    return p


def test_reference_sample_pipeline_shape(spark, cloud_path):
    """The reference's tests/data/pipeline.json, with its LAS reader
    pointing at the engine's table format: reader -> expression filter ->
    writer (stripped)."""
    spec = {
        "pipeline": [
            {"filename": cloud_path, "type": "readers.las"},
            {"type": "filters.expression", "expression": "Intensity < 250"},
            {"type": "writers.gdal", "resolution": 1, "filename": "output.tif"},
        ]
    }
    df, writers = PJ.pipeline_from_json(spark, spec)
    n = df.count()
    manual = spark.read.parquet(cloud_path).filter(F.col("intensity") < 250).count()
    assert n == manual > 0
    assert writers == [spec["pipeline"][2]]  # stripped, not executed
    # the JSON-driven filter must still push down to the parquet scan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "intensity" in plan


def test_pipeline_accepts_json_string_and_file(spark, cloud_path, tmp_path):
    spec = json.dumps(
        {"pipeline": [cloud_path, {"type": "filters.range", "limits": "Classification![7:7]"}]}
    )
    df1, _ = PJ.pipeline_from_json(spark, spec)
    p = tmp_path / "pipe.json"
    p.write_text(spec)
    df2, _ = PJ.pipeline_from_json(spark, str(p))
    assert df1.count() == df2.count() > 0


def test_range_semantics_or_within_dim_and_across(spark, cloud_path):
    """PDAL: same-dimension conditions OR, different dimensions AND —
    Classification[1:2],Classification[6:6],ReturnNumber[1:1]."""
    spec = [
        cloud_path,
        {
            "type": "filters.range",
            "limits": "Classification[1:2],Classification[6:6],ReturnNumber[1:1]",
        },
    ]
    df, _ = PJ.pipeline_from_json(spark, spec)
    src = spark.read.parquet(cloud_path)
    manual = src.filter(
        (F.col("classification").isin([1, 2, 6])) & (F.col("return_number") == 1)
    ).count()
    assert df.count() == manual > 0


def test_range_negation_and_open_bounds(spark, cloud_path):
    df, _ = PJ.pipeline_from_json(
        spark, [cloud_path, {"type": "filters.range", "limits": "Z[50:],Classification![7:7]"}]
    )
    src = spark.read.parquet(cloud_path)
    manual = src.filter((F.col("z") >= 50) & ~((F.col("classification") >= 7) & (F.col("classification") <= 7))).count()
    assert df.count() == manual


def test_assign_and_crop_chain(spark, cloud_path):
    spec = [
        cloud_path,
        {"type": "filters.crop", "bounds": "([20000, 80000], [20000, 80000])"},
        {"type": "filters.assign", "assignment": "Classification[7:7]=1"},
        {"type": "filters.expression", "expression": "Classification != 9 && X < 60000"},
    ]
    df, _ = PJ.pipeline_from_json(spark, spec)
    pdf = df.toPandas()
    assert (pdf.x >= 20000).all() and (pdf.x < 60000).all()
    assert (pdf.y >= 20000).all() and (pdf.y < 80000).all()
    assert (pdf.classification != 7).all()  # reassigned to 1
    assert (pdf.classification != 9).all()  # filtered


def test_expression_translation():
    assert (
        PJ.translate_expression("Intensity < 250 && Classification != 7")
        == "intensity < 250  AND  classification != 7"
    )
    assert PJ.translate_expression("X == 5 || Y == 6") == "x = 5  OR  y = 6"


def test_reader_override_and_errors(spark, cloud_path):
    src = spark.read.parquet(cloud_path).limit(100)
    df, _ = PJ.pipeline_from_json(
        spark,
        [{"type": "filters.expression", "expression": "Z > 0"}],
        reader=src,
    )
    assert df.count() <= 100
    with pytest.raises(ValueError, match="reader"):
        PJ.pipeline_from_json(spark, [{"type": "filters.expression", "expression": "Z > 0"}])
    with pytest.raises(ValueError, match="unsupported filter stage"):
        PJ.pipeline_from_json(spark, [cloud_path, {"type": "filters.voxelgrid"}])


def test_smrf_stage_classifies_ground(spark):
    """filters.smrf through the JSON surface: planted flat terrain +
    buildings; ground points get Classification 2 (PDAL convention)."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(8)
    n = 15_000
    x = rng.uniform(0, 500, n)
    y = rng.uniform(0, 500, n)
    gx = np.floor(x / 100).astype(int)
    gy = np.floor(y / 100).astype(int)
    fx, fy = x - gx * 100, y - gy * 100
    bld = (fx > 30) & (fx < 70) & (fy > 30) & (fy < 70)
    z = 0.01 * x + np.where(bld, 12.0, 0.0)
    src = spark.createDataFrame(pd.DataFrame({"pid": np.arange(n), "x": x, "y": y, "z": z}))
    df, _ = PJ.pipeline_from_json(
        spark,
        [{"type": "filters.smrf", "cell": 4.0, "window": 60.0}],
        extent=(0.0, 0.0, 500.0, 500.0),
        reader=src,
    )
    pdf = df.toPandas()
    ground_frac_bld = (pdf.classification[bld[pdf.pid.values]] == 2).mean()
    ground_frac_terr = (pdf.classification[~bld[pdf.pid.values]] == 2).mean()
    assert ground_frac_bld < 0.15  # buildings not ground
    assert ground_frac_terr > 0.85  # terrain is ground


def test_cli_read_points_dispatch(spark, cloud_path, tmp_path):
    """The CLI's input dispatch (reference PipelineReader analog): .json
    pipeline specs and .ply meshes feed the same register/vcd path as
    parquet tables."""
    import numpy as np
    import pandas as pd

    from codem_spark.io import mesh as meshio
    from codem_spark.main import _read_points

    spec = {"pipeline": [cloud_path, {"type": "filters.range", "limits": "Z[50:]"}]}
    jp = tmp_path / "input.json"
    jp.write_text(json.dumps(spec))
    df = _read_points(spark, str(jp))
    assert df.columns == ["pid", "x", "y", "z"]
    manual = spark.read.parquet(cloud_path).filter(F.col("z") >= 50).count()
    assert df.count() == manual > 0

    ply = tmp_path / "input.ply"
    meshio.write_ply_ascii(
        pd.DataFrame({"x": np.arange(9.0), "y": np.arange(9.0), "z": np.ones(9)}),
        str(ply),
    )
    dfm = _read_points(spark, str(ply))
    assert dfm.count() == 9 and dfm.columns == ["pid", "x", "y", "z"]
