"""Lineage manifests + checkpoint-resume semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from codem_spark.io import lineage, tables


def test_write_read_roundtrip(spark, tmp_path):
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    m = tables.write_table(df, str(tmp_path / "t1"), properties={"crs": "synthetic-utm"})
    assert m["row_count"] == 100
    back = tables.read_table(spark, str(tmp_path / "t1"))
    assert back.count() == 100
    assert tables.table_manifest(str(tmp_path / "t1"))["properties"]["crs"] == "synthetic-utm"


def test_cell_partitioned_write_prunes(spark, tmp_path):
    from codem_spark import synth

    pc = synth.point_cloud(spark, 2000)
    ext = (0.0, 0.0, 100_000.0, 100_000.0)
    tables.cell_partitioned_write(pc, str(tmp_path / "pts"), ext, level=3)
    back = tables.read_table(spark, str(tmp_path / "pts"))
    assert back.count() == 2000
    # partition column present -> a part_cell predicate prunes at scan
    one = back.filter(F.col("part_cell") == back.select("part_cell").first()[0])
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or one.count() > 0


def test_run_stage_resume_skips_recompute(spark, tmp_path):
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(50).withColumn("v", F.lit(1))

    run_dir = str(tmp_path / "run")
    a = lineage.run_stage(spark, run_dir, "s1", build, input_fingerprint="f1")
    assert a.count() == 50 and calls["n"] == 1
    b = lineage.run_stage(spark, run_dir, "s1", build, input_fingerprint="f1")
    assert b.count() == 50 and calls["n"] == 1  # resumed, not recomputed
    c = lineage.run_stage(spark, run_dir, "s1", build, input_fingerprint="f2")
    assert c.count() == 50 and calls["n"] == 2  # fingerprint changed -> rerun
    ms = lineage.run_manifest(run_dir)
    assert ms and ms[-1]["row_count"] == 50
    assert ms[-1]["n_partitions"] >= 1
    assert sum(p["rows"] for p in ms[-1]["partition_metrics"]) == 50


def test_run_stage_is_single_job(spark, tmp_path):
    """The north rule's lineage metrics must not tax the pipeline: one
    Spark job per stage (the write itself) — partition metrics come from
    parquet footers, not a second pass (VERDICT r3 'What's wrong' #3)."""
    sc = spark.sparkContext
    sc.setJobGroup("lineage_single_pass", "assert one job per stage")
    try:
        lineage.run_stage(
            spark,
            str(tmp_path / "run_sp"),
            "s1",
            lambda: spark.range(1000).withColumn("v", F.col("id") % 7),
            input_fingerprint="f1",
        )
    finally:
        sc.setJobGroup("other", "done")
    ids = sc.statusTracker().getJobIdsForGroup("lineage_single_pass")
    assert len(ids) == 1, f"run_stage ran {len(ids)} jobs, expected 1: {ids}"
    ms = lineage.run_manifest(str(tmp_path / "run_sp"))
    assert sum(p["rows"] for p in ms[-1]["partition_metrics"]) == 1000
    assert all("file" in p and p["bytes"] > 0 for p in ms[-1]["partition_metrics"])


def test_quantized_point_roundtrip(spark, tmp_path):
    """S9 (reference apply.py:343-353): scale/offset int quantization with
    manifest-carried parameters; roundtrip error bounded by scale/2."""
    import numpy as np
    import pandas as pd
    from codem_spark.io import tables

    rng = np.random.default_rng(9)
    pdf = pd.DataFrame(
        {
            "pid": np.arange(5000),
            "x": rng.uniform(500_000, 501_000, 5000),
            "y": rng.uniform(4_420_000, 4_421_000, 5000),
            "z": rng.uniform(1000, 1200, 5000),
        }
    )
    path = str(tmp_path / "quant_pts")
    m = tables.quantized_point_write(spark.createDataFrame(pdf), path)
    q = m["properties"]["point_quantization"]
    assert q["scales"]["x"] == 0.01 and q["offsets"]["x"] == 500_000.0
    # stored columns are integers
    raw = spark.read.parquet(path)
    assert dict(raw.dtypes)["x"] == "int"
    back = tables.quantized_point_read(spark, path).toPandas().sort_values("pid")
    for a in ("x", "y", "z"):
        err = np.abs(back[a].values - pdf.sort_values("pid")[a].values)
        assert err.max() <= 0.01 / 2 + 1e-9, a
    # explicit offsets/scales are honored
    path2 = str(tmp_path / "quant_pts2")
    m2 = tables.quantized_point_write(
        spark.createDataFrame(pdf), path2, offsets=(500_000, 4_420_000, 0), scales=(0.001, 0.001, 0.001)
    )
    back2 = tables.quantized_point_read(spark, path2).toPandas().sort_values("pid")
    assert np.abs(back2.z.values - pdf.sort_values("pid").z.values).max() <= 0.0005 + 1e-9


def test_quantized_write_int32_overflow_raises(spark, tmp_path):
    import numpy as np
    import pandas as pd

    from codem_spark.io import tables

    pdf = pd.DataFrame(
        {"pid": [0, 1], "x": [0.0, 1.0e9], "y": [0.0, 1.0], "z": [0.0, 1.0]}
    )
    # x range 1e9 at cm scale -> 1e11 quantized steps: far outside int32.
    # The write must refuse loudly instead of letting the cast wrap.
    with pytest.raises(ValueError, match="int32"):
        tables.quantized_point_write(
            spark.createDataFrame(pdf), str(tmp_path / "q_overflow")
        )


def test_dedup_stage_manifest_carries_hot_bucket_stats(spark, tmp_path):
    """VERDICT r3 item 8: a minhash dedup stage run under run_stage surfaces
    the hot-bucket truncation stats in its manifest — star-pair recall loss
    is measured, not assumed."""
    import pandas as pd

    from codem_spark.operators import dedup

    # 200 docs: 150 unique + one 50-member boilerplate cluster that lands in
    # a single hot bucket (cap=8 forces the star fallback)
    docs = pd.DataFrame({
        "doc_id": range(200),
        "text": [f"unique document number {i} with its own words" for i in range(150)]
        + ["identical boilerplate text shared by many pages"] * 50,
    })
    src = spark.createDataFrame(docs)

    run_dir = str(tmp_path / "run_dedup")
    lineage.run_stage(
        spark,
        run_dir,
        "minhash_cands",
        lambda: dedup.minhash_lsh_candidates(src, bucket_cap=8),
        input_fingerprint="d1",
    )
    ms = lineage.run_manifest(run_dir)
    hb = ms[-1]["metrics"]["hot_bucket_stats"]
    assert hb["bucket_cap"] == 8
    assert hb["hot_buckets"] >= 1  # the boilerplate cluster tripped the cap
    assert hb["hot_rows"] >= 50
