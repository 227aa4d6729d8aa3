"""Small plan utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def rebalance(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure scan-side parallelism before heavy per-row work.

    At 100 TB the scan has thousands of input splits and this no-ops; tiny
    demo files arrive as ONE split and every narrow stage downstream would
    run single-threaded (observed: 8 s -> 1.3 s on a 5000-doc shingle stage
    at local[32]). Only repartitions when the current partition count is
    below the session's default parallelism — the shuffle it introduces is
    then trivially small by construction.

    Plan-aware short-circuit (guide §2.4/§7.2): if the physical plan already
    contains an Exchange, downstream stages run at spark.sql.shuffle
    .partitions (>= parallelism in this engine's sessions), so rebalancing
    is a no-op BY CONSTRUCTION — and probing ``df.rdd.getNumPartitions()``
    on such a plan is far from free: with AQE enabled, materializing the
    RDD eagerly EXECUTES every shuffle stage of the query just to learn the
    partition count, and that work is thrown away and repeated by the real
    action (measured: ~0.3-0.5 s per bench query at sf0.1, one redundant
    scan+shuffle each for every _points()-derived query). Only exchange-free
    (narrow, scan-rooted) plans fall through to the RDD probe, where
    materialization is free because there is no stage to execute.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
        if "Exchange" in plan:
            return df
    except Exception:
        pass  # fall through to the RDD probe on any introspection failure
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def approx_row_count(df: DataFrame, row_width_floor: int = 16) -> int:
    """Cheap row-count ESTIMATE from Catalyst plan statistics — no job.

    For parallelism knobs only (tile-level selection in knn.auto_level and
    friends), where being a factor of a few off changes nothing but task
    granularity: an exact ``df.count()`` there costs a full scan+shuffle
    execution per call (measured: 2 count jobs = ~0.7 s of the 3.3 s
    tin_resample query at sf0.1). Uses the optimizer's rowCount when
    statistics provide it, else sizeInBytes divided by the schema's fixed
    width (variable-width columns make this an overestimate, which errs
    toward MORE tiles — bounded by the radius rule, so always correct)."""
    try:
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        rc = stats.rowCount()
        if rc.isDefined():
            return int(rc.get().longValue())
        size = int(stats.sizeInBytes())
        width = max(row_width_floor, sum(
            8 if f.dataType.simpleString() in ("double", "bigint", "long") else 4
            for f in df.schema.fields
        ))
        return max(1, size // width)
    except Exception:
        return df.count()
