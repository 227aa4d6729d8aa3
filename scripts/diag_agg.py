"""Diagnose the tile_grid_agg 8->32 core regression (VERDICT r1 item 1).

Runs ONLY the agg stage of scripts/scaling.py in a fresh JVM per config,
with per-substage timings. Usage:
  python scripts/diag_agg.py --worker <cpus> <sf_dir> <gc> <heap>
  python scripts/diag_agg.py            # sweep
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def workload(cpus: int, sf_dir: str, gc: str, heap: str) -> dict:
    sys.path.insert(0, REPO)
    from pyspark.sql import functions as F

    from codem_spark.functions import cells, geo
    from codem_spark.operators import grid
    from codem_spark.session import get_spark

    os.environ["SPARK_GRAFT_DRIVER_MEM"] = heap
    gc_flag = {"parallel": "-XX:+UseParallelGC", "g1": "-XX:+UseG1GC"}[gc]
    spark = get_spark(
        app_name=f"diag_{cpus}_{gc}_{heap}", cpus=cpus, shuffle_partitions=2 * cpus,
        extra_conf={"spark.driver.extraJavaOptions": gc_flag},
    )
    ext = (0.0, 0.0, 100_000.0, 100_000.0)
    rep = 8
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    base = li.select((F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("pid0")).distinct()
    pts = (
        base.withColumn("r", F.explode(F.array(*[F.lit(i) for i in range(rep)])))
        .select((F.col("pid0") * rep + F.col("r")).alias("pid"))
        .repartition(4 * cpus)
        .withColumn("x", geo.id_lane_col(F.col("pid"), 0) * F.lit(ext[2]))
        .withColumn("y", geo.id_lane_col(F.col("pid"), 1) * F.lit(ext[3]))
        .withColumn("z", geo.id_lane_col(F.col("pid"), 2) * F.lit(100.0))
        .persist()
    )
    pts.count()
    warm = pts.filter(F.col("pid") % 16 == 3).persist()
    warm.count()
    grid.grid_max(warm, ext, 400.0).count()

    t: dict[str, float] = {}
    t0 = time.time()
    cell = cells.cell_encode_col(F.col("x"), F.col("y"), ext, 12)
    pts.select(cell.alias("c"), "z").groupBy("c").agg(F.max("z"), F.count("*")).count()
    t["morton12_agg"] = round(time.time() - t0, 2)
    for res in (100.0, 50.0, 200.0):
        t0 = time.time()
        grid.grid_max(pts, ext, res).count()
        t[f"grid_max_{int(res)}"] = round(time.time() - t0, 2)
    total = round(sum(t.values()), 2)
    spark.stop()
    return {"cpus": cpus, "gc": gc, "heap": heap, "timings": t, "total": total}


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        print("RESULT " + json.dumps(workload(int(sys.argv[2]), sys.argv[3], sys.argv[4], sys.argv[5])))
        return
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    configs = [
        (8, "parallel", "48g"),
        (32, "parallel", "48g"),
        (32, "g1", "48g"),
        (32, "parallel", "16g"),
        (32, "g1", "16g"),
        (8, "g1", "16g"),
    ]
    for cpus, gc, heap in configs:
        out = subprocess.run(
            ["taskset", "-c", f"0-{cpus - 1}", sys.executable,
             os.path.abspath(__file__), "--worker", str(cpus), sf_dir, gc, heap],
            capture_output=True, text=True, timeout=1200,
        )
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("RESULT ")]
        print(line[-1][7:] if line else f"FAIL {cpus} {gc} {heap}: {out.stderr[-500:]}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
