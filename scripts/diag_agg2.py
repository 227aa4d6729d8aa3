"""Round 2 of the agg-scaling diagnosis: G1 everywhere, sweep heap /
shuffle partitions / input partitions / data size at 8 vs 32 cores.
Usage: python scripts/diag_agg2.py [--worker cpus sf heap shuf inparts rep]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def workload(cpus: int, sf_dir: str, heap: str, shuf: int, inparts: int, rep: int) -> dict:
    sys.path.insert(0, REPO)
    from pyspark.sql import functions as F

    from codem_spark.functions import cells, geo
    from codem_spark.operators import grid
    from codem_spark.session import get_spark

    os.environ["SPARK_GRAFT_DRIVER_MEM"] = heap
    spark = get_spark(
        app_name=f"diag2_{cpus}", cpus=cpus, shuffle_partitions=shuf,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    ext = (0.0, 0.0, 100_000.0, 100_000.0)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    base = li.select((F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("pid0")).distinct()
    pts = (
        base.withColumn("r", F.explode(F.array(*[F.lit(i) for i in range(rep)])))
        .select((F.col("pid0") * rep + F.col("r")).alias("pid"))
        .repartition(inparts)
        .withColumn("x", geo.id_lane_col(F.col("pid"), 0) * F.lit(ext[2]))
        .withColumn("y", geo.id_lane_col(F.col("pid"), 1) * F.lit(ext[3]))
        .withColumn("z", geo.id_lane_col(F.col("pid"), 2) * F.lit(100.0))
        .persist()
    )
    n = pts.count()
    warm = pts.filter(F.col("pid") % 16 == 3)
    grid.grid_max(warm, ext, 400.0).count()

    t = {}
    t0 = time.time()
    cell = cells.cell_encode_col(F.col("x"), F.col("y"), ext, 12)
    pts.select(cell.alias("c"), "z").groupBy("c").agg(F.max("z"), F.count("*")).count()
    t["morton12"] = round(time.time() - t0, 2)
    t0 = time.time()
    for res in (100.0, 50.0, 200.0):
        grid.grid_max(pts, ext, res).count()
    t["grid_max3"] = round(time.time() - t0, 2)
    spark.stop()
    return {"cpus": cpus, "heap": heap, "shuf": shuf, "inparts": inparts,
            "rep": rep, "n": n, "timings": t, "total": round(sum(t.values()), 2)}


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        print("RESULT " + json.dumps(workload(
            int(sys.argv[2]), sys.argv[3], sys.argv[4],
            int(sys.argv[5]), int(sys.argv[6]), int(sys.argv[7]))))
        return
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # (cpus, heap, shuffle_partitions, input_partitions, rep)
    configs = [
        (8, "16g", 16, 64, 8),
        (32, "16g", 64, 64, 8),
        (32, "16g", 32, 64, 8),
        (32, "40g", 64, 128, 8),
        (32, "16g", 128, 128, 8),
        (8, "16g", 16, 64, 24),
        (32, "16g", 64, 128, 24),
        (32, "16g", 256, 128, 24),
    ]
    for cpus, heap, shuf, inparts, rep in configs:
        out = subprocess.run(
            ["taskset", "-c", f"0-{cpus - 1}", sys.executable,
             os.path.abspath(__file__), "--worker", str(cpus), sf_dir, heap,
             str(shuf), str(inparts), str(rep)],
            capture_output=True, text=True, timeout=1200,
        )
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("RESULT ")]
        print(line[-1][7:] if line else f"FAIL {cpus}: {out.stderr[-400:]}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
