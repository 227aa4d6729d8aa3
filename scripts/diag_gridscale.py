"""Diagnose tile_grid_agg scaling (VERDICT r3 item 1).

Runs the grid-agg stage variants at a given core count, timing each
sub-piece separately, to attribute the 1->4 core scaling gap (2.37x
measured in BENCH_r03) to: AQE/job fixed latency, shuffle bandwidth,
or scan/agg CPU. Usage:
  taskset -c 2-2 python scripts/diag_gridscale.py 1
  taskset -c 2-5 python scripts/diag_gridscale.py 4
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    cpus = int(sys.argv[1])
    rep = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from codem_spark.functions import cells, geo
    from codem_spark.operators import grid
    from codem_spark.session import get_spark

    spark = get_spark(app_name=f"diag_grid_{cpus}", cpus=cpus)
    ext = (0.0, 0.0, 100_000.0, 100_000.0)

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
    n_pts = pts.count()
    out: dict[str, float] = {"cpus": cpus, "n_pts": n_pts}

    # warm
    grid.grid_max(pts.limit(50000), ext, 400.0).count()

    def t(name, fn, n=2):
        best = None
        for _ in range(n):
            t0 = time.time()
            r = fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
        return r

    # A: the r3 workload stage exactly (union of 4 marker-aggs, one count)
    def stage_union():
        cell = cells.cell_encode_col(F.col("x"), F.col("y"), ext, 12)
        marker = F.lit(1).alias("one")
        u = pts.select(cell.alias("c"), "z").groupBy("c").agg(
            F.max("z"), F.count("*")
        ).select(marker)
        for res in (100.0, 50.0, 200.0):
            u = u.unionByName(grid.grid_max(pts, ext, res).select(marker))
        return u.count()

    t("union_all4", stage_union)

    # B: each aggregation alone (separate jobs)
    def cell12():
        cell = cells.cell_encode_col(F.col("x"), F.col("y"), ext, 12)
        return pts.select(cell.alias("c"), "z").groupBy("c").agg(
            F.max("z"), F.count("*")).select(F.lit(1)).count()

    t("cell12_alone", cell12)
    for res in (100.0, 50.0, 200.0):
        t(f"grid{int(res)}_alone", lambda r=res: grid.grid_max(pts, ext, r).select(F.lit(1)).count())

    # C: scan+expr only, no shuffle (partial agg collapses to per-partition row)
    def scan_only():
        cell = cells.cell_encode_col(F.col("x"), F.col("y"), ext, 12)
        return pts.select(cell.alias("c"), "z").groupBy(
            F.spark_partition_id()).agg(F.max("c"), F.max("z")).count()

    t("scan_noshuffle", scan_only)

    # D: pyramid — level-12 agg then rollup 11,10,9 by 2-bit shifts
    def pyramid():
        cell = cells.cell_encode_col(F.col("x"), F.col("y"), ext, 12)
        fine = pts.select(cell.alias("c"), "z").groupBy("c").agg(
            F.max("z").alias("z"), F.count("*").alias("n"))
        u = fine.select(F.lit(1).alias("one"))
        cur = fine
        for _ in range(3):
            cur = cur.select(F.shiftright("c", 2).alias("c"), "z", "n").groupBy("c").agg(
                F.max("z").alias("z"), F.sum("n").alias("n"))
            u = u.unionByName(cur.select(F.lit(1).alias("one")))
        return u.count()

    t("pyramid", pyramid)

    # E: single-shuffle tile-local pyramid via applyInPandas over coarse tiles
    import numpy as np
    import pandas as pd

    def tile_pyramid():
        lvl, coarse = 12, 7
        size = cells.cell_size(ext, lvl)
        n1 = 1 << lvl

        def kern(pdf: pd.DataFrame) -> pd.DataFrame:
            cid = cells.cell_encode_np(
                pdf["x"].to_numpy(), pdf["y"].to_numpy(), ext, lvl)
            z = pdf["z"].to_numpy()
            outs = []
            for lv in (12, 11, 10, 9):
                u, inv = np.unique(cid, return_inverse=True)
                mx = np.full(len(u), -np.inf)
                np.maximum.at(mx, inv, z)
                outs.append(pd.DataFrame({"level": lv, "c": u, "z": mx}))
                z = mx
                cid = u >> 2
            return pd.concat(outs)

        c7 = cells.cell_encode_col(F.col("x"), F.col("y"), ext, coarse)
        res = pts.withColumn("t", c7).groupBy("t").applyInPandas(
            kern, "level int, c long, z double")
        return res.select(F.lit(1)).count()

    t("tile_pyramid_kernel", tile_pyramid)

    print("DIAG " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
