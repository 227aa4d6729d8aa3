"""Interleaved A/B of tile_grid_agg variants (noise phases hit all variants
equally). Run at 1 and 4 cores to measure per-variant scaling."""
from __future__ import annotations
import json, os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

def main():
    cpus = int(sys.argv[1]); rep = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pyspark.sql import functions as F
    from codem_spark.functions import cells, geo
    from codem_spark.operators import grid
    from codem_spark.session import get_spark
    spark = get_spark(app_name=f"diag4_{cpus}", cpus=cpus)
    ext = (0.0, 0.0, 100_000.0, 100_000.0)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    base = li.select((F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("pid0")).distinct()
    pts = (base.withColumn("r", F.explode(F.array(*[F.lit(i) for i in range(rep)])))
        .select((F.col("pid0") * rep + F.col("r")).alias("pid"))
        .repartition(4 * cpus)
        .withColumn("x", geo.id_lane_col(F.col("pid"), 0) * F.lit(ext[2]))
        .withColumn("y", geo.id_lane_col(F.col("pid"), 1) * F.lit(ext[3]))
        .withColumn("z", geo.id_lane_col(F.col("pid"), 2) * F.lit(100.0)).persist())
    n_pts = pts.count()
    level, coarsest = 12, 9
    shift = 2 * (level - coarsest)
    c = cells.cell_encode_col(F.col("x"), F.col("y"), ext, level)

    def make_pre():
        return pts.select(F.shiftright(c, shift).alias("_ck"), c.alias("cell"),
                          F.col("z").alias("z")).repartition(4 * cpus, "_ck")

    def v_union4():
        marker = F.lit(1).alias("one")
        u = pts.select(c.alias("cc"), "z").groupBy("cc").agg(
            F.max("z"), F.count("*")).select(marker)
        for res in (100.0, 50.0, 200.0):
            u = u.unionByName(grid.grid_max(pts, ext, res).select(marker))
        return u.count()

    def _cascade(cur):
        u = cur.select(F.lit(1).alias("one"))
        for _ in range(3):
            cur = cur.groupBy("_ck", F.shiftright("cell", 2).alias("cell")).agg(
                F.max("z_max").alias("z_max"), F.sum("n").alias("n"))
            u = u.unionByName(cur.select(F.lit(1).alias("one")))
        return u.count()

    def v_pyr_persist_pre():
        pre = make_pre().persist()
        try:
            cur = pre.groupBy("_ck", "cell").agg(F.max("z").alias("z_max"),
                                                 F.count("*").alias("n"))
            return _cascade(cur)
        finally:
            pre.unpersist()

    def v_pyr_persist_agg():
        cur = make_pre().groupBy("_ck", "cell").agg(
            F.max("z").alias("z_max"), F.count("*").alias("n")).persist()
        try:
            return _cascade(cur)
        finally:
            cur.unpersist()

    def v_explode_linear():
        pre = make_pre()
        cur = pre.groupBy("_ck", "cell").agg(F.max("z").alias("z_max"), F.count("*").alias("n"))
        pairs = F.array(*[F.struct(F.lit(lv).alias("level"),
                                   F.shiftright("cell", 2 * (level - lv)).alias("acell"))
                          for lv in range(level, coarsest - 1, -1)])
        res = (cur.select("_ck", F.explode(pairs).alias("p"), "z_max", "n")
               .groupBy("_ck", F.col("p.level").alias("level"), F.col("p.acell").alias("cell"))
               .agg(F.max("z_max").alias("z_max"), F.sum("n").alias("n")))
        return res.select(F.lit(1)).count()

    variants = {"union4": v_union4, "pyr_persist_pre": v_pyr_persist_pre,
                "pyr_persist_agg": v_pyr_persist_agg, "explode_linear": v_explode_linear}
    # warmup all code paths once
    for fn in variants.values():
        fn()
    times = {k: [] for k in variants}
    for _ in range(3):
        for k, fn in variants.items():
            t0 = time.time(); fn(); times[k].append(round(time.time() - t0, 3))
    out = {"cpus": cpus, "n_pts": n_pts,
           "best": {k: min(v) for k, v in times.items()}, "all": times}
    print("DIAG " + json.dumps(out))
    spark.stop()

if __name__ == "__main__":
    main()
