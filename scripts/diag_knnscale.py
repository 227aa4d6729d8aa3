"""kNN-join stage scaling: does wave imbalance at 16 tasks / 4 cores explain
the 3.15x ratio? Interleaved A/B over shuffle-partition counts."""
from __future__ import annotations
import json, os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

def main():
    cpus = int(sys.argv[1]); rep = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    parts_list = [int(p) for p in (sys.argv[3].split(",") if len(sys.argv) > 3 else ["16","32","64"])]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pyspark.sql import functions as F
    from codem_spark.functions import geo
    from codem_spark.operators import knn
    from codem_spark.session import get_spark
    spark = get_spark(app_name=f"diagknn_{cpus}", cpus=cpus)
    ext = (0.0, 0.0, 100_000.0, 100_000.0)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    base = li.select((F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("pid0")).distinct()
    pts = (base.withColumn("r", F.explode(F.array(*[F.lit(i) for i in range(rep)])))
        .select((F.col("pid0") * rep + F.col("r")).alias("pid"))
        .repartition(4 * cpus)
        .withColumn("x", geo.id_lane_col(F.col("pid"), 0) * F.lit(ext[2]))
        .withColumn("y", geo.id_lane_col(F.col("pid"), 1) * F.lit(ext[3]))
        .withColumn("z", geo.id_lane_col(F.col("pid"), 2) * F.lit(100.0)).persist())
    n = pts.count()
    a = pts.filter(F.col("pid") % 2 == 0)
    b = pts.filter(F.col("pid") % 2 == 1)
    warm = pts.filter(F.col("pid") % 16 == 3).persist(); warm.count()
    knn.knn_join(warm, warm, ext, radius=300.0, k=1, lid="pid", rid="pid").count()

    def run(parts):
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        t0 = time.time()
        knn.knn_join(a, b, ext, radius=300.0, k=1, lid="pid", rid="pid",
                     l_carry=("z",), r_carry=("z",)).count()
        return round(time.time() - t0, 3)

    times = {p: [] for p in parts_list}
    for _ in range(3):
        for p in parts_list:
            times[p].append(run(p))
    print("DIAG " + json.dumps({"cpus": cpus, "n": n,
        "best": {p: min(v) for p, v in times.items()}, "all": times}))
    spark.stop()

if __name__ == "__main__":
    main()
