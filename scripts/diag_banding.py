"""A/B the minhash banding pair-generation plans (interleaved, so host noise
phases hit both equally): OLD = sizes agg -> join back -> self-join on
(band,bkey) [3 shuffles of the banded frame], NEW = one groupBy collecting
the sorted member array + JVM pair explosion [_bucket_pairs, 1 shuffle].
Run at 1 and 4 cores (taskset outside) to see per-plan core scaling.

Usage: taskset -c 2-5 python scripts/diag_banding.py 4 [doc_rep]
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
    rep = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pyspark.sql import functions as F

    from codem_spark.operators import dedup
    from codem_spark.session import get_spark

    spark = get_spark(app_name=f"diagband_{cpus}", cpus=cpus)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    big = (
        docs.withColumn("r", F.explode(F.array(*[F.lit(i) for i in range(rep)])))
        .select(
            (F.col("doc_id") * rep + F.col("r")).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" v"), F.col("r").cast("string")).alias("text"),
        )
        .repartition(4 * cpus)
        .persist()
    )
    big.count()

    def banded_frame():
        keys = big.select(
            F.col("doc_id").alias("did"),
            dedup.minhash_band_keys_col(
                dedup.shingles_col(F.col("text"), 3), 64, 8
            ).alias("bkeys"),
        )
        return keys.select("did", F.posexplode("bkeys").alias("band", "bkey"))

    def old_plan():
        banded = banded_frame().persist()
        cap = 64
        sizes = banded.groupBy("band", "bkey").agg(
            F.count("*").alias("_bn"), F.min("did").alias("_bmin")
        )
        tagged = banded.join(sizes, ["band", "bkey"]).persist()
        small = tagged.filter(F.col("_bn") <= cap).select("band", "bkey", "did")
        a, b = small.alias("a"), small.alias("b")
        small_pairs = a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.did") < F.col("b.did")),
        ).select(F.col("a.did").alias("id_a"), F.col("b.did").alias("id_b"))
        big_pairs = tagged.filter(
            (F.col("_bn") > cap) & (F.col("did") != F.col("_bmin"))
        ).select(F.col("_bmin").alias("id_a"), F.col("did").alias("id_b"))
        n = small_pairs.unionByName(big_pairs).distinct().count()
        tagged.unpersist()
        banded.unpersist()
        return n

    def new_plan():
        return dedup._bucket_pairs(banded_frame(), cap=64).count()

    # warm both
    dedup.minhash_lsh_candidates(big.limit(3000), num_hashes=64, bands=8).count()
    times = {"old": [], "new": []}
    counts = {}
    for _ in range(3):
        for name, fn in (("old", old_plan), ("new", new_plan)):
            t0 = time.time()
            counts[name] = fn()
            times[name].append(round(time.time() - t0, 2))
    print(
        "DIAG "
        + json.dumps(
            {
                "cpus": cpus,
                "counts": counts,
                "best": {k: min(v) for k, v in times.items()},
                "all": times,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
