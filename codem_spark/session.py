"""SparkSession factory tuned for the engine.

Local mode is the test bed; the same settings (AQE, Arrow, explicit shuffle
partitions) are what we would submit with ``spark-submit --py-files`` on a
real cluster. ``SPARK_GRAFT_CPUS`` selects parallelism so the N vs 4N
scaling-efficiency evidence (BASELINE.md) runs the identical code path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _use_shm_shuffle(shm: str = "/dev/shm", min_free_bytes: int = 16 << 30) -> bool:
    flag = os.environ.get("SPARK_GRAFT_SHM_SHUFFLE", "").strip().lower()
    if flag in ("1", "true", "yes"):
        return True
    if flag in ("0", "false", "no"):
        return False
    if not (os.path.isdir(shm) and os.access(shm, os.W_OK)):
        return False
    try:
        st = os.statvfs(shm)
    except OSError:
        return False
    return st.f_bavail * st.f_frsize >= min_free_bytes


def get_spark(
    app_name: str = "codem_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    shuffle_partitions defaults to 4x cores: cogroup kernel stages (kNN,
    normals, clustering) have expensive Python work per task, and with only
    ~1-2 waves of tasks the last wave strands most of the cluster (measured:
    a 23-task kernel stage on 16 cores ran 44 s with the second wave using
    7/16 slots — wave imbalance, not skew). ~4 waves bounds that loss at
    ~1/8. The AQE advisory size below keeps coalescing from undoing this
    for kernel stages while still collapsing genuinely tiny shuffles.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    if shuffle_partitions is None:
        shuffle_partitions = max(16, 4 * cpus)

    # One BLAS thread per Python worker: N workers x M BLAS threads
    # oversubscribes the box quadratically (batched eigh/matmul kernels);
    # parallelism comes from Spark tasks, not from nested BLAS pools.
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    # Keep glibc from mmap/munmap-cycling large numpy temporaries: by
    # default every allocation > 128 KB is a fresh mmap whose pages are
    # returned to the OS on free, so each kernel iteration re-faults its
    # temps — and page faults both serialize under concurrency and are
    # pathologically slow on this host's virtual-memory backend (measured:
    # a 4-process numpy streaming loop 13.9 s -> 2.75 s with the thresholds
    # raised). Raising the thresholds keeps big chunks on the reusable
    # heap; cost is only idle-RSS, safe on real executors too.
    _malloc_tuning = {
        "MALLOC_MMAP_THRESHOLD_": str(1 << 30),
        "MALLOC_TRIM_THRESHOLD_": str(1 << 30),
    }
    for var, val in _malloc_tuning.items():
        os.environ.setdefault(var, val)

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        # AQE partition coalescing targets BYTES, but the engine's cogroup
        # kernel stages cost Python CPU per row, not bytes: a few-MB shuffle
        # carries tens of seconds of kernel work, and coalescing it to ~1
        # wave of tasks strands most cores (measured: normals stage 47 s ->
        # 30 s at local[16] with coalescing off). Skew-join stays on.
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # local mode: the driver heap IS the executor heap. Measured on the
        # scaling workload (scripts/diag_agg.py): a 48g heap with ParallelGC
        # made a pure-JVM hash agg 8x SLOWER at local[32] than local[8]
        # (GC threads x huge young gen thrash); G1 (the JVM default) with a
        # heap sized to the task-thread count is uniformly fastest. ~1 GiB
        # per task thread + 8 GiB base fits every sf0.1 stage with headroom.
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", f"{min(8 + cpus, 40)}g"),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    # Shuffle spill dir on tmpfs — GATED: this host's virtual disk serializes
    # under concurrent shuffle writers (measured: the same 40M-row
    # repartition took 7.8 s at local[8] but 30.7 s at local[32] on /tmp, and
    # 5.9 s on /dev/shm) — with the default dir, every shuffle-heavy stage
    # ANTI-scales with cores. But tmpfs is RAM-backed: a shuffle larger than
    # its free space dies with ENOSPC, so this must NOT be a blanket library
    # default. Policy: SPARK_GRAFT_SHM_SHUFFLE=1 forces on, =0 forces off;
    # unset = auto, on only with >=16 GiB free on /dev/shm (~100x any sf0.1
    # stage's shuffle). On a real cluster keep the default (local SSD /
    # YARN local dirs) and leave this off.
    if _use_shm_shuffle():
        builder = builder.config("spark.local.dir", "/dev/shm/spark-local")
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        builder = builder.config(f"spark.executorEnv.{var}", "1")
    for var, val in _malloc_tuning.items():
        builder = builder.config(f"spark.executorEnv.{var}", os.environ.get(var, val))
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
