"""Similarity search over embedding columns (array<float>).

Engine-new operators for the training-data tier: brute-force cosine top-k as
the correctness baseline, and an LSH-bucketed (random-hyperplane) variant as
the 100 TB scale path — the same adaptive brute-force/LSH switch the
reference applies to descriptor matching (dsm.py:175-187: BF under 2^17
rows, LSH above).

Dot products run through ``F.aggregate``/``F.zip_with`` (JVM, codegen) for
the SQL-checkable path; batch matmul in a pandas UDF is used by the bulk
(all-pairs) variant where the quadratic term dominates and BLAS wins.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot_col(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_col(a: Column, b: Column) -> Column:
    return dot_col(a, b) / (norm_col(a) * norm_col(b) + F.lit(1e-30))


def cosine_topk_bruteforce(
    queries: DataFrame,
    data: DataFrame,
    k: int = 10,
    qid: str = "vec_id",
    did: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine: broadcast-join all pairs (query side small or
    chunked), rank with a window. Deterministic: ties break by data id.
    Output: (q_id, d_id, cos_sim, rank)."""
    # norms hoisted out of the pair stage: computing norm_col per PAIR
    # evaluated two 64-element array folds for every (q, d) combination;
    # per-row norms are the identical float values (same fold, same input)
    # so dot/(qn*dn + eps) is bit-for-bit the old cosine_col result at a
    # third of the pair-stage expression work (guide §1.2 per-task work)
    q = queries.select(
        F.col(qid).alias("q_id"), F.col(vec).alias("q_vec"),
        norm_col(F.col(vec)).alias("_qn"),
    )
    d = data.select(
        F.col(did).alias("d_id"), F.col(vec).alias("d_vec"),
        norm_col(F.col(vec)).alias("_dn"),
    )
    pairs = q.join(F.broadcast(d), F.col("q_id") != F.col("d_id"))
    sim = dot_col(F.col("q_vec"), F.col("d_vec")) / (
        F.col("_qn") * F.col("_dn") + F.lit(1e-30)
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("d_id"))
    return (
        pairs.select("q_id", "d_id", F.round(sim, 6).alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# Broadcast-side row cap for the matmul path — the same 2^17 brute-force /
# LSH switch point the reference uses for descriptor matching
# (dsm.py:175-183) and the engine uses for keypoints (coarse.py
# BF_MATCH_CAPACITY). Above it, an uncapped driver collect of the data side
# is the classic 10^8-embedding driver OOM, so we fall through to the
# bucketed LSH path instead.
MATMUL_BROADCAST_CAP = 1 << 17


def cosine_topk_matmul(
    queries: DataFrame,
    data: DataFrame,
    k: int = 10,
    qid: str = "vec_id",
    did: str = "vec_id",
    vec: str = "embedding",
    cap: int = MATMUL_BROADCAST_CAP,
    lsh_kwargs: dict | None = None,
) -> DataFrame:
    """Exact top-k via per-partition BLAS matmul against a broadcast,
    pre-normalized data matrix — the throughput path when data fits in one
    broadcast (same role as the reference's brute-force Hamming matmul,
    dsm.py:185-187). Queries stream through mapInPandas in Arrow batches.

    The data side is collected to the driver ONLY after a row-cap probe
    (``limit(cap+1).count()`` — no full scan): above ``cap`` rows the call
    falls through to :func:`cosine_topk_lsh` (approximate, bucketed — the
    scale path), mirroring the reference's BF/LSH capacity switch."""
    over_cap = data.limit(cap + 1).count() > cap
    if over_cap:
        # ADVICE r3: an empty data side can't reach here (count==0 <= cap),
        # but a head() on a just-over-cap frame could race a concurrently
        # shrinking source — guard dim=0 explicitly, and make the silent
        # exact->approximate switch visible in the logs.
        first = data.select(vec).head()
        qt = {f.name: f.dataType.simpleString() for f in queries.schema.fields}[qid]
        empty_schema = f"q_id {qt}, d_id {qt}, cos_sim double, rank int"
        if first is None:
            return queries.sparkSession.createDataFrame([], empty_schema)
        dim = len(first[0])
        import warnings

        warnings.warn(
            f"cosine_topk_matmul: data side exceeds cap={cap} rows — falling "
            "through to the approximate bucketed LSH path (cosine_topk_lsh)",
            stacklevel=2,
        )
        kw = dict(n_planes=8, n_tables=8)
        kw.update(lsh_kwargs or {})
        return cosine_topk_lsh(
            queries, data, dim=dim, k=k, qid=qid, did=did, vec=vec, **kw
        )
    d_pdf = data.select(did, vec).toPandas()
    if len(d_pdf) == 0:
        # empty data side: empty result with the contract schema instead of
        # an obscure downstream vstack failure (ADVICE r3)
        qt = {f.name: f.dataType.simpleString() for f in queries.schema.fields}[qid]
        return queries.sparkSession.createDataFrame(
            [], f"q_id {qt}, d_id {qt}, cos_sim double, rank int"
        )
    assert len(d_pdf) <= cap  # probe above guarantees this
    d_ids = d_pdf[did].to_numpy()
    dmat = np.vstack(d_pdf[vec].to_numpy()).astype(np.float64)
    dmat /= np.linalg.norm(dmat, axis=1, keepdims=True) + 1e-30
    sc = queries.sparkSession.sparkContext
    bc = sc.broadcast((d_ids, dmat))

    def batches(it):
        d_ids_, dmat_ = bc.value
        for pdf in it:
            if len(pdf) == 0:
                continue
            qmat = np.vstack(pdf[vec].to_numpy()).astype(np.float64)
            qmat /= np.linalg.norm(qmat, axis=1, keepdims=True) + 1e-30
            sims = qmat @ dmat_.T  # (Q, D)
            qids_ = pdf[qid].to_numpy()
            same = qids_[:, None] == d_ids_[None, :]
            sims[same] = -np.inf
            kk = min(k, sims.shape[1] - 1)
            cand = min(sims.shape[1], kk + 8)
            part = np.argpartition(-sims, cand - 1, axis=1)[:, :cand]
            rows = np.arange(len(qmat))[:, None]
            simc = sims[rows, part]
            order = np.lexsort((d_ids_[part], -simc), axis=1)[:, :kk]
            sel = part[rows[:, :kk], order]
            yield pd.DataFrame(
                {
                    "q_id": np.repeat(qids_, kk),
                    "d_id": d_ids_[sel].ravel(),
                    "cos_sim": np.round(sims[rows[:, :kk], sel].ravel(), 6),
                    "rank": np.tile(np.arange(1, kk + 1), len(qmat)),
                }
            )

    qt = {f.name: f.dataType.simpleString() for f in queries.schema.fields}[qid]
    return queries.select(qid, vec).mapInPandas(
        batches, schema=f"q_id {qt}, d_id {qt}, cos_sim double, rank int"
    )


def lsh_bucket_col(vec: Column, dim: int, n_planes: int = 16, seed: int = 13) -> Column:
    """Random-hyperplane LSH bucket id: sign pattern of n_planes fixed
    (deterministically generated) hyperplanes — a JVM expression: each plane
    is a literal array; dot via zip_with/aggregate; bits packed into a long."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    bucket = F.lit(0).cast("long")
    for i in range(n_planes):
        plane = F.array(*[F.lit(float(v)) for v in planes[i]])
        d = dot_col(vec, plane)
        bucket = bucket + F.when(d > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
    return bucket


def lsh_buckets_udf_col(
    vec: Column, dim: int, n_planes: int, n_tables: int, seed: int = 13
) -> Column:
    """All ``n_tables`` bucket ids in ONE Arrow pass: batch matmul against
    the full (n_tables*n_planes, dim) plane matrix held in the UDF closure.
    The scale path for high-dim embeddings — the JVM expression variant
    (lsh_bucket_col) unrolls dim*n_planes*n_tables literals into the plan,
    which bloats codegen past ~dim 64. Plane generation is identical to
    lsh_bucket_col (same per-table seeds), so bucket ids agree up to
    floating-point sign ties on near-zero projections."""
    mats = [
        np.random.default_rng(seed + 101 * t).standard_normal((n_planes, dim))
        for t in range(n_tables)
    ]
    allplanes = np.vstack(mats)  # (T*P, dim)
    weights = (1 << np.arange(n_planes)).astype(np.int64)

    @F.pandas_udf("array<long>")
    def bk(s: pd.Series) -> pd.Series:
        if len(s) == 0:
            return pd.Series([], dtype=object)
        m = np.vstack([np.asarray(v, dtype=np.float64) for v in s])
        proj = m @ allplanes.T  # (N, T*P)
        bits = (proj > 0).reshape(len(m), n_tables, n_planes)
        buckets = (bits * weights[None, None, :]).sum(axis=2, dtype=np.int64)
        return pd.Series(list(buckets))

    return bk(vec)


def cosine_topk_lsh(
    queries: DataFrame,
    data: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 8,
    qid: str = "vec_id",
    did: str = "vec_id",
    vec: str = "embedding",
    impl: str = "auto",
) -> DataFrame:
    """Approximate top-k: multi-table random-hyperplane LSH. Both sides are
    bucketed under ``n_tables`` independent plane sets; candidates = union of
    per-table bucket collisions (the shuffle is keyed by (table, bucket) —
    the IVF-style 100 TB path); exact cosine re-rank on the candidates.
    Recall rises with n_tables, cost with n_tables / 2^n_planes.

    impl: "expr" = JVM literal-plane expressions (whole-stage codegen; fine
    to ~dim 64), "udf" = one Arrow matmul pass (high-dim scale path),
    "auto" = switch on total plane-literal count."""
    pairs = lsh_candidate_pairs(
        queries, data, dim, n_planes, n_tables, qid=qid, did=did, vec=vec, impl=impl
    )
    sim = cosine_col(F.col("q_vec"), F.col("d_vec"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("d_id"))
    return (
        pairs.select("q_id", "d_id", F.round(sim, 6).alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def lsh_candidate_pairs(
    queries: DataFrame,
    data: DataFrame,
    dim: int,
    n_planes: int = 8,
    n_tables: int = 8,
    qid: str = "vec_id",
    did: str = "vec_id",
    vec: str = "embedding",
    impl: str = "auto",
) -> DataFrame:
    """Multi-table LSH bucket-collision candidate pairs
    (q_id, q_vec, d_id, d_vec), deduplicated across tables — the shared
    shuffle core of :func:`cosine_topk_lsh` and
    :func:`embedding_cosine_dedup`. Shuffle is keyed by (table, bucket)."""
    if impl == "auto":
        # measured at dim=64, 6 planes x 8 tables (3072 literals): the expr
        # path spends ~20-40 s in analysis/codegen of the unrolled literal
        # trees before any data moves — the one-Arrow-matmul-pass UDF path
        # wins well below the old 4096 cutoff
        impl = "udf" if dim * n_planes * n_tables > 1024 else "expr"

    def bucketize(df: DataFrame, id_alias: str, vec_alias: str) -> DataFrame:
        src_id = qid if id_alias == "q_id" else did
        if impl == "udf":
            b = df.select(
                F.col(src_id).alias(id_alias),
                F.col(vec).alias(vec_alias),
                lsh_buckets_udf_col(F.col(vec), dim, n_planes, n_tables).alias("_bks"),
            )
            return b.select(
                id_alias, vec_alias, F.posexplode("_bks").alias("tbl", "bucket")
            )
        tbl = F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"),
                        lsh_bucket_col(F.col(vec), dim, n_planes, seed=13 + 101 * t).alias("bucket"),
                    )
                    for t in range(n_tables)
                ]
            )
        )
        return df.select(
            F.col(src_id).alias(id_alias),
            F.col(vec).alias(vec_alias),
            tbl.alias("tb"),
        ).select(id_alias, vec_alias, F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket"))

    qb = bucketize(queries, "q_id", "q_vec")
    db = bucketize(data, "d_id", "d_vec")
    return (
        qb.join(db, ["tbl", "bucket"])
        .filter(F.col("q_id") != F.col("d_id"))
        .select("q_id", "q_vec", "d_id", "d_vec")
        .dropDuplicates(["q_id", "d_id"])
    )


def embedding_cosine_dedup(
    df: DataFrame,
    dim: int,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec: str = "embedding",
    n_planes: int = 6,
    n_tables: int = 8,
    impl: str = "auto",
    bucket_cap: int | None = 64,
) -> DataFrame:
    """Embedding-cosine near-duplicate removal — the dedup-family member
    over an embedding column: one bucketize pass (all ``n_tables`` LSH
    buckets per vector), candidate pairs through the SAME hot-bucket-guarded
    machinery as minhash banding (``dedup._bucket_pairs``: buckets over
    ``bucket_cap`` emit O(m) star pairs vs the bucket-min representative —
    the correct guard when a 10^12-row corpus has million-member duplicate
    clusters, whose members all verify against the representative and drop,
    which is the dedup contract), exact cosine verify at ``threshold``,
    drop the higher id of each confirmed pair. Near-identical vectors
    (angle ~0) collide in some table with probability
    ~1 - (angle/pi * n_planes)^n_tables ~ 1, so recall at dedup-grade
    thresholds is not the recall of top-k search."""
    from codem_spark.operators.dedup import _bucket_pairs

    if impl == "auto":
        impl = "udf" if dim * n_planes * n_tables > 1024 else "expr"
    if impl == "udf":
        b = df.select(
            F.col(id_col).alias("did"),
            lsh_buckets_udf_col(F.col(vec), dim, n_planes, n_tables).alias("_bks"),
        )
        banded = b.select("did", F.posexplode("_bks").alias("band", "bkey"))
    else:
        tbl = F.array(
            *[
                F.struct(
                    F.lit(t).alias("band"),
                    lsh_bucket_col(F.col(vec), dim, n_planes, seed=13 + 101 * t).alias("bkey"),
                )
                for t in range(n_tables)
            ]
        )
        banded = df.select(F.col(id_col).alias("did"), F.explode(tbl).alias("b")).select(
            "did", F.col("b.band").alias("band"), F.col("b.bkey").alias("bkey")
        )
    pairs = _bucket_pairs(banded, cap=bucket_cap)
    va = df.select(F.col(id_col).alias("id_a"), F.col(vec).alias("_va"))
    vb = df.select(F.col(id_col).alias("id_b"), F.col(vec).alias("_vb"))
    sim = cosine_col(F.col("_va"), F.col("_vb"))
    dup = (
        pairs.join(va, "id_a")
        .join(vb, "id_b")
        .filter(sim >= F.lit(threshold))
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    from codem_spark.operators.dedup import carry_probe

    return carry_probe(pairs, df.join(dup, id_col, "left_anti"))
