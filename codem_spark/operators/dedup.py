"""Deduplication family for web-scale training-data pipelines.

No reference analog (CODEM is geometry-only) — these are the engine-new
operators the 100 TB webtext use case demands. All hot paths are JVM column
expressions (xxhash64 / transform / aggregate over arrays); the only
shuffles are the final groupBys on hash keys, which AQE skew-splits.

Scale notes:
* exact: one hash-agg — map-side combine makes the shuffle one row per
  distinct digest per partition.
* minhash-LSH: signatures are computed scan-side (no shuffle); the only
  shuffle is groupBy(band_key), whose fan-out is n_bands rows per doc;
  candidate pairs then verify jaccard with a JVM array intersect.
* simhash: 64-bit fingerprint scan-side; near-dup = equality on rotated
  band keys (here: 4x16-bit bands via bit slicing).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from codem_spark.functions.text import normalized_text_col
from codem_spark.util import rebalance

# -------------------------------------------------------------- exact dedup
def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id row per exact (normalized) text digest."""
    d = df.withColumn("_digest", F.sha2(normalized_text_col(F.col(text_col)), 256))
    w = Window.partitionBy("_digest").orderBy(F.col(id_col))
    return d.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop(
        "_digest", "_rn"
    )


def exact_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Digest -> group size + representative id (the SQL-checkable face of
    exact dedup)."""
    d = rebalance(df).select(
        F.col(id_col), F.sha2(normalized_text_col(F.col(text_col)), 256).alias("digest")
    )
    return d.groupBy("digest").agg(
        F.count("*").alias("n_dups"), F.min(id_col).alias("keep_id")
    )


# ----------------------------------------------------------------- shingles
# Two-stage shingle hashing. Stage 1 (JVM): one xxhash64 per TOKEN — a
# single-pass transform. Stage 2 (Arrow UDF): n-gram window combine +
# per-row distinct in batched numpy. Both obvious all-JVM forms are
# pathological: transform(i -> xxhash64(concat_ws(slice(...)))) re-slices
# strings per window (measured 1.2 ms/doc), and element_at(th, i+j) inside
# a transform re-evaluates the whole token-hash array per element in
# interpreted mode (O(tokens^2) — observed as a single task pinning a core
# for minutes on 100k docs).
_SH_P = (1 << 31) - 1
_SH_COEF = (1_000_003, 999_979, 31_337, 7_368_787, 2_750_159)


def token_hashes_col(text_col: Column) -> Column:
    """Per-token 31-bit hashes of the normalized text — pure JVM, one pass."""
    toks = F.split(normalized_text_col(text_col), " ")
    return F.transform(toks, lambda t: F.pmod(F.xxhash64(t), F.lit(_SH_P)))


def _grams_np(flat: np.ndarray, lens: np.ndarray, n: int):
    """Windowed n-gram combine over a batch-flattened token-hash array.
    Returns (row_idx, gram) for every full window that does not cross a row
    boundary. Fully vectorized."""
    total = len(flat)
    if total < n:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    g = np.zeros(total - n + 1, dtype=np.int64)
    for j, c in zip(range(n), _SH_COEF):
        g = (g + flat[j : total - n + 1 + j] * c) % _SH_P
    row_of = np.repeat(np.arange(len(lens)), lens)
    valid = row_of[: total - n + 1] == row_of[n - 1 :]
    return row_of[: total - n + 1][valid], g[valid]


def shingles_col(text_col: Column, n: int = 3) -> Column:
    """Word n-gram shingle hashes: distinct combined hashes of each full
    n-word window (rows with fewer than n tokens get an empty set)."""
    th = token_hashes_col(text_col)

    @F.pandas_udf("array<long>")
    def grams(s: pd.Series) -> pd.Series:
        nrows = len(s)
        lens = s.map(len).to_numpy(np.int64)
        if nrows == 0 or lens.sum() == 0:
            return pd.Series([[] for _ in range(nrows)])
        flat = np.concatenate([np.asarray(v, dtype=np.int64) for v in s])
        rows, g = _grams_np(flat, lens, n)
        # per-row distinct via unique on (row, gram) packed keys — chunked
        # by row groups (exact: the packed key embeds the row id, so rows
        # are independent) to keep each sort's working set ~2 MB instead of
        # one ~25 MB random-access sort over the whole Arrow batch; large
        # streaming temps are what flatten this host's core-scaling curve
        packed = rows * (np.int64(1) << np.int64(31)) + g
        row_bounds = np.searchsorted(rows, np.arange(nrows + 1))
        out: list[np.ndarray] = []
        chunk = 262_144
        lo = 0
        while lo < nrows:
            hi = int(np.searchsorted(row_bounds, row_bounds[lo] + chunk, side="left"))
            hi = max(min(hi, nrows), lo + 1)
            keys = np.unique(packed[row_bounds[lo] : row_bounds[hi]])
            krow = keys >> np.int64(31)
            kval = keys & np.int64(_SH_P)
            starts = np.searchsorted(krow, np.arange(lo, hi))
            ends = np.append(starts[1:], len(keys))
            out.extend(kval[starts[i] : ends[i]] for i in range(hi - lo))
            lo = hi
        return pd.Series(out)

    return grams(th)


# -------------------------------------------------------------- minhash LSH
# Mersenne prime 2^31-1: (h mod p) * a + b stays under 2^61 — no int64
# overflow, so the expression is safe under Spark 4's default ANSI mode.
_MH_PRIME = (1 << 31) - 1


def _mh_coeffs(num_hashes: int, seed: int = 7) -> list[tuple[int, int]]:
    # deterministic LCG-derived coefficients (no RNG state dependency)
    coeffs = []
    s = seed
    for _ in range(num_hashes):
        s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = (s >> 16) % (1 << 30) | 1
        s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = (s >> 16) % (1 << 30)
        coeffs.append((a, b))
    return coeffs


def _minhash_matrix(
    s: pd.Series, a_vec: np.ndarray, b_vec: np.ndarray, chunk_flat: int = 256_000
) -> np.ndarray:
    """(n_rows, num_hashes) minhash matrix over a batch of shingle arrays.

    Processes row slices whose total flattened shingle count stays under
    ``chunk_flat``: the (N, H) modular-product temporary is the hot
    allocation (an unchunked 65536-row Arrow batch of ~200-shingle docs is a
    13M x 64 x 8 B = ~6.7 GB temp PER python worker — 32 workers of those
    thrash the box and flatten the core-scaling curve). Chunked, results
    are bit-identical. 256k flat entries (~130 MB temp per worker) measured
    best at sf0.1/32 cores: 64k -> 14.8 s, 128k -> 10.5 s, 256k -> 8.0 s,
    512k -> 8.8 s for the full candidates+verify pipeline (best-of-3 each)
    — the per-chunk numpy dispatch overhead dominates below 256k now that
    the tmpfs shuffle dir removed the allocation-stall pressure that
    originally justified 64k."""
    num_hashes = len(a_vec)
    n = len(s)
    out = np.full((n, num_hashes), _MH_PRIME, dtype=np.int64)
    if n == 0:
        return out
    lens = s.map(len).to_numpy(np.int64)
    if lens.sum() == 0:
        return out
    # row-slice boundaries so each slice's flat length <= chunk_flat
    cum = np.cumsum(lens)
    row_lo = 0
    while row_lo < n:
        base = cum[row_lo - 1] if row_lo else 0
        row_hi = int(np.searchsorted(cum, base + chunk_flat, side="right"))
        row_hi = max(row_hi, row_lo + 1)  # always advance (one huge row)
        sl = s.iloc[row_lo:row_hi]
        lsl = lens[row_lo:row_hi]
        if lsl.sum() > 0:
            flat = np.concatenate([np.asarray(v, dtype=np.int64) for v in sl])
            hp = flat % _MH_PRIME
            starts = np.zeros(len(lsl), dtype=np.int64)
            np.cumsum(lsl[:-1], out=starts[1:])
            safe = lsl > 0
            safe_starts = starts if safe.all() else starts[safe]
            # lane loop with (chunk,)-sized temporaries instead of one
            # (chunk, num_hashes) materialization: the 2D form writes+reads
            # ~2 x chunk x H x 8 B of DRAM per chunk (memory-bandwidth
            # bound — measured only 2.5x core-scaling 4 -> 16 on the
            # signature stage), while the per-lane temps stay L2-resident
            # (hp is reread from cache each lane). Bit-identical results.
            #
            # The per-lane reduction `prod % p` is the hot op: int64
            # remainder has no SIMD form (scalar ~20-40-cycle divisions,
            # 64 lanes x every shingle). p = 2^31 - 1 is Mersenne, so
            # 2^31 ≡ 1 (mod p) and the remainder folds with shifts:
            # x ≡ (x & p) + (x >> 31). prod = hp*a + b < p^2 + p < 2^62,
            # so two folds bring the value to <= p + 2 and one masked
            # subtract lands exactly in [0, p) — bit-identical to `%`
            # (asserted in tests/test_dedup.py), all SIMD ops. Measured
            # ~3x on the signature kernel.
            prod = np.empty_like(hp)
            fold = np.empty_like(hp)
            for lane in range(num_hashes):
                np.multiply(hp, a_vec[lane], out=prod)
                prod += b_vec[lane]
                np.right_shift(prod, 31, out=fold)
                prod &= _MH_PRIME
                prod += fold
                np.right_shift(prod, 31, out=fold)
                prod &= _MH_PRIME
                prod += fold
                np.subtract(prod, _MH_PRIME, out=prod, where=prod >= _MH_PRIME)
                mins = np.minimum.reduceat(prod, safe_starts)
                if safe.all():
                    out[row_lo:row_hi, lane] = mins
                else:
                    out[row_lo:row_hi, lane][safe] = mins
        row_lo = row_hi
    return out


def minhash_signature_col(shingles: Column, num_hashes: int = 64) -> Column:
    """num_hashes-lane minhash signature: min over shingles of
    (a * h + b) mod p per lane.

    Implemented as ONE Arrow-vectorized pandas UDF over the shingle array
    (flatten batch -> chunked (N, num_hashes) modular products -> per-row
    minimum.reduceat): a 64-lane JVM expression tree is ~50x slower here and
    the UDF is still scan-side (no shuffle), deterministic arithmetic."""
    coeffs = _mh_coeffs(num_hashes)
    a_vec = np.array([a for a, _ in coeffs], dtype=np.int64)
    b_vec = np.array([b for _, b in coeffs], dtype=np.int64)

    @F.pandas_udf("array<long>")
    def sig(s: pd.Series) -> pd.Series:
        return pd.Series(list(_minhash_matrix(s, a_vec, b_vec)))

    return sig(shingles)


def minhash_band_keys_col(
    shingles: Column, num_hashes: int = 64, bands: int = 16
) -> Column:
    """Banded-LSH keys in ONE pandas UDF: minhash signature (as above) then
    an FNV-1a fold of each band's lanes -> array<long> of ``bands`` keys.
    Folding the band hash into the same Arrow pass avoids a 64-element_at
    JVM expression tree that measured ~0.8 ms/row."""
    coeffs = _mh_coeffs(num_hashes)
    a_vec = np.array([a for a, _ in coeffs], dtype=np.int64)
    b_vec = np.array([b for _, b in coeffs], dtype=np.int64)
    rpb = num_hashes // bands
    fnv_offset = np.uint64(1469598103934665603)
    fnv_prime = np.uint64(1099511628211)

    @F.pandas_udf("array<long>")
    def bkeys(s: pd.Series) -> pd.Series:
        n = len(s)
        sigm = _minhash_matrix(s, a_vec, b_vec)
        sig3 = sigm.reshape(n, bands, rpb).astype(np.uint64)
        h = np.full((n, bands), fnv_offset, dtype=np.uint64)
        for r in range(rpb):
            h = (h ^ sig3[:, :, r]) * fnv_prime
        return pd.Series(list(h.view(np.int64)))

    return bkeys(shingles)


def _attach_probe(out: DataFrame, banded: DataFrame, cap: int | None) -> DataFrame:
    """Tag the result frame with the banded frame + cap so downstream
    lineage (io/lineage.run_stage) can surface hot_bucket_stats in the
    stage manifest without the hot path paying for the extra agg."""
    if cap is not None:
        out._codem_hot_bucket_probe = (banded, cap)  # type: ignore[attr-defined]
    return out


def carry_probe(src: DataFrame, out: DataFrame) -> DataFrame:
    """Propagate the hot-bucket probe through a wrapping transformation
    (verify joins, anti-join dedup) so run_stage still sees it."""
    probe = getattr(src, "_codem_hot_bucket_probe", None)
    if probe is not None:
        out._codem_hot_bucket_probe = probe  # type: ignore[attr-defined]
    return out


def _bucket_pairs(banded: DataFrame, cap: int | None = 64) -> DataFrame:
    """(band, bkey, did) -> candidate pairs (id_a < id_b) with a hot-bucket
    guard. Buckets of size <= ``cap`` emit every pair (exact banded-LSH
    semantics). Larger buckets — boilerplate/empty docs sharing a signature,
    the quadratic scale-killer at 10^12 rows — emit STAR pairs instead
    (bucket-min did vs every member): O(m) rows per m-member bucket, and any
    member that truly near-dups the bucket survives verification against the
    representative, which is the dedup contract (drop all but one).

    NOTE: the star fallback WEAKENS pairwise completeness — two hot-bucket
    members near-dup of each other but not of the representative are never
    paired. Pass ``cap=None`` for exact (all-pairs) banded-LSH semantics,
    and use :func:`hot_bucket_stats` to measure how many buckets/rows the
    cap actually truncated on a given input.

    Plan shape: ONE shuffle. groupBy(band, bkey) collects each bucket's
    sorted member array, and the pair list (all-pairs or star) is generated
    by JVM array expressions and exploded — no Python, no second pass. The
    earlier plan (sizes agg -> join back -> self-join on (band, bkey)) moved
    the banded frame through three shuffles; on a DRAM-thin host that extra
    shuffle traffic was the minhash stage's core-scaling ceiling (measured
    1.65x at 4 -> 16 cores)."""
    ms = F.array_sort(F.collect_list("did")).alias("ms")
    buckets = banded.groupBy("band", "bkey").agg(ms)
    arr = F.col("ms")
    all_pairs = F.flatten(
        F.transform(
            arr,
            lambda x, i: F.transform(
                F.slice(arr, i + F.lit(2), F.size(arr)),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    if cap is None:
        pairs = all_pairs
    else:
        star = F.transform(
            F.slice(arr, 2, F.size(arr)),
            lambda y: F.struct(F.element_at(arr, 1).alias("id_a"), y.alias("id_b")),
        )
        pairs = F.when(F.size(arr) <= F.lit(cap), all_pairs).otherwise(star)
    out = (
        buckets.select(F.explode(pairs).alias("p"))
        .select(F.col("p.id_a"), F.col("p.id_b"))
        .distinct()
    )
    return _attach_probe(out, banded, cap)


def hot_bucket_stats(banded: DataFrame, cap: int = 64) -> dict[str, int]:
    """Observability for the hot-bucket star-pair fallback: how many
    (band, bkey) buckets exceed ``cap`` and how many member rows sit in
    them. Run on the ``banded`` frame (did, band, bkey) that feeds
    _bucket_pairs; one extra agg job, opt-in, so the hot path stays
    single-pass. A nonzero count quantifies the recall loss surface of the
    star fallback (see _bucket_pairs)."""
    r = (
        banded.groupBy("band", "bkey")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > cap)
        .agg(F.count("*").alias("hot_buckets"), F.coalesce(F.sum("n"), F.lit(0)).alias("hot_rows"))
        .collect()[0]
    )
    return {"hot_buckets": int(r["hot_buckets"]), "hot_rows": int(r["hot_rows"])}


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    bucket_cap: int = 64,
) -> DataFrame:
    """Banded-LSH candidate pairs (id_a < id_b), deduplicated across bands.
    Standard MinHash banding: docs sharing any full band collide; buckets
    above ``bucket_cap`` fall back to star pairs (see _bucket_pairs)."""
    src = df
    df = rebalance(df)
    # Shingles are materialized ONCE and shared with the verify stage
    # (optimization round r6): candidates need the banded minhash keys OF
    # the shingles, verification needs the shingle sets themselves, and the
    # two stages previously each ran the full normalize+tokenize+n-gram UDF
    # pass over the corpus. The persisted shingle frame rides along on the
    # returned DataFrame (same plumbing as the hot-bucket probe) and
    # jaccard_verify picks it up only when handed the SAME source frame.
    sh_frame = df.select(
        F.col(id_col).alias("did"), shingles_col(F.col(text_col), shingle_n).alias("sh")
    ).persist()
    keys = sh_frame.select(
        "did", minhash_band_keys_col(F.col("sh"), num_hashes, bands).alias("bkeys")
    )
    banded = keys.select("did", F.posexplode("bkeys").alias("band", "bkey"))
    out = _bucket_pairs(banded, cap=bucket_cap)
    out._codem_shingle_frame = (sh_frame, src, text_col, id_col, shingle_n)  # type: ignore[attr-defined]
    return out


def jaccard_verify(
    pairs: DataFrame,
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    shingle_n: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs (JVM array intersect/union).
    pairs: (id_a, id_b)."""
    shared = getattr(pairs, "_codem_shingle_frame", None)
    if (
        shared is not None
        and shared[1] is df
        and shared[2] == text_col
        and shared[3] == id_col
        and shared[4] == shingle_n
    ):
        # candidates already materialized this exact shingle frame — reuse
        # it instead of a second full shingle-UDF pass over the corpus
        sh = shared[0]
    else:
        sh = rebalance(df).select(
            F.col(id_col).alias("did"), shingles_col(F.col(text_col), shingle_n).alias("sh")
        ).persist()  # joined on both pair sides
    j = (
        pairs.join(sh.withColumnsRenamed({"did": "id_a", "sh": "sh_a"}), "id_a")
        .join(sh.withColumnsRenamed({"did": "id_b", "sh": "sh_b"}), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    out = j.select("id_a", "id_b", F.round(jac, 6).alias("jaccard")).filter(
        F.col("jaccard") >= threshold
    )
    return carry_probe(pairs, out)


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    **kw,
) -> DataFrame:
    """Full near-dup pipeline: LSH candidates -> Jaccard verify -> drop the
    higher id of each confirmed pair (greedy, deterministic)."""
    cands = minhash_lsh_candidates(df, text_col, id_col, **kw)
    dups = jaccard_verify(cands, df, text_col, id_col, threshold, kw.get("shingle_n", 3))
    drop = dups.select(F.col("id_b").alias(id_col)).distinct()
    return carry_probe(dups, df.join(drop, id_col, "left_anti"))


# ------------------------------------------------------------------ simhash
def simhash_col(text_col: Column, bits: int = 64, shingle_n: int = 2) -> Column:
    """64-bit SimHash: per token-shingle hash, each bit votes +1/-1; the
    fingerprint is the sign vector. One Arrow-vectorized pandas UDF over the
    shingle array (batch-flattened bit unpack + add.reduceat) — scan-side,
    deterministic; shingle hashes themselves stay JVM-side (xxhash64)."""
    sh = shingles_col(text_col, shingle_n)

    @F.pandas_udf("long")
    def simhash(s: pd.Series) -> pd.Series:
        lens = s.map(len).to_numpy(np.int64)
        n = len(s)
        if lens.sum() == 0:
            return pd.Series(np.zeros(n, dtype=np.int64))
        from codem_spark.functions.geo import splitmix64_np

        # shingle hashes are 31-bit (see shingles_col) — spread to a full
        # 64-bit avalanche so every simhash bit-plane is informative
        flat31 = np.concatenate([np.asarray(v, dtype=np.int64) for v in s])
        flat = splitmix64_np(flat31).view(np.uint64)
        # Per-bit set counts, chunked by row groups so the per-lane
        # temporaries stay L2-resident (same pattern and 256k-flat chunk
        # size as _minhash_matrix): the old (N_shingles, 64) int64 ±1 vote
        # matrix wrote+read multi-GB DRAM temporaries per Arrow batch at
        # corpus scale. tot = sum(±1) = 2*count_set - n_shingles, computed
        # per row at the end — bit-identical fingerprints.
        cnt = np.zeros((n, bits), dtype=np.int64)
        cum = np.cumsum(lens)
        chunk_flat = 256_000
        row_lo = 0
        while row_lo < n:
            base = cum[row_lo - 1] if row_lo else 0
            row_hi = int(np.searchsorted(cum, base + chunk_flat, side="right"))
            row_hi = max(row_hi, row_lo + 1)
            lsl = lens[row_lo:row_hi]
            if lsl.sum() > 0:
                fl = flat[base : cum[row_hi - 1]]
                starts = np.zeros(len(lsl), dtype=np.int64)
                np.cumsum(lsl[:-1], out=starts[1:])
                safe = lsl > 0
                safe_starts = starts if safe.all() else starts[safe]
                tmp = np.empty_like(fl)
                for bit in range(bits):
                    np.right_shift(fl, np.uint64(bit), out=tmp)
                    tmp &= np.uint64(1)
                    m = np.add.reduceat(tmp.view(np.int64), safe_starts)
                    if safe.all():
                        cnt[row_lo:row_hi, bit] = m
                    else:
                        cnt[row_lo:row_hi, bit][safe] = m
            row_lo = row_hi
        tot = 2 * cnt - lens[:, None]
        bitsm = (tot > 0).astype(np.uint64)
        weights = np.left_shift(np.uint64(1), np.arange(bits, dtype=np.uint64))
        packed = (bitsm * weights[None, :]).sum(axis=1, dtype=np.uint64)
        return pd.Series(packed.view(np.int64))

    return simhash(sh)


def simhash_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    band_bits: int = 32,
    hamming_max: int = 1,
    bucket_cap: int = 64,
) -> DataFrame:
    """Near-dup candidates = equality on any simhash band (pigeonhole:
    64/band_bits bands catch every pair within Hamming distance
    64/band_bits - 1). Output: (id_a, id_b, hamming), hamming <= hamming_max.

    Defaults are the SCALE configuration: 2 bands of 32 bits -> 2^32 key
    space per band, so at 10^9 docs the average bucket stays O(1) (16-bit
    bands cap at 65,536 distinct values per band — every bucket holds ~15k
    docs at 10^9 and candidate volume goes ~10^12). Wider bands narrow the
    guaranteed Hamming radius (here <=1); pass band_bits=16, hamming_max=3
    for the looser small-data behavior. Buckets above ``bucket_cap`` emit
    star pairs (see _bucket_pairs) — the residual guard for pathological
    keys (e.g. simhash 0 from empty docs)."""
    df = rebalance(df)
    d = df.select(
        F.col(id_col).alias("did"), simhash_col(F.col(text_col)).alias("sh")
    ).persist()  # joined back onto both pair sides for the hamming distance
    return simhash_candidates_from(d, band_bits, hamming_max, bucket_cap)


def simhash_candidates_from(
    d: DataFrame,
    band_bits: int = 32,
    hamming_max: int = 1,
    bucket_cap: int | None = 64,
) -> DataFrame:
    """Banding half of :func:`simhash_candidates` over a PRECOMPUTED
    (did, sh) fingerprint frame — callers that also need the fingerprints
    (e.g. an exact verifier) compute them once, persist, and avoid a second
    scan-side UDF pass."""
    bands = 64 // band_bits
    mask = (1 << band_bits) - 1
    bexpr = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band"),
                F.shiftrightunsigned("sh", bi * band_bits).bitwiseAND(F.lit(mask)).alias("bkey"),
            )
            for bi in range(bands)
        ]
    )
    banded = d.select("did", F.explode(bexpr).alias("b")).select(
        "did", F.col("b.band").alias("band"), F.col("b.bkey").alias("bkey")
    )
    pairs = _bucket_pairs(banded, cap=bucket_cap)
    sh_a = d.select(F.col("did").alias("id_a"), F.col("sh").alias("_sha"))
    sh_b = d.select(F.col("did").alias("id_b"), F.col("sh").alias("_shb"))
    out = (
        pairs.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("_sha").bitwiseXOR(F.col("_shb"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= F.lit(hamming_max))
    )
    return carry_probe(pairs, out)
