"""Explicit skew handling: salted repartitioning of hot cells (north rule).

URL-hash pseudo-coordinates are uniform by construction, but real web data
is not — crawl hot-spots (one host's pages hashing into one region, or a
degenerate geometry) put millions of rows in one cell. AQE's skew-join
splitting handles *joins*; for cell-keyed aggregations/kernels the engine
salts explicitly (SURVEY.md §4 'skew handling'):

1. one count-by-cell agg finds cells above ``threshold`` rows;
2. the (tiny) hot-cell map is broadcast;
3. hot rows get ``salt = pmod(xxhash64(id), n_salt)``, cold rows salt 0;
4. repartition by (cell, salt) — each hot cell fans out to n_salt tasks.

Mergeable aggregations then run per (cell, salt) and re-merge per cell (a
second tiny agg); order-insensitive kernels (grid-max, density, partial
normal equations) are salt-transparent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hot_cells(df: DataFrame, cell_col: str, threshold: int) -> DataFrame:
    return (
        df.groupBy(cell_col)
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > threshold)
        .select(cell_col, F.ceil(F.col("n") / threshold).alias("n_salt"))
    )


def salted_repartition(
    df: DataFrame,
    cell_col: str,
    threshold: int = 200_000,
    max_salt: int = 64,
    id_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Attach a ``salt`` column (0 for cold cells, 0..n_salt-1 for hot ones)
    and hash-repartition by (cell, salt). Deterministic: the salt is a hash
    of ``id_col`` (or all columns when None), not a random number."""
    hot = hot_cells(df, cell_col, threshold)
    salt_src = F.xxhash64(F.col(id_col)) if id_col else F.xxhash64(*[F.col(c) for c in df.columns])
    out = (
        df.join(F.broadcast(hot), cell_col, "left")
        .withColumn(
            "salt",
            F.when(
                F.col("n_salt").isNotNull(),
                F.pmod(salt_src, F.least(F.col("n_salt"), F.lit(max_salt))).cast("int"),
            ).otherwise(F.lit(0)),
        )
        .drop("n", "n_salt")
    )
    n_parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism * 2
    return out.repartition(n_parts, F.col(cell_col), F.col("salt"))


def salted_grid_agg(
    df: DataFrame,
    cell_col: str,
    agg_exprs: dict[str, str],
    threshold: int = 200_000,
    id_col: str | None = None,
) -> DataFrame:
    """Two-phase mergeable aggregation over a salted key: phase 1 aggregates
    per (cell, salt), phase 2 re-merges per cell. Supported merges: max,
    min, sum, count (count re-merges as sum)."""
    merge = {"max": "max", "min": "min", "sum": "sum", "count": "sum"}
    salted = salted_repartition(df, cell_col, threshold, id_col=id_col)
    p1 = salted.groupBy(cell_col, "salt").agg(
        *[getattr(F, fn)(col).alias(f"_{fn}_{col}") for col, fn in agg_exprs.items()]
    )
    p2 = p1.groupBy(cell_col).agg(
        *[
            getattr(F, merge[fn])(f"_{fn}_{col}").alias(f"{fn}_{col}")
            for col, fn in agg_exprs.items()
        ]
    )
    return p2
