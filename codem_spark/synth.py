"""Deterministic synthetic inputs (M0 of SURVEY.md §7).

Two families:

* ``pages(spark, n)`` — the input_hint table ``(url, warc_ts, html, text,
  lang)``; html is the invertible wrap of text (functions/text.py), so the
  byte-identical-extraction invariant is testable end-to-end. A ``skew``
  fraction of urls maps into one hot cell to exercise salting.
* ``points_from_pages(df)`` / ``points_from_lineitem(df)`` — georeferenced
  point clouds: pseudo (x, y) from the url hash (or deterministic id lanes
  when an arithmetic oracle is needed), z from the synthetic surface, plus
  the LAS-style attribute columns the reference filters on
  (classification / return_number / intensity — FIXTURES.md §2,
  reference src/vcd/preprocessing/preprocess.py:163-166).

Everything is seedless-deterministic (pure functions of row id / url) so
any executor count produces identical tables — required for run-to-run
parity and for resume-from-checkpoint correctness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from codem_spark.functions import geo, text

Extent = tuple[float, float, float, float]

DEFAULT_EXTENT: Extent = (0.0, 0.0, 100_000.0, 100_000.0)

_LANGS = ["en", "de", "fr", "es", "zh"]
_WORDS = (
    "data tile point cloud raster vector join index cell query spark shuffle "
    "partition broadcast salt skew morton surface building corner feature "
    "match transform solve residual iterate converge register the and of to"
).split()


def pages(
    spark: SparkSession,
    n: int,
    n_hosts: int = 97,
    skew_fraction: float = 0.0,
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic Common-Crawl-style pages table.

    text = a deterministic word sequence keyed by row id (varying length);
    html = '<html>...<article>{escaped text}</article>...' so the extractor
    inverse holds byte-for-byte. skew_fraction of rows get urls that all
    hash-land wherever host0/page0's neighborhood is (hot-cell injection for
    salting tests, FIXTURES.md §1).
    """
    df = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)
    rid = F.col("id")
    host = rid % F.lit(n_hosts)
    # Deterministic text: 5..40 words chosen by id lanes.
    n_words = (F.pmod(rid * F.lit(2654435761), F.lit(36)) + F.lit(5)).cast("int")
    words = F.transform(
        F.sequence(F.lit(0), n_words - 1),
        lambda i: F.element_at(
            F.array(*[F.lit(w) for w in _WORDS]),
            (F.pmod(rid + i * F.lit(40503), F.lit(len(_WORDS)))).cast("int") + 1,
        ),
    )
    body = F.concat_ws(" ", words)
    # Sprinkle chars needing entity escaping so the extractor is non-trivial.
    body = F.when(rid % 7 == 0, F.concat(body, F.lit(" a<b & c>d"))).otherwise(body)
    lang = F.element_at(
        F.array(*[F.lit(lg) for lg in _LANGS]), (F.pmod(rid, F.lit(len(_LANGS)))).cast("int") + 1
    )
    if skew_fraction > 0:
        hot = (geo.id_lane_col(rid, 3) < F.lit(skew_fraction))
        url = F.when(
            hot, F.concat(F.lit("https://hot.example/h"), (rid % 50).cast("string"))
        ).otherwise(
            F.concat(F.lit("https://host"), host.cast("string"), F.lit(".example/p/"), rid.cast("string"))
        )
    else:
        url = F.concat(
            F.lit("https://host"), host.cast("string"), F.lit(".example/p/"), rid.cast("string")
        )
    html_str = F.concat(
        F.lit("<html><head><title>page "),
        rid.cast("string"),
        F.lit("</title></head><body><article>"),
        text.escape_html_col(body),
        F.lit("</article><footer>host "),
        host.cast("string"),
        F.lit("</footer></body></html>"),
    )
    ts = F.timestamp_seconds(F.lit(1_700_000_000) + rid * F.lit(13) % F.lit(31_536_000))
    return df.select(
        url.alias("url"),
        ts.alias("warc_ts"),
        F.encode(html_str, "UTF-8").alias("html"),
        body.alias("text"),
        lang.alias("lang"),
    )


def georeference_pages(df: DataFrame, extent: Extent = DEFAULT_EXTENT) -> DataFrame:
    """pages -> points: the production path (xxhash64 pseudo-coords +
    synthetic surface z). Analog of raster->points (preprocess.py:285-315)."""
    x, y = geo.pseudo_xy_cols(F.col("url"), extent)
    out = df.withColumn("x", x).withColumn("y", y)
    return out.withColumn("z", geo.surface_z_col(F.col("x"), F.col("y")))


def point_cloud(
    spark: SparkSession,
    n: int,
    extent: Extent = DEFAULT_EXTENT,
    jitter: float = 0.0,
) -> DataFrame:
    """Bare synthetic point cloud keyed by integer pid — the arithmetic
    (id-lane) path that DuckDB oracles can reproduce exactly. Includes the
    LAS-ish attribute columns of FIXTURES.md §2."""
    x0, y0, x1, y1 = extent
    df = spark.range(0, n, 1, spark.sparkContext.defaultParallelism).withColumnRenamed("id", "pid")
    pid = F.col("pid")
    x = F.lit(x0) + geo.id_lane_col(pid, 0) * F.lit(x1 - x0)
    y = F.lit(y0) + geo.id_lane_col(pid, 1) * F.lit(y1 - y0)
    df = df.withColumn("x", x).withColumn("y", y)
    z = geo.surface_z_col(F.col("x"), F.col("y"))
    if jitter > 0:
        z = z + (geo.id_lane_col(pid, 2) - F.lit(0.5)) * F.lit(2.0 * jitter)
    df = df.withColumn("z", z)
    cls = (
        F.when(F.pmod(pid, F.lit(100)) < 55, F.lit(2))  # ground
        .when(F.pmod(pid, F.lit(100)) < 80, F.lit(6))  # building
        .when(F.pmod(pid, F.lit(100)) < 90, F.lit(1))  # unclassified
        .when(F.pmod(pid, F.lit(100)) < 95, F.lit(7))  # noise
        .when(F.pmod(pid, F.lit(100)) < 98, F.lit(9))  # water
        .otherwise(F.lit(18))  # high noise
    )
    rn = F.when(F.pmod(pid, F.lit(10)) < 8, F.lit(1)).otherwise(F.lit(2))
    nr = F.when(F.pmod(pid, F.lit(10)) < 8, F.lit(1)).otherwise(F.lit(2))
    inten = geo.id_lane_col(pid, 3) * F.lit(400.0)
    return (
        df.withColumn("classification", cls)
        .withColumn("return_number", rn)
        .withColumn("number_of_returns", nr)
        .withColumn("intensity", inten)
    )


def points_from_lineitem(df: DataFrame, extent: Extent = DEFAULT_EXTENT) -> DataFrame:
    """Derive a deterministic point cloud from the driver's lineitem table
    (bench/entry input per TESTDATA.md — don't synthesize our own when the
    driver provides rows). pid is unique; coords from id lanes."""
    x0, y0, x1, y1 = extent
    pid = (F.col("l_orderkey") * F.lit(8) + F.col("l_linenumber")).alias("pid")
    out = df.select(pid)
    out = out.withColumn("x", F.lit(x0) + geo.id_lane_col(F.col("pid"), 0) * F.lit(x1 - x0))
    out = out.withColumn("y", F.lit(y0) + geo.id_lane_col(F.col("pid"), 1) * F.lit(y1 - y0))
    return out.withColumn("z", geo.surface_z_col(F.col("x"), F.col("y")))


# SQL twins (DuckDB oracle) for the arithmetic paths above.
def point_cloud_sql(n: int, extent: Extent = DEFAULT_EXTENT) -> str:
    from codem_spark.functions.geo import id_lane_sql

    x0, y0, x1, y1 = extent
    return f"""
    SELECT pid,
           {x0!r} + ({id_lane_sql('pid', 0)}) * {x1 - x0!r} AS x,
           {y0!r} + ({id_lane_sql('pid', 1)}) * {y1 - y0!r} AS y
    FROM (SELECT range AS pid FROM range(0, {n}))
    """


def points_from_lineitem_sql(extent: Extent = DEFAULT_EXTENT) -> str:
    from codem_spark.functions.geo import id_lane_sql

    x0, y0, x1, y1 = extent
    pid = "(l_orderkey * 8 + l_linenumber)"
    return f"""
    SELECT {pid} AS pid,
           {x0!r} + ({id_lane_sql(pid, 0)}) * {x1 - x0!r} AS x,
           {y0!r} + ({id_lane_sql(pid, 1)}) * {y1 - y0!r} AS y
    FROM lineitem
    """
