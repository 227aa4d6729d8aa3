"""Structured Streaming ingest of web-page rows.

The reference has no streaming surface (SURVEY.md §2.4 note) — this is the
engine-new continuous-ingest path for the 100 TB pipeline: a stream of
``(url, warc_ts, html, text, lang)`` rows (files landing in a directory;
kafka in production — same plan after ``readStream``) is georeferenced,
cell-indexed and grid-aggregated with event-time watermarks, so late WARC
batches fold into the right tiles. All transformations are the SAME column
expressions as the batch path (functions/geo.py, functions/cells.py) — one
code path, two execution modes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from codem_spark.functions import cells, geo, text

Extent = tuple[float, float, float, float]

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)


def read_pages_stream(spark: SparkSession, path: str, max_files: int = 16) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def georeferenced_stream(pages: DataFrame, extent: Extent) -> DataFrame:
    """Streaming variant of synth.georeference_pages + extraction check."""
    x, y = geo.pseudo_xy_cols(F.col("url"), extent)
    out = (
        pages.withColumn("x", x)
        .withColumn("y", y)
        .withColumn("z", geo.surface_z_col(F.col("x"), F.col("y")))
        .withColumn("extract_ok", (text.extract_text_col(F.col("html")) == F.col("text")).cast("int"))
    )
    return out


def windowed_tile_counts(
    geo_stream: DataFrame,
    extent: Extent,
    level: int = 6,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Event-time windowed per-cell ingest stats: rows, max z, extraction
    invariant violations — the streaming face of the G1/G2 grid aggs."""
    cell = cells.cell_encode_col(F.col("x"), F.col("y"), extent, level)
    return (
        geo_stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("win"), cell.alias("cell_id"))
        .agg(
            F.count("*").alias("n_pages"),
            F.max("z").alias("z_max"),
            (F.count("*") - F.sum("extract_ok")).alias("n_extract_violations"),
        )
    )


def streaming_exact_dedup(
    pages: DataFrame,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Stateful streaming exact dedup: keep the first arrival per normalized
    text digest (the streaming face of operators/dedup.exact_dedup).
    ``dropDuplicatesWithinWatermark`` keeps per-digest state in the state
    store and evicts entries older than the watermark — the correct contract
    for continuous WARC ingest (a re-crawl months later is a new snapshot,
    not a dup), and the only shape whose state is bounded at 10^12 rows."""
    from codem_spark.functions.text import normalized_text_col

    d = pages.withColumn("digest", F.sha2(normalized_text_col(F.col("text")), 256))
    return d.withWatermark("warc_ts", watermark).dropDuplicatesWithinWatermark(["digest"])


def streaming_dedup_counts(
    pages: DataFrame,
    watermark: str = "30 minutes",
    window: str = "10 minutes",
) -> DataFrame:
    """Windowed duplicate-rate metrics: per event-time window, total pages
    and distinct digests (duplicate rate = 1 - distinct/total)."""
    from codem_spark.functions.text import normalized_text_col

    d = pages.withColumn("digest", F.sha2(normalized_text_col(F.col("text")), 256))
    return (
        d.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("win"))
        .agg(
            F.count("*").alias("n_pages"),
            F.approx_count_distinct("digest").alias("n_distinct_approx"),
        )
    )


def run_to_memory(stream_df: DataFrame, name: str) -> None:
    """Drive a bounded stream to completion synchronously (test harness)."""
    q = (
        stream_df.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
