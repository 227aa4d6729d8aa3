"""Streaming ingest: windowed tile aggregation must equal the batch plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from codem_spark import synth
from codem_spark.functions import cells, geo
from codem_spark.streaming import ingest
from tests.conftest import EXTENT


def test_stream_matches_batch(spark, tmp_path):
    # land two parquet "WARC batches" in a directory
    pages = synth.pages(spark, 1000)
    pages.filter(F.col("url").substr(-1, 1).isin(["0", "1", "2", "3", "4"])).write.parquet(
        str(tmp_path / "in" / "b1")
    )
    pages.filter(~F.col("url").substr(-1, 1).isin(["0", "1", "2", "3", "4"])).write.parquet(
        str(tmp_path / "in" / "b2")
    )
    stream = ingest.read_pages_stream(spark, str(tmp_path / "in" / "*"))
    g = ingest.georeferenced_stream(stream, EXTENT)
    agg = ingest.windowed_tile_counts(g, EXTENT, level=4, window="60 minutes")
    ingest.run_to_memory(agg, "tile_counts")
    got = spark.sql("SELECT cell_id, sum(n_pages) AS n, sum(n_extract_violations) AS v FROM tile_counts GROUP BY cell_id")
    gp = got.toPandas().sort_values("cell_id").reset_index(drop=True)

    # batch oracle: same expressions, batch mode
    batch = synth.georeference_pages(pages, EXTENT)
    cell = cells.cell_encode_col(F.col("x"), F.col("y"), EXTENT, 4)
    bp = (
        batch.groupBy(cell.alias("cell_id"))
        .agg(F.count("*").alias("n"))
        .toPandas()
        .sort_values("cell_id")
        .reset_index(drop=True)
    )
    assert (gp.v == 0).all()  # byte-identical extraction holds in-stream
    assert len(gp) == len(bp)
    assert (gp.cell_id.values == bp.cell_id.values).all()
    assert (gp.n.values == bp.n.values).all()


def test_streaming_exact_dedup_drops_dups(spark, tmp_path):
    """Stateful streaming dedup: planted exact duplicates across two
    micro-batches collapse to one survivor per digest (streaming face of
    operators/dedup.exact_dedup)."""
    pages = synth.pages(spark, 400).persist()
    dups = pages.limit(100).withColumn(
        "url", F.concat(F.col("url"), F.lit("?utm=copy"))
    )
    pages.write.parquet(str(tmp_path / "din" / "b1"))
    dups.write.parquet(str(tmp_path / "din" / "b2"))
    stream = ingest.read_pages_stream(spark, str(tmp_path / "din" / "*"))
    dd = ingest.streaming_exact_dedup(stream)
    q = (
        dd.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_pages")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT digest, count(*) AS n FROM dedup_pages GROUP BY digest").toPandas()
    # batch oracle: distinct digests of the union
    from codem_spark.functions.text import normalized_text_col

    exp = (
        pages.unionByName(dups)
        .select(F.sha2(normalized_text_col(F.col("text")), 256).alias("digest"))
        .distinct()
        .count()
    )
    assert (got.n == 1).all()  # every digest survives exactly once
    assert len(got) == exp
    pages.unpersist()
