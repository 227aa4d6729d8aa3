"""Text operators: byte-identical extraction invariant + analysis sanity."""

from __future__ import annotations

from pyspark.sql import functions as F

from codem_spark import synth
from codem_spark.functions import text


def test_extractor_byte_identical(spark):
    pg = synth.pages(spark, 1000)
    bad = (
        pg.withColumn("ext", text.extract_text_col(F.col("html")))
        .filter(F.col("ext") != F.col("text"))
        .count()
    )
    assert bad == 0


def test_extractor_hash_stable(spark):
    # group-check used at scale: sha2(text) per url identical across runs
    pg = synth.pages(spark, 300)
    a = pg.select("url", F.sha2(F.col("text"), 256).alias("h")).toPandas()
    b = (
        synth.pages(spark, 300)
        .select("url", F.sha2(text.extract_text_col(F.col("html")), 256).alias("h"))
        .toPandas()
    )
    m = a.merge(b, on="url", suffixes=("_a", "_b"))
    assert (m.h_a == m.h_b).all()


def test_token_count_matches_duckdb(spark, duck):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = (
        docs.select("doc_id", text.token_count_col(F.col("text")).alias("n_tokens"))
        .toPandas()
        .sort_values("doc_id")
    )
    exp = duck.sql(
        """SELECT doc_id, case when trim(text) = '' then 0
           else len(regexp_split_to_array(trim(text), '\\s+')) end AS n_tokens
           FROM '/root/testdata/sf0.001/documents.parquet' ORDER BY doc_id"""
    ).df()
    assert (got.n_tokens.values == exp.n_tokens.values).all()


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of the house is here"),
            (2, "der hund und die katze ist nicht hier"),
            (3, "xyzzy qwerty asdf"),
        ],
        "id int, text string",
    )
    got = {r["id"]: r["lang"] for r in df.select("id", text.lang_id_col(F.col("text")).alias("lang")).collect()}
    assert got[1] == "en"
    assert got[2] == "de"
    assert got[3] == "und"


def test_quality_and_fingerprint_deterministic(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(100)
    q1 = docs.select("doc_id", text.quality_score_col(F.col("text")).alias("q")).toPandas()
    q2 = docs.select("doc_id", text.quality_score_col(F.col("text")).alias("q")).toPandas()
    assert (q1.sort_values("doc_id").q.values == q2.sort_values("doc_id").q.values).all()
    f1 = docs.select(text.fingerprint_col(F.col("text")).alias("f")).toPandas()
    assert f1.f.between(0, 1_000_000_006).all()


def test_canonical_url_col_rules(spark):
    """Web-dedup URL canonicalization: case, default ports, fragments,
    tracking params, param order — and the DuckDB twin agrees exactly."""
    import duckdb
    import pandas as pd
    from pyspark.sql import functions as F

    from codem_spark.functions import text as T

    urls = [
        "http://ExAmple3.com/page/7?b=2&a=1",
        "HTTP://EXAMPLE3.COM:80/page/7?a=1&utm_source=x&b=2#frag",
        "https://Host.Org:443/",
        "https://host.org/",
        "http://a.com/path/?gclid=zz",
        "http://a.com/x?fbclid=1&ref=home",
        "http://b.com:8080/y?z=1",  # non-default port preserved
    ]
    df = spark.createDataFrame(pd.DataFrame({"url": urls}))
    got = [r["c"] for r in df.select(T.canonical_url_col(F.col("url")).alias("c")).collect()]
    assert got[0] == got[1] == "http://example3.com/page/7?a=1&b=2"
    assert got[2] == got[3] == "https://host.org"
    assert got[4] == "http://a.com/path/"
    assert got[5] == "http://a.com/x"
    assert got[6] == "http://b.com:8080/y?z=1"
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"url": urls}))
    oracle = con.sql(f"SELECT {T.canonical_url_sql('url')} AS c FROM t").df()["c"].tolist()
    assert got == oracle
    # JVM-only: the expression must not plan any Python eval node
    plan = df.select(T.canonical_url_col(F.col("url")).alias("c"))._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
