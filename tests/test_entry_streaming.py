"""Driver-contract smoke + streaming extension tests."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from sparkspatial import fixtures, streaming

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"zone_id", "page_count", "n_domains"} <= set(df.columns)


def test_queries_have_oracles_and_run(spark, sf_dir):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    # every oracle key must be a query key
    assert set(oracles) <= set(qs)
    # a fast representative subset runs + matches duckdb at sf0.001
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{sf_dir}/{t}.parquet'")
    for name in ["grid_counts", "tag_pivot", "token_count", "dedup_exact"]:
        spdf = qs[name](spark, sf_dir).toPandas()
        opdf = con.execute(oracles[name]).df()
        assert len(spdf) == len(opdf), name
        sc, oc = sorted(spdf.columns), sorted(opdf.columns)
        assert sc == oc, name
        a = sorted(map(tuple, spdf[sc].astype(str).values.tolist()))
        b = sorted(map(tuple, opdf[oc].astype(str).values.tolist()))
        assert a == b, name


def test_streaming_grid_counts(spark, tmp_path):
    pages = fixtures.synthetic_pages(spark, n=400, n_domains=20)
    path = str(tmp_path / "pages_stream")
    pages.write.mode("overwrite").parquet(path)

    stream = streaming.read_pages_stream(spark, path)
    assert stream.isStreaming
    agg = streaming.streaming_grid_counts(stream, res=6, window="1 hour")
    name = streaming.run_to_memory(agg, "t_stream_out")
    got = spark.sql(f"SELECT * FROM {name}")
    total = got.agg(F.sum("page_count")).first()[0]
    assert total == 400  # every page lands in exactly one (window, cell)
    assert got.where(F.col("cell").isNull()).count() == 0

    # streaming result == batch result on the same data (Kappa property)
    from sparkspatial import cells, extract
    batch = extract.geotag(spark.read.parquet(path), "domain", "url")
    batch = batch.withColumn("cell",
                             F.expr(cells.cell_sql("lat", "lon", 6)))
    want = {(r.cell,): r.n for r in
            batch.groupBy("cell").agg(F.count("*").alias("n")).collect()}
    got_cells = {(r.cell,): r.page_count for r in
                 got.groupBy("cell").agg(
                     F.sum("page_count").alias("page_count"))
                 .withColumnRenamed("sum(page_count)", "page_count")
                 .collect()}
    assert got_cells == want
