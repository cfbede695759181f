"""Bucketed-table plan guarantees: joins and aggregations on the
bucket key must run with NO exchange (the write pre-paid the shuffle,
like the reference's build-once indexes, SURVEY.md §2.8 P1-P3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkspatial import bucketing


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("buckets")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet") \
        .withColumnRenamed("vec_id", "doc_id")
    bucketing.save_bucketed(docs, "docs_b", "doc_id", 4,
                            sort_col="doc_id",
                            path=str(base / "docs_b"))
    bucketing.save_bucketed(emb, "emb_b", "doc_id", 4,
                            sort_col="doc_id",
                            path=str(base / "emb_b"))
    yield spark
    spark.sql("DROP TABLE IF EXISTS docs_b")
    spark.sql("DROP TABLE IF EXISTS emb_b")


def test_bucket_bucket_join_has_no_exchange(bucketed):
    spark = bucketed
    a = bucketing.read_table(spark, "docs_b")
    b = bucketing.read_table(spark, "emb_b")
    # disable broadcast so the join must satisfy distribution by
    # bucketing (at real scale neither side broadcasts anyway)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = a.join(b, "doc_id").select("doc_id", "lang", "label")
        plan = _plan(out)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert out.count() == a.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucket_agg_has_no_exchange(bucketed):
    spark = bucketed
    a = bucketing.read_table(spark, "docs_b")
    out = a.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    plan = _plan(out)
    assert "Exchange" not in plan


def test_unbucketed_join_does_exchange(bucketed, sf_dir):
    """Control: the same join over plain parquet shuffles — proving
    the no-Exchange property above comes from bucketing, not AQE."""
    spark = bucketed
    a = spark.read.parquet(f"{sf_dir}/documents.parquet")
    b = spark.read.parquet(f"{sf_dir}/embeddings.parquet") \
        .withColumnRenamed("vec_id", "doc_id")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(a.join(b, "doc_id"))
        assert "Exchange" in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_roundtrip_values(bucketed, sf_dir):
    spark = bucketed
    a = bucketing.read_table(spark, "docs_b")
    orig = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert sorted(r.doc_id for r in a.select("doc_id").collect()) == \
        sorted(r.doc_id for r in orig.select("doc_id").collect())


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    """Hive-partitioned layout by lang: a lang-filtered read must
    prune at the FILE level (PartitionFilters in the scan, other
    langs' files never opened) — the write-side layout lever that
    pairs with bucketing for 100 TB corpora."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = str(tmp_path / "docs_by_lang")
    docs.write.mode("overwrite").partitionBy("lang").parquet(path)

    q = spark.read.parquet(path).where(F.col("lang") == "en") \
        .select("doc_id")
    plan = q._jdf.queryExecution().toString()
    assert "PartitionFilters: [isnotnull(lang" in plan
    # correctness: same rows as filtering the unpartitioned table
    assert q.count() == docs.where("lang = 'en'").count()
