"""spark-submit entry point (tools/run_pipeline.py) exercised
in-process, including the round-3 --building-overlay mode."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))


def test_run_pipeline_with_building_overlay(spark, tmp_path):
    import __spark_entry__ as entrymod
    from sparkspatial import fixtures

    import run_pipeline

    pages = fixtures.synthetic_pages(spark, n=300, n_domains=15)
    pages_path = str(tmp_path / "pages")
    pages.write.mode("overwrite").parquet(pages_path)

    zdf = entrymod._poly_zones_df(spark)
    zones_path = str(tmp_path / "zones")
    zdf.write.mode("overwrite").parquet(zones_path)

    out = str(tmp_path / "out")
    run_pipeline.main([
        "--pages", pages_path, "--zones", zones_path, "--out", out,
        "--checkpoint", str(tmp_path / "ck"),
        "--res", "8", "--rollup", "5", "--building-overlay"])

    pairs = spark.read.parquet(f"{out}/building_overlay")
    counts = spark.read.parquet(f"{out}/building_overlay_counts")
    assert pairs.count() > 0
    assert set(pairs.columns) == {"url", "zone_id"}
    # counts re-aggregate to the pair totals, zones all from the input
    got = {r.zone_id: r.building_count for r in counts.collect()}
    want = {r.zone_id: r.n for r in
            pairs.groupBy("zone_id").agg(
                F.count(F.lit(1)).alias("n")).collect()}
    assert got == want
    zone_ids = {r.zone_id for r in zdf.select("zone_id").collect()}
    assert set(got) <= zone_ids
    # the point-join rollup outputs still produced
    assert spark.read.parquet(f"{out}/res=8").count() > 0
    assert spark.read.parquet(f"{out}/res=5").count() > 0
