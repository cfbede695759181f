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


def test_run_pipeline_with_knn(spark, tmp_path):
    """--knn stage under the deployment entry point: output exact-
    matches knn_bruteforce for the same hash-sampled query side, and
    a second run with the same fingerprints serves the knn stage from
    the checkpoint (lineage row present, results identical)."""
    from sparkspatial import extract, fixtures, knn

    import run_pipeline

    pages = fixtures.synthetic_pages(spark, n=300, n_domains=15)
    pages_path = str(tmp_path / "pages")
    pages.write.mode("overwrite").parquet(pages_path)

    import __spark_entry__ as entrymod
    zones_path = str(tmp_path / "zones")
    entrymod._poly_zones_df(spark).write.parquet(zones_path)

    out = str(tmp_path / "out")
    args = ["--pages", pages_path, "--zones", zones_path, "--out", out,
            "--checkpoint", str(tmp_path / "ck"),
            "--res", "8", "--rollup", "5",
            "--knn", "3", "--knn-sample", "10", "--knn-res", "8"]
    run_pipeline.main(args)

    got = {(r.qid, r.rnk): (r.url, round(r.dist_m, 6))
           for r in spark.read.parquet(f"{out}/knn").collect()}
    pts = extract.extract_points(spark.read.parquet(pages_path))
    queries = (pts.where("xxhash64(url) % 10 = 0")
               .selectExpr("url AS qid", "lat AS qlat", "lon AS qlon"))
    want = {(r.qid, r.rnk): (r.url, round(r.dist_m, 6))
            for r in knn.knn_bruteforce(pts, queries, 3).collect()}
    assert got == want and len(want) > 0

    # resumed run: same fingerprints -> knn served from checkpoint
    # (manifest mtime unchanged proves no recompute: stage() rewrites
    # the manifest whenever it materializes)
    manifest = str(tmp_path / "ck" / "knn" / "_MANIFEST.json")
    mtime_before = os.path.getmtime(manifest)
    run_pipeline.main(args)
    assert os.path.getmtime(manifest) == mtime_before
    got2 = {(r.qid, r.rnk): (r.url, round(r.dist_m, 6))
            for r in spark.read.parquet(f"{out}/knn").collect()}
    assert got2 == got
