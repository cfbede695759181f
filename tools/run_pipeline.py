"""spark-submit entry point for the flagship pipeline.

Cluster deployment (north_rule: pure-Python, no JARs):

    cd /root/repo && zip -r /tmp/sparkspatial.zip sparkspatial
    spark-submit --py-files /tmp/sparkspatial.zip \
        tools/run_pipeline.py \
        --pages  s3://bucket/pages/          \
        --zones  s3://bucket/zones.parquet   \
        --out    s3://bucket/out/            \
        --checkpoint s3://bucket/_ck         \
        --res 12 --rollup 9 6 3 --salt

Stages (each resumable through the fingerprinted checkpointer):
  1. extract: pages -> geo-marker points (Arrow UDTF)
  2. join:    points x zones spatial join (broadcast-or-shuffle,
              optional hot-cell salting)
  3. tiles:   per-cell indicators + hierarchical rollups
"""

from __future__ import annotations

import argparse
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--pages", required=True)
    p.add_argument("--zones", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--res", type=int, default=12)
    p.add_argument("--rollup", type=int, nargs="*", default=[9, 6])
    p.add_argument("--salt", action="store_true")
    p.add_argument("--broadcast", choices=["auto", "yes", "no"],
                   default="auto")
    p.add_argument("--code-version", default="v1")
    p.add_argument("--building-overlay", action="store_true",
                   help="additionally run the polygon x polygon "
                        "building overlay (quads of --bld-half-w/h "
                        "degrees around each extracted point) against "
                        "the zone polygons")
    p.add_argument("--bld-half-w", type=float, default=2.1e-4)
    p.add_argument("--bld-half-h", type=float, default=1.7e-4)
    args = p.parse_args(argv)

    from pyspark.sql import functions as F

    from sparkspatial import extract, join, tiles
    from sparkspatial.checkpoint import Checkpointer, fingerprint_of
    from sparkspatial.session import get_spark

    spark = get_spark(app="sparkspatial-pipeline")
    pages = spark.read.parquet(args.pages)
    zones_df = spark.read.parquet(args.zones)

    ck = Checkpointer(args.checkpoint, spark) if args.checkpoint else None

    points = extract.extract_points(pages)
    if ck:
        points = ck.stage(points, "extract",
                          fingerprint_of(args.pages, args.code_version,
                                         extract.EXTRACT_TEXT_VERSION))

    bcast = {"auto": None, "yes": True, "no": False}[args.broadcast]
    matched = join.spatial_join(points, zones_df, how="inner",
                                broadcast=bcast, salt=args.salt,
                                res=args.res)
    if ck:
        matched = ck.stage(matched, "join",
                           fingerprint_of(args.pages, args.zones,
                                          args.res, args.code_version))

    g = tiles.assign_cells(matched, res=args.res)
    fine = (g.groupBy("cell", "zone_id")
            .agg(F.count(F.lit(1)).alias("page_count")))
    fine.write.mode("overwrite").parquet(f"{args.out}/res={args.res}")
    for pr in args.rollup:
        level = (fine.withColumn("pcell",
                                 tiles.parent_col("cell", args.res, pr))
                 .groupBy("pcell", "zone_id")
                 .agg(F.sum("page_count").alias("page_count"))
                 .withColumnRenamed("pcell", "cell"))
        level.write.mode("overwrite").parquet(f"{args.out}/res={pr}")

    if args.building_overlay:
        # polygon x polygon overlay (round-3 operator) on the JVM
        # probe fast path: codegen bbox quads -> prebuilt poly-zone
        # index -> pairs + per-zone counts
        def dlit(x: float) -> str:
            r = repr(float(x))
            return r if "e" in r or "E" in r else r + "e0"

        pidx = join.build_poly_zone_index(zones_df)
        quads = points.selectExpr(
            "url",
            f"lon - {dlit(args.bld_half_w)} AS minx",
            f"lon + {dlit(args.bld_half_w)} AS maxx",
            f"lat - {dlit(args.bld_half_h)} AS miny",
            f"lat + {dlit(args.bld_half_h)} AS maxy")
        pairs = join.spatial_join_polygons(
            quads, probe_id="url", probe_rect=True, broadcast=bcast,
            index=pidx)
        if ck:
            pairs = ck.stage(pairs, "building_overlay",
                             fingerprint_of(args.pages, args.zones,
                                            args.bld_half_w,
                                            args.bld_half_h,
                                            args.code_version))
        pairs.write.mode("overwrite") \
            .parquet(f"{args.out}/building_overlay")
        (pairs.groupBy("zone_id")
         .agg(F.count(F.lit(1)).alias("building_count"))
         .write.mode("overwrite")
         .parquet(f"{args.out}/building_overlay_counts"))

    if ck:
        ck.lineage(spark).show(20, truncate=False)
    print("pipeline complete:", args.out)


if __name__ == "__main__":
    main()
