"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-
insensitive value-hash -> CORRECTNESS_r{N}.json).

Queries derive a web-page corpus from the provided tables
(FIXTURES.md B.4: ``url = source || '/' || doc_id``), geotag it with
the canonical cross-engine arithmetic geocode (sparkspatial/geocode.py)
and run the engine's operators; oracles re-state the semantics in
DuckDB-dialect ANSI SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkspatial import extract, join, tiles, zones
from sparkspatial.geocode import lat_sql, lon_sql, url_sql
from sparkspatial import cells as cellmod

# ---------------------------------------------------------------------------
# shared derivations
# ---------------------------------------------------------------------------

# oracle-visible zone set: axis-aligned rectangles over the geocode
# bands (5 hot-lattice zones + 8 cold-band zones). Chosen with edges
# that derived points cannot hit exactly.
# Edges end in a ten-thousandth in {1,3,7,9}: derived points sit on a
# 0.0005-degree lattice, so no point can ever fall exactly on an edge
# (keeps raycast vs BETWEEN boundary semantics out of the comparison).
ORACLE_ZONES = [
    # (zone_id, minx, miny, maxx, maxy)
    ("hot_a", -74.4103, 39.9107, -73.8901, 40.4309),
    ("hot_b", -73.9103, 40.4107, -73.3901, 40.9709),
    ("hot_c", -74.8703, 39.5301, -74.3909, 41.1107),
    ("cold_a", -170.1303, -50.0707, -120.1101, -10.0309),
    ("cold_b", -120.1101, -50.0707, -70.0903, -10.0309),
    ("cold_c", -70.0903, -50.0707, -20.0701, -10.0309),
    ("cold_d", -20.0701, -50.0707, 29.9501, -10.0309),
    ("cold_e", 29.9501, -50.0707, 79.9703, -10.0309),
    ("cold_f", 79.9703, -50.0707, 129.9901, -10.0309),
    ("cold_g", -170.1303, -10.0309, 0.0101, 49.9903),
    ("cold_h", 0.0101, -10.0309, 170.1303, 49.9903),
    ("band_s", -179.9301, -59.9707, 179.9301, -50.0707),
]


def _pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.expr(url_sql("source", "doc_id", "spark")).alias("url"),
        F.col("source").alias("domain"),
        "lang", "doc_id", "text", "n_chars")


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract.geotag(_pages(spark, sf_dir), "domain", "url")


def _zones_df(spark: SparkSession) -> DataFrame:
    from sparkspatial import geom
    rows = []
    for zid, minx, miny, maxx, maxy in ORACLE_ZONES:
        g = geom.wkb_loads(geom.box_wkb(minx, miny, maxx, maxy))
        rows.append(zones.zone_row(zid, g))
    return spark.createDataFrame(rows, zones.ZONE_SCHEMA)


def _duck_points_cte() -> str:
    """DuckDB CTE producing (url, domain, lang, doc_id, lat, lon)."""
    u = url_sql("source", "doc_id", "duckdb")
    return (
        "pts AS (SELECT "
        f"{u} AS url, source AS domain, lang, doc_id, "
        f"{lat_sql('source', u, 'duckdb')} AS lat, "
        f"{lon_sql('source', u, 'duckdb')} AS lon "
        "FROM documents)"
    )


def _duck_zones_cte() -> str:
    vals = ", ".join(
        f"('{z}', {a}, {b}, {c}, {d})" for z, a, b, c, d in ORACLE_ZONES)
    return ("zon(zone_id, minx, miny, maxx, maxy) AS "
            f"(SELECT * FROM (VALUES {vals}))")


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def q_spatial_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5/J6: engine spatial join, per-zone page counts."""
    pts = _points(spark, sf_dir)
    zdf = _zones_df(spark)
    matched = join.spatial_join(pts, zdf, how="inner", broadcast=True)
    return (matched.groupBy("zone_id")
            .agg(F.count(F.lit(1)).alias("page_count"),
                 F.countDistinct("domain").alias("n_domains"))
            .orderBy("zone_id"))


def q_spatial_join_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 row-level: exact (url, zone_id) match set."""
    pts = _points(spark, sf_dir)
    zdf = _zones_df(spark)
    return (join.spatial_join(pts, zdf, how="inner", broadcast=True)
            .select("url", "zone_id"))


def q_spatial_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 anti branch (Transform.groovy:437-442 pattern): pages in no zone."""
    pts = _points(spark, sf_dir)
    zdf = _zones_df(spark)
    return (join.spatial_join(pts, zdf, how="left_anti", broadcast=True)
            .select("url", "lat", "lon"))


def q_grid_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid aggregation: page counts per res-7 cell."""
    pts = _points(spark, sf_dir)
    g = tiles.assign_cells(pts, res=7)
    return (g.groupBy("cell").agg(F.count(F.lit(1)).alias("page_count"))
            .orderBy("cell"))


def q_grid_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup: res-9 counts re-aggregated to res-5 parents."""
    pts = _points(spark, sf_dir)
    g = tiles.assign_cells(pts, res=9)
    fine = g.groupBy("cell").agg(F.count(F.lit(1)).alias("n"))
    coarse = (fine.withColumn("pcell", tiles.parent_col("cell", 9, 5))
              .groupBy("pcell").agg(F.sum("n").alias("page_count"))
              .withColumnRenamed("pcell", "cell"))
    return coarse.orderBy("cell")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "spatial_join_counts": q_spatial_join_counts,
        "spatial_join_pairs": q_spatial_join_pairs,
        "spatial_antijoin": q_spatial_antijoin,
        "grid_counts": q_grid_counts,
        "grid_rollup": q_grid_rollup,
    }


def oracle_sql() -> dict[str, str]:
    pts = _duck_points_cte()
    zon = _duck_zones_cte()
    cell7 = cellmod.cell_sql("lat", "lon", 7)
    cell9 = cellmod.cell_sql("lat", "lon", 9)
    parent95 = cellmod.parent_sql("cell", 9, 5, dialect="duckdb")
    return {
        "spatial_join_counts": f"""
            WITH {pts}, {zon}
            SELECT z.zone_id,
                   COUNT(*) AS page_count,
                   COUNT(DISTINCT p.domain) AS n_domains
            FROM pts p JOIN zon z
              ON p.lat >= z.miny AND p.lat <= z.maxy
             AND p.lon >= z.minx AND p.lon <= z.maxx
            GROUP BY z.zone_id ORDER BY z.zone_id
        """,
        "spatial_join_pairs": f"""
            WITH {pts}, {zon}
            SELECT p.url, z.zone_id
            FROM pts p JOIN zon z
              ON p.lat >= z.miny AND p.lat <= z.maxy
             AND p.lon >= z.minx AND p.lon <= z.maxx
        """,
        "spatial_antijoin": f"""
            WITH {pts}, {zon}
            SELECT p.url, p.lat, p.lon
            FROM pts p
            WHERE NOT EXISTS (
                SELECT 1 FROM zon z
                WHERE p.lat >= z.miny AND p.lat <= z.maxy
                  AND p.lon >= z.minx AND p.lon <= z.maxx)
        """,
        "grid_counts": f"""
            WITH {pts}
            SELECT {cell7} AS cell, COUNT(*) AS page_count
            FROM pts GROUP BY 1 ORDER BY 1
        """,
        "grid_rollup": f"""
            WITH {pts}, fine AS (
                SELECT {cell9} AS cell, COUNT(*) AS n FROM pts GROUP BY 1)
            SELECT {parent95} AS cell, CAST(SUM(n) AS BIGINT) AS page_count
            FROM fine GROUP BY 1 ORDER BY 1
        """,
    }


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: pages -> geotag -> spatial join -> per-zone grid counts."""
    return q_spatial_join_counts(spark, "/root/testdata/sf0.001")
