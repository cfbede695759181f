"""kNN via k-ring cell expansion with exact distance re-rank.

Extension beyond the reference (SURVEY.md §2.3: "kNN is required by the
north_rule"). For each query point: candidates are points whose cell
lies in the query's k-ring; candidates re-rank by exact haversine; the
result is certified exact when the k-th distance fits inside the
guaranteed-covered window of the searched ring, else the ring doubles
and only the unsatisfied queries re-run (a shrinking driver loop,
each round a broadcast join of the remaining query ring-cells).

Ties break deterministically by (distance, point id).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import cells, geom

# conservative meters-per-degree bounds (min over the globe for lat;
# cos-scaled at the window's worst latitude for lon)
MIN_M_PER_DEG_LAT = 110_567.0


def _ring_cells_df(spark, queries_pdf: pd.DataFrame, ring: int, res: int):
    """Driver-side expansion of query points into their k-ring cells."""
    rows = []
    qcell = cells.encode(queries_pdf["qlat"].to_numpy(),
                         queries_pdf["qlon"].to_numpy(), res)
    for i, qc in enumerate(qcell):
        for c in cells.kring(int(qc), ring):
            rows.append((queries_pdf["qid"].iloc[i],
                         float(queries_pdf["qlat"].iloc[i]),
                         float(queries_pdf["qlon"].iloc[i]), int(c)))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["qid", "qlat", "qlon", "cell"]),
        "qid string, qlat double, qlon double, cell long")


def knn_join(points: DataFrame, queries: DataFrame, k: int, *,
             res: int = 10, point_id: str = "url",
             lat_col: str = "lat", lon_col: str = "lon",
             qid_col: str = "qid", qlat_col: str = "qlat",
             qlon_col: str = "qlon",
             initial_ring: int = 1, max_ring: int = 64) -> DataFrame:
    """Exact kNN: returns (qid, point_id, dist_m, rnk) with rnk 1..k.

    `queries` is expected to be small (it collects to the driver to
    build ring-cell candidate tables); `points` is the big side and is
    only ever touched through cell-equi-joins + window top-k.
    """
    spark = points.sparkSession
    pts = points.withColumn("cell", F.expr(cells.cell_sql(lat_col, lon_col, res)))

    q_pdf = (queries.select(F.col(qid_col).cast("string").alias("qid"),
                            F.col(qlat_col).alias("qlat"),
                            F.col(qlon_col).alias("qlon"))
             .toPandas())

    cell_h_deg = 180.0 / (1 << res)
    cell_w_deg = 360.0 / (1 << res)

    results: list[DataFrame] = []
    ring = initial_ring
    remaining = q_pdf
    while len(remaining) > 0:
        ring_df = _ring_cells_df(spark, remaining, ring, res)
        cand = pts.join(F.broadcast(ring_df), on="cell", how="inner")

        dist = 2.0 * F.lit(geom.EARTH_RADIUS_M) * F.asin(F.sqrt(
            F.pow(F.sin(F.radians(F.col(lat_col) - F.col("qlat")) / 2), 2)
            + F.cos(F.radians(F.col("qlat"))) * F.cos(F.radians(F.col(lat_col)))
            * F.pow(F.sin(F.radians(F.col(lon_col) - F.col("qlon")) / 2), 2)))
        cand = cand.withColumn("dist_m", dist)

        w = Window.partitionBy("qid").orderBy(F.col("dist_m").asc(),
                                              F.col(point_id).asc())
        # persist: the certification aggregate AND the per-round result
        # both consume topk — unpersisted it would re-scan the corpus
        topk = (cand.withColumn("rnk", F.row_number().over(w))
                    .where(F.col("rnk") <= k)
                    .select("qid", "qlat", "qlon", point_id, "dist_m", "rnk")
                    .persist())

        got = topk.groupBy("qid", "qlat", "qlon").agg(
            F.count(F.lit(1)).alias("n"), F.max("dist_m").alias("dmax")).toPandas()

        if len(got) < len(remaining):
            got = remaining.merge(got, on=["qid", "qlat", "qlon"], how="left")
            got["n"] = got["n"].fillna(0)
            got["dmax"] = got["dmax"].fillna(np.inf)

        # certification: everything within dmax must lie inside the ring
        # window. Guaranteed covered radius (meters, conservative):
        lat_abs = np.abs(got["qlat"].to_numpy()) + ring * cell_h_deg
        m_per_deg_lon = 111_320.0 * np.cos(np.radians(np.minimum(lat_abs, 89.9)))
        cover_m = np.minimum(ring * cell_h_deg * MIN_M_PER_DEG_LAT,
                             ring * cell_w_deg * m_per_deg_lon)
        ok = (got["n"].to_numpy() >= k) & (got["dmax"].to_numpy() < cover_m)
        ok_ids = set(got.loc[ok, "qid"])
        if ok_ids:
            done_df = topk.where(F.col("qid").isin([str(x) for x in ok_ids]))
            results.append(done_df.select("qid", point_id, "dist_m", "rnk"))
        remaining = remaining[~remaining["qid"].isin(ok_ids)].reset_index(drop=True)
        if len(remaining) > 0 and ring >= max_ring:
            # ring expansion exhausted (queries far from all data, or
            # fewer than k points exist): exact brute-force for the
            # remaining handful of queries — still bounded, since only
            # uncertified queries reach this branch
            rest_q = spark.createDataFrame(
                remaining, "qid string, qlat double, qlon double")
            results.append(knn_bruteforce(points, rest_q, k,
                                          point_id=point_id,
                                          lat_col=lat_col, lon_col=lon_col))
            break
        ring *= 2

    if not results:
        return spark.createDataFrame(
            [], f"qid string, {point_id} string, dist_m double, rnk int")
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out


def haversine_col(lat1, lon1, lat2, lon2):
    """Haversine meters as a Column expression (shared by kNN/range)."""
    return 2.0 * F.lit(geom.EARTH_RADIUS_M) * F.asin(F.sqrt(
        F.pow(F.sin(F.radians(lat2 - lat1) / 2), 2)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2))
        * F.pow(F.sin(F.radians(lon2 - lon1) / 2), 2)))


def range_join(points: DataFrame, queries: DataFrame, radius_m: float, *,
               res: int = 10, point_id: str = "url",
               lat_col: str = "lat", lon_col: str = "lon",
               qid_col: str = "qid", qlat_col: str = "qlat",
               qlon_col: str = "qlon") -> DataFrame:
    """Within-radius join: all (query, point) pairs with haversine
    distance <= radius_m (the buffer/overlay range query; a range
    join the reference lacks — SURVEY.md §2.3 note).

    Each query's circle bbox explodes into covering cells (conservative
    lat/lon padding); points equi-join on cell; the exact haversine
    predicate filters JVM-side. No driver loop, no Python.
    """
    import pandas as pd

    spark = points.sparkSession
    q_pdf = (queries.select(F.col(qid_col).cast("string").alias("qid"),
                            F.col(qlat_col).alias("qlat"),
                            F.col(qlon_col).alias("qlon")).toPandas())
    if len(q_pdf) == 0:
        return spark.createDataFrame(
            [], f"qid string, {point_id} string, dist_m double")
    qlat = q_pdf["qlat"].to_numpy(np.float64)
    qlon = q_pdf["qlon"].to_numpy(np.float64)
    dlat = radius_m / MIN_M_PER_DEG_LAT
    coslat = np.cos(np.radians(np.minimum(np.abs(qlat) + dlat, 89.9)))
    dlon = radius_m / (110_567.0 * np.maximum(coslat, 1e-9))

    # one resolution for BOTH sides (cell equality is the join key):
    # coarsen until the widest circle bbox covers <= 256 cells
    while res > 0:
        nx = 2.0 * dlon.max() / (360.0 / (1 << res)) + 2
        ny = 2.0 * dlat / (180.0 / (1 << res)) + 2
        if nx * ny <= 256:
            break
        res -= 1
    pts = points.withColumn("cell", F.expr(cells.cell_sql(lat_col, lon_col, res)))
    idx, cell = cells.covering_cells_many(
        qlon - dlon, qlat - dlat, qlon + dlon, qlat + dlat, res,
        max_cells_per_box=10 ** 9)
    ring_df = spark.createDataFrame(
        pd.DataFrame({"qid": q_pdf["qid"].to_numpy()[idx],
                      "qlat": qlat[idx], "qlon": qlon[idx], "cell": cell}),
        "qid string, qlat double, qlon double, cell long")

    cand = pts.join(F.broadcast(ring_df), on="cell", how="inner")
    dist = haversine_col(F.col("qlat"), F.col("qlon"),
                         F.col(lat_col), F.col(lon_col))
    return (cand.withColumn("dist_m", dist)
            .where(F.col("dist_m") <= radius_m)
            .select("qid", point_id, "dist_m"))


def knn_bruteforce(points: DataFrame, queries: DataFrame, k: int, *,
                   point_id: str = "url", lat_col: str = "lat",
                   lon_col: str = "lon", qid_col: str = "qid",
                   qlat_col: str = "qlat", qlon_col: str = "qlon") -> DataFrame:
    """Cross-join oracle (FIXTURES.md B.5) — small inputs only."""
    dist = 2.0 * F.lit(geom.EARTH_RADIUS_M) * F.asin(F.sqrt(
        F.pow(F.sin(F.radians(F.col(lat_col) - F.col(qlat_col)) / 2), 2)
        + F.cos(F.radians(F.col(qlat_col))) * F.cos(F.radians(F.col(lat_col)))
        * F.pow(F.sin(F.radians(F.col(lon_col) - F.col(qlon_col)) / 2), 2)))
    w = Window.partitionBy(qid_col).orderBy(F.col("dist_m").asc(),
                                            F.col(point_id).asc())
    return (queries.crossJoin(points)
            .withColumn("dist_m", dist)
            .withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= k)
            .select(F.col(qid_col).alias("qid"), point_id, "dist_m", "rnk"))
