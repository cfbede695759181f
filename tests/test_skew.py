"""Skew-handling effectiveness + negative-path tests."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sparkspatial import join, skew, transform


@pytest.fixture(scope="module")
def skewed_points(spark):
    """90% of points in one cell (extreme web-corpus hotspot)."""
    n = 20_000
    rng = np.random.RandomState(42)
    hot = rng.uniform(-0.01, 0.01, (int(n * 0.9), 2)) + [40.2, -74.0]
    cold_lat = rng.uniform(-50, 50, (n - len(hot),))
    cold_lon = rng.uniform(-170, 170, (n - len(hot),))
    pdf = pd.DataFrame({
        "url": [f"u{i}" for i in range(n)],
        "lat": np.concatenate([hot[:, 0], cold_lat]),
        "lon": np.concatenate([hot[:, 1], cold_lon]),
    })
    return spark.createDataFrame(pdf).persist()


def test_salting_splits_hot_cells(spark, skewed_points):
    from sparkspatial import cells as cellmod

    pts = skewed_points.withColumn(
        "cell", F.expr(cellmod.cell_sql("lat", "lon", 8)))
    hist = skew.cell_histogram(pts, sample_fraction=0.2, min_count=1)
    plan = skew.plan_salts(hist, hot_threshold=1000, target_rows=2000)
    plans = {r.cell: r.n_salt for r in plan.collect()}
    assert len(plans) >= 1
    assert max(plans.values()) >= 4  # the hot cell splits into >= 4

    salted = skew.salt_points(pts, plan, id_cols=["url"])
    # the hot cell's points spread across its salt buckets
    hot_cell = max(plans, key=plans.get)
    dist = (salted.where(F.col("cell") == hot_cell)
            .groupBy("salt").count().collect())
    counts = [r["count"] for r in dist]
    assert len(counts) == plans[hot_cell]
    assert max(counts) < sum(counts) * 0.5  # no single bucket dominates

    # cover replication matches the plan
    cover = spark.createDataFrame(
        [(int(hot_cell), "z1")], "cell long, zone_id string")
    rep = skew.salt_cover(cover, plan)
    assert rep.count() == plans[hot_cell]


def test_salted_join_balances_partitions(spark, skewed_points):
    """Max rows per (cell,salt) key shrinks by the salt factor."""
    from sparkspatial import cells as cellmod

    pts = skewed_points.withColumn(
        "cell", F.expr(cellmod.cell_sql("lat", "lon", 8)))
    unsalted_max = (pts.groupBy("cell").count()
                    .agg(F.max("count")).first()[0])
    hist = skew.cell_histogram(pts, sample_fraction=0.5, min_count=1)
    plan = skew.plan_salts(hist, hot_threshold=1000, target_rows=2000)
    salted = skew.salt_points(pts, plan, id_cols=["url"])
    salted_max = (salted.groupBy("cell", "salt").count()
                  .agg(F.max("count")).first()[0])
    assert salted_max < unsalted_max / 3


# ------------------------------------------------------------ negative paths

def test_bad_tags_type_yields_false_predicate():
    # negative-path contract (TransformTest.groovy:76-99): malformed
    # tags produce a False predicate (empty downstream results), not an
    # exception — round-2 parity change, see test_zones_schema too
    pred, keys = transform.create_where_filter(42)
    assert keys == []
    assert "false" in str(pred).lower()


def test_join_rejects_unknown_how(spark, skewed_points):
    zdf = spark.createDataFrame([], "zone_id string, the_geom_wkb binary, "
                                    "minx double, miny double, "
                                    "maxx double, maxy double")
    with pytest.raises(ValueError):
        join.spatial_join(skewed_points, zdf, how="full_outer",
                          broadcast=True)


def test_cells_res_bounds():
    import numpy as np

    from sparkspatial import cells

    with pytest.raises(ValueError):
        cells.encode(np.array([0.0]), np.array([0.0]), 29)
    with pytest.raises(ValueError):
        cells.children(int(cells.encode(
            np.array([0.0]), np.array([0.0]), cells.MAX_RES)[0]))
