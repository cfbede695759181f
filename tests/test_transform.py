"""Transform-parity tests against the reference micro-fixture.

Golden expectations transcribed from TransformTest.groovy /
TransformUtilsTest.groovy (FIXTURES.md A.2):
- toPoints({building:house}, keep=[water]) -> nodes 1 (water NULL)
  and 4 (water=lake), Point geometry          (TransformTest:104-147)
- toLines  -> 'w1' LineString + 'r1' MultiLineString, building=house,
  water=lake                                  (TransformTest:182-226)
- toPolygons -> 'w1' Polygon + 'r1' Polygon   (TransformTest:261-305)
- unknown tag {toto:tata} -> empty            (TransformTest:366-368)
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparkspatial import geom, transform
from sparkspatial.fixtures import micro_osm


@pytest.fixture(scope="module")
def osm(spark):
    return micro_osm(spark)


TAGS = {"building": "house"}
KEEP = ["water"]


def test_to_points_golden(osm):
    rows = {r.id_node: r for r in
            transform.to_points(osm, TAGS, KEEP).collect()}
    assert set(rows) == {"1", "4"}
    assert rows["1"].water is None
    assert rows["4"].water == "lake"
    assert rows["1"].building == "house"
    g = geom.wkb_loads(bytes(rows["4"].the_geom_wkb))
    assert g == ("Point", (10.0, 10.0))


def test_to_lines_golden(osm):
    rows = {r.id: r for r in transform.to_lines(osm, TAGS, KEEP).collect()}
    assert set(rows) == {"w1", "r1"}
    for r in rows.values():
        assert r.building == "house" and r.water == "lake"
    gw = geom.wkb_loads(bytes(rows["w1"].the_geom_wkb))
    assert gw[0] == "LineString" and len(gw[1]) == 5
    gr = geom.wkb_loads(bytes(rows["r1"].the_geom_wkb))
    assert gr[0] == "MultiLineString"


def test_to_polygons_golden(osm):
    rows = {r.id: r for r in transform.to_polygons(osm, TAGS, KEEP).collect()}
    assert set(rows) == {"w1", "r1"}
    for r in rows.values():
        g = geom.wkb_loads(bytes(r.the_geom_wkb))
        assert g[0] == "Polygon"
        assert abs(abs(geom.ring_area(g[1][0])) - 100.0) < 1e-9
        assert r.building == "house" and r.water == "lake"


def test_unknown_tag_empty(osm):
    assert transform.to_polygons(osm, {"toto": "tata"}).count() == 0
    assert transform.to_points(osm, {"toto": "tata"}).count() == 0


def test_tag_filter_forms(osm):
    # list form: key presence
    pts = transform.to_points(osm, ["water"])
    assert {r.id_node for r in pts.collect()} == {"3", "4"}
    # dict with list values
    pts2 = transform.to_points(osm, {"material": ["concrete", "brick"]})
    assert {r.id_node for r in pts2.collect()} == {"1", "2"}
    # dict with None value = presence
    pts3 = transform.to_points(osm, {"building": None})
    assert {r.id_node for r in pts3.collect()} == {"1", "4"}
    # tuple key: same values over several keys
    pts4 = transform.to_points(osm, {("building", "water"): ["house", "lake"]})
    assert {r.id_node for r in pts4.collect()} == {"1", "3", "4"}


def test_pivot_requested_keys_only(osm):
    out = transform.to_points(osm, {"building": "house"}, ["material"])
    cols = set(out.columns)
    assert "building" in cols and "material" in cols
    assert "water" not in cols  # not requested -> excluded (TUTest:488+)


def test_nonclosed_way_excluded_from_polygons(spark):
    """A way whose ring is not closed yields no polygon but a line."""
    from sparkspatial.fixtures import micro_osm

    osm = micro_osm(spark)
    # drop the closing node (order 5)
    osm = dict(osm)
    osm["way_node"] = osm["way_node"].where(F.col("node_order") != 5)
    polys = transform.extract_ways(osm["way_tag"], osm["way_node"],
                                   osm["node"], TAGS, KEEP, as_polygon=True)
    lines = transform.extract_ways(osm["way_tag"], osm["way_node"],
                                   osm["node"], TAGS, KEEP, as_polygon=False)
    assert polys.count() == 0
    assert lines.count() == 1


def test_relation_polygon_with_hole(spark):
    """Multipolygon relation: outer square + inner 'hole' square ->
    polygon with hole; hole interior excluded (Transform:422-444)."""
    def pt(x, y):
        return bytearray(geom.point_wkb(float(x), float(y)))

    node = spark.createDataFrame(
        [(i + 1, pt(x, y)) for i, (x, y) in enumerate(
            [(0, 0), (10, 0), (10, 10), (0, 10),     # outer
             (4, 4), (6, 4), (6, 6), (4, 6)])],      # inner
        "id_node long, the_geom_wkb binary")
    way_node = spark.createDataFrame(
        [(1, 1, 1), (1, 2, 2), (1, 3, 3), (1, 4, 4), (1, 1, 5),
         (2, 5, 1), (2, 6, 2), (2, 7, 3), (2, 8, 4), (2, 5, 5)],
        "id_way long, id_node long, node_order int")
    way_member = spark.createDataFrame(
        [(7, 1, "outer", 1), (7, 2, "inner", 2)],
        "id_relation long, id_way long, role string, way_order int")
    relation_tag = spark.createDataFrame(
        [(7, "building", "house")],
        "id_relation long, tag_key string, tag_value string")
    out = transform.extract_relations(relation_tag, way_member, way_node,
                                      node, {"building": "house"},
                                      as_polygon=True).collect()
    assert len(out) == 1
    g = geom.wkb_loads(bytes(out[0].the_geom_wkb))
    assert g[0] == "Polygon" and len(g[1]) == 2  # shell + hole
    assert out[0].id == "r7"
    # area = 100 - 4
    area = abs(geom.ring_area(g[1][0])) - abs(geom.ring_area(g[1][1]))
    assert abs(area - 96.0) < 1e-9


def test_relation_ring_from_split_ways(spark):
    """Outer ring split across two member ways must linemerge into one
    closed ring (Transform:358-396)."""
    def pt(x, y):
        return bytearray(geom.point_wkb(float(x), float(y)))

    node = spark.createDataFrame(
        [(1, pt(0, 0)), (2, pt(10, 0)), (3, pt(10, 10)), (4, pt(0, 10))],
        "id_node long, the_geom_wkb binary")
    # way 1: 1->2->3 ; way 2: 3->4->1
    way_node = spark.createDataFrame(
        [(1, 1, 1), (1, 2, 2), (1, 3, 3), (2, 3, 1), (2, 4, 2), (2, 1, 3)],
        "id_way long, id_node long, node_order int")
    way_member = spark.createDataFrame(
        [(9, 1, "outer", 1), (9, 2, "outer", 2)],
        "id_relation long, id_way long, role string, way_order int")
    relation_tag = spark.createDataFrame(
        [(9, "landuse", "forest")],
        "id_relation long, tag_key string, tag_value string")
    out = transform.extract_relations(relation_tag, way_member, way_node,
                                      node, {"landuse": "forest"},
                                      as_polygon=True).collect()
    assert len(out) == 1
    g = geom.wkb_loads(bytes(out[0].the_geom_wkb))
    assert g[0] == "Polygon"
    assert abs(abs(geom.ring_area(g[1][0])) - 100.0) < 1e-9


def test_union_align_schema_padding(spark):
    a = spark.createDataFrame([("x", 1)], "id string, building string")
    b = spark.createDataFrame([("y", "lake")], "id string, water string")
    out = transform.union_align(a, b)
    assert set(out.columns) == {"id", "building", "water"}
    rows = {r.id: r for r in out.collect()}
    assert rows["x"].water is None and rows["y"].building is None
