"""Zone-builder parity + OSM fixture schema golden tests.

Schema expectations transcribed from LoaderTest.groovy:466-744
(FIXTURES.md A.1); zone-builder semantics from Loader.groovy:71-218.
"""

from __future__ import annotations

import math

import pytest

from sparkspatial import geom, zones
from sparkspatial.fixtures import micro_osm

EXPECTED_SCHEMAS = {
    "node": {"id_node": "bigint", "the_geom_wkb": "binary"},
    "node_tag": {"id_node": "bigint", "tag_key": "string",
                 "tag_value": "string"},
    "node_member": {"id_relation": "bigint", "id_node": "bigint",
                    "role": "string", "node_order": "int"},
    "way": {"id_way": "bigint"},
    "way_node": {"id_way": "bigint", "id_node": "bigint",
                 "node_order": "int"},
    "way_tag": {"id_way": "bigint", "tag_key": "string",
                "tag_value": "string"},
    "way_member": {"id_relation": "bigint", "id_way": "bigint",
                   "role": "string", "way_order": "int"},
    "relation": {"id_relation": "bigint"},
    "relation_tag": {"id_relation": "bigint", "tag_key": "string",
                     "tag_value": "string"},
    "relation_member": {"id_relation": "bigint",
                        "id_sub_relation": "bigint", "role": "string",
                        "relation_order": "int"},
}


def test_micro_osm_schemas(spark):
    osm = micro_osm(spark)
    assert set(osm) == set(EXPECTED_SCHEMAS)
    for name, want in EXPECTED_SCHEMAS.items():
        got = {f.name: f.dataType.simpleString() for f in osm[name].schema}
        for col, typ in want.items():
            assert got.get(col) == typ, f"{name}.{col}: {got.get(col)}"


def test_micro_osm_row_counts(spark):
    # row counts pinned by AbstractOSMTest.createData fixture
    osm = micro_osm(spark)
    assert osm["node"].count() == 4
    assert osm["node_tag"].count() == 6
    assert osm["way_node"].count() == 5
    assert osm["way_tag"].count() == 3
    assert osm["relation_tag"].count() == 3
    assert osm["way_member"].count() == 1


def test_from_area_envelope_expansion(spark):
    z = zones.from_area(spark, (2.0, 48.0, 3.0, 49.0), "z",
                        distance_m=1000.0).collect()[0]
    # expansion matches the spherical formula exactly
    dlat = 1000.0 / (zones.WGS84_EARTH_RADIUS_M * math.pi / 180.0)
    dlon = dlat / math.cos(math.radians(48.5))
    assert z.miny == pytest.approx(48.0 - dlat)
    assert z.maxy == pytest.approx(49.0 + dlat)
    assert z.minx == pytest.approx(2.0 - dlon)
    assert z.maxx == pytest.approx(3.0 + dlon)
    g = geom.wkb_loads(bytes(z.the_geom_wkb))
    assert g[0] == "Polygon"
    # geometry stays the un-expanded zone (reference: envelope table is
    # separate from the zone table)
    assert geom.bounds(g) == (2.0, 48.0, 3.0, 49.0)


def test_from_place_gazetteer(spark):
    z = zones.from_place(spark, "  Paris!! ").collect()[0]
    assert z.zone_id == "paris"
    assert 2.0 < z.minx < 2.5 and 48.5 < z.miny < 49.0
    # negative path: unknown place -> EMPTY zones DF, declared schema
    # (reference processes return false, TransformTest.groovy:76-99)
    missing = zones.from_place(spark, "atlantis")
    assert missing.isEmpty()
    assert missing.schema == zones.empty_zones(spark).schema


def test_normalize_place():
    assert zones.normalize_place(" Saint-Étienne ") == "saint-tienne"
    assert zones.normalize_place("New York") == "new york"
    assert zones.normalize_place("Redon;DROP TABLE") == "redondrop table"


# ----------------------------------------------------------- negative paths

def test_bad_tags_type_yields_empty(spark):
    """Malformed tags -> False predicate -> empty output with declared
    schema, mirroring the reference's false-returning processes."""
    from sparkspatial import transform

    pred, keys = transform.create_where_filter(12345)
    assert keys == []
    eav = spark.createDataFrame(
        [(1, "k", "v")], "id long, tag_key string, tag_value string")
    out = eav.where(pred)
    assert out.isEmpty() and out.schema == eav.schema


def test_bad_epsg_yields_nan_not_garbage():
    import numpy as np

    from sparkspatial import crs

    assert not crs.valid_utm_epsg(-1)
    assert crs.valid_utm_epsg(32630)
    e, n = crs.project_utm([48.5], [2.3], [-1])
    assert np.isnan(e).all() and np.isnan(n).all()
    e2, n2 = crs.project_utm([48.5, 48.5], [2.3, 2.3], [32631, -1])
    assert np.isfinite(e2[0]) and np.isnan(e2[1])


def test_polygon_gazetteer_spatial_join(spark):
    """Multipolygon-with-hole place (geojson parse path,
    Utilities.groovy:143-166): points in the lagoon hole don't match,
    island points do, second island counts."""
    import numpy as np

    from sparkspatial import join

    zdf = zones.from_place(spark, "Atoll")
    row = zdf.collect()[0]
    g = geom.wkb_loads(bytes(row.the_geom_wkb))
    assert g[0] == "MultiPolygon" and len(g[1]) == 2
    assert len(g[1][0][1]) == 2  # island 1 carries the lagoon hole

    pts = spark.createDataFrame(
        [("in_island", 40.10, -74.35),      # inside shell, outside hole
         ("in_lagoon", 40.50, -74.00),      # inside the hole -> no match
         ("in_island2", 40.50, -73.40),     # second island
         ("outside", 40.50, -75.50)],
        "url string, lat double, lon double")
    got = {r.url for r in join.spatial_join(
        pts, zdf, how="inner", broadcast=True).collect()}
    assert got == {"in_island", "in_island2"}
