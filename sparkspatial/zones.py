"""Zone builders — the analog of Loader.fromArea / fromPlace.

The reference turns an envelope/polygon or a Nominatim place name into
a one-row `zone` table plus a `zone_envelope` table expanded by a
meter distance (Loader.groovy:71-136, 152-218; envelope expansion at
Loader.groovy:100,182 via GeographyUtilities.expandEnvelopeByMeters).
Here zones are plain DataFrames ``(zone_id, the_geom_wkb, minx, miny,
maxx, maxy)`` — the envelope columns double as the coarse `&&` filter
the join engine consumes, and place lookup reads a bundled gazetteer
DataFrame instead of the network (AbstractOSMTest's Nominatim mock,
AbstractOSMTest.groovy:118-214, made first-class).
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, Row, SparkSession

from . import geom

WGS84_EARTH_RADIUS_M = 6378137.0

ZONE_SCHEMA = ("zone_id string, the_geom_wkb binary, "
               "minx double, miny double, maxx double, maxy double")


def expand_envelope_meters(minx: float, miny: float, maxx: float, maxy: float,
                           distance_m: float) -> tuple[float, float, float, float]:
    """Expand a lon/lat envelope by a distance in meters.

    Spherical approximation: one degree of latitude is
    ``R * pi / 180`` meters; longitude shrinks by cos(latitude of the
    envelope center) — the same approximation class as the reference's
    GeographyUtilities.expandEnvelopeByMeters (Loader.groovy:100).
    """
    if distance_m == 0:
        return minx, miny, maxx, maxy
    dlat = distance_m / (WGS84_EARTH_RADIUS_M * math.pi / 180.0)
    midlat = math.radians((miny + maxy) / 2.0)
    dlon = dlat / max(math.cos(midlat), 1e-12)
    return minx - dlon, miny - dlat, maxx + dlon, maxy + dlat


def zone_row(zone_id: str, g, distance_m: float = 0.0) -> Row:
    """Tagged-tuple polygon geometry -> zone Row (envelope expanded)."""
    minx, miny, maxx, maxy = geom.bounds(g)
    minx, miny, maxx, maxy = expand_envelope_meters(minx, miny, maxx, maxy, distance_m)
    return Row(zone_id=zone_id, the_geom_wkb=bytearray(geom.wkb_dumps(g)),
               minx=float(minx), miny=float(miny),
               maxx=float(maxx), maxy=float(maxy))


def from_area(spark: SparkSession, area, zone_id: str = "zone",
              distance_m: float = 0.0) -> DataFrame:
    """Envelope tuple (minx,miny,maxx,maxy) or tagged polygon -> 1-row
    zones DataFrame (Loader.fromArea semantics, Loader.groovy:71-136)."""
    if isinstance(area, tuple) and len(area) == 4:
        minx, miny, maxx, maxy = area
        g = geom.wkb_loads(geom.box_wkb(minx, miny, maxx, maxy))
    else:
        g = area
    return spark.createDataFrame([zone_row(zone_id, g, distance_m)], ZONE_SCHEMA)


def parse_geojson_geometry(obj: dict):
    """GeoJSON-shaped dict -> tagged-tuple geometry.

    Semantics of Utilities.parsePolygon/arrayToCoordinate
    (Utilities.groovy:143-166, 175-185): coordinates[0] is the exterior
    ring, the remaining arrays are holes; a MultiPolygon is one such
    3D array per sub-polygon. Z values are dropped (the engine is 2D).
    """
    def ring(arr):
        return np.asarray([[c[0], c[1]] for c in arr], dtype=np.float64)

    t = obj["type"]
    cc = obj["coordinates"]
    if t == "Polygon":
        return ("Polygon", [ring(r) for r in cc])
    if t == "MultiPolygon":
        return ("MultiPolygon",
                [("Polygon", [ring(r) for r in poly]) for poly in cc])
    raise ValueError(f"unsupported geojson type {t!r}")


# embedded Nominatim-style responses (the no-network analog of the
# reference's mocked geojson files, AbstractOSMTest.groovy:118-214) —
# including a multipolygon-with-hole place exercising the full
# parsePolygon path
_GAZETTEER_GEOJSON: dict[str, dict] = {
    "redon": {"type": "Polygon", "coordinates": [
        [[-2.12, 47.62], [-2.02, 47.62], [-2.02, 47.72], [-2.12, 47.72],
         [-2.12, 47.62]]]},
    "paris": {"type": "Polygon", "coordinates": [
        [[2.22, 48.81], [2.47, 48.81], [2.47, 48.90], [2.22, 48.90],
         [2.22, 48.81]]]},
    "new york": {"type": "Polygon", "coordinates": [
        [[-74.26, 40.49], [-73.70, 40.49], [-73.70, 40.92], [-74.26, 40.92],
         [-74.26, 40.49]]]},
    "vannes": {"type": "Polygon", "coordinates": [
        [[-2.81, 47.63], [-2.70, 47.63], [-2.70, 47.69], [-2.81, 47.69],
         [-2.81, 47.63]]]},
    # two islands, the larger with a lagoon hole
    "atoll": {"type": "MultiPolygon", "coordinates": [
        [[[-74.45, 40.05], [-73.55, 40.05], [-73.55, 40.95],
          [-74.45, 40.95], [-74.45, 40.05]],
         [[-74.25, 40.25], [-73.75, 40.25], [-73.75, 40.75],
          [-74.25, 40.75], [-74.25, 40.25]]],
        [[[-73.45, 40.35], [-73.30, 40.35], [-73.30, 40.65],
          [-73.45, 40.65], [-73.45, 40.35]]]]},
}


def builtin_gazetteer(spark: SparkSession) -> DataFrame:
    """Small deterministic place->polygon lookup (no-network analog of
    Utilities.getAreaFromPlace, Utilities.groovy:77-130), geometries
    parsed from embedded GeoJSON-style literals."""
    rows = []
    for name in sorted(_GAZETTEER_GEOJSON):
        g = parse_geojson_geometry(_GAZETTEER_GEOJSON[name])
        minx, miny, maxx, maxy = geom.bounds(g)
        rows.append(Row(place=name, the_geom_wkb=bytearray(geom.wkb_dumps(g)),
                        minx=float(minx), miny=float(miny),
                        maxx=float(maxx), maxy=float(maxy)))
    return spark.createDataFrame(
        rows, "place string, the_geom_wkb binary, "
              "minx double, miny double, maxx double, maxy double")


def normalize_place(name: str) -> str:
    """Place-name normalization (Loader.groovy:167 regex analog)."""
    import re
    return re.sub(r"[^a-zA-Z0-9 _-]", "", name.strip().lower())


def empty_zones(spark: SparkSession) -> DataFrame:
    """Zero-row zones DataFrame with the declared schema — the engine's
    negative-path contract (reference processes return false/empty on
    bad inputs instead of raising, TransformTest.groovy:76-99)."""
    return spark.createDataFrame([], ZONE_SCHEMA)


def from_place(spark: SparkSession, place: str,
               gazetteer: DataFrame | None = None,
               distance_m: float = 0.0) -> DataFrame:
    """Place name -> 1-row zones DataFrame via gazetteer lookup
    (Loader.fromPlace semantics, Loader.groovy:152-218). An unknown
    place yields the EMPTY zones DataFrame (declared schema), not an
    exception — parity with the reference's false-returning processes.
    """
    gaz = gazetteer if gazetteer is not None else builtin_gazetteer(spark)
    norm = normalize_place(place)
    hit = gaz.where(gaz.place == norm).limit(1).collect()
    if not hit:
        return empty_zones(spark)
    row = hit[0]
    minx, miny, maxx, maxy = expand_envelope_meters(
        row.minx, row.miny, row.maxx, row.maxy, distance_m)
    return spark.createDataFrame(
        [Row(zone_id=norm, the_geom_wkb=row.the_geom_wkb,
             minx=float(minx), miny=float(miny),
             maxx=float(maxx), maxy=float(maxy))], ZONE_SCHEMA)


def synthetic_zones(spark: SparkSession, n: int = 64,
                    include_hotspots: bool = True) -> DataFrame:
    """Deterministic synthetic zone set for tests/bench (FIXTURES.md B.2):
    disjoint rectangles across the geocode band, a polygon with a hole,
    an overlapping pair, and rectangles over the hotspot centers."""
    rows = []
    rng = np.random.RandomState(42)
    for i in range(n):
        # centers spread over the non-hot geocode band
        cx = -175.0 + (i * 353.0) % 350.0 + rng.uniform(0, 1)
        cy = -55.0 + (i * 97.0) % 110.0 + rng.uniform(0, 1)
        w = 0.5 + (i % 7) * 0.45
        h = 0.5 + (i % 5) * 0.4
        g = geom.wkb_loads(geom.box_wkb(cx - w, cy - h, cx + w, cy + h))
        rows.append(zone_row(f"z{i:03d}", g))
    if include_hotspots:
        # cover the 5x5 hot-center lattice (geocode.py: lat 40.1..40.9,
        # lon -74.3..-73.5) so hot cells hit the join
        g = geom.wkb_loads(geom.box_wkb(-74.8, 39.6, -73.0, 41.4))
        rows.append(zone_row("zhot", g))
        # polygon with a hole inside the hot box (J5 contains semantics)
        shell = np.array([[-74.6, 39.8], [-73.2, 39.8], [-73.2, 41.2],
                          [-74.6, 41.2], [-74.6, 39.8]])
        hole = np.array([[-74.1, 40.2], [-73.7, 40.2], [-73.7, 40.7],
                         [-74.1, 40.7], [-74.1, 40.2]])
        rows.append(zone_row("zhole", ("Polygon", [shell, hole])))
        # overlapping pair (a point may match 2 zones)
        g1 = geom.wkb_loads(geom.box_wkb(-74.5, 40.0, -73.9, 40.6))
        g2 = geom.wkb_loads(geom.box_wkb(-74.2, 40.3, -73.6, 40.9))
        rows.append(zone_row("zov_a", g1))
        rows.append(zone_row("zov_b", g2))
    return spark.createDataFrame(rows, ZONE_SCHEMA)
