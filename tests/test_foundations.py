"""Foundation tests: hashing, cells, geometry kernel, cross-engine parity.

The cross-engine tests are the load-bearing ones: every oracle-checked
query relies on h32 / geocode / cell encode agreeing bit-for-bit
between numpy (pandas UDFs), Spark SQL, and DuckDB SQL.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from sparkspatial import cells, geom
from sparkspatial.geocode import geocode_pandas, lat_sql, lon_sql, url_sql
from sparkspatial.hashing import h32, h32_duckdb_sql, h32_pandas, h32_spark_sql

WORDS = ["src0/1", "example.com/a?b=1", "", "unicode-éλ漢", "x" * 500, "src19/4999"]


# ------------------------------------------------------------------ hashing

def test_h32_python_vs_pandas():
    s = pd.Series(WORDS)
    out = h32_pandas(s)
    assert list(out) == [h32(w) for w in WORDS]
    assert out.dtype == np.int64
    assert (out >= 0).all() and (out < 2 ** 32).all()


def test_h32_duckdb_matches_python():
    con = duckdb.connect()
    expr = h32_duckdb_sql("s")
    got = con.execute(
        f"SELECT {expr} FROM (SELECT unnest(?) AS s)", [WORDS]
    ).fetchall()
    assert [g[0] for g in got] == [h32(w) for w in WORDS]


def test_h32_spark_matches_python(spark):
    df = spark.createDataFrame([(w,) for w in WORDS], "s string")
    got = [r[0] for r in df.selectExpr(h32_spark_sql("s")).collect()]
    assert got == [h32(w) for w in WORDS]


# ------------------------------------------------------------------ geocode

def test_geocode_three_engines_agree(spark):
    srcs = [f"src{i}" for i in range(25)]
    ids = list(range(25))
    urls = [f"{s}/{i}" for s, i in zip(srcs, ids)]
    lat_np, lon_np = geocode_pandas(pd.Series(srcs), pd.Series(urls))

    con = duckdb.connect()
    q = (f"SELECT {lat_sql('source', url_sql('source', 'id', 'duckdb'), 'duckdb')},"
         f" {lon_sql('source', url_sql('source', 'id', 'duckdb'), 'duckdb')}"
         f" FROM (SELECT unnest(?) AS source, unnest(?) AS id)")
    duck = con.execute(q, [srcs, ids]).fetchall()

    df = spark.createDataFrame(list(zip(srcs, ids)), "source string, id long")
    sp = df.selectExpr(
        lat_sql("source", url_sql("source", "id", "spark"), "spark") + " AS lat",
        lon_sql("source", url_sql("source", "id", "spark"), "spark") + " AS lon",
    ).collect()

    for i in range(len(srcs)):
        assert duck[i][0] == lat_np[i] and duck[i][1] == lon_np[i]
        assert sp[i]["lat"] == lat_np[i] and sp[i]["lon"] == lon_np[i]
    assert (np.abs(lat_np) < 61.0).all() and (np.abs(lon_np) < 180.0).all()


def test_geocode_creates_hotspots():
    # many domains -> 30% land on 25 hot centers
    srcs = pd.Series([f"d{i}.example" for i in range(1000)])
    urls = srcs + "/0"
    lat, lon = geocode_pandas(srcs, urls)
    c = cells.encode(lat, lon, 6)
    _, counts = np.unique(c, return_counts=True)
    assert counts.max() > 20 * np.median(counts)  # heavy skew present


# ------------------------------------------------------------------ cells

def test_cell_roundtrip_and_bounds():
    lat = np.array([-89.9, -45.0, 0.0, 37.75, 89.9])
    lon = np.array([-179.9, -122.4, 0.0, 55.5, 179.9])
    for res in (0, 3, 9, 15, 28):
        c = cells.encode(lat, lon, res)
        assert (cells.decode_res(c) == res).all()
        minlon, minlat, maxlon, maxlat = cells.cell_bounds(c)
        assert ((lon >= minlon) & (lon < maxlon + 1e-12)).all()
        assert ((lat >= minlat) & (lat < maxlat + 1e-12)).all()


def test_cell_parent_child_consistency():
    c = cells.encode(np.array([48.85]), np.array([2.35]), 15)[0]
    p = cells.parent(np.array([c]), 12)[0]
    # walking children down from the parent must reach the original tile
    lvl = [p]
    for _ in range(3):
        nxt = []
        for cc in lvl:
            nxt.extend(cells.children(cc))
        lvl = nxt
    assert c in lvl
    # parent bounds contain child bounds
    pb = cells.cell_bounds(np.array([p]))
    cb = cells.cell_bounds(np.array([c]))
    assert pb[0][0] <= cb[0][0] and pb[2][0] >= cb[2][0]


def test_kring_counts_and_wrap():
    c = cells.encode(np.array([0.0]), np.array([0.0]), 10)[0]
    assert len(cells.kring(c, 1)) == 9
    assert len(cells.kring(c, 2)) == 25
    # wrap at the antimeridian: x=0 ring includes x=n-1 cells
    edge = cells.encode(np.array([0.0]), np.array([-180.0]), 5)[0]
    ring = cells.kring(edge, 1)
    xs = [int(x) for x in cells.decode_xy(ring)[0]]
    assert (0 in xs) and ((1 << 5) - 1 in xs)
    assert len(ring) == 9


def test_cell_sql_matches_numpy(spark):
    rng = np.random.RandomState(42)
    lat = rng.uniform(-89, 89, 50)
    lon = rng.uniform(-179.9, 179.9, 50)
    for res in (4, 12):
        want = cells.encode(lat, lon, res)
        expr = cells.cell_sql("lat", "lon", res)
        con = duckdb.connect()
        duck = [r[0] for r in con.execute(
            f"SELECT {expr} FROM (SELECT unnest(?) AS lat, unnest(?) AS lon)",
            [lat.tolist(), lon.tolist()]).fetchall()]
        assert duck == list(want)
        df = spark.createDataFrame(
            pd.DataFrame({"lat": lat, "lon": lon}))
        got = [r[0] for r in df.selectExpr(expr + " AS c").collect()]
        assert got == list(want)


def test_parent_sql_matches_numpy():
    lat = np.array([12.3, -45.6, 71.0])
    lon = np.array([100.1, -3.3, -170.0])
    c = cells.encode(lat, lon, 12)
    want = list(cells.parent(c, 7))
    expr = cells.parent_sql("c", 12, 7, dialect="duckdb")
    con = duckdb.connect()
    got = [r[0] for r in con.execute(
        f"SELECT {expr} FROM (SELECT unnest(?) AS c)", [c.tolist()]).fetchall()]
    assert got == want


def test_covering_cells():
    cover = cells.covering_cells(-1.0, -1.0, 1.0, 1.0, 8)
    # 2 degrees at res 8 (cell = 1.40625 deg) -> 2x2 or 3x3 cells
    assert 4 <= len(cover) <= 9
    # every cell intersects the box
    minlon, minlat, maxlon, maxlat = cells.cell_bounds(cover)
    assert (maxlon >= -1.0).all() and (minlon <= 1.0).all()


# ------------------------------------------------------------------ geometry

def test_wkb_roundtrip():
    geoms = [
        ("Point", (2.5, -3.5)),
        ("LineString", np.array([[0, 0], [1, 1], [2, 0]], dtype=float)),
        ("Polygon", [np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], dtype=float),
                     np.array([[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]], dtype=float)]),
    ]
    for g in geoms:
        out = geom.wkb_loads(geom.wkb_dumps(g))
        assert out[0] == g[0]
    mp = ("MultiPolygon", [geoms[2], ("Polygon", [np.array(
        [[10, 10], [11, 10], [11, 11], [10, 10]], dtype=float)])])
    rt = geom.wkb_loads(geom.wkb_dumps(mp))
    assert rt[0] == "MultiPolygon" and len(rt[1]) == 2


def test_wkt_roundtrip_reference_fixture():
    # the reference micro-fixture points (AbstractOSMTest.groovy:269-309)
    for wkt in ["POINT (0 0)", "POINT (10 10)"]:
        g = geom.wkt_loads(wkt)
        assert geom.wkt_dumps(g) == wkt
    poly = geom.wkt_loads("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    assert poly[0] == "Polygon" and len(poly[1][0]) == 5


def test_point_in_polygon_with_hole():
    rings = [np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], dtype=float),
             np.array([[4, 4], [6, 4], [6, 6], [4, 6], [4, 4]], dtype=float)]
    px = np.array([5.0, 1.0, 11.0, 4.5])
    py = np.array([5.0, 1.0, 5.0, 4.5])
    got = geom.points_in_rings(px, py, rings)
    assert list(got) == [False, True, False, False]  # 5,5 is inside the hole


def test_point_in_multipolygon():
    mp = ("MultiPolygon", [
        ("Polygon", [np.array([[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]], float)]),
        ("Polygon", [np.array([[5, 5], [7, 5], [7, 7], [5, 7], [5, 5]], float)]),
    ])
    got = geom.points_in_geom(np.array([1, 6, 3.5]), np.array([1, 6, 3.5]), mp)
    assert list(got) == [True, True, False]


def test_clip_polyline():
    line = np.array([[-5, 0.5], [5, 0.5], [5, 5], [20, 5]], dtype=float)
    pieces = geom.clip_polyline_box(line, 0, 0, 10, 10)
    assert len(pieces) == 1
    p = pieces[0]
    assert p[0, 0] == 0.0 and p[-1, 0] == 10.0
    # fully outside
    assert geom.clip_polyline_box(np.array([[20, 20], [30, 30.]]), 0, 0, 10, 10) == []


def test_clip_polygon():
    ring = np.array([[-5, -5], [15, -5], [15, 15], [-5, 15], [-5, -5]], dtype=float)
    out = geom.clip_polygon_box([ring], 0, 0, 10, 10)
    assert len(out) == 1
    assert abs(abs(geom.ring_area(out[0])) - 100.0) < 1e-9


def test_linemerge_ring():
    a = np.array([[0, 0], [1, 0]], float)
    b = np.array([[1, 0], [1, 1]], float)
    c = np.array([[0, 1], [1, 1]], float)  # reversed orientation
    d = np.array([[0, 1], [0, 0]], float)
    merged = geom.linemerge([a, b, c, d])
    assert len(merged) == 1
    m = merged[0]
    assert len(m) == 5 and np.array_equal(m[0], m[-1])  # closed ring


def test_intersects_box():
    tri = ("Polygon", [np.array([[0, 0], [4, 0], [2, 3], [0, 0]], float)])
    assert geom.geom_intersects_box(tri, 1, 1, 3, 2)      # box inside triangle-ish
    assert geom.geom_intersects_box(tri, -10, -10, 20, 20)  # poly inside box
    assert not geom.geom_intersects_box(tri, 10, 10, 11, 11)
    line = ("LineString", np.array([[-1, -1], [5, 5]], float))
    assert geom.geom_intersects_box(line, 0, 0, 1, 1)


def test_haversine():
    # Paris -> London ~343.5 km
    d = geom.haversine_deg(48.8566, 2.3522, 51.5074, -0.1278)
    assert 330_000 < float(d) < 350_000
    assert float(geom.haversine_deg(0, 0, 0, 0)) == 0.0
