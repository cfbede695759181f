"""GeoParquet-style typed export (S9 upgrade, r2 verdict item 7):
footer metadata per spec 1.0.0, external-reader visibility via DuckDB,
byte-identical WKB round-trip."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from sparkspatial import geom, geoparquet, zones


def test_geoparquet_roundtrip(spark, tmp_path):
    zdf = zones.synthetic_zones(spark, n=12)
    path = str(tmp_path / "zones_geo")
    n = geoparquet.write_geoparquet(zdf.repartition(3), path)
    assert n == zdf.count()

    # footer metadata: GeoParquet 1.0.0 shape
    meta = geoparquet.read_geo_metadata(path)
    assert meta["version"] == "1.0.0"
    assert meta["primary_column"] == "the_geom_wkb"
    col = meta["columns"]["the_geom_wkb"]
    assert col["encoding"] == "WKB"
    assert set(col["geometry_types"]) == {"Polygon", "MultiPolygon"}

    # an external reader (DuckDB, no spatial extension needed) sees the
    # geo key in the parquet footer and byte-identical WKB payloads
    con = duckdb.connect()
    kv = dict(con.execute(
        f"SELECT key, value FROM parquet_kv_metadata('{path}/*.parquet')"
    ).fetchall())
    assert b"geo" in kv and b'"encoding": "WKB"' in kv[b"geo"]
    duck_wkb = {bytes(r[0]) for r in con.execute(
        f"SELECT the_geom_wkb FROM '{path}/*.parquet'").fetchall()}
    want_wkb = {bytes(r.the_geom_wkb) for r in
                zdf.select("the_geom_wkb").collect()}
    assert duck_wkb == want_wkb

    # geometry identity through the engine's own codec
    for w in duck_wkb:
        g = geom.wkb_loads(w)
        assert g[0] in ("Polygon", "MultiPolygon")
        assert geom.wkb_dumps(g) == w

    # Spark reads the dataset back unchanged (footer key is ignored);
    # the typed reader also hands back the metadata
    back, meta2 = geoparquet.read_geoparquet(spark, path)
    assert back.count() == n and "the_geom_wkb" in back.columns
    assert meta2 == meta


def test_geoparquet_duckdb_spatial_decode(spark, tmp_path):
    """Full typed decode through DuckDB-spatial's ST_GeomFromWKB —
    skipped where the extension isn't shipped (this sandbox has no
    network); the engine-codec identity in the roundtrip test covers
    the WKB bytes either way."""
    con = duckdb.connect()
    try:
        con.execute("LOAD spatial")
    except duckdb.Error:
        pytest.skip("duckdb spatial extension unavailable in sandbox")
    zdf = zones.synthetic_zones(spark, n=4)
    path = str(tmp_path / "zones_geo_sp")
    geoparquet.write_geoparquet(zdf, path)
    wkt = con.execute(
        f"SELECT ST_AsText(ST_GeomFromWKB(the_geom_wkb)) "
        f"FROM '{path}/*.parquet' LIMIT 1").fetchone()[0]
    assert wkt.startswith("POLYGON") or wkt.startswith("MULTIPOLYGON")


def test_geoparquet_rejects_missing_column(spark):
    df = spark.range(3).selectExpr("CAST(id AS STRING) AS zone_id")
    with pytest.raises(ValueError, match="no geometry column"):
        geoparquet.write_geoparquet(df, "/tmp/nope")


def test_geoparquet_rewrite_clears_stale_parts(spark, tmp_path):
    """Overwrite semantics: re-writing with fewer partitions must not
    leave earlier part files mixing into glob reads."""
    zdf = zones.synthetic_zones(spark, n=12)
    path = str(tmp_path / "rewrite_geo")
    geoparquet.write_geoparquet(zdf.repartition(8), path)
    sub = zdf.limit(3)
    n = geoparquet.write_geoparquet(sub.repartition(1), path)
    assert n == 3
    assert spark.read.parquet(path).count() == 3
    con = duckdb.connect()
    assert con.execute(
        f"SELECT COUNT(*) FROM '{path}/*.parquet'").fetchone()[0] == 3


def test_geoparquet_all_null_column(spark, tmp_path):
    """Schema comes from the DataFrame, not per-batch inference: an
    all-None string column must write as string, not arrow null."""
    rows = [("z0", bytearray(geom.wkb_dumps(("Polygon", [np.array(
        [[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], dtype=np.float64)]))),
        None)]
    df = spark.createDataFrame(
        rows, "zone_id string, the_geom_wkb binary, note string")
    path = str(tmp_path / "nullcol_geo")
    assert geoparquet.write_geoparquet(df, path) == 1
    back = spark.read.parquet(path)
    assert dict(back.dtypes)["note"] == "string"
    assert back.collect()[0].note is None


def test_geoparquet_empty_partitions(spark, tmp_path):
    """Empty partitions write no file but the dataset stays readable."""
    rows = [("z0", bytearray(geom.wkb_dumps(("Polygon", [np.array(
        [[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], dtype=np.float64)]))))]
    df = spark.createDataFrame(rows, "zone_id string, the_geom_wkb binary") \
        .repartition(8)
    path = str(tmp_path / "sparse_geo")
    assert geoparquet.write_geoparquet(df, path) == 1
    meta = geoparquet.read_geo_metadata(path)
    assert meta["primary_column"] == "the_geom_wkb"
    assert spark.read.parquet(path).count() == 1


def test_geoparquet_zero_rows(spark, tmp_path):
    """A zero-row frame still yields a readable dataset: one empty
    part file carrying the geo footer plus _SUCCESS (ADVICE r3: the
    old writer stamped _SUCCESS over an empty dir and the read path
    raised FileNotFoundError on a 'successful' write)."""
    df = spark.createDataFrame(
        [], "zone_id string, the_geom_wkb binary").repartition(4)
    path = str(tmp_path / "empty_geo")
    assert geoparquet.write_geoparquet(df, path) == 0
    meta = geoparquet.read_geo_metadata(path)
    assert meta["primary_column"] == "the_geom_wkb"
    back = spark.read.parquet(path)
    assert back.count() == 0
    assert set(back.columns) == {"zone_id", "the_geom_wkb"}


def test_geoparquet_no_stray_tmp_files(spark, tmp_path):
    """The attempt-unique temp names are all renamed or cleaned: after
    a write, no _tmp- file remains next to the parts (the commit
    protocol added for speculative/zombie task attempts)."""
    import os

    zdf = zones.synthetic_zones(spark, n=6)
    path = str(tmp_path / "tmpless_geo")
    geoparquet.write_geoparquet(zdf.repartition(3), path)
    assert not [f for f in os.listdir(path) if f.startswith("_tmp-")]
    # second write over the first also leaves no stragglers
    geoparquet.write_geoparquet(zdf.repartition(2), path)
    assert not [f for f in os.listdir(path) if f.startswith("_tmp-")]
