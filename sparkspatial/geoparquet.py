"""GeoParquet-style typed geometry export (SURVEY.md §2 S9 upgrade).

The reference's save workflow hands layers to external GIS tools
(osm/README.md save-to-shapefile); this engine's layer outputs were
WKB-in-parquet with nothing telling a reader which column is geometry.
`write_geoparquet` writes parquet whose file footer carries the
GeoParquet ``geo`` metadata key (spec 1.0.0: version, primary_column,
per-column ``encoding: "WKB"`` + ``geometry_types``), so
GeoParquet-aware readers (GeoPandas, DuckDB-spatial, GDAL/OGR) load
the layer directly as typed geometry — DuckDB exposes the footer via
``parquet_kv_metadata`` even without its spatial extension.

Distributed writer: Spark's parquet sink cannot attach custom footer
key-value metadata, so each PARTITION streams its Arrow batches
through its own ``pyarrow.parquet.ParquetWriter`` (one file per task,
footer stamped per file — exactly how GeoParquet datasets shard). The
driver never sees row data; it writes only the ``_SUCCESS`` marker
after the job completes.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

GEO_KEY = b"geo"
SPEC_VERSION = "1.0.0"


def geo_metadata(geometry_col: str,
                 geometry_types: list[str]) -> dict:
    """The GeoParquet 1.0.0 ``geo`` footer document. ``crs`` omitted =
    OGC:CRS84 (the spec default), which matches the engine's lon/lat
    EPSG:4326 axis order for WKB payloads."""
    return {
        "version": SPEC_VERSION,
        "primary_column": geometry_col,
        "columns": {
            geometry_col: {
                "encoding": "WKB",
                "geometry_types": sorted(geometry_types),
            },
        },
    }


def write_geoparquet(df: DataFrame, path: str, *,
                     geometry_col: str = "the_geom_wkb",
                     geometry_types: list[str] | None = None) -> int:
    """Write `df` as a GeoParquet dataset at `path`; returns row count.

    One file per partition, written executor-side via pyarrow with the
    ``geo`` footer. Commit protocol: each task attempt writes to an
    attempt-unique ``_tmp-`` name and atomically ``os.replace``s it
    into the final ``part-NNNNN.parquet`` only when its stream
    completes — a speculative or zombie attempt can therefore never
    interleave bytes with a retry's file; whichever attempt renames
    last leaves a complete file (task attempts of one partition carry
    identical rows). A zero-row frame still produces one empty part
    file carrying the footer, so the dataset always reads back.

    Requires driver and executors to share one filesystem for `path`
    (true in local mode and on clusters with a shared mount; an
    object-store backend would swap the rename for a PUT, same
    protocol). `geometry_types` defaults to the polygonal pair the
    layer builders emit.
    """
    if geometry_col not in df.columns:
        raise ValueError(f"no geometry column {geometry_col!r} in {df.columns}")
    meta = geo_metadata(geometry_col,
                        geometry_types or ["Polygon", "MultiPolygon"])
    meta_bytes = json.dumps(meta, sort_keys=True).encode()
    os.makedirs(path, exist_ok=True)
    # overwrite semantics: clear stale parts up front — a rewrite with
    # fewer partitions must not leave earlier part files mixing into
    # glob reads under a fresh _SUCCESS
    for f in os.listdir(path):
        if f.endswith(".parquet") or f == "_SUCCESS" \
                or f.startswith("_tmp-"):
            os.remove(os.path.join(path, f))

    # ONE schema derived from the DataFrame schema (not inferred per
    # pandas batch — an all-None object column in the first batch
    # would infer arrow `null` and crash ParquetWriter on the next)
    from pyspark.sql.pandas.types import to_arrow_schema

    arrow_schema = to_arrow_schema(df.schema).with_metadata(
        {GEO_KEY: meta_bytes})

    def _write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        attempt = ctx.taskAttemptId() if ctx is not None else 0
        fname = os.path.join(path, f"part-{pid:05d}.parquet")
        # attempt-unique temp + atomic rename: concurrent attempts of
        # the same partition never write the same inode. The temp name
        # deliberately does NOT end in .parquet so an in-flight zombie
        # temp can never be picked up by *.parquet glob readers
        tmp = os.path.join(path, f"_tmp-{pid:05d}-{attempt}.inprogress")
        writer = None
        n = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            table = pa.Table.from_pandas(pdf, schema=arrow_schema,
                                         preserve_index=False)
            if writer is None:
                writer = pq.ParquetWriter(tmp, arrow_schema)
            writer.write_table(table)
            n += len(pdf)
        if writer is not None:
            writer.close()
            os.replace(tmp, fname)
        yield pd.DataFrame({"file": [fname if writer else None],
                            "n_rows": [n]})

    stats = df.mapInPandas(_write, schema="file string, n_rows long") \
        .collect()
    total = sum(r.n_rows for r in stats)
    if not any(r.file for r in stats):
        # all partitions were empty: emit one empty part with the
        # footer so read_geo_metadata / spark.read.parquet succeed on
        # a dataset that reported a successful write
        import pyarrow as pa
        import pyarrow.parquet as pq
        empty = pa.Table.from_pylist([], schema=arrow_schema)
        pq.write_table(empty, os.path.join(path, "part-00000.parquet"))
    with open(os.path.join(path, "_SUCCESS"), "w"):
        pass
    return total


def read_geoparquet(spark, path: str):
    """Read a GeoParquet dataset back: (DataFrame, geo metadata).
    Spark ignores the footer key, so the frame is a plain parquet
    scan; the metadata tells the caller which column is geometry and
    how it is encoded."""
    return spark.read.parquet(path), read_geo_metadata(path)


def read_geo_metadata(path: str) -> dict:
    """The ``geo`` footer document of a GeoParquet dataset (first part
    file found under `path`)."""
    import pyarrow.parquet as pq

    parts = sorted(f for f in os.listdir(path) if f.endswith(".parquet"))
    if not parts:
        raise FileNotFoundError(f"no parquet parts under {path}")
    md = pq.ParquetFile(os.path.join(path, parts[0])).metadata.metadata
    return json.loads(md[GEO_KEY].decode())
