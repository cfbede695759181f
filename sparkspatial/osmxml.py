"""OSM XML -> the reference's 10 relational tables, distributed.

The reference's `load` process (Loader.groovy:289-324) delegates
XML->tables to H2GIS's OSM driver; its exact semantics are pinned by
the golden rows of LoaderTest.groovy:455-744 over sample.osm, which
this module re-derives (no reference code consulted — the test
expectations ARE the spec):

- NODE(id_node, the_geom_wkb POINT, ele, user_name, uid, visible,
  version, changeset, last_update, name): `name` is pulled OUT of the
  tags into a column ('' when absent, LoaderTest:520-545); `ele`
  likewise (double). Node LAST_UPDATE is DATE-truncated — a pinned
  reference quirk (LoaderTest:492 expects "2012-01-10 00:00:00" from
  timestamp 2012-01-10T23:02:55Z) — while way/relation keep the full
  timestamp (LoaderTest:617 "2012-01-10 23:02:55").
- NODE_TAG: remaining tags, `name`/`ele` excluded (LoaderTest:578-594
  expects 2 node_tag rows, not 4); WAY_TAG excludes only `name` (the
  way table has no ele column, so a way-level ele tag stays a tag).
- WAY(...name), WAY_NODE(node_order 1-based in document order).
- {NODE,WAY,RELATION}_MEMBER: relation members split by type; the
  *_ORDER is the member's 1-based position in the FULL member list,
  not per-type (LoaderTest:563-569: way member gets 1, node members
  get 2 and 3).
- RELATION / RELATION_TAG (relations have no name column; all tags
  stay).

Scale shape: `binaryFile` scan (one task per .osm file) ->
xml.etree parse inside ONE Arrow stage emitting a tall element
frame -> persisted -> ten codegen filters. Parallelism = number of
files; a planet-scale ingest splits the planet file with osmium
beforehand (documented limitation: a single giant XML is one task).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = ("node", "node_member", "node_tag", "way", "way_member",
          "way_tag", "way_node", "relation", "relation_member",
          "relation_tag")

_TALL_SCHEMA = (
    "kind string, id long, geom binary, ele double, "
    "user_name string, uid long, visible boolean, version int, "
    "changeset long, last_update timestamp, name string, "
    "tag_key string, tag_value string, ref_id long, role string, "
    "ord int")


def _parse_file(content: bytes) -> list:
    import xml.etree.ElementTree as ET
    from datetime import datetime

    from . import geom as _geom

    def ts(el, date_only: bool):
        t = el.get("timestamp")
        if not t:
            return None
        dt = None
        for fmt in ("%Y-%m-%dT%H:%M:%SZ", "%Y-%m-%dT%H:%M:%S%z",
                    "%Y-%m-%dT%H:%M:%S.%fZ"):
            try:
                dt = datetime.strptime(t, fmt)
                break
            except ValueError:  # exporter timestamp variants
                continue
        if dt is None:
            return None
        if dt.tzinfo is not None:
            dt = dt.replace(tzinfo=None)
        return dt.replace(hour=0, minute=0, second=0,
                          microsecond=0) if date_only else dt

    def common(el):
        return (el.get("user", ""), int(el.get("uid", 0)),
                el.get("visible", "true") == "true",
                int(el.get("version", 0)), int(el.get("changeset", 0)))

    rows = []
    root = ET.fromstring(content)
    for el in root:
        if el.tag == "node":
            tags = {t.get("k"): t.get("v") for t in el.findall("tag")}
            u, uid, vis, ver, ch = common(el)
            ele = None
            if "ele" in tags:
                try:
                    ele = float(tags["ele"])
                    tags.pop("ele")
                except ValueError:
                    pass  # dirty ele ('~250', '600;590') stays a tag
            lat, lon = el.get("lat"), el.get("lon")
            # deleted/history nodes legally omit lat/lon -> NULL geom
            wkb = (_geom.point_wkb(float(lon), float(lat))
                   if lat is not None and lon is not None else None)
            rows.append(("node", int(el.get("id")), wkb, ele,
                         u, uid, vis, ver, ch, ts(el, True),
                         tags.pop("name", ""),
                         None, None, None, None, None))
            for k, v in tags.items():
                rows.append(("node_tag", int(el.get("id")),
                             None, None, None, None, None, None,
                             None, None, None, k, v, None, None, None))
        elif el.tag == "way":
            tags = {t.get("k"): t.get("v") for t in el.findall("tag")}
            u, uid, vis, ver, ch = common(el)
            rows.append(("way", int(el.get("id")), None, None,
                         u, uid, vis, ver, ch, ts(el, False),
                         tags.pop("name", ""),
                         None, None, None, None, None))
            for i, nd in enumerate(el.findall("nd")):
                rows.append(("way_node", int(el.get("id")),
                             None, None, None, None, None, None,
                             None, None, None, None, None,
                             int(nd.get("ref")), None, i + 1))
            for k, v in tags.items():
                rows.append(("way_tag", int(el.get("id")),
                             None, None, None, None, None, None,
                             None, None, None, k, v, None, None, None))
        elif el.tag == "relation":
            u, uid, vis, ver, ch = common(el)
            rows.append(("relation", int(el.get("id")), None,
                         None, u, uid, vis, ver, ch, ts(el, False),
                         None, None, None, None, None, None))
            for i, m in enumerate(el.findall("member")):
                kind = {"node": "node_member", "way": "way_member",
                        "relation": "relation_member"}.get(m.get("type"))
                if kind:
                    rows.append((kind, int(el.get("id")),
                                 None, None, None, None, None,
                                 None, None, None, None, None, None,
                                 int(m.get("ref")), m.get("role", ""),
                                 i + 1))
            for t in el.findall("tag"):
                rows.append(("relation_tag", int(el.get("id")),
                             None, None, None, None, None, None,
                             None, None, None, t.get("k"), t.get("v"),
                             None, None, None))
    return rows


def load_osm(spark: SparkSession, path: str) -> dict[str, DataFrame]:
    """Parse .osm XML file(s) at `path` (glob ok) into the 10 tables.

    Returns {table_name: DataFrame} with the FIXTURES.md A.1 schemas;
    the tall parsed frame is persisted once and shared by all ten
    projections (register in session._PERSISTED for release).
    """
    files = spark.read.format("binaryFile").load(path).select("content")

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [c.split()[0] for c in _TALL_SCHEMA.split(", ")]
        for pdf in batches:
            out = []
            for content in pdf["content"]:
                out.extend(_parse_file(bytes(content)))
            yield pd.DataFrame(out, columns=cols)

    tall = files.mapInPandas(_parse, schema=_TALL_SCHEMA).persist()
    from . import session as _session
    _session.register_persisted(tall)

    def pick(kind, *exprs):
        return tall.where(F.col("kind") == kind).selectExpr(*exprs)

    out = {
        "node": (tall.where("kind = 'node'")
                 .select(F.col("id").alias("id_node"),
                         F.col("geom").alias("the_geom_wkb"),
                         "ele", "user_name", "uid", "visible",
                         "version", "changeset", "last_update", "name")),
        "node_member": pick("node_member", "id AS id_relation",
                            "ref_id AS id_node", "role",
                            "ord AS node_order"),
        "node_tag": pick("node_tag", "id AS id_node", "tag_key",
                         "tag_value"),
        "way": pick("way", "id AS id_way", "user_name", "uid",
                    "visible", "version", "changeset", "last_update",
                    "name"),
        "way_member": pick("way_member", "id AS id_relation",
                           "ref_id AS id_way", "role",
                           "ord AS way_order"),
        "way_tag": pick("way_tag", "id AS id_way", "tag_key",
                        "tag_value"),
        "way_node": pick("way_node", "id AS id_way",
                         "ref_id AS id_node", "ord AS node_order"),
        "relation": pick("relation", "id AS id_relation", "user_name",
                         "uid", "visible", "version", "changeset",
                         "last_update"),
        "relation_member": pick("relation_member", "id AS id_relation",
                                "ref_id AS id_sub_relation", "role",
                                "ord AS relation_order"),
        "relation_tag": pick("relation_tag", "id AS id_relation",
                             "tag_key", "tag_value"),
    }
    return out
