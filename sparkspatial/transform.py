"""OSM-table transform parity operators.

Re-creates the reference's Transform pipeline (Transform.groovy /
TransformUtils.groovy) over the 10 normalized OSM tables as lazy
DataFrame plans:

- tag predicate compiler          (createWhereFilter, TU:340-385)
- column selector                 (getColumnSelector, TU:196-214)
- count guard / empty contract    (getCountTagsQuery, TU:225-233)
- dynamic tag pivot               (createTagList, TU:393-409)
- nodes -> points                 (extractNodesAsPoints, TU:244-334)
- ways -> lines / polygons        (Transform:160-267, 520-600)
- relations -> lines / polygons   (Transform:284-466, 610-700), incl.
  outer/inner ring assembly, linemerge, ring-closure filter, hole
  containment (the RTREE contains-join, Transform:422-444)
- union with schema alignment     (TU:149-172)

Where the reference materializes a temp table per SQL statement, each
step here is a plan node; Catalyst sees the whole tree. Geometry
assembly crosses into Python exactly once per operator (an Arrow batch
map over pre-grouped coordinate arrays); everything else — semi-join
reduction, ordered collect, closed-ring predicates, pivot — is JVM.

Expected table schemas (FIXTURES.md A.1): node(id_node, the_geom_wkb,
...), node_tag(id_node, tag_key, tag_value), way(id_way, ...),
way_node(id_way, id_node, node_order), way_tag, relation(id_relation),
way_member(id_relation, id_way, role, way_order), relation_tag.
"""

from __future__ import annotations

import struct as _struct
from functools import reduce
from typing import Iterator, Mapping, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import geom

# ------------------------------------------------------------------ filters


def create_where_filter(tags):
    """Tag predicate over (tag_key, tag_value) EAV rows.

    Mirrors createWhereFilter (TU:340-385, semantics pinned by
    TUTest:80-152):

    - list  -> ``tag_key IN (...)``
    - dict  -> OR over entries; entry value None/[] -> key presence;
      scalar/list value -> ``tag_key = k AND tag_value IN (...)``;
      a tuple key applies one value set to several keys.

    Returns (pyspark Column, requested_key_list).
    """
    if tags is None:
        return F.lit(True), []
    if isinstance(tags, (list, tuple, set)):
        keys = [str(k).lower() for k in tags]
        return F.lower(F.col("tag_key")).isin(keys), sorted(set(keys))
    if isinstance(tags, Mapping):
        clauses = []
        keys: list[str] = []
        for k, v in tags.items():
            ks = [str(x).lower() for x in (k if isinstance(k, (list, tuple)) else [k])]
            keys.extend(ks)
            key_pred = F.lower(F.col("tag_key")).isin(ks)
            if v is None or v == [] or v == "*":
                clauses.append(key_pred)
            else:
                vals = [str(x) for x in (v if isinstance(v, (list, tuple)) else [v])]
                clauses.append(key_pred & F.col("tag_value").isin(vals))
        pred = reduce(lambda a, b: a | b, clauses) if clauses else F.lit(True)
        return pred, sorted(set(keys))
    # negative-path contract: the reference's processes return false
    # (empty results) on malformed inputs instead of raising
    # (TransformTest.groovy:76-99) — a False predicate yields the empty
    # output with the declared schema through every downstream operator
    return F.lit(False), []


def get_column_selector(tag_table: DataFrame, tags, columns_to_keep) -> list[str]:
    """Distinct tag keys limited to filter-keys + columnsToKeep, sorted
    (getColumnSelector TU:196-214; sorted for deterministic pivots)."""
    _, keys = create_where_filter(tags)
    wanted = set(keys) | {str(c).lower() for c in (columns_to_keep or [])}
    if not wanted:
        return []
    present = (tag_table
               .select(F.lower(F.col("tag_key")).alias("k")).distinct()
               .where(F.col("k").isin(sorted(wanted)))
               .collect())
    return sorted(r.k for r in present)


def tag_pivot(tag_table: DataFrame, id_col: str, keys: Sequence[str]) -> DataFrame:
    """EAV -> wide: one MAX(tag_value) column per requested key
    (createTagList TU:393-409 / the MAX(CASE WHEN...) pivot)."""
    if not keys:
        return tag_table.select(id_col).distinct()
    return (tag_table
            .withColumn("tag_key", F.lower(F.col("tag_key")))
            .groupBy(id_col)
            .pivot("tag_key", list(keys))
            .agg(F.max("tag_value")))


# ------------------------------------------------------------------ helpers

def node_xy(node: DataFrame) -> DataFrame:
    """Decode POINT WKB -> (id_node, x, y). One vectorized pass."""
    def _dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            x = np.empty(n, np.float64)
            y = np.empty(n, np.float64)
            for i, w in enumerate(pdf["the_geom_wkb"].values):
                x[i], y[i] = _struct.unpack_from("<dd", bytes(w), 5)
            yield pd.DataFrame({"id_node": pdf["id_node"], "x": x, "y": y})

    return node.select("id_node", "the_geom_wkb").mapInPandas(
        _dec, schema="id_node long, x double, y double")


def _empty_geoms(spark, id_name: str) -> DataFrame:
    return spark.createDataFrame([], f"{id_name} string, the_geom_wkb binary, "
                                     "geom_type string")


def _ordered_way_coords(way_node: DataFrame, node: DataFrame) -> DataFrame:
    """(id_way, pts array<struct<node_order,x,y>> sorted by node_order)
    — the ST_ACCUM ordered collect (A1/O1, Transform:234-240)."""
    pts = way_node.join(node_xy(node), "id_node")
    return (pts.groupBy("id_way")
            .agg(F.array_sort(F.collect_list(
                F.struct("node_order", "x", "y"))).alias("pts")))


def _ways_geometry(way_coords: DataFrame, as_polygon: bool) -> DataFrame:
    """Coordinate arrays -> WKB lines / polygons.

    Closed-ring + min-size predicates stay JVM-side as array
    expressions (F6: element_at(pts,1)==element_at(pts,-1) AND
    size>=4, Transform:405-406,416-417); only WKB byte assembly
    crosses into Python.
    """
    first = F.element_at("pts", 1)
    last = F.element_at("pts", -1)
    if as_polygon:
        ok = ((F.size("pts") >= 4)
              & (first.getField("x") == last.getField("x"))
              & (first.getField("y") == last.getField("y")))
    else:
        ok = F.size("pts") >= 2
    kept = way_coords.where(ok)

    gtype = "Polygon" if as_polygon else "LineString"

    def _mk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            wkbs = []
            for arr in pdf["pts"].values:
                coords = np.array([[p["x"], p["y"]] for p in arr], np.float64)
                if as_polygon:
                    wkbs.append(geom.wkb_dumps(("Polygon", [coords])))
                else:
                    wkbs.append(geom.wkb_dumps(("LineString", coords)))
            yield pd.DataFrame({"id_way": pdf["id_way"], "the_geom_wkb": wkbs,
                                "geom_type": gtype})

    return kept.mapInPandas(
        _mk, schema="id_way long, the_geom_wkb binary, geom_type string")


# ------------------------------------------------------------------ nodes

def extract_nodes_as_points(node: DataFrame, node_tag: DataFrame, tags=None,
                            columns_to_keep=None) -> DataFrame:
    """Nodes with matching tags -> points + pivoted tag columns
    (extractNodesAsPoints, TU:244-334; TUTest:488-923 semantics:
    requested keys become columns, NULL when absent per node)."""
    spark = node.sparkSession
    pred, _ = create_where_filter(tags)
    ids = node_tag.where(pred).select("id_node").distinct()
    if ids.isEmpty():
        return spark.createDataFrame([], "id_node string, the_geom_wkb binary")
    keys = get_column_selector(node_tag, tags, columns_to_keep)
    tags_wide = tag_pivot(node_tag.join(ids, "id_node", "left_semi"),
                          "id_node", keys)
    out = (node.join(ids, "id_node", "left_semi")
           .select("id_node", "the_geom_wkb")
           .join(tags_wide, "id_node", "left"))
    return out.withColumn("id_node", F.col("id_node").cast("string"))


# ------------------------------------------------------------------ ways

def extract_ways(way_tag: DataFrame, way_node: DataFrame, node: DataFrame,
                 tags=None, columns_to_keep=None,
                 as_polygon: bool = False) -> DataFrame:
    """Ways with matching tags -> 'w'||id rows with WKB geometry +
    pivoted tags (extractWaysAsPolygons/Lines, Transform:160-267 /
    520-600)."""
    spark = way_tag.sparkSession
    pred, _ = create_where_filter(tags)
    ids = way_tag.where(pred).select("id_way").distinct()
    if ids.isEmpty():
        return _empty_geoms(spark, "id")
    coords = _ordered_way_coords(
        way_node.join(ids, "id_way", "left_semi"), node)
    geoms = _ways_geometry(coords, as_polygon)
    keys = get_column_selector(way_tag, tags, columns_to_keep)
    tags_wide = tag_pivot(way_tag.join(ids, "id_way", "left_semi"),
                          "id_way", keys)
    out = geoms.join(tags_wide, "id_way", "left")
    return (out.withColumn("id", F.concat(F.lit("w"),
                                          F.col("id_way").cast("string")))
               .drop("id_way"))


# ------------------------------------------------------------------ relations

_REL_SCHEMA = "id_relation long, the_geom_wkb binary, geom_type string"


def _relation_geoms(members_with_coords: DataFrame,
                    as_polygon: bool) -> DataFrame:
    """Per-relation assembly: linemerge member ways; for polygons,
    close rings, explode, and assign inner-ring holes to the outer
    ring containing them (Transform:358-444).

    Runs in applyInPandas grouped by id_relation — relations are small
    (tens of member ways), so scalar Python inside the group is off
    the hot path, exactly as SURVEY.md §7.3 prescribes.
    """
    def _assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        rid = pdf["id_relation"].iloc[0]
        rows = []
        if not as_polygon:
            lines = [np.array([[p["x"], p["y"]] for p in arr], np.float64)
                     for arr in pdf["pts"].values]
            merged = geom.linemerge(lines)
            merged = [m for m in merged if len(m) >= 2]
            if merged:
                mls = ("MultiLineString", [("LineString", m) for m in merged])
                rows.append((rid, geom.wkb_dumps(mls), "MultiLineString"))
        else:
            def rings_for(role: str) -> list[np.ndarray]:
                sel = pdf[pdf["role"] == role]
                lines = [np.array([[p["x"], p["y"]] for p in arr], np.float64)
                         for arr in sel["pts"].values]
                out = []
                for m in geom.linemerge(lines):
                    # ring closure filter (Transform:405-406,416-417)
                    if len(m) >= 4 and np.array_equal(m[0], m[-1]):
                        out.append(m)
                return out

            outers = rings_for("outer")
            inners = rings_for("inner")
            for shell in outers:
                holes = []
                for h in inners:
                    # hole containment = the RTREE contains-join
                    # (Transform:422-444): test a hole vertex in shell
                    if geom.points_in_rings(
                            np.array([h[0, 0]]), np.array([h[0, 1]]),
                            [shell])[0]:
                        holes.append(h)
                rows.append((rid,
                             geom.wkb_dumps(("Polygon", [shell] + holes)),
                             "Polygon"))
        return pd.DataFrame(rows,
                            columns=["id_relation", "the_geom_wkb", "geom_type"])

    return members_with_coords.groupBy("id_relation").applyInPandas(
        _assemble, schema=_REL_SCHEMA)


def extract_relations(relation_tag: DataFrame, way_member: DataFrame,
                      way_node: DataFrame, node: DataFrame,
                      tags=None, columns_to_keep=None,
                      as_polygon: bool = False) -> DataFrame:
    """Relations with matching tags -> 'r'||id rows (Transform:284-466
    polygons with holes / 610-700 merged lines) + pivoted tags."""
    spark = relation_tag.sparkSession
    pred, _ = create_where_filter(tags)
    ids = relation_tag.where(pred).select("id_relation").distinct()
    if ids.isEmpty():
        return _empty_geoms(spark, "id")
    members = way_member.join(ids, "id_relation", "left_semi")
    coords = _ordered_way_coords(
        way_node.join(members.select("id_way").distinct(),
                      "id_way", "left_semi"), node)
    mw = members.join(coords, "id_way")
    geoms = _relation_geoms(mw.select("id_relation", "role", "pts"), as_polygon)
    keys = get_column_selector(relation_tag, tags, columns_to_keep)
    tags_wide = tag_pivot(relation_tag.join(ids, "id_relation", "left_semi"),
                          "id_relation", keys)
    out = geoms.join(tags_wide, "id_relation", "left")
    return (out.withColumn("id", F.concat(F.lit("r"),
                                          F.col("id_relation").cast("string")))
               .drop("id_relation"))


# ------------------------------------------------------------------ top level

def union_align(a: DataFrame, b: DataFrame) -> DataFrame:
    """UNION ALL with null-padded schema alignment (TU:149-172)."""
    return a.unionByName(b, allowMissingColumns=True)


def to_points(osm: Mapping[str, DataFrame], tags=None,
              columns_to_keep=None) -> DataFrame:
    """OSMTools.Transform.toPoints parity."""
    return extract_nodes_as_points(osm["node"], osm["node_tag"],
                                   tags, columns_to_keep)


def to_lines(osm: Mapping[str, DataFrame], tags=None,
             columns_to_keep=None) -> DataFrame:
    """toLines: ways-as-lines UNION relations-as-merged-lines
    (toPolygonOrLine LINES branch, TU:97-185)."""
    w = extract_ways(osm["way_tag"], osm["way_node"], osm["node"],
                     tags, columns_to_keep, as_polygon=False)
    r = extract_relations(osm["relation_tag"], osm["way_member"],
                          osm["way_node"], osm["node"],
                          tags, columns_to_keep, as_polygon=False)
    return union_align(w, r)


def to_polygons(osm: Mapping[str, DataFrame], tags=None,
                columns_to_keep=None) -> DataFrame:
    """toPolygons: closed ways UNION relation multipolygon assembly."""
    w = extract_ways(osm["way_tag"], osm["way_node"], osm["node"],
                     tags, columns_to_keep, as_polygon=True)
    r = extract_relations(osm["relation_tag"], osm["way_member"],
                          osm["way_node"], osm["node"],
                          tags, columns_to_keep, as_polygon=True)
    return union_align(w, r)
