"""Deterministic test fixtures.

`micro_osm` reproduces the reference's inline synthetic world
(AbstractOSMTest.createData, AbstractOSMTest.groovy:269-309; rows
transcribed in FIXTURES.md A.2): 4 nodes on a 10x10 square, one
closed way over them, one relation with the way as 'outer' member,
tags building=house / material=concrete / water=lake.

`synthetic_pages` builds the FIXTURES.md B.1 page corpus: urls over a
zipf-ish domain pool, html embedding geo markers at the canonical
arithmetic geocode, `text` byte-identical to extract_text(html).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from . import extract, geom
from .geocode import geocode_pandas


def micro_osm(spark: SparkSession) -> dict[str, DataFrame]:
    def pt(x, y):
        return bytearray(geom.point_wkb(float(x), float(y)))

    node = spark.createDataFrame(
        [(1, pt(0, 0)), (2, pt(10, 0)), (3, pt(0, 10)), (4, pt(10, 10))],
        "id_node long, the_geom_wkb binary")
    node_tag = spark.createDataFrame(
        [(1, "building", "house"), (1, "material", "concrete"),
         (2, "material", "concrete"), (3, "water", "lake"),
         (4, "water", "lake"), (4, "building", "house")],
        "id_node long, tag_key string, tag_value string")
    way = spark.createDataFrame([(1,)], "id_way long")
    way_node = spark.createDataFrame(
        [(1, 1, 1), (1, 2, 2), (1, 4, 3), (1, 3, 4), (1, 1, 5)],
        "id_way long, id_node long, node_order int")
    way_tag = spark.createDataFrame(
        [(1, "building", "house"), (1, "material", "concrete"),
         (1, "water", "lake")],
        "id_way long, tag_key string, tag_value string")
    relation = spark.createDataFrame([(1,)], "id_relation long")
    relation_tag = spark.createDataFrame(
        [(1, "building", "house"), (1, "material", "concrete"),
         (1, "water", "lake")],
        "id_relation long, tag_key string, tag_value string")
    way_member = spark.createDataFrame(
        [(1, 1, "outer", 1)],
        "id_relation long, id_way long, role string, way_order int")
    node_member = spark.createDataFrame(
        [], "id_relation long, id_node long, role string, node_order int")
    relation_member = spark.createDataFrame(
        [], "id_relation long, id_sub_relation long, role string, "
            "relation_order int")
    return {
        "node": node, "node_tag": node_tag, "node_member": node_member,
        "way": way, "way_node": way_node, "way_tag": way_tag,
        "way_member": way_member, "relation": relation,
        "relation_tag": relation_tag, "relation_member": relation_member,
    }


def synthetic_pages(spark: SparkSession, n: int = 2000,
                    n_domains: int = 50, seed: int = 42) -> DataFrame:
    """FIXTURES.md B.1 pages corpus: (url, warc_ts, html, text, lang);
    `text` byte-identical to extract_text(html); 0..3 geo markers per
    page at the canonical geocode of the url (so marker extraction and
    arithmetic geotag agree on the first marker)."""
    rng = np.random.RandomState(seed)
    # zipf-ish domain draw -> hotspot skew in urls per domain
    ranks = np.arange(1, n_domains + 1, dtype=np.float64)
    probs = (1.0 / ranks) / (1.0 / ranks).sum()
    dom_idx = rng.choice(n_domains, size=n, p=probs)
    domains = np.array([f"d{i}.example" for i in range(n_domains)])[dom_idx]
    seq = pd.Series(range(n)).groupby(domains).cumcount().to_numpy()
    urls = np.array([f"{d}/{s}" for d, s in zip(domains, seq)])
    lat, lon = geocode_pandas(pd.Series(domains), pd.Series(urls))
    langs = np.array(["en", "fr", "de", "es", "zh"])[
        rng.randint(0, 5, size=n)]
    n_markers = rng.randint(0, 4, size=n)
    rows = []
    base_ts = pd.Timestamp("2024-06-01", tz="UTC")
    for i in range(n):
        markers = [(lat[i], lon[i])] * int(n_markers[i])
        text = f"page {urls[i]} in {langs[i]} with {n_markers[i]} markers"
        html = extract.make_html(text, markers)
        rows.append((urls[i], (base_ts + pd.Timedelta(seconds=int(i))
                               ).to_pydatetime(),
                     bytearray(html), extract.extract_text(html), langs[i],
                     domains[i]))
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, "
              "lang string, domain string")
