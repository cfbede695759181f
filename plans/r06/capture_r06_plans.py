"""Capture .explain("formatted") for every query the r6 optimization
round touched, as the judge-checkable plan evidence.

Usage (from a tree at the revision you want to capture):
    python plans/r06/capture_r06_plans.py <suffix>
writes plans/r06/<query>_<suffix>.txt for suffix in {before, after}.
`before` is produced from a git worktree at the round-start commit.

Plans are captured over the sf0.01 tables (the oracle scale — plan
SHAPE is scale-independent; the timings in OPTIMIZATION_r06.md come
from the sf1.0-scale runs) on local[8]/8 shuffle partitions so before
and after are byte-comparable.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

SF = "/root/testdata/sf0.01"
OUT = os.path.dirname(os.path.abspath(__file__))


def main():
    suffix = sys.argv[1] if len(sys.argv) > 1 else "after"
    from pyspark.sql import functions as F

    from sparkspatial import extract, join, knn, sim, text, zones
    from sparkspatial.session import get_spark

    spark = get_spark(app=f"plans-r06-{suffix}", master="local[8]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    pages = docs.select(
        F.concat_ws("/", "source", F.col("doc_id").cast("string")).alias("url"),
        F.col("source").alias("domain"), "lang")
    pts = extract.geotag(pages, "domain", "url")
    zdf = zones.synthetic_zones(spark, n=48)

    emb_q = emb.where("vec_id % 20 = 0").select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    kidx = knn.build_knn_index(pts, res=10, k_max=16).persist()
    knn_q = (pts.limit(50)
             .selectExpr("url AS qid", "lat AS qlat", "lon AS qlon"))

    targets = {
        "trigram_familiarity":
            lambda: entry.q_trigram_familiarity(spark, SF),
        "decontaminate":
            lambda: text.decontaminate(
                docs, docs.where("doc_id % 50 = 0"), shingle_k=5),
        "minhash":
            lambda: text.minhash_signatures(docs, n_hashes=8),
        "ann_cosine":
            lambda: sim.cosine_topk(emb, emb_q, k=10),
        "ann_cosine_blocked":
            lambda: sim.cosine_topk_blocked(emb, emb_q, k=5),
        "knn_graph":
            lambda: sim.knn_graph(emb, k=5),
        # the kNN loop is iterative: capture ROUND 1's flagged-frame
        # plan by running the join and explaining the result union
        "knn":
            lambda: knn.knn_join(pts, knn_q, k=10, res=10, index=kidx),
        "join_shuffle_salted":
            lambda: join.spatial_join(pts, zdf, how="inner",
                                      broadcast=False, salt=True),
    }
    for name, fn in targets.items():
        path = os.path.join(OUT, f"{name}_{suffix}.txt")
        try:
            df = fn()
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(path, "w") as f:
                f.write(buf.getvalue())
            print("wrote", path)
        except Exception as e:  # capture failures loudly, don't abort
            with open(path, "w") as f:
                f.write(f"CAPTURE FAILED: {e}\n")
            print("FAILED", path, e)


if __name__ == "__main__":
    main()
