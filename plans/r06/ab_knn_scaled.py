"""A/B harness: knn_join at bench replicate=10 scale (6M points,
5.75M-entry index -> density probe ON) against an arbitrary tree.

Usage: python plans/r06/ab_knn_scaled.py <tree> <reps>
Both trees must be benched against the SAME cache dir (symlink
.bench_cache/pages_root_testdata_sf0.1_x10.parquet across trees so
the corpus is byte-identical). Used for the post-restart
re-verification in OPTIMIZATION_r06.md.
"""
import sys, time

tree = sys.argv[1]; reps = int(sys.argv[2])
sys.path.insert(0, tree)
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[32]")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.shuffle.partitions", "64")
         .config("spark.driver.memory", "48g")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import bench as B
from sparkspatial import extract, knn

path = B.build_pages_cache(spark, "/root/testdata/sf0.1", replicate=10)
pages = spark.read.parquet(path)
pts = extract.geotag(pages.select("url", "domain", "lang"),
                     "domain", "url").persist()
print("pts:", pts.count())
kidx = knn.build_knn_index(pts, res=10, k_max=16).persist()
print("index n_loc:", getattr(kidx, "n_loc", "n/a"))
queries = (pts.where("xxhash64(url) % 5000 = 0")
           .selectExpr("url AS qid", "lat AS qlat", "lon AS qlon"))
t0 = time.time()
knn.knn_join(pts, queries, k=10, res=10, index=kidx).count()
print("warmup:", round(time.time() - t0, 3))
ts = []
for _ in range(reps):
    t0 = time.time()
    n = knn.knn_join(pts, queries, k=10, res=10, index=kidx).count()
    ts.append(round(time.time() - t0, 3))
print("rows:", n, "reps:", ts, "median:", sorted(ts)[len(ts) // 2])
