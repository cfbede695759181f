"""A/B harness: adaptive salted join at 6M points and cosine_topk at
200k vectors / 10k queries, against an arbitrary tree.

Usage: python plans/r06/ab_salted_ann_scaled.py <tree> <reps>
The salted corpus is the frozen bench's own build_pages_cache
replicate=10 output (symlink .bench_cache across trees so both read
identical bytes); the embedding corpus replicates sf0.1's
embeddings.parquet 100x with a deterministic element-wise
perturbation (a pure scale would leave every cosine unchanged).
Used for the post-restart re-verification in OPTIMIZATION_r06.md.
"""
import sys, time

tree = sys.argv[1]; reps = int(sys.argv[2])
sys.path.insert(0, tree)
from pyspark.sql import SparkSession, functions as F

spark = (SparkSession.builder.master("local[32]")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.shuffle.partitions", "64")
         .config("spark.driver.memory", "48g")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import bench as B
from sparkspatial import extract, join, sim, zones


def probed(fn, label):
    fn()  # full-job warmup (verify-skill cold-start rule)
    ts = []
    for _ in range(reps):
        t0 = time.time(); r = fn(); ts.append(round(time.time() - t0, 3))
    print(label, "result:", r, "reps:", ts, "median:", sorted(ts)[len(ts) // 2])


path = B.build_pages_cache(spark, "/root/testdata/sf0.1", replicate=10)
pts = extract.geotag(
    spark.read.parquet(path).select("url", "domain", "lang"),
    "domain", "url").persist()
print("pts:", pts.count())
zdf = zones.synthetic_zones(spark, n=192).persist(); zdf.count()
zidx = join.build_zone_index(zdf, res=10).persist()
probed(lambda: join.spatial_join(pts, zdf, how="inner", broadcast=False,
                                 salt=True, res=10, index=zidx).count(),
       "salted:")

emb0 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
emb = (emb0.withColumn("_rep", F.explode(F.sequence(F.lit(0), F.lit(99))))
       .selectExpr("vec_id * 100 + _rep AS vec_id",
                   "transform(embedding, (x, i) -> "
                   "x + sin(x * 7.0 + i + _rep) * 1e-3) AS embedding")
       .repartition(64).persist())
print("emb:", emb.count())
queries = emb.where("vec_id % 20 = 0").select(
    F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
probed(lambda: sim.cosine_topk(emb, queries, k=10).count(), "ann:")
