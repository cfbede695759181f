"""A/B harness: trigram_familiarity on a deterministic long-document
corpus (5k docs x ~3000 chars) — the regime where the pre-r6
substring(i,3) path is O(len^2) per document.

Usage: python plans/r06/ab_trigram_longdoc.py <tree> <reps>
Prints a (count, hash-sum) checksum so two trees can be compared for
result equality as well as time. Used for the post-restart
re-verification in OPTIMIZATION_r06.md.
"""
import sys, time

tree = sys.argv[1]; reps = int(sys.argv[2])
sys.path.insert(0, tree)
from pyspark.sql import SparkSession, functions as F

spark = (SparkSession.builder.master("local[32]")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.shuffle.partitions", "64")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from sparkspatial import text as T

docs = spark.range(5000).selectExpr(
    "cast(id as string) as doc_id",
    "concat_ws(' ', transform(sequence(1, 500), "
    "i -> substr(md5(concat(cast(id as string), '-', cast(i as string))), 1, 5))) as text")
docs = docs.persist(); docs.count()
t0 = time.time()
T.trigram_familiarity(docs).write.format("noop").mode("overwrite").save()
print("warmup:", round(time.time() - t0, 3))
ts = []
for _ in range(reps):
    t0 = time.time()
    T.trigram_familiarity(docs).write.format("noop").mode("overwrite").save()
    ts.append(round(time.time() - t0, 3))
print("reps:", ts, "median:", sorted(ts)[len(ts) // 2])
r = T.trigram_familiarity(docs).agg(
    F.count(F.lit(1)), F.sum(F.hash("doc_id"))).first()
print("check:", tuple(r))
