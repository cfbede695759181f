"""End-to-end training-data curation demo: WARC -> curated corpus.

The web-corpus half of the engine (the OSM half lives in
noise_pipeline_demo.py): ingest a Common-Crawl-style WARC archive,
extract text, gate on quality/language, scrub PII, excise duplicated
boilerplate substrings, near-dedup, and pack the survivors into
training sequences. Run:

    python examples/curation_demo.py [out_dir]

Synthesizes a small WARC from the sf0.001 documents table (no
network), so the demo is self-contained and deterministic.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


def main(out_dir: str) -> dict:
    from pyspark.sql import functions as F

    from sparkspatial import extract, text, warc
    from sparkspatial.session import get_spark

    spark = get_spark(app="curation-demo")
    spark.sparkContext.setLogLevel("ERROR")
    stats = {}

    # 0. synthesize a WARC archive from the documents table (stand-in
    #    for a downloaded Common Crawl segment), with injected
    #    boilerplate + PII to give the pipeline something to remove
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    records = []
    for r in docs:
        t = r.text + " subscribe to our newsletter for daily updates"
        if r.doc_id % 9 == 0:
            t += f" contact user{r.doc_id}@mail.example"
        records.append((f"https://{r.source}.example/{r.doc_id}",
                        "2024-05-01T00:00:00Z",
                        f"<html><body>{t}</body></html>".encode()))
    warc_path = os.path.join(out_dir, "segment.warc.gz")
    os.makedirs(out_dir, exist_ok=True)
    with open(warc_path, "wb") as f:
        f.write(warc.encode_warc(records, compress=True))

    # 1. ingest + text extraction (exchange between the Python stages)
    pages = warc.read_warc(spark, warc_path).repartition(8)
    pages = extract.extract_text_udf(pages, "html") \
        .withColumnRenamed("text_extracted", "text") \
        .withColumn("doc_id", F.xxhash64("url"))
    stats["ingested"] = pages.count()

    # 2. quality/language gate (codegen projection)
    gated = pages.where(F.expr(
        text.quality_score_sql("text", "spark") + " >= 4e-1"))
    stats["passed_quality"] = gated.count()

    # 3. PII scrub (codegen regexp chain)
    scrubbed = gated.selectExpr(
        "doc_id", "url",
        text.pii_scrub_sql("text", "spark") + " AS text")

    # 4. duplicated-substring excision (the injected boilerplate)
    clean = text.remove_duplicated_spans(scrubbed, shingle_k=5,
                                         min_run=3)
    stats["boilerplate_tokens_removed"] = clean.agg(
        F.sum("n_tokens_removed")).first()[0]
    clean = clean.selectExpr("doc_id", "text_clean AS text")

    # 5. near-dedup survivors (MinHash -> LSH -> verified >= 0.8)
    sigs = text.minhash_signatures(clean, n_hashes=8)
    pairs = text.lsh_candidate_pairs(sigs, bands=4)
    verified = (text.token_jaccard_pairs(clean, pairs)
                .where(F.col("jaccard") >= 0.8))
    losers = verified.select(F.col("id_b").alias("doc_id")).distinct()
    survivors = clean.join(losers, "doc_id", "left_anti")
    stats["survivors"] = survivors.count()

    # 6. pack into training sequences + write shard manifests
    packed = text.pack_sequences(survivors, seq_len=256, n_shards=4)
    packed.write.mode("overwrite").parquet(f"{out_dir}/packed")
    stats["packs"] = packed.select("shard", "pack_id") \
        .distinct().count()
    return stats


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/curation_demo_out"
    print(main(out))
