"""Resumable checkpoints with per-partition lineage + metrics.

The north_rule requires "per-partition lineage + metrics checkpointed
to Iceberg so any stage resumes without recomputation" — the scale
analog of the reference's SHA-256 HTTP result cache
(Loader.groovy:240-261: key the expensive step by a content hash,
skip it when the key matches).

In this sandbox there is no Iceberg runtime jar, so the catalog is a
parquet directory + JSON manifest with identical semantics (the
`catalog` hook is where a real deployment points `writeTo(...)` at an
Iceberg table — the API is storage-agnostic). Each stage write records
one lineage row per output partition: (stage, fingerprint, partition_id,
rows_out, wall_ms, written_at). On re-run with the same fingerprint the
stage short-circuits to a parquet scan of the prior output.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_SCHEMA = ("stage string, fingerprint string, partition_id int, "
                  "rows_out long, wall_ms long, written_at string")


class Checkpointer:
    def __init__(self, base_path: str, spark: SparkSession | None = None):
        self.base = base_path
        self.spark = spark
        os.makedirs(base_path, exist_ok=True)

    def _paths(self, stage: str):
        root = os.path.join(self.base, stage)
        return root, os.path.join(root, "_MANIFEST.json"), \
            os.path.join(self.base, "_lineage", stage)

    def is_complete(self, stage: str, fingerprint: str) -> bool:
        _, manifest, _ = self._paths(stage)
        if not os.path.exists(manifest):
            return False
        try:
            with open(manifest) as f:
                m = json.load(f)
        except (json.JSONDecodeError, OSError):
            # a crash mid-write left a truncated manifest: treat the
            # stage as incomplete and recompute
            return False
        return m.get("fingerprint") == fingerprint and m.get("complete")

    def stage(self, df: DataFrame, stage: str, fingerprint: str) -> DataFrame:
        """Materialize `df` under (stage, fingerprint), or reuse the
        prior materialization when the fingerprint matches."""
        spark = df.sparkSession
        root, manifest, lineage_dir = self._paths(stage)
        data_path = os.path.join(root, "data")
        if self.is_complete(stage, fingerprint):
            return spark.read.parquet(data_path).drop("_pid")

        t0 = time.monotonic()
        with_pid = df.withColumn("_pid", F.spark_partition_id())
        with_pid.write.mode("overwrite").parquet(data_path)
        wall_ms = int((time.monotonic() - t0) * 1000)

        out = spark.read.parquet(data_path)
        lineage = (out.groupBy("_pid")
                   .agg(F.count(F.lit(1)).alias("rows_out"))
                   .select(F.lit(stage).alias("stage"),
                           F.lit(fingerprint).alias("fingerprint"),
                           F.col("_pid").cast("int").alias("partition_id"),
                           "rows_out",
                           F.lit(wall_ms).cast("long").alias("wall_ms"),
                           F.lit(time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                               time.gmtime()))
                           .alias("written_at")))
        lineage.write.mode("overwrite").parquet(lineage_dir)

        # atomic publish: write-then-rename so a crash mid-write can
        # never leave a truncated manifest that claims completion
        tmp = manifest + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"stage": stage, "fingerprint": fingerprint,
                       "complete": True, "wall_ms": wall_ms}, f)
        os.replace(tmp, manifest)
        return out.drop("_pid")

    def load(self, spark: SparkSession, stage: str) -> DataFrame:
        """Read-only accessor for a completed stage's data.

        Callers that already checked `is_complete()` must use this
        instead of routing a dummy DataFrame through `stage()`: if
        the manifest disappears between the outer check and stage()'s
        internal re-check, stage() would materialize the dummy under
        the real fingerprint and poison every future resume
        (review-caught r4).
        """
        root, _, _ = self._paths(stage)
        return spark.read.parquet(os.path.join(root, "data")).drop("_pid")

    def lineage(self, spark: SparkSession, stage: str | None = None) -> DataFrame:
        base = os.path.join(self.base, "_lineage")
        path = os.path.join(base, stage) if stage else os.path.join(base, "*")
        return spark.read.schema(LINEAGE_SCHEMA).parquet(path)

    def invalidate(self, stage: str) -> None:
        _, manifest, _ = self._paths(stage)
        if os.path.exists(manifest):
            os.remove(manifest)


def fingerprint_of(*parts) -> str:
    """Stable content fingerprint for stage inputs (paths, code
    versions, parameter dicts)."""
    from .hashing import h64

    return format(h64("|".join(str(p) for p in parts)), "016x")
