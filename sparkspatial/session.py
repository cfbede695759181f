"""SparkSession factory with the engine's standard configuration."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


# DataFrames persisted by engine internals (e.g. the mixed-resolution
# spatial-join cover) register here so long-lived sessions can release
# executor memory between jobs without tracking them by hand.
_PERSISTED: list = []


def register_persisted(df) -> None:
    _PERSISTED.append(df)


def unpersist_all(blocking: bool = False) -> int:
    """Unpersist every engine-registered cached DataFrame; returns the
    number released. Call between jobs in a long-lived session."""
    n = 0
    while _PERSISTED:
        df = _PERSISTED.pop()
        try:
            df.unpersist(blocking)
            n += 1
        except Exception:
            pass
    return n


def fan_out(df, min_parallelism: int | None = None):
    """Ensure a scan feeds wide per-row compute (explode / trigram /
    shingle fan-out) with at least cluster parallelism.

    A small corpus often arrives as one unsplittable parquet row group,
    which serializes an explode that amplifies the data 100-1000x
    downstream. When the scan's partition count is below the session's
    default parallelism, pay one narrow-input round-robin shuffle (the
    *input* rows — cheap relative to the fan-out) to unlock full-width
    compute. When the scan is already wide (the 100 TB case: thousands
    of row groups across thousands of files), this is a no-op and adds
    no shuffle: the condition, not the repartition, is the contract.
    """
    sc = df.sparkSession.sparkContext
    target = min_parallelism or sc.defaultParallelism
    parts = df.rdd.getNumPartitions()
    return df.repartition(target) if parts < target else df


def get_spark(app: str = "sparkspatial", master: str | None = None,
              shuffle_partitions: int | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    Local-mode defaults come from env (`SPARK_GRAFT_CPUS`); on a real
    cluster the master/memory flags come from spark-submit and this
    function only applies SQL-level settings, all of which scale with
    cluster size via AQE.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or max(cpus, 8)
    builder = (
        SparkSession.builder.master(master)
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
    )
    # Benchmarks pre-size the heap (-Xms == -Xmx) so timed runs never
    # pay heap-growth page-fault storms (observed 89% sys time cold at
    # local[32], see .claude/skills/verify/SKILL.md). Env-gated: tests
    # and ad-hoc sessions keep the default lazy heap.
    xms = os.environ.get("SPARK_GRAFT_XMS")
    if xms:
        builder = builder.config("spark.driver.extraJavaOptions",
                                 f"-Xms{xms}")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, str(v))
    return builder.getOrCreate()
