"""Bucketed-table storage: pre-shuffled persistent layout for
repeat-join workloads.

The reference keeps 14 B-tree indexes + an RTREE so its per-query
joins never rescan (SURVEY.md §2.8 P1-P3; osm-transform
`Transform.groovy` index DDL). The Spark-native analog for the
*equi-join* half of that is HIVE-style bucketing: write the table
hash-partitioned AND bucket-sorted by the join key once, and every
later join/aggregation on that key runs with NO exchange — the scan
itself satisfies the required distribution. At 100 TB this converts
the dominant shuffle of every downstream pipeline run into a one-time
write cost, exactly like building the reference's indexes once.

Use `save_bucketed` for the big fact side (pages/points by `cell`,
documents by `doc_id`), then `read_table`; `tests/test_bucketing.py`
pins the no-Exchange plan property for bucket-bucket joins and
bucket-side aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(df: DataFrame, name: str, bucket_col: str,
                  n_buckets: int, *, sort_col: str | None = None,
                  path: str | None = None,
                  mode: str = "overwrite") -> None:
    """Persist `df` as a parquet table bucketed (and optionally
    bucket-sorted) by `bucket_col`.

    `n_buckets` plays the role of shuffle parallelism for every future
    join on this key: pick ~2-4x the executor-core count at the
    table's target scale. `sort_col` additionally sorts within
    buckets, which lets sort-merge joins skip their sort stage too.
    """
    w = df.write.format("parquet").mode(mode) \
        .bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(name)


def read_table(spark: SparkSession, name: str) -> DataFrame:
    """Read a bucketed table back (bucket metadata comes from the
    catalog; a plain spark.read.parquet(path) would lose it)."""
    return spark.table(name)
