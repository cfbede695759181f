"""Skew handling: cell histograms + salting plans.

Dense web-corpus hotspots (many urls from few domains landing in few
cells — BASELINE.json north_star) make the spatial-join shuffle key
skewed in a way AQE's generic skew-join split cannot always fix
(AQE splits map outputs, but a single hot *key* still lands in one
reducer for a hash join). The engine therefore salts hot cells
explicitly: points in a hot cell scatter over ``n_salt`` sub-keys,
polygon cover rows replicate ``n_salt`` times, and the join runs on
``(cell, salt)``.

The histogram side stays lazy: hot cells are detected with a sampled
aggregation, the (tiny) hot-cell table is broadcast, and no driver
collect of data rows ever happens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_HOT_THRESHOLD = 200_000  # rows per cell before salting kicks in
DEFAULT_TARGET_ROWS = 50_000     # target rows per (cell, salt) bucket


def cell_histogram(points: DataFrame, cell_col: str = "cell",
                   sample_fraction: float | None = 0.01,
                   min_count: int = 1) -> DataFrame:
    """(cell, n_est) counts, optionally from a Bernoulli sample.

    With sampling, counts are scaled back by 1/fraction — good enough
    to pick hot cells (they are orders of magnitude above threshold).
    """
    df = points
    scale = 1.0
    if sample_fraction is not None and sample_fraction < 1.0:
        df = df.sample(fraction=sample_fraction, seed=42)
        scale = 1.0 / sample_fraction
    hist = (df.groupBy(cell_col)
              .agg((F.count(F.lit(1)) * F.lit(scale)).cast("long").alias("n_est")))
    return hist.where(F.col("n_est") >= min_count)


def plan_salts(hist: DataFrame, cell_col: str = "cell",
               hot_threshold: int = DEFAULT_HOT_THRESHOLD,
               target_rows: int = DEFAULT_TARGET_ROWS,
               max_salt: int = 256) -> DataFrame:
    """Hot cells -> (cell, n_salt). n_salt = ceil(n/target), capped."""
    return (hist.where(F.col("n_est") >= hot_threshold)
                .select(F.col(cell_col),
                        F.least(F.ceil(F.col("n_est") / F.lit(target_rows)),
                                F.lit(max_salt)).cast("int").alias("n_salt")))


def salt_points(points: DataFrame, salt_plan: DataFrame,
                cell_col: str = "cell", salt_col: str = "salt",
                id_cols: list[str] | None = None) -> DataFrame:
    """Assign each point a salt in [0, n_salt) (1 for non-hot cells).

    The salt hash uses xxhash64 over the point id columns — engine-side
    only (never part of an oracle-checked result)."""
    id_cols = id_cols or ["url"]
    joined = points.join(F.broadcast(salt_plan), on=cell_col, how="left")
    n = F.coalesce(F.col("n_salt"), F.lit(1))
    return (joined
            .withColumn(salt_col,
                        F.pmod(F.xxhash64(*[F.col(c) for c in id_cols]), n)
                         .cast("int"))
            .drop("n_salt"))


def salt_cover(cover: DataFrame, salt_plan: DataFrame,
               cell_col: str = "cell", salt_col: str = "salt") -> DataFrame:
    """Replicate polygon cover rows once per salt bucket of hot cells."""
    joined = cover.join(F.broadcast(salt_plan), on=cell_col, how="left")
    n = F.coalesce(F.col("n_salt"), F.lit(1))
    return (joined
            .withColumn(salt_col,
                        F.explode(F.sequence(F.lit(0), (n - F.lit(1)).cast("int"))))
            .withColumn(salt_col, F.col(salt_col).cast("int"))
            .drop("n_salt"))
