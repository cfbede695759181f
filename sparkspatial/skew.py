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

# A cell is hot only when BOTH hold (r6, mirroring AQE's skew-join
# criterion of skewedPartitionFactor x median AND an absolute
# 256 MB floor): it exceeds DEFAULT_HOT_THRESHOLD rows (~the 256 MB
# equivalent at the engine's ~60-120 B point-row width — one key
# below this fits comfortably in a single task, and salting it costs
# a per-row hash, a cover explode and a wider join key for nothing)
# AND it exceeds rel_factor x the average reducer fill (plan_salts;
# so the threshold scales with the shuffle width instead of being a
# constant tuned to any one corpus size).
DEFAULT_HOT_THRESHOLD = 2_000_000  # rows per cell before salting kicks in
DEFAULT_TARGET_ROWS = 50_000       # target rows per (cell, salt) bucket


def cell_histogram(points: DataFrame, cell_col: str = "cell",
                   sample_fraction: float | None = 0.01,
                   min_count: int = 1) -> DataFrame:
    """(cell, n_est) counts, optionally from a Bernoulli sample.

    With sampling, counts are scaled back by 1/fraction — good enough
    to pick hot cells (they are orders of magnitude above threshold).
    """
    # project to the key BEFORE sampling: column pruning does not
    # reach through the Sample operator, so sampling the full row set
    # deserialized every cached column and ran SLOWER than a full
    # pruned groupBy (r6 measured: 1.27 s sampled vs 1.06 s full scan
    # on a 6M-row corpus; projected-then-sampled ~0.4 s)
    df = points.select(cell_col)
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
               max_salt: int = 256,
               n_reducers: int | None = None,
               rel_factor: float = 5.0) -> DataFrame:
    """Hot cells -> (cell, n_salt). n_salt = ceil(n/target), capped.

    With ``n_reducers`` (r6), the threshold is RELATIVE as well as
    absolute: a cell only counts as hot when it exceeds
    ``rel_factor * total_rows / n_reducers`` — i.e. when it would
    genuinely overload its reducer relative to the average fill (the
    guide-§2.5 max-vs-median skew criterion; AQE's skewedPartitionFactor
    uses the same shape). An absolute-only threshold misfires at
    scale in both directions: a 200k-row cell is 5x the average
    reducer on a 6M-row/32-way shuffle boundary case yet harmless on
    a 10^10-row/10^4-way one, and salting balanced data pays the
    per-row salt hash, the cover explode and a wider join key for
    nothing. The total comes from the histogram itself (one scalar
    subquery — no extra pass over the data); pass n_reducers=None for
    the pre-r6 absolute behavior."""
    thr = F.lit(hot_threshold).cast("double")
    if n_reducers:
        tot = hist.agg(F.sum("n_est").cast("double").alias("_tot"))
        hist = hist.crossJoin(F.broadcast(tot))
        thr = F.greatest(thr, F.lit(rel_factor) * F.col("_tot")
                         / F.lit(float(n_reducers)))
    return (hist.where(F.col("n_est") >= thr)
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
