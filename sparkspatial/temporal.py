"""Temporal operators: as-of join (point-in-time lookup).

The reference engine is batch-spatial only; an as-of join is the
temporal sibling of its correlated-UPDATE pattern
(osm-traffic Traffic.groovy-style "latest matching row wins", see
SURVEY.md §2 J9) applied along a timestamp axis — the operator a
web-corpus training pipeline needs to stamp each page/event with the
most recent prior state (crawl snapshot, robots fetch, model version).

Spark lacks a native as-of join. The scalable shape used here is the
union + running-last window trick:

    left  rows tagged _side=1 (probe)
    right rows tagged _side=0 (build, payload columns carried)
    union -> window PARTITION BY keys ORDER BY ts, _side, tie
          -> last(payload, ignorenulls=True) ROWS UNBOUNDED PRECEDING
    filter _side=1

One hash exchange on the partition keys, sort within partitions, no
range explosion, no Python — the plan survives a 100x scale-up
because its cost is O(|left| + |right|) through a single shuffle,
unlike an interval join (|left| x |right| candidate blowup) or a
per-key collect. Skewed keys can reuse skew.salted_keys upstream.

Ordering `_side ASC` puts build rows *before* probe rows at equal
timestamps, giving inclusive (ts_left >= ts_right) semantics —
identical to DuckDB's `ASOF JOIN ... ON l.ts >= r.ts`, which serves
as the cross-engine oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, keys: list[str],
              left_ts: str, right_ts: str,
              payload: list[str], suffix: str = "_r",
              strict: bool = False,
              tolerance_s: int | None = None) -> DataFrame:
    """For every left row, attach the payload of the latest right row
    with right_ts <= left_ts (strict: <) within the same `keys` group.

    Left rows with no prior right row keep NULL payload (left outer
    as-of semantics). `tolerance_s` additionally nulls matches older
    than the given number of seconds (pandas.merge_asof-style).

    Right-side determinism: if several right rows share (keys, ts) the
    one latest in (ts, payload[0]) order wins — pre-deduplicate the
    right side if a different tie-break is wanted.
    """
    lcols = left.columns
    out_payload = [p + suffix for p in payload]

    # epoch in microseconds keeps TIMESTAMP_NTZ comparisons exact and
    # engine-neutral (NTZ -> TIMESTAMP with UTC session TZ, then the
    # exact integer micros — never via double, which loses the last
    # microsecond at 2024-era epochs; duckdb twin: epoch_us(ts))
    def _epoch_us(c):
        return F.unix_micros(F.col(c).cast("timestamp"))

    # probe rows come AFTER build rows at equal ts for inclusive
    # semantics; BEFORE them when strict
    probe_side, build_side = (0, 1) if strict else (1, 0)

    l = (left
         .withColumn("_ts", _epoch_us(left_ts))
         .withColumn("_side", F.lit(probe_side)))
    for p, op in zip(payload, out_payload):
        l = l.withColumn(op, F.lit(None).cast(right.schema[p].dataType))
    l = l.withColumn("_rts", F.lit(None).cast("long"))

    r = (right
         .withColumn("_ts", _epoch_us(right_ts))
         .withColumn("_side", F.lit(build_side))
         .withColumn("_rts", _epoch_us(right_ts)))
    for p, op in zip(payload, out_payload):
        r = r.withColumn(op, F.col(p))
    for c in lcols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    sel = keys + ["_ts", "_side", "_rts"] + out_payload + \
        [c for c in lcols if c not in keys]
    u = l.select(*sel).unionByName(r.select(*sel))

    # tie-break inside equal (_ts, _side) by the first payload column
    # so "latest right row wins" is deterministic across partitionings
    w = (Window.partitionBy(*keys)
         .orderBy("_ts", "_side", out_payload[0])
         .rowsBetween(Window.unboundedPreceding, 0))
    carried = [F.last(op, ignorenulls=True).over(w).alias(op)
               for op in out_payload]
    carried_ts = F.last("_rts", ignorenulls=True).over(w).alias("_mts")

    matched = (u.select(*keys, "_ts", "_side",
                        *[c for c in lcols if c not in keys],
                        *carried, carried_ts)
               .where(F.col("_side") == probe_side))
    if tolerance_s is not None:
        lim = int(tolerance_s) * 1_000_000
        keep = F.col("_ts") - F.col("_mts") <= F.lit(lim)
        for op in out_payload:
            matched = matched.withColumn(
                op, F.when(keep, F.col(op)))
        matched = matched.withColumn(
            "_mts", F.when(keep, F.col("_mts")))
    return (matched
            .withColumn("asof_gap_s",
                        F.expr("(_ts - _mts) DIV 1000000"))
            .drop("_ts", "_side", "_mts"))
