"""Physical-plan shape assertions — the scale guarantees.

These pin the properties that make the engine viable at 100 TB:
column-pruned scans, broadcast hash joins for small polygon sides,
bbox predicates inside the join (not post-filters), no extra point
explode under single-res covers, partial aggregation for rollups.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkspatial import extract, join, tiles, zones


@pytest.fixture(scope="module")
def pts(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pages = docs.select(
        F.concat_ws("/", "source", F.col("doc_id").cast("string")).alias("url"),
        F.col("source").alias("domain"), "lang")
    return extract.geotag(pages, "domain", "url")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _explain(df) -> str:
    return df._jdf.queryExecution().toString()


def test_scan_is_column_pruned(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    q = docs.select("doc_id").where(F.col("doc_id") > 10)
    plan = _explain(q)
    # only doc_id reaches the scan; filter pushed to parquet
    assert "ReadSchema: struct<doc_id:bigint>" in plan
    assert "PushedFilters: [IsNotNull(doc_id), GreaterThan(doc_id,10)]" in plan


def test_spatial_join_is_broadcast_hash(spark, pts):
    zdf = zones.synthetic_zones(spark, n=24)
    out = join.spatial_join(pts, zdf, how="inner", broadcast=True)
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # the bbox test rides inside the join condition, not a post-filter
    assert "minx" in plan.split("BroadcastHashJoin")[1].split("\n")[0]


def test_spatial_join_single_res_no_point_explode(spark, pts):
    """Mixed-size zones must not multiply the probe side: single global
    res -> plain project, no Generate/explode on the point side."""
    zdf = zones.synthetic_zones(spark, n=48)  # varied sizes
    out = join.spatial_join(pts, zdf, how="inner", broadcast=True)
    plan = _plan(out)
    assert "Generate explode" not in plan


def test_shuffle_join_uses_exchange_on_cell(spark, pts):
    # AQE rightly re-plans tiny shuffle joins to broadcast; disable the
    # thresholds to assert the genuine at-scale shuffle shape
    zdf = zones.synthetic_zones(spark, n=24)
    old = {k: spark.conf.get(k, None) for k in
           ("spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold")}
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        out = join.spatial_join(pts, zdf, how="inner", broadcast=False)
        plan = _plan(out)
        assert "Exchange hashpartitioning(cell" in plan
    finally:
        for k, v in old.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)


def test_shuffle_join_aqe_rescues_tiny_cover(spark, pts):
    """With defaults, AQE turns a tiny-cover shuffle join into a
    broadcast at runtime — the behavior we rely on at scale when the
    polygon side turns out small."""
    zdf = zones.synthetic_zones(spark, n=24)
    out = join.spatial_join(pts, zdf, how="inner", broadcast=False)
    assert "BroadcastHashJoin" in _plan(out) or \
        "Exchange hashpartitioning(cell" in _plan(out)


def test_rollup_has_partial_aggregation(spark, pts):
    g = tiles.assign_cells(pts, res=9)
    fine = g.groupBy("cell").agg(F.count(F.lit(1)).alias("n"))
    plan = _plan(fine)
    # map-side combine before the exchange
    assert "partial_count" in plan or "HashAggregate" in plan
    assert plan.index("HashAggregate") < plan.index("Exchange")


def test_geotag_is_whole_stage_codegen(spark, pts):
    """The arithmetic geocode must stay JVM-side (no Python eval)."""
    plan = _plan(pts)
    # "*(n)" prefixes mark whole-stage-codegen spans in toString()
    assert "*(1)" in plan
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan


def test_line_dedup_plan_combines_before_exchange(spark, sf_dir):
    """Hot-line safety: the min-struct aggregation must have a partial
    (map-side) phase below the exchange on md5(line), and there must
    be NO Window over the line hash (a window would serialize a hot
    boilerplate line into one task)."""
    from sparkspatial import text

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(text.line_dedup(docs))
    assert "partial_min(struct" in plan
    assert "Window" not in plan


def test_pack_sequences_single_exchange_on_shard(spark, sf_dir):
    """One hash exchange (on shard) feeds the running-sum window; no
    second data shuffle."""
    from sparkspatial import text

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(text.pack_sequences(docs))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "hashpartitioning(shard" in plan
    assert "Window" in plan


def test_decontaminate_only_hashes_cross_the_semi_join(spark, sf_dir):
    """The contamination check joins on the 8-byte shingle hash (sh);
    document text must never be a join key or shuffle column of the
    semi-join side."""
    from sparkspatial import text

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    ev = docs.where("doc_id % 10 = 0")
    plan = _plan(text.decontaminate(docs, ev, shingle_k=5))
    assert "LeftSemi" in plan
    # the semi-join keys are the shingle hashes
    import re
    m = re.search(r"Join [^,]*\[sh#\d+L?\], \[sh#\d+L?\], LeftSemi", plan) \
        or re.search(r"BroadcastHashJoin \[sh#\d+L?\], \[sh#\d+L?\], LeftSemi",
                     plan)
    assert m, plan[:2000]


def test_every_driver_query_plan_is_scale_clean(spark, sf_dir):
    """Sweeping hot-path guard over ALL driver queries: no physical
    plan may contain a CartesianProduct/BroadcastNestedLoopJoin (the
    all-pairs trap) or BatchEvalPython (row-at-a-time Python UDF —
    Arrow stages show as ArrowEvalPython/MapInPandas/FlatMapGroupsInPandas
    and are allowed). Catches a scale regression in any future query
    without writing a per-query test."""
    import __spark_entry__ as entrymod

    # no exemptions: since r3 the embedding queries ride the
    # block-pair cosine_pairs_blocked plan (no cartesian), so every
    # driver query must be free of all-pairs operators (r3 verdict
    # item 6 removed the stale allowlist)
    bad = {}
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        problems = []
        if "BatchEvalPython" in plan:
            problems.append("row-at-a-time Python UDF")
        if ("CartesianProduct" in plan
                or "BroadcastNestedLoopJoin" in plan):
            problems.append("all-pairs join")
        if problems:
            bad[name] = problems
    assert not bad, bad
