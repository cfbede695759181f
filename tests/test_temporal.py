"""asof_join vs pandas.merge_asof brute force + semantics edges."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from sparkspatial import temporal


@pytest.fixture(scope="module")
def events(spark):
    sf_dir = "/root/testdata/sf0.001"
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _brute(left_pdf, right_pdf, strict=False, tolerance_s=None):
    l = left_pdf.sort_values("ts").reset_index(drop=True)
    r = (right_pdf.sort_values("ts").reset_index(drop=True)
         .rename(columns={"event_id": "event_id_e", "value": "value_e"}))
    kw = {}
    if tolerance_s is not None:
        kw["tolerance"] = pd.Timedelta(seconds=tolerance_s)
    m = pd.merge_asof(l, r[["user_id", "ts", "event_id_e", "value_e"]],
                      on="ts", by="user_id",
                      allow_exact_matches=not strict, **kw)
    return m.sort_values("event_id").reset_index(drop=True)


@pytest.mark.parametrize("strict", [False, True])
def test_asof_matches_merge_asof(events, strict):
    left = events.where("event_type = 'click'")
    right = events.where("event_type = 'error'")
    out = temporal.asof_join(left, right, ["user_id"], "ts", "ts",
                             payload=["event_id", "value"], suffix="_e",
                             strict=strict)
    got = (out.select("event_id", "event_id_e", "value_e", "asof_gap_s")
           .orderBy("event_id").toPandas())
    exp = _brute(left.toPandas(), right.toPandas(), strict=strict)
    assert len(got) == left.count()
    pd.testing.assert_series_equal(
        got["event_id_e"].astype("float"),
        exp["event_id_e"].astype("float"), check_names=False)
    pd.testing.assert_series_equal(
        got["value_e"].astype("float"),
        exp["value_e"].astype("float"), check_names=False)
    # gap is whole truncated seconds of (l.ts - r.ts), NULL iff no match
    gap = (exp["ts"] - pd.merge(exp, _brute(left.toPandas(),
                                            right.toPandas(), strict=strict),
                                on="event_id")["ts_y"])
    assert got["asof_gap_s"].isna().equals(exp["event_id_e"].isna())


def test_asof_tolerance(events):
    left = events.where("event_type = 'click'")
    right = events.where("event_type = 'error'")
    tol = 3600
    out = temporal.asof_join(left, right, ["user_id"], "ts", "ts",
                             payload=["event_id", "value"], suffix="_e",
                             tolerance_s=tol)
    got = (out.select("event_id", "event_id_e", "asof_gap_s")
           .orderBy("event_id").toPandas())
    exp = _brute(left.toPandas(), right.toPandas(), tolerance_s=tol)
    pd.testing.assert_series_equal(
        got["event_id_e"].astype("float"),
        exp["event_id_e"].astype("float"), check_names=False)
    ok = got["asof_gap_s"].dropna()
    assert (ok <= tol).all() and (ok >= 0).all()


def test_asof_exact_ts_inclusive_vs_strict(spark):
    l = spark.createDataFrame(
        [(1, 10, "2024-01-01 00:00:10.000000")],
        "event_id long, user_id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    r = spark.createDataFrame(
        [(100, 10, "2024-01-01 00:00:10.000000", 1.5),
         (99, 10, "2024-01-01 00:00:05.000000", 2.5)],
        "event_id long, user_id long, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    inc = temporal.asof_join(l, r, ["user_id"], "ts", "ts",
                             payload=["event_id", "value"], suffix="_e")
    row = inc.collect()[0]
    assert row["event_id_e"] == 100 and row["asof_gap_s"] == 0
    st = temporal.asof_join(l, r, ["user_id"], "ts", "ts",
                            payload=["event_id", "value"], suffix="_e",
                            strict=True)
    row = st.collect()[0]
    assert row["event_id_e"] == 99 and row["asof_gap_s"] == 5


def test_asof_no_prior_is_null(spark):
    l = spark.createDataFrame(
        [(1, 10, "2024-01-01 00:00:01")],
        "event_id long, user_id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    r = spark.createDataFrame(
        [(100, 10, "2024-01-01 00:00:02", 1.5)],
        "event_id long, user_id long, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    row = temporal.asof_join(l, r, ["user_id"], "ts", "ts",
                             payload=["event_id", "value"],
                             suffix="_e").collect()[0]
    assert row["event_id_e"] is None and row["asof_gap_s"] is None


def test_asof_single_shuffle_plan(events):
    """Scale shape: exactly one hash exchange (on the keys), no
    cartesian/range join in the plan."""
    left = events.where("event_type = 'click'")
    right = events.where("event_type = 'error'")
    out = temporal.asof_join(left, right, ["user_id"], "ts", "ts",
                             payload=["event_id", "value"], suffix="_e")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
