"""Interval (range) join: binned equi-join semantics vs a literal BETWEEN
join, boundary inclusivity, nulls, and the no-nested-loop plan guarantee."""

import datetime as dt

import pyspark.sql.functions as F

from observability_platform___databricks_etl_pipeline_spark.operators.rangejoin import interval_join

T0 = dt.datetime(2024, 1, 1)


def _t(m, s=0.0):
    return T0 + dt.timedelta(minutes=m, seconds=s)


def test_interval_join_matches_between_join(spark):
    pts = spark.createDataFrame(
        [(i, i % 3, _t(i * 7 % 120, s=(i % 4) * 0.25)) for i in range(60)]
        + [(998, 0, None)],
        "pid long, k long, ts timestamp",
    )
    ivs = spark.createDataFrame(
        [(j, j % 3, _t(j * 11 % 100), _t(j * 11 % 100 + 13)) for j in range(25)]
        + [(901, 0, None, _t(50)), (902, 0, _t(60), _t(40))],  # null lo / inverted
        "iid long, k long, lo timestamp, hi timestamp",
    )
    got = {
        (r["pid"], r["iid"])
        for r in interval_join(pts, ivs, "ts", "lo", "hi", on=["k"], bin_width=300).collect()
    }
    want = {
        (r["pid"], r["iid"])
        for r in pts.join(ivs, "k").where(F.col("ts").between(F.col("lo"), F.col("hi"))).collect()
    }
    assert got == want and len(got) > 20
    # boundary inclusivity: a point exactly at lo and one exactly at hi match
    p2 = spark.createDataFrame([(1, _t(10)), (2, _t(20))], "pid long, ts timestamp")
    i2 = spark.createDataFrame([(9, _t(10), _t(20))], "iid long, lo timestamp, hi timestamp")
    assert interval_join(p2, i2, "ts", "lo", "hi", bin_width=60).count() == 2


def test_interval_join_overlapping_names_and_plan(spark):
    """A shared non-key column name gets the _iv suffix with values intact,
    and the plan is an equi-join — never BroadcastNestedLoopJoin."""
    pts = spark.createDataFrame([(1, _t(5), "P")], "pid long, ts timestamp, tag string")
    ivs = spark.createDataFrame(
        [(7, _t(0), _t(10), "I")], "iid long, lo timestamp, hi timestamp, tag string"
    )
    out = interval_join(pts, ivs, "ts", "lo", "hi", bin_width=600)
    rows = out.collect()
    assert rows[0]["tag"] == "P" and rows[0]["tag_iv"] == "I"
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan
