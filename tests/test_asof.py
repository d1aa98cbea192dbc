"""As-of join unit semantics: overlap-safe payload names, null timestamps,
variant parity, and no caller-schema mutation."""

import datetime as dt

import pyspark.sql.functions as F

from observability_platform___databricks_etl_pipeline_spark.operators.asof import asof_join, asof_join_pandas

T0 = dt.datetime(2024, 1, 1)


def _t(m):
    return T0 + dt.timedelta(minutes=m)


def test_asof_join_with_overlapping_payload_names(spark):
    """A right payload column whose name also exists on the left must carry
    its REAL values (previously nulled by the schema-alignment order)."""
    left = spark.createDataFrame(
        [(1, _t(10), 100.0), (1, _t(30), 300.0)], "k long, ts timestamp, v double"
    )
    right = spark.createDataFrame(
        [(1, _t(5), 5.0), (1, _t(25), 25.0)], "k long, ts timestamp, v double"
    )
    for impl in (asof_join, asof_join_pandas):
        got = {
            (r["k"], r["ts"]): (r["v"], r["v_right"], r["ts_right"])
            for r in impl(left, right, ["k"], "ts", ["v"]).collect()
        }
        assert got[(1, _t(10))] == (100.0, 5.0, _t(5)), impl.__name__
        assert got[(1, _t(30))] == (300.0, 25.0, _t(25)), impl.__name__


def test_asof_join_null_timestamps_both_variants(spark):
    """Null-ts LEFT rows keep their row with null match fields; null-ts
    RIGHT rows are dropped — identically in both variants (merge_asof
    previously crashed the pandas variant on either)."""
    left = spark.createDataFrame(
        [(1, _t(10), "a"), (1, None, "b")], "k long, ts timestamp, p string"
    )
    right = spark.createDataFrame(
        [(1, _t(5), "r1"), (1, None, "rnull")], "k long, ts timestamp, q string"
    )
    for impl in (asof_join, asof_join_pandas):
        rows = {r["p"]: (r["q_right"], r["ts_right"]) for r in impl(
            left, right, ["k"], "ts", ["q"]).collect()}
        assert rows["a"] == ("r1", _t(5)), impl.__name__
        assert rows["b"] == (None, None), impl.__name__


def test_asof_join_pandas_does_not_mutate_caller_schema(spark):
    left = spark.createDataFrame([(1, _t(1), 1.0)], "k long, ts timestamp, v double")
    right = spark.createDataFrame([(1, _t(0), 2.0)], "k long, ts timestamp, w double")
    cols_before = list(left.columns)
    asof_join_pandas(left, right, ["k"], "ts", ["w"]).collect()
    asof_join_pandas(left, right, ["k"], "ts", ["w"]).collect()  # second call: no dup fields
    assert list(left.columns) == cols_before
    assert left.select(*cols_before).count() == 1
