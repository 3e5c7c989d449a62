# -*- coding: utf-8 -*-
"""as-of join: semantics + the no-join plan shape."""

from datetime import datetime

from pyspark.sql import functions as F

from rdf_converter_spark.operators.asof import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01T10:00:00"), 1.0),
            (2, 10, _ts("2024-01-01T12:00:00"), 2.0),
            (3, 10, _ts("2024-01-01T09:00:00"), 3.0),  # before any right
            (4, 20, _ts("2024-01-01T11:00:00"), 4.0),  # key without rights
            (5, 10, _ts("2024-01-01T11:00:00"), 5.0),  # ties a right ts
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01T09:30:00"), 100.0),
            (10, _ts("2024-01-01T11:00:00"), 110.0),
        ],
        "user_id long, ts timestamp, value double",
    )
    return left, right


def test_asof_join_semantics(spark):
    left, right = _frames(spark)
    out = {r["event_id"]: r for r in asof_join(left, right).collect()}
    assert len(out) == 5  # every left row exactly once
    # latest right at-or-before
    assert out[1]["value_asof"] == 100.0
    assert out[2]["value_asof"] == 110.0
    # inclusive >=: equal timestamps match (DuckDB ASOF semantics)
    assert out[5]["value_asof"] == 110.0
    assert out[5]["ts_asof"] == _ts("2024-01-01T11:00:00")
    # no right at-or-before / no right at all -> nulls, row kept
    assert out[3]["value_asof"] is None and out[3]["ts_asof"] is None
    assert out[4]["value_asof"] is None
    # left columns pass through untouched
    assert out[2]["value"] == 2.0


def test_asof_join_is_single_exchange_no_join(spark):
    """The union+window form must compile to ONE hash exchange and NO
    join operator — the whole point vs a range join that explodes
    O(|L|*|R|) per key at 10^12 rows."""
    left, right = _frames(spark)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = asof_join(left, right)._jdf.queryExecution() \
            .executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert "Join" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_asof_join_multiple_value_columns(spark):
    left = spark.createDataFrame(
        [(1, 7, _ts("2024-01-02T00:00:00"))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(7, _ts("2024-01-01T00:00:00"), 1.5, "x")],
        "user_id long, ts timestamp, value double, props string",
    )
    row = asof_join(left, right, values=("value", "props")).collect()[0]
    assert row["value_asof"] == 1.5 and row["props_asof"] == "x"


def test_asof_ignores_null_ts_right_rows(spark):
    """A NULL-ts right row can never satisfy ts_left >= ts_right; it
    must not be carried as a bogus earliest match (NULLS FIRST
    ordering would otherwise place it before every left row)."""
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01T09:00:00"), 1.0)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    right = spark.createDataFrame(
        [(10, None, 99.0), (10, _ts("2024-01-01T11:00:00"), 110.0)],
        "user_id long, ts timestamp, value double",
    )
    row = asof_join(left, right).collect()[0]
    assert row["value_asof"] is None and row["ts_asof"] is None
