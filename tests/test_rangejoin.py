"""Range join: exact equivalence with the naive inequality join, interval
edge semantics, and the plan property that justifies it (hash join on the
bucket key, no nested-loop/cartesian)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from ct_clickhouse_spark.catalog import load_table
from ct_clickhouse_spark.operators.rangejoin import interval_join, naive_interval_join
from tests.conftest import SF_DIR


def _intervals(spark, events):
    """Deterministic test intervals derived from the data: for each
    event_type, three 90-minute maintenance windows spaced across the
    data's time range (non-aligned to the bucket width on purpose)."""
    bounds = events.agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).collect()[0]
    span = (bounds.hi - bounds.lo).total_seconds()
    types = [r.event_type for r in events.select("event_type").distinct().collect()]
    rows = []
    for i, et in enumerate(sorted(types)):
        for k in range(3):
            start = bounds.lo + datetime.timedelta(
                seconds=(span * (k + 0.13 * (i + 1)) / 3.0)
            )
            rows.append((et, start, start + datetime.timedelta(minutes=90)))
    return spark.createDataFrame(
        rows, "event_type string, start timestamp_ntz, end timestamp_ntz"
    )


def test_interval_join_matches_naive(spark):
    events = load_table(spark, SF_DIR, "events").select("event_id", "ts", "event_type")
    iv = _intervals(spark, events)
    got = interval_join(
        events, iv, ts_col="ts", bucket="1 hour", extra_key="event_type"
    )
    want = events.join(
        iv.withColumnRenamed("event_type", "et"),
        (F.col("ts") >= F.col("start"))
        & (F.col("ts") < F.col("end"))
        & (F.col("event_type") == F.col("et")),
    ).drop("et")
    assert got.count() == want.count() > 0
    g = {tuple(r) for r in got.select("event_id", "start").collect()}
    w = {tuple(r) for r in want.select("event_id", "start").collect()}
    assert g == w


def test_interval_join_half_open_edges(spark):
    fact = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (2, "2024-01-01 01:00:00"),
         (3, "2024-01-01 00:59:59")],
        "id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    iv = spark.createDataFrame(
        [("2024-01-01 00:00:00", "2024-01-01 01:00:00")], "start string, end string"
    ).select(
        F.col("start").cast("timestamp_ntz").alias("start"),
        F.col("end").cast("timestamp_ntz").alias("end"),
    )
    got = sorted(
        r.id for r in interval_join(fact, iv, bucket="1 hour").collect()
    )
    assert got == [1, 3]  # start inclusive, end exclusive


def test_interval_join_left_semi_keeps_duplicates_once(spark):
    fact = spark.createDataFrame(
        [(1, "2024-01-01 00:30:00"), (1, "2024-01-01 00:30:00"),
         (2, "2024-01-02 00:00:00")],
        "id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    # two overlapping windows both containing the first events
    iv = spark.createDataFrame(
        [("2024-01-01 00:00:00", "2024-01-01 01:00:00"),
         ("2024-01-01 00:15:00", "2024-01-01 00:45:00")],
        "start string, end string",
    ).select(
        F.col("start").cast("timestamp_ntz").alias("start"),
        F.col("end").cast("timestamp_ntz").alias("end"),
    )
    rows = interval_join(fact, iv, bucket="1 hour", how="left_semi").collect()
    # each matching fact ROW exactly once (two duplicate rows -> two rows,
    # not four from the double match, not one from a blanket distinct)
    assert sorted(r.id for r in rows) == [1, 1]


def test_interval_join_plan_is_hash_join(spark):
    events = load_table(spark, SF_DIR, "events").select("event_id", "ts", "event_type")
    iv = _intervals(spark, events)
    plan = (
        interval_join(events, iv, extra_key="event_type")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan[:1500]
    naive_plan = (
        naive_interval_join(events, iv)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the shape we are avoiding really is what Catalyst does otherwise
    assert "NestedLoop" in naive_plan or "Cartesian" in naive_plan


def test_interval_join_subsecond_bounds(spark):
    """Sub-second interval bounds must not mis-bucket: a fact row inside
    [start, end) where end has fractional seconds is matched (the old
    whole-second end-1 adjustment dropped it)."""
    fact = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00.2"), (2, "2024-01-01 10:00:00.7")],
        "id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    iv = spark.createDataFrame(
        [("2024-01-01 09:30:00", "2024-01-01 10:00:00.5")], "start string, end string"
    ).select(
        F.col("start").cast("timestamp_ntz").alias("start"),
        F.col("end").cast("timestamp_ntz").alias("end"),
    )
    got = sorted(r.id for r in interval_join(fact, iv, bucket="1 hour").collect())
    want = sorted(
        r.id for r in naive_interval_join(fact, iv).collect()
    )
    assert got == want == [1]


def test_naive_interval_join_extra_key_resolves(spark):
    """The keyed oracle path must actually run (it previously raised
    MISSING_ATTRIBUTES from a self-rename)."""
    fact = spark.createDataFrame(
        [(1, "a", "2024-01-01 00:30:00"), (2, "b", "2024-01-01 00:30:00")],
        "id long, event_type string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    iv = spark.createDataFrame(
        [("a", "2024-01-01 00:00:00", "2024-01-01 01:00:00")],
        "event_type string, start string, end string",
    ).select(
        "event_type",
        F.col("start").cast("timestamp_ntz").alias("start"),
        F.col("end").cast("timestamp_ntz").alias("end"),
    )
    rows = naive_interval_join(fact, iv, extra_key="event_type").collect()
    assert [r.id for r in rows] == [1]


def test_interval_join_left_semi_preserves_fact_start_end_columns(spark):
    """A fact table that itself has 'start'/'end' columns must keep them
    through a left_semi interval join (the old drop(start_col, end_col)
    removed the fact's own columns too, and the residual was ambiguous)."""
    fact = spark.createDataFrame(
        [(1, "2024-01-01 00:30:00", "sA", "eA"), (2, "2024-01-02 00:00:00", "sB", "eB")],
        "id long, ts string, start string, end string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    iv = spark.createDataFrame(
        [("2024-01-01 00:00:00", "2024-01-01 01:00:00")], "start string, end string"
    ).select(
        F.col("start").cast("timestamp_ntz").alias("start"),
        F.col("end").cast("timestamp_ntz").alias("end"),
    )
    rows = interval_join(fact, iv, bucket="1 hour", how="left_semi").collect()
    assert [(r.id, r.start, r.end) for r in rows] == [(1, "sA", "eA")]
