"""Stream-stream interval join (streaming/joins.py): the watermarked
symmetric-hash join over two live streams must converge to the batch
interval join on the same data, and the module must refuse an unbounded
(no time-range) join shape by construction of its API."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from ct_clickhouse_spark.catalog import load_table
from ct_clickhouse_spark.streaming.joins import ATTRIBUTION_LAG, attributed_purchases
from tests.conftest import SF_DIR


@pytest.fixture()
def event_stream_src(spark, tmp_path):
    src = str(tmp_path / "ss_join_src")
    events = load_table(spark, SF_DIR, "events").orderBy("ts", "event_id")
    n = events.count()
    first = events.limit(n // 2)
    rest = events.subtract(first)
    first.coalesce(1).write.parquet(src + "/chunk=0")
    rest.coalesce(1).write.parquet(src + "/chunk=1")
    return src, events


def test_stream_stream_join_converges_to_batch(spark, event_stream_src):
    src, events = event_stream_src
    schema = (
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string"
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/chunk=*")
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    q = (
        attributed_purchases(stream)
        .writeStream.format("memory")
        .queryName("attributed")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(180), "streaming query did not finish in 180s"
    finally:
        q.stop()

    got = {
        (r.user_id, r.click_id, r.purchase_id)
        for r in spark.sql("SELECT * FROM attributed").collect()
    }

    ev = events.withColumn("ts", F.col("ts").cast("timestamp"))
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("cts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("pts"),
    )
    want = {
        (r.user_id, r.click_id, r.purchase_id)
        for r in clicks.join(
            purchases,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("pts") > F.col("cts"))
            & (F.col("pts") <= F.col("cts") + F.expr(f"INTERVAL {ATTRIBUTION_LAG}")),
        ).collect()
    }
    assert len(want) > 0  # fixture actually exercises the join
    assert got == want


def test_stream_join_state_is_time_bounded(spark, event_stream_src):
    """The executed streaming plan must carry the event-time range into
    the join (state eviction depends on it): both watermarks present and
    the join condition references both time columns."""
    src, _ = event_stream_src
    schema = (
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string"
    )
    stream = (
        spark.readStream.schema(schema)
        .parquet(src + "/chunk=*")
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    plan = attributed_purchases(stream)._jdf.queryExecution().analyzed().toString()
    assert plan.count("EventTimeWatermark") == 2
    assert "purchase_ts" in plan and "click_ts" in plan
