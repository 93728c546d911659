"""Streaming event-time semantics (SURVEY T7/T8): the same F.window
expression used in operators/windows.py run as a real Structured Streaming
query with a watermark, fed by a file source in two chunks, must converge
to the batch answer."""

from __future__ import annotations

import pytest

from ct_clickhouse_spark.catalog import load_table
from tests.conftest import SF_DIR


@pytest.fixture()
def event_chunks(spark, tmp_path):
    """events split into 2 parquet chunk files (arrival order = ts order,
    so no chunk is late beyond the watermark)."""
    src = str(tmp_path / "stream_src")
    events = load_table(spark, SF_DIR, "events").orderBy("ts", "event_id")
    n = events.count()
    first = events.limit(n // 2)
    rest = events.subtract(first)
    first.coalesce(1).write.parquet(src + "/chunk=0")
    rest.coalesce(1).write.parquet(src + "/chunk=1")
    return src, events


def test_streaming_tumbling_window_matches_batch(spark, event_chunks, tmp_path):
    from pyspark.sql import functions as F

    src, events = event_chunks
    schema = "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/chunk=*")
        .withColumn("ts_tz", F.col("ts").cast("timestamp"))
        .withWatermark("ts_tz", "1 hour")
        .groupBy(F.window("ts_tz", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("hourly")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(180), "streaming query did not finish in 180s"
    finally:
        q.stop()

    got = {
        (r["w"].start.isoformat(), r.event_type): r.n_events
        for r in spark.sql("SELECT * FROM hourly").collect()
    }
    want = {
        (r["ws"].isoformat(), r.event_type): r.n_events
        for r in events.groupBy(
            F.date_trunc("hour", "ts").alias("ws"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .collect()
    }
    assert got == want


def test_streaming_session_window_matches_batch(spark, event_chunks, tmp_path):
    """Session windows (gap-based, data-driven bounds) as a REAL streaming
    aggregation: F.session_window under a watermark, availableNow over two
    file chunks, must converge to the identical batch session_window
    result — the streaming twin of the evt_session_30m batch operator."""
    from pyspark.sql import functions as F

    src, events = event_chunks
    schema = "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/chunk=*")
        .withColumn("ts_tz", F.col("ts").cast("timestamp"))
        .withWatermark("ts_tz", "1 hour")
        .groupBy(F.session_window("ts_tz", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("sessions30")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(180), "streaming query did not finish in 180s"
    finally:
        q.stop()

    got = {
        (r["w"].start.isoformat(), r["w"].end.isoformat(), r.user_id): r.n_events
        for r in spark.sql("SELECT * FROM sessions30").collect()
    }
    want = {
        (r["w"].start.isoformat(), r["w"].end.isoformat(), r.user_id): r.n_events
        for r in events.withColumn("ts_tz", F.col("ts").cast("timestamp"))
        .groupBy(F.session_window("ts_tz", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .collect()
    }
    assert len(want) > 0
    assert got == want
