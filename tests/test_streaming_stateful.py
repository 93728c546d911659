"""applyInPandasWithState: running totals across micro-batches must
converge to the batch aggregate, with state carried between triggers."""

from __future__ import annotations

from ct_clickhouse_spark.catalog import load_table
from ct_clickhouse_spark.streaming.stateful import running_user_totals
from tests.conftest import SF_DIR


def test_stateful_running_totals_converge_to_batch(spark, tmp_path):
    from pyspark.sql import functions as F

    src = str(tmp_path / "src")
    events = load_table(spark, SF_DIR, "events").orderBy("ts", "event_id")
    n = events.count()
    first = events.limit(n // 2)
    rest = events.subtract(first)
    first.coalesce(1).write.parquet(src + "/chunk=0")
    rest.coalesce(1).write.parquet(src + "/chunk=1")

    schema = (
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string"
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/chunk=*")
        .select("user_id", "value")
    )
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("running_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    # update mode appends one row per key per batch: the LAST row per key
    # is the final state (memory sink preserves batch order)
    rows = spark.sql("SELECT * FROM running_totals").collect()
    final = {}
    for r in rows:
        final[r.user_id] = (r.n_events, round(r.total_value, 4))
    want = {
        r.user_id: (r.n, round(r.total, 4))
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert final == want
    # state really carried across batches: some keys must appear twice
    assert len(rows) > len(final)


def test_streaming_asof_converges_to_batch(spark, tmp_path):
    """The stateful streaming AS-OF join must produce exactly the batch
    asof_last_view result when the stream is consumed in time order, with
    view state carried across micro-batch boundaries."""
    from pyspark.sql import functions as F

    from ct_clickhouse_spark.operators.windows import asof_last_view
    from ct_clickhouse_spark.streaming.stateful import streaming_asof_last_view

    src = str(tmp_path / "src")
    events = (
        load_table(spark, SF_DIR, "events")
        .filter(F.col("event_type").isin("view", "purchase"))
        .select(
            "event_id",
            "user_id",
            F.col("ts").cast("timestamp").alias("ts"),
            "event_type",
        )
        .orderBy("ts", "event_id")
    )
    n = events.count()
    # time-ordered chunks: per-key arrival order == event order, the
    # operator's documented in-order assumption
    first = events.limit(n // 2)
    rest = events.subtract(first)
    first.coalesce(1).write.parquet(src + "/chunk=0")
    rest.coalesce(1).write.parquet(src + "/chunk=1")

    stream = (
        spark.readStream.schema(
            "event_id long, user_id long, ts timestamp, event_type string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/chunk=*")
    )
    q = (
        streaming_asof_last_view(stream)
        .writeStream.format("memory")
        .queryName("asof_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        r.event_id: (r.user_id, r.purchase_ts, r.view_ts)
        for r in spark.sql("SELECT * FROM asof_stream").collect()
    }
    want = {
        r.event_id: (
            r.user_id,
            r.purchase_ts,
            r.view_ts,
        )
        for r in asof_last_view(spark, SF_DIR)
        .select(
            "event_id",
            "user_id",
            F.col("purchase_ts").cast("timestamp").alias("purchase_ts"),
            F.col("view_ts").cast("timestamp").alias("view_ts"),
        )
        .collect()
    }
    assert got == want
    # the split must actually cross state: some user's purchase in chunk 1
    # depends on a view from chunk 0 (vacuous-test guard)
    boundary = first.agg(F.max("ts")).collect()[0][0]
    crossing = [
        e
        for e, (_, pts, vts) in got.items()
        if vts is not None and pts > boundary >= vts
    ]
    assert crossing, "split produced no cross-batch asof dependency"


def test_streaming_kmv_converges_to_batch_sketch(spark, tmp_path):
    """The streamed per-(window, event_type) KMV sketch must equal the
    batch kmv_sketch of the same grouping after consuming the whole
    stream — streamed and backfilled sketches are interchangeable."""
    from pyspark.sql import functions as F

    from ct_clickhouse_spark.operators.sketches import kmv_sketch
    from ct_clickhouse_spark.streaming.stateful import streaming_window_kmv

    src = str(tmp_path / "src")
    events = load_table(spark, SF_DIR, "events")
    # interleaved split (KMV is set-semantics, no in-order assumption):
    # every window's group spans both chunks, so the cross-batch-state
    # guard below is non-vacuous
    first = events.filter(F.col("event_id") % 2 == 0)
    rest = events.filter(F.col("event_id") % 2 == 1)
    first.coalesce(1).write.parquet(src + "/chunk=0")
    rest.coalesce(1).write.parquet(src + "/chunk=1")

    schema = (
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string"
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/chunk=*")
        .select(F.col("ts").cast("timestamp").alias("ts"), "user_id", "event_type")
    )
    q = (
        streaming_window_kmv(stream, k=64)
        .writeStream.format("memory")
        .queryName("kmv_stream")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    rows = spark.sql("SELECT * FROM kmv_stream").collect()
    final = {}
    for r in rows:  # memory sink preserves batch order: last row wins
        final[(r.window_id, r.event_type)] = list(r.users_kmv)

    batch = events.select(
        F.floor(F.unix_timestamp(F.col("ts").cast("timestamp")) / 3600)
        .cast("long")
        .alias("window_id"),
        "event_type",
        "user_id",
    )
    want = {
        (r.window_id, r.event_type): list(r.kmv)
        for r in kmv_sketch(batch, ["window_id", "event_type"], "user_id", k=64)
        .collect()
    }
    assert final == want
    # state carried across batches: some group must have been updated twice
    assert len(rows) > len(final)


def test_streaming_kmv_default_k_matches_batch_side():
    """Streamed and batch sketches must default to the SAME k: merging a
    saturated smaller sketch then estimating at the larger k silently
    over-reports (the hazard kmv_distinct_estimate documents)."""
    from ct_clickhouse_spark.operators.sketches import DEFAULT_K
    from ct_clickhouse_spark.streaming.rollup import KMV_USERS_K
    from ct_clickhouse_spark.streaming.stateful import resolve_kmv_k

    assert resolve_kmv_k(None) == DEFAULT_K == KMV_USERS_K
    assert resolve_kmv_k(64) == 64
