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
