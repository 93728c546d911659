"""Incremental rollup maintenance: a continuous aggregate over a stream,
kept exactly correct across micro-batches and restarts.

The ClickHouse-world analog is a materialized view into an
AggregatingMergeTree (hypertable rollup in the Timescale world): every
insert batch folds into a persistent pre-aggregated table so dashboards
read the tiny rollup, never the raw events. The reference has no such
surface (its API re-aggregates cert_domains per request,
/root/reference/api/app.py:120-141) — this is north-star territory that a
100 TB deployment needs: re-scanning raw data per dashboard query stops
being an option long before 100 TB.

Spark-first shape:
- `readStream -> withWatermark -> window(...).agg(...)` with
  ``outputMode("append")``: finalized windows only — each (window, key)
  group is emitted EXACTLY ONCE, after the watermark passes, so the sink
  needs no merge logic and rows are never revised.
- `foreachBatch` writes each emission batch to the rollup Parquet table
  with dynamic partition overwrite keyed by the WINDOW ID (not the date:
  a date's windows finalize across many micro-batches, so overwriting a
  date partition would clobber its earlier hours — every group of ONE
  window finalizes in one trigger, so the window is the unit that is
  written atomically-and-completely). The id is the UTC EPOCH-HOUR of
  the window start, not a session-timezone date string: local rendering
  collides two distinct hourly windows on a DST fall-back (05:00Z and
  06:00Z both format to ...0301 under America/New_York), and the second
  batch's overwrite would permanently delete the first window's rows.
  Replaying a failed batch rewrites
  the same window partitions with the same rows (idempotent), which
  upgrades the at-least-once foreachBatch contract to effective
  exactly-once.
- Counts and sums are algebraic, so batch-vs-stream equivalence is exact,
  not approximate — pinned by test against the batch groupBy of the same
  input.

At scale: state is bounded by the watermark horizon x keys-per-window;
the rollup table is partitioned by window id so both the overwrite and
typical dashboard reads touch few partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

ROLLUP_WINDOW = "1 hour"
ROLLUP_WATERMARK = "2 hours"


def _rollup_aggs() -> list:
    """The mergeable-aggregate set. Everything here re-aggregates across
    windows without touching raw events: count/sum/min/max algebraically,
    distinct users via a DataSketches HLL sketch column (binary,
    hll_union_agg-mergeable) — the reason a rollup can answer 'distinct
    users over an arbitrary range' without a raw re-scan, which a plain
    per-window COUNT(DISTINCT) number cannot (it does not add)."""
    return [
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.expr("hll_sketch_agg(user_id)").alias("users_sketch"),
    ]


_ROLLUP_COLS = [
    "event_type",
    "n_events",
    "sum_value",
    "min_value",
    "max_value",
    "users_sketch",
]


def hourly_rollup(events: DataFrame, watermark: str = ROLLUP_WATERMARK) -> DataFrame:
    """Finalized per-(hour, event_type) aggregate of an events stream.
    ``events`` needs (ts TIMESTAMP, user_id, event_type, value)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", ROLLUP_WINDOW).alias("w"), "event_type")
        .agg(*_rollup_aggs())
        .select(
            F.col("w.start").alias("window_start"),
            (F.unix_timestamp("w.start") / 3600).cast("long").alias("window_id"),
            *_ROLLUP_COLS,
        )
    )


def distinct_users_over(
    rollup: DataFrame, start, end, by_type: bool = False
) -> DataFrame:
    """Distinct-user estimate FROM THE ROLLUP ALONE: merge the
    per-window sketches with hll_union_agg and estimate. No raw-event
    scan; cost is proportional to the number of rollup rows in range.
    This is what the sketch column buys — per-window exact distinct
    counts cannot be combined (users repeat across hours).

    Bounds SNAP TO WINDOW GRANULARITY (the filter is on window_start):
    a non-aligned ``start`` excludes the partial window containing it,
    and the range runs through the last window STARTING before ``end``.
    Pass window-aligned bounds for exact-range semantics — the rollup
    cannot split a window it has already finalized."""
    keys = ["event_type"] if by_type else []
    in_range = rollup.filter(
        (F.col("window_start") >= F.lit(start)) & (F.col("window_start") < F.lit(end))
    )
    return in_range.groupBy(*keys).agg(
        F.expr("hll_sketch_estimate(hll_union_agg(users_sketch))").alias(
            "approx_distinct_users"
        )
    )


def start_rollup(
    spark: SparkSession,
    events: DataFrame,
    rollup_path: str,
    checkpoint: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Maintain the rollup table incrementally. Append-mode emissions are
    final per group; the partition-overwrite write makes batch replay
    idempotent, so the rollup equals the batch aggregate of everything
    the watermark has finalized."""

    def _merge(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        (
            batch.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("window_id")
            .parquet(rollup_path)
        )

    writer = (
        hourly_rollup(events)
        .writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(_merge)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_rollup(spark: SparkSession, rollup_path: str) -> DataFrame:
    # pin the partition column's type so the read schema matches the
    # written frame regardless of partition-value inference settings
    return spark.read.parquet(rollup_path).withColumn(
        "window_id", F.col("window_id").cast("long")
    )


def batch_rollup_reference(events: DataFrame) -> DataFrame:
    """The batch semantics the incremental rollup must match exactly
    (same grouping/aggregates, no watermark): used by tests and as the
    backfill path when bootstrapping a rollup from historical data."""
    return (
        events.groupBy(F.window("ts", ROLLUP_WINDOW).alias("w"), "event_type")
        .agg(*_rollup_aggs())
        .select(
            F.col("w.start").alias("window_start"),
            (F.unix_timestamp("w.start") / 3600).cast("long").alias("window_id"),
            *_ROLLUP_COLS,
        )
    )
