"""Stream-stream interval join (SURVEY §2.8 family): correlate two live
event streams by key within an event-time window.

The reference has no stream-stream correlation at all — its pipeline is a
stateless poller per log (ingestion/ct_ingestor.py:100-111). This is the
engine-native capability a training-data / clickstream pipeline needs:
e.g. attribute each purchase to a preceding click by the same user.

Scale notes: both sides carry a watermark, and the join condition bounds
the event-time distance, so Spark's symmetric hash join keeps per-side
state ONLY for rows younger than (watermark + lag) — state is bounded by
stream rate x window, not by stream length. Without the time-range bound
the state store would grow forever; this module refuses to build such a
join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ATTRIBUTION_LAG = "30 minutes"


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_lag: str = ATTRIBUTION_LAG,
    watermark: str = "1 hour",
) -> DataFrame:
    """Inner-join two watermarked streams on ``key`` where the right
    event happens in ``(left_ts, left_ts + max_lag]``. Columns from both
    sides are kept (key once). Both inputs must be streaming DataFrames
    with event-time columns ``left_ts`` / ``right_ts``."""
    lw = left.withWatermark(left_ts, watermark).alias("l")
    rw = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") > F.col(f"l.{left_ts}"))
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {max_lag}")
        )
    )
    return lw.join(rw, cond, "inner").drop(F.col(f"r.{key}"))


def attributed_purchases(events: DataFrame, max_lag: str = ATTRIBUTION_LAG) -> DataFrame:
    """Click→purchase attribution over one event stream split into two
    logical streams: every (click, purchase) pair of the same user with
    the purchase at most ``max_lag`` after the click. Returns
    (user_id, click_id, purchase_id, click_ts, purchase_ts)."""
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    return stream_interval_join(
        clicks, purchases, "user_id", "click_ts", "purchase_ts", max_lag
    ).select("user_id", "click_id", "purchase_id", "click_ts", "purchase_ts")
