"""Range (interval) join: match fact rows whose timestamp falls inside
interval rows' [start, end) — the third canonical time-series join next to
as-of (operators/windows.py:asof_last_view) and windowed aggregation.

Spark has no interval-join operator: the naive formulation
``fact.join(intervals, (ts >= start) & (ts < end))`` has no equality key,
so Catalyst plans BroadcastNestedLoopJoin (small side) or a cartesian
product — O(N*M) comparisons, the classic 100 TB trap.

Scalable idiom (same as Databricks' range-join bin optimization and
KDB/ClickHouse time-bin tricks): discretize time into fixed-width
buckets, explode each interval into the buckets it overlaps, join on
bucket EQUALITY (hash join, shuffle on the bucket key), and re-apply the
exact predicate as a residual filter. Cost: |intervals| x
avg_buckets_per_interval exploded rows — linear for bounded interval
length, and each fact row meets only the intervals sharing its bucket.
Bucket width tunes the tradeoff: ~median interval length keeps the
explosion factor ~2 while keeping buckets selective.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BUCKET = "1 hour"


def _bucket_seconds(width: str) -> int:
    n, unit = width.split()
    mult = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}[
        unit.rstrip("s")
    ]
    return int(n) * mult


def interval_join(
    fact: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket: str = DEFAULT_BUCKET,
    extra_key: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join ``fact`` rows to every ``intervals`` row with
    start <= ts < end (half-open, the streaming-window convention), via
    bucket-equality + residual filter — no nested-loop join at any size.

    ``extra_key``: an optional equality column present on both sides
    (e.g. user_id) folded into the join key — the common "point in
    interval AND same entity" shape. ``how`` supports 'inner' and
    'left_semi' ('does this event fall in any window').
    """
    if how not in ("inner", "left_semi"):
        raise ValueError(f"how must be inner or left_semi, got {how!r}")
    step = _bucket_seconds(bucket) * 1_000_000
    # bucket on exact epoch MICROS (unix_micros), not unix_timestamp:
    # whole-second truncation mis-buckets sub-second bounds (an end of
    # 10:00:00.5 landed in the 09:00 bucket after the old end-1s
    # adjustment and silently dropped matches). The same cast is applied
    # to both sides, so NTZ/TZ semantics stay consistent within the join.

    def _us(col):
        return F.unix_micros(F.col(col).cast("timestamp"))

    ts_bucket = F.floor(_us(ts_col) / step).cast("long")

    # explode each interval into every bucket it overlaps; sequence() is
    # bounded by the interval length / bucket width
    lo = F.floor(_us(start_col) / step).cast("long")
    # end is exclusive: the last included instant is just below end, so
    # its bucket is ceil(end/step)-1 — correct for both bucket-aligned
    # ends (steps back one bucket) and mid-bucket ends (same bucket), at
    # any timestamp precision
    hi = (F.ceil(_us(end_col) / step) - 1).cast("long")
    exploded = intervals.withColumn(
        "_bucket", F.explode(F.sequence(lo, F.greatest(hi, lo)))
    )

    keys = ["_bucket"] + ([extra_key] if extra_key else [])
    keyed_fact = fact.withColumn("_bucket", ts_bucket)
    residual = (F.col(ts_col) >= F.col(start_col)) & (
        F.col(ts_col) < F.col(end_col)
    )
    if how == "left_semi":
        # a fact row matching k intervals in its bucket would come out k
        # times; dedup on a synthetic row id so genuinely-duplicate fact
        # rows survive (plain distinct() would merge them). The interval
        # bounds ride along under reserved names so a fact table that
        # itself has start/end columns neither collides in the residual
        # nor loses its own columns in the final drop.
        probe = exploded.select(
            *keys,
            F.col(start_col).alias("_iv_start"),
            F.col(end_col).alias("_iv_end"),
        )
        tagged = keyed_fact.withColumn("_rid", F.monotonically_increasing_id())
        semi_residual = (F.col(ts_col) >= F.col("_iv_start")) & (
            F.col(ts_col) < F.col("_iv_end")
        )
        joined = tagged.join(probe, keys, "inner").filter(semi_residual)
        return (
            joined.dropDuplicates(["_rid"])
            .drop("_bucket", "_rid", "_iv_start", "_iv_end")
        )
    joined = keyed_fact.join(exploded, keys, "inner").filter(residual)
    return joined.drop("_bucket")


def naive_interval_join(
    fact: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    extra_key: str | None = None,
) -> DataFrame:
    """The O(N*M) reference semantics (test oracle only — its plan is the
    nested-loop shape interval_join exists to avoid)."""
    cond = (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    if extra_key:
        # rename the right side's key so the equality resolves without
        # ambiguous/stale attribute references
        right = intervals.withColumnRenamed(extra_key, "_iv_key")
        cond = cond & (F.col(extra_key) == F.col("_iv_key"))
        return fact.join(right, cond).drop("_iv_key")
    return fact.join(intervals, cond)
