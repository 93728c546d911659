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
    sec = _bucket_seconds(bucket)
    ts_bucket = (F.unix_timestamp(F.col(ts_col)) / sec).cast("long")

    # explode each interval into every bucket it overlaps; sequence() is
    # bounded by the interval length / bucket width
    lo = (F.unix_timestamp(F.col(start_col)) / sec).cast("long")
    # end is exclusive: a zero-length or bucket-aligned end must not leak
    # into the next bucket
    hi = ((F.unix_timestamp(F.col(end_col)) - 1) / sec).cast("long")
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
        # rows survive (plain distinct() would merge them)
        probe = exploded.select(*keys, start_col, end_col)
        tagged = keyed_fact.withColumn("_rid", F.monotonically_increasing_id())
        joined = tagged.join(probe, keys, "inner").filter(residual)
        return (
            joined.dropDuplicates(["_rid"])
            .drop("_bucket", "_rid", start_col, end_col)
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
        cond = cond & (fact[extra_key] == intervals[extra_key])
        return fact.join(intervals.withColumnRenamed(extra_key, extra_key), cond).drop(
            intervals[extra_key]
        )
    return fact.join(intervals, cond)
