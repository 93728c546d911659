"""Incremental rollup (continuous aggregate): the maintained table must
equal the batch aggregate of all finalized windows, across micro-batches
AND across a stream restart from checkpoint; a replayed write must not
duplicate or clobber other windows (partition-overwrite idempotency)."""

from __future__ import annotations

import datetime

import pytest

from pyspark.sql import functions as F

from ct_clickhouse_spark.catalog import load_table
from ct_clickhouse_spark.streaming.rollup import (
    batch_rollup_reference,
    read_rollup,
    start_rollup,
)
from tests.conftest import SF_DIR

SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, "
    "value double, props string"
)


def _stream(spark, src):
    return (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/chunk=*")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .select("ts", "user_id", "event_type", "value")
    )


@pytest.fixture()
def rollup_env(spark, tmp_path):
    src = str(tmp_path / "src")
    events = load_table(spark, SF_DIR, "events").orderBy("ts", "event_id")
    n = events.count()
    first = events.limit(n // 2)
    rest = events.subtract(first)
    first.coalesce(1).write.parquet(src + "/chunk=0")
    rest.coalesce(1).write.parquet(src + "/chunk=1")
    # sentinel far past everything: advances the watermark so every real
    # window finalizes; its own (unfinalized) window never emits
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    sentinel_ts = max_ts + datetime.timedelta(hours=12)
    spark.createDataFrame(
        [(10**9, sentinel_ts, 0, "sentinel", 0.0, "{}")], SCHEMA
    ).coalesce(1).write.parquet(src + "/chunk=2")
    return src, events, str(tmp_path / "rollup"), str(tmp_path / "ckpt")


def test_rollup_converges_to_batch_and_survives_restart(spark, rollup_env):
    src, events, rollup_path, ckpt = rollup_env

    # phase 1: one availableNow run over all three chunks (3 triggers)
    q = start_rollup(spark, _stream(spark, src), rollup_path, ckpt)
    q.awaitTermination(240)

    got = {
        (r.window_start, r.event_type): (r.n_events, round(r.sum_value, 6))
        for r in read_rollup(spark, rollup_path).collect()
    }
    want = {
        (r.window_start, r.event_type): (r.n_events, round(r.sum_value, 6))
        for r in batch_rollup_reference(
            events.select(
                F.col("ts").cast("timestamp").alias("ts"),
                "user_id", "event_type", "value",
            )
        ).collect()
    }
    assert got == want  # every real window finalized, exactly once, exact values

    # phase 2: restart from the same checkpoint with no new data — the
    # table must be unchanged (no duplicate windows, no clobbered ones)
    q2 = start_rollup(spark, _stream(spark, src), rollup_path, ckpt)
    q2.awaitTermination(240)
    again = {
        (r.window_start, r.event_type): (r.n_events, round(r.sum_value, 6))
        for r in read_rollup(spark, rollup_path).collect()
    }
    assert again == got


def test_rollup_replay_is_idempotent_per_window(spark, rollup_env):
    """Simulate the foreachBatch retry path directly: writing the same
    finalized-window batch twice leaves exactly one copy, and writing a
    later window does not disturb earlier ones."""
    _src, _events, rollup_path, _ckpt = rollup_env
    rows1 = [("2024-01-01 00:00:00", 473352, "click", 10, 1.0, 0.1, 0.9, None)]
    rows2 = [("2024-01-01 01:00:00", 473353, "click", 7, 2.0, 0.2, 0.8, None)]
    schema = (
        "window_start string, window_id long, event_type string, "
        "n_events long, sum_value double, min_value double, max_value double, "
        "users_sketch binary"
    )

    def write(rows):
        (
            spark.createDataFrame(rows, schema)
            .withColumn("window_start", F.col("window_start").cast("timestamp"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("window_id")
            .parquet(rollup_path)
        )

    write(rows1)
    write(rows1)  # replay of the same window
    write(rows2)  # a later window
    out = read_rollup(spark, rollup_path)
    assert out.count() == 2
    assert {r.window_id for r in out.collect()} == {473352, 473353}


def test_rollup_sketches_answer_range_distinct_without_raw_scan(spark):
    """The sketch column's reason to exist: distinct users over an
    arbitrary window range, computed from the rollup alone, must track
    the exact distinct count over the raw events — while the per-window
    counts can NOT be summed to get it (users repeat across hours)."""
    from ct_clickhouse_spark.streaming.rollup import (
        batch_rollup_reference,
        distinct_users_over,
    )

    events = (
        load_table(spark, SF_DIR, "events")
        .select(
            F.col("ts").cast("timestamp").alias("ts"),
            "user_id", "event_type", "value",
        )
    )
    rollup = batch_rollup_reference(events)
    lo, hi = events.agg(F.min("ts"), F.max("ts")).collect()[0]
    mid = lo + (hi - lo) / 2
    est = distinct_users_over(rollup, lo, mid).collect()[0].approx_distinct_users
    exact = (
        events.filter((F.col("ts") >= F.lit(lo)) & (F.col("ts") < F.lit(mid)))
        .select("user_id").distinct().count()
    )
    assert exact > 0
    assert abs(est - exact) / exact < 0.05  # HLL lgK=12: ~1.6% rse
    # and the naive sum of per-window distinct counts would NOT work:
    per_window_users = (
        events.filter((F.col("ts") >= F.lit(lo)) & (F.col("ts") < F.lit(mid)))
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.countDistinct("user_id").alias("d"))
        .agg(F.sum("d")).collect()[0][0]
    )
    assert per_window_users > exact  # repeats across hours make the sum wrong


def test_kmv_rollup_returning_users_between_ranges(spark):
    """The KMV rollup column must answer the cross-range intersection
    the HLL column cannot: returning users between two halves of the
    event history, checked against the exact raw-data intersection.
    Range snapping follows window starts, so exact uses the same snap."""
    from ct_clickhouse_spark.streaming.rollup import (
        backfill_rollup_kmv,
        returning_users,
    )

    events = load_table(spark, SF_DIR, "events").select(
        F.col("ts").cast("timestamp").alias("ts"),
        "user_id", "event_type", "value",
    )
    kmv = backfill_rollup_kmv(events)
    lo, hi = events.agg(F.min("ts"), F.max("ts")).collect()[0]
    mid = lo + (hi - lo) / 2
    row = returning_users(kmv, (lo, mid), (mid, hi)).collect()[0]

    starts = events.select(
        F.window("ts", "1 hour").start.alias("ws"), "user_id"
    )
    def _users(a, b):
        return {
            r.user_id
            for r in starts.filter(
                (F.col("ws") >= F.lit(a)) & (F.col("ws") < F.lit(b))
            ).select("user_id").distinct().collect()
        }

    ua, ub = _users(lo, mid), _users(mid, hi)
    exact_both = len(ua & ub)
    assert exact_both > 0
    # k=256 on a few hundred distinct users per side: if unsaturated the
    # estimate is EXACT; if saturated allow the 4-sigma band
    if len(ua | ub) < 256:
        assert row.users_both == exact_both
        assert row.users_a == len(ua) and row.users_b == len(ub)
    else:
        assert abs(row.users_both - exact_both) / exact_both < 0.5
        assert abs(row.users_a - len(ua)) / len(ua) < 0.25


def test_kmv_range_merge_equals_direct_sketch(spark):
    """KMV closure on the rollup: merging per-window sketches over a
    range must equal the sketch computed directly on the range's raw
    events — the property that makes window-grain backfill sufficient."""
    from ct_clickhouse_spark.operators.sketches import kmv_sketch
    from ct_clickhouse_spark.streaming.rollup import (
        _range_kmv,
        backfill_rollup_kmv,
    )

    events = load_table(spark, SF_DIR, "events").select(
        F.col("ts").cast("timestamp").alias("ts"),
        "user_id", "event_type", "value",
    )
    kmv = backfill_rollup_kmv(events, k=64)
    lo, hi = events.agg(F.min("ts"), F.max("ts")).collect()[0]
    mid = lo + (hi - lo) / 2
    merged = _range_kmv(kmv, lo, mid, 64).collect()[0].kmv

    starts = events.select(
        F.window("ts", "1 hour").start.alias("ws"), "user_id"
    ).filter((F.col("ws") >= F.lit(lo)) & (F.col("ws") < F.lit(mid)))
    direct = (
        kmv_sketch(starts.withColumn("g", F.lit(1)), ["g"], "user_id", k=64)
        .collect()[0]
        .kmv
    )
    assert merged == direct


def test_histogram_rollup_range_quantiles(spark):
    """Merged per-window histograms must yield range quantiles within
    one bin width of the exact percentile over the raw range, and the
    merge must be exact (summed bins == direct histogram of the range)."""
    from ct_clickhouse_spark.streaming.rollup import (
        backfill_rollup_histogram,
        range_quantiles,
    )

    events = load_table(spark, SF_DIR, "events").select(
        F.col("ts").cast("timestamp").alias("ts"), "event_type", "value",
        "user_id",
    )
    lo_v, hi_v = [
        float(x)
        for x in events.agg(F.min("value"), F.max("value")).collect()[0]
    ]
    hi_v += 1e-9
    hist = backfill_rollup_histogram(events, lo_v, hi_v, bins=64)
    t0, t1 = events.agg(F.min("ts"), F.max("ts")).collect()[0]
    mid = t0 + (t1 - t0) / 2
    qs = [0.1, 0.5, 0.9]
    got = {
        r.q: r.value_est
        for r in range_quantiles(hist, t0, mid, qs, lo_v, hi_v, 64).collect()
    }
    starts = events.select(
        F.window("ts", "1 hour").start.alias("ws"), "value"
    ).filter((F.col("ws") >= F.lit(t0)) & (F.col("ws") < F.lit(mid)))
    exact = starts.approxQuantile("value", qs, 0.0)
    width = (hi_v - lo_v) / 64
    for q, e in zip(qs, exact):
        assert abs(got[q] - e) <= width + 1e-9, (q, got[q], e, width)
    # exact-merge property: summed bins equal the direct histogram
    merged = (
        hist.filter((F.col("window_start") >= F.lit(t0)) & (F.col("window_start") < F.lit(mid)))
        .select(F.posexplode("hist").alias("b", "n"))
        .groupBy("b").agg(F.sum("n").alias("n")).collect()
    )
    in_range = events.withColumn(
        "_ws", F.window("ts", "1 hour").start
    ).filter((F.col("_ws") >= F.lit(t0)) & (F.col("_ws") < F.lit(mid))).drop("_ws")
    direct = (
        backfill_rollup_histogram(in_range, lo_v, hi_v, bins=64)
        .select(F.posexplode("hist").alias("b", "n"))
        .groupBy("b").agg(F.sum("n").alias("n")).collect()
    )
    assert {(r.b, r.n) for r in merged} == {(r.b, r.n) for r in direct}


def test_histogram_backfill_skips_null_values(spark):
    from ct_clickhouse_spark.streaming.rollup import backfill_rollup_histogram

    ev = spark.createDataFrame(
        [("2024-01-01 00:10:00", "a", 5.0), ("2024-01-01 00:20:00", "a", None)],
        "ts string, event_type string, value double",
    ).select(F.col("ts").cast("timestamp").alias("ts"), "event_type", "value")
    hist = backfill_rollup_histogram(ev, 0.0, 10.0, bins=4).collect()
    assert len(hist) == 1 and sum(hist[0].hist) == 1


def test_rollup_cms_range_merge_is_exact_sketch_merge(spark):
    """Cell-wise-summing the per-window CMS cells over a range must
    equal the CMS built directly on the range's raw events — the exact
    merge law that makes the column a rollup column."""
    from ct_clickhouse_spark.catalog import load_table
    from ct_clickhouse_spark.operators.sketches import cms_build
    from ct_clickhouse_spark.streaming.rollup import (
        RANGE_A,
        backfill_rollup_cms,
    )

    ev = load_table(spark, SF_DIR, "events")
    rollup = backfill_rollup_cms(ev)
    merged = (
        rollup.filter(
            (F.col("window_start") >= F.lit(RANGE_A[0]))
            & (F.col("window_start") < F.lit(RANGE_A[1]))
        )
        .groupBy("d", "b")
        .agg(F.sum("c").alias("c"))
    )
    direct = cms_build(
        ev.filter(
            (F.col("ts") >= F.lit(RANGE_A[0])) & (F.col("ts") < F.lit(RANGE_A[1]))
        ),
        "user_id",
    )
    sig = lambda df: sorted((r.d, r.b, int(r.c)) for r in df.collect())
    assert sig(merged) == sig(direct)


def test_rollup_cms_range_freq_bounds(spark):
    """range_freq: est >= the user's true in-range event count, within
    the eps*N bound."""
    from ct_clickhouse_spark.catalog import load_table
    from ct_clickhouse_spark.operators.sketches import CMS_WIDTH
    from ct_clickhouse_spark.streaming.rollup import (
        RANGE_A,
        backfill_rollup_cms,
        range_freq,
    )

    ev = load_table(spark, SF_DIR, "events")
    in_range = ev.filter(
        (F.col("ts") >= F.lit(RANGE_A[0])) & (F.col("ts") < F.lit(RANGE_A[1]))
    )
    n = in_range.count()
    exact = {
        r.user_id: r.n
        for r in in_range.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    some = list(exact)[:5]
    q = spark.createDataFrame([(u,) for u in some], "user_id long")
    got = {
        r.user_id: r.est
        for r in range_freq(
            backfill_rollup_cms(ev), RANGE_A[0], RANGE_A[1], q, "user_id"
        ).collect()
    }
    for u in some:
        assert got[u] >= exact[u]
        assert got[u] <= exact[u] + 3 * n / CMS_WIDTH


def test_range_freq_driver_section_equals_direct_sketch_probe(spark):
    """The driver-visible 'range_freq' rows (rel_sketch_quantiles) are
    pinned equal to probing a sketch built DIRECTLY on the raw week-1
    events — the rollup-merge law made concrete for the exact probes the
    driver hashes each round."""
    from ct_clickhouse_spark.catalog import load_table
    from ct_clickhouse_spark.operators.sketches import cms_build, cms_estimate
    from ct_clickhouse_spark.streaming.rollup import (
        CMS_PROBE_USERS,
        RANGE_A,
        range_freq_section,
    )

    got = {r.key: r.value for r in range_freq_section(spark, SF_DIR).collect()}
    ev = load_table(spark, SF_DIR, "events")
    direct = cms_build(
        ev.filter(
            (F.col("ts") >= F.lit(RANGE_A[0])) & (F.col("ts") < F.lit(RANGE_A[1]))
        ),
        "user_id",
    )
    q = spark.createDataFrame([(u,) for u in CMS_PROBE_USERS], "user_id long")
    want = {
        f"u{r.user_id}": float(r.est)
        for r in cms_estimate(direct, q, "user_id").collect()
    }
    assert got == want
    assert all(v > 0 for v in got.values())  # probes actually occur
