"""Concurrent streaming topology gate (r11 verdict #8, the streaming
analog of tests/test_serving_concurrent.py): every streaming test and
bench runs one query at a time, but production runs ingest + rollup +
tail on ONE session. This gate runs all three CONCURRENTLY under FAIR
pools and asserts each query's output equals its deterministic oracle:

- ingest (recorded CT log -> watermark dedup -> partitioned parquet):
  sink rows == the planted unique domain set (duplicates swallowed);
- rollup (watermark + tumbling window + sketch aggs): output == the
  batch reference aggregate;
- tail (file-source change stream over the ingest's LIVE output dir):
  delivers exactly the sink's rows, gap-free, while they are appended.

The full-scale solo-vs-concurrent identity + interference factors are
recorded by scripts/bench_streaming.py --only concurrent
(BENCH_streaming_r12_concurrent.json).
"""

from __future__ import annotations

import datetime
import threading

from pyspark.sql import functions as F

from ct_clickhouse_spark.catalog import load_table
from ct_clickhouse_spark.session import run_in_scheduler_pool
from ct_clickhouse_spark.streaming.rollup import (
    batch_rollup_reference,
    read_rollup,
    start_rollup,
)
from ct_clickhouse_spark.streaming.tail import tail_cert_domains
from tests.ctgen import make_cert_der, wrap_leaf, write_log_dir

SF_DIR = "/root/testdata/sf0.001"
SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, "
    "event_type string, value double, props string"
)
LOG = "Concurrent Gate Log"
N_CERTS = 12


def test_ingest_rollup_tail_concurrently_match_solo_semantics(spark, tmp_path):
    from ct_clickhouse_spark.streaming.ingest import start_ingest

    # --- sources -----------------------------------------------------
    logs = str(tmp_path / "logs")
    # one duplicate replay (leaf 3 again at the end): the dedup must
    # swallow it even while two sibling queries compete for slots
    leaves = [
        wrap_leaf(make_cert_der([f"conc{i}.example.org"], i + 1))
        for i in range(N_CERTS)
    ]
    write_log_dir(logs, LOG, leaves + [leaves[3]], tree_size=N_CERTS + 1)

    src = str(tmp_path / "events")
    events = load_table(spark, SF_DIR, "events").orderBy("ts", "event_id")
    n = events.count()
    first = events.limit(n // 2)
    rest = events.subtract(first)
    first.coalesce(1).write.parquet(src + "/chunk=0")
    rest.coalesce(1).write.parquet(src + "/chunk=1")
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    spark.createDataFrame(
        [(10**9, max_ts + datetime.timedelta(hours=12), 0, "sentinel", 0.0, "{}")],
        SCHEMA,
    ).coalesce(1).write.parquet(src + "/chunk=2")

    table = str(tmp_path / "cert_domains")
    import os

    os.makedirs(table, exist_ok=True)

    # --- run all three concurrently, one FAIR pool each --------------
    tail_rows: list[dict] = []
    lock = threading.Lock()

    def on_rows(rows):
        with lock:
            tail_rows.extend(rows)

    results: dict = {}
    errs: dict = {}

    def run(name, fn):
        try:
            q = fn()
            q.awaitTermination(300)
            results[name] = q
        except Exception as e:  # noqa: BLE001 — surfaced in the assert
            errs[name] = repr(e)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/chunk=*")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .select("ts", "user_id", "event_type", "value")
    )
    t_ing = threading.Thread(
        target=run,
        args=(
            "ingest",
            lambda: run_in_scheduler_pool(
                spark,
                "t_ingest",
                lambda: start_ingest(
                    spark, logs, table, str(tmp_path / "ickpt"), available_now=True
                ),
            ),
        ),
    )
    t_rol = threading.Thread(
        target=run,
        args=(
            "rollup",
            lambda: run_in_scheduler_pool(
                spark,
                "t_rollup",
                lambda: start_rollup(
                    spark, stream, str(tmp_path / "rollup"), str(tmp_path / "rckpt")
                ),
            ),
        ),
    )
    t_ing.start()
    t_rol.start()
    tail_q = run_in_scheduler_pool(
        spark,
        "t_tail",
        lambda: tail_cert_domains(
            spark,
            table,
            str(tmp_path / "tckpt"),
            on_rows,
            available_now=False,
            poll_seconds=1,
        ),
    )
    t_ing.join(timeout=300)
    t_rol.join(timeout=300)
    assert not errs, errs

    # --- per-query oracles -------------------------------------------
    # ingest: every planted domain exactly once (replayed leaf deduped)
    sink = spark.read.parquet(table)
    got_domains = sorted(r.domain for r in sink.select("domain").collect())
    assert got_domains == sorted(f"conc{i}.example.org" for i in range(N_CERTS))

    # rollup: equals the batch reference exactly
    got = {
        (r.window_start, r.event_type): (r.n_events, round(r.sum_value, 6))
        for r in read_rollup(spark, str(tmp_path / "rollup")).collect()
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
    assert got == want

    # tail: drains to exactly the sink rows, gap-free, no duplicates
    import time

    deadline = time.time() + 120
    while len(tail_rows) < N_CERTS and time.time() < deadline:
        assert tail_q.exception() is None, tail_q.exception()
        time.sleep(0.5)
    tail_q.stop()
    tail_q.awaitTermination(30)
    tail_domains = sorted(r["domain"] for r in tail_rows)
    assert tail_domains == got_domains
