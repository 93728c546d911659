#!/usr/bin/env python
"""Streaming throughput bench (r8 verdict #2): the T1-T8 surface had
correctness coverage but zero recorded performance numbers. Two benches:

1. ingest_e2e — the full reference dataflow (fixture CT logs -> ct_log
   source -> mapInPandas X.509 parse -> explode to per-domain rows ->
   base-domain pandas UDF -> dropDuplicatesWithinWatermark ->
   month-partitioned parquet sink) under a LIVE-GROWTH protocol: the
   sth.json tree sizes start at one trigger's worth, then jump to the
   full fixture size right after batch 0 commits, so every subsequent
   trigger ingests exactly maxEntriesPerTrigger per log. Pacing-bound =
   the bench measures ENGINE rate, not arrival rate. Run at the
   reference's knobs (512/trigger, ct_ingestor.py:24-25) and at a scale
   config (4096/trigger) so the per-trigger fixed cost is separable
   from the per-row cost.

   Fixture certs are template-patched: ONE real self-signed DER is
   built (tests/ctgen.make_cert_der), then each leaf substitutes a
   fixed-width unique token into the CN/SAN strings — byte-identical
   lengths keep the DER valid, the sha256 fingerprint is unique per
   leaf, and generation is O(replace) instead of O(EC-sign). ~5% of
   leaves repeat the previous leaf's token to give the watermark dedup
   real cross-batch duplicates.

2. rollup — hourly_rollup (watermark + tumbling window + HLL/KMV
   sketch aggregates, idempotent partition-overwrite sink) over the
   sf1 events table (1M rows) split into ts-ordered chunk files,
   maxFilesPerTrigger=1 -> one trigger per chunk.

Per trigger it records numInputRows, triggerExecution/addBatch ms, and
state-store rows/bytes; the grid lands in SCALING.md. Driver-bottleneck
check: the non-addBatch part of triggerExecution (query planning, WAL
commit, offset tracking — the driver's per-trigger work) must stay flat
as the batch size scales 8x.

Usage: python scripts/bench_streaming.py [--leaves N] [--out FILE]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF1_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", ".benchdata/sf1")
N_LOGS = 3
_WATERMARK_UNIT_S = {
    "second": 1, "seconds": 1,
    "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600,
}
TOKEN = b"qqqqqqqq"  # 8 bytes, 0x71 run: never occurs in DER structure


def _token(i: int) -> bytes:
    """Fixed-width lowercase base-26 id (a-z only, same byte length as
    TOKEN) — keeps every patched DER byte-identical in length."""
    s = ""
    for _ in range(8):
        s = chr(ord("a") + i % 26) + s
        i //= 26
    return s.encode()


def build_fixture(base: str, n_leaves: int, dup_every: int = 20) -> None:
    """n_leaves template-patched certs across N_LOGS recorded logs, with
    every dup_every-th leaf repeating the previous token (same DER ->
    same fingerprint -> a real cross-batch duplicate for the dedup)."""
    from tests.ctgen import make_cert_der, wrap_leaf, write_log_dir

    tmpl = make_cert_der(
        [
            f"cn-{TOKEN.decode()}.bench.example",
            f"alt-{TOKEN.decode()}.bench.example",
            f"www.alt-{TOKEN.decode()}.bench.example",
        ],
        serial=7,
    )
    # CN + self-signed issuer CN + 3 SANs: the token must appear exactly
    # 5 times, else the template accidentally contains the pattern in
    # key/signature bytes and patching would corrupt it
    assert tmpl.count(TOKEN) == 5, tmpl.count(TOKEN)
    per_log = n_leaves // N_LOGS
    for li in range(N_LOGS):
        leaves = []
        for j in range(per_log):
            i = li * per_log + j
            if dup_every and j > 0 and j % dup_every == 0:
                i -= 1  # repeat previous leaf's token -> duplicate cert
            leaves.append(wrap_leaf(tmpl.replace(TOKEN, _token(i))))
        write_log_dir(base, f"bench-log-{li}", leaves)


def _set_sth(base: str, tree_size: int) -> None:
    # atomic replace: the source polls sth.json concurrently with the
    # grow step — a truncate-then-write would race it into a JSON error
    for li in range(N_LOGS):
        path = os.path.join(base, f"bench-log-{li}", "sth.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"tree_size": tree_size}, f)
        os.replace(tmp, path)


def _progress_row(p) -> dict:
    if isinstance(p, str):
        p = json.loads(p)
    so = (p.get("stateOperators") or [{}])[0]
    return {
        "batch": p.get("batchId"),
        "rows": p.get("numInputRows", 0),
        "trigger_ms": p.get("durationMs", {}).get("triggerExecution"),
        "addbatch_ms": p.get("durationMs", {}).get("addBatch"),
        "state_rows": so.get("numRowsTotal"),
        "state_bytes": so.get("memoryUsedBytes"),
        # RocksDB provider only: live SST bytes on local disk — the
        # number that proves state actually spills out of the JVM heap
        "state_disk_bytes": (so.get("customMetrics") or {}).get(
            "rocksdbSstFileSize"
        ),
        "state_evicted": so.get("numRowsRemoved"),
        "watermark": (p.get("eventTime") or {}).get("watermark"),
    }


def _progress_rows(q) -> list[dict]:
    return [_progress_row(p) for p in q.recentProgress]


def _consumed(q) -> int:
    """Entries the source has committed, summed over logs, read from
    lastProgress — monotone and immune to the ~100-entry recentProgress
    cap. A Python DataSource offset round-trips through the progress
    payload as the DICT'S PYTHON REPR (single quotes), not JSON."""
    import ast

    lp = q.lastProgress
    if not lp:
        return 0
    if isinstance(lp, str):
        lp = json.loads(lp)
    try:
        end = lp["sources"][0]["endOffset"]
        if isinstance(end, str):
            end = ast.literal_eval(end)
        return sum(end.values())
    except (KeyError, TypeError, ValueError, AttributeError, IndexError):
        return 0


def _raise_if_dead(q, what: str) -> None:
    if q.exception() is not None:
        raise RuntimeError(f"{what} died: {q.exception()}")


def _table_strhash(spark, path: str, canon: dict | None = None) -> tuple[int, str]:
    """(rows, order-insensitive value hash) of a parquet table, every
    column cast to string so array columns hash too — the output-identity
    check for the solo-vs-concurrent comparison.

    ``canon`` maps column -> replacement SQL (or None to drop): the
    identity claim must exclude what is nondeterministic BY CONTRACT —
    the ingest's `ts` is processing time (the reference's utcnow(),
    streaming/ingest.py:20), and an HLL sketch's serialized BYTES depend
    on merge order while its register state/estimate does not, so the
    rollup hashes hll_sketch_estimate(users_sketch) instead of the raw
    payload."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import BinaryType

    from ct_clickhouse_spark.testing import pandas_signature

    canon = canon or {}
    df = spark.read.parquet(path)
    cols = []
    for f in df.schema.fields:
        if f.name in canon:
            if canon[f.name] is None:
                continue
            cols.append(F.expr(canon[f.name]).cast("string").alias(f.name))
        elif isinstance(f.dataType, BinaryType):
            # binary -> hex: a raw binary->string cast yields non-UTF-8
            # bytes Arrow refuses to ship
            cols.append(F.hex(F.col(f.name)).alias(f.name))
        else:
            cols.append(F.col(f.name).cast("string").alias(f.name))
    pdf = df.select(cols).toPandas()
    sig = pandas_signature(pdf)
    return sig[1], sig[2]


def bench_ingest(
    spark,
    n_leaves: int,
    max_per_trigger: int,
    work: str | None = None,
    pool: str | None = None,
    hash_sink: bool = False,
    logs_dir: str | None = None,
) -> dict:
    from ct_clickhouse_spark.session import run_in_scheduler_pool
    from ct_clickhouse_spark.streaming.ingest import start_ingest

    own_work = work is None
    if own_work:
        work = tempfile.mkdtemp(prefix="ctspark_stream_bench_")
    # ``logs_dir`` lets the solo-vs-concurrent identity protocol feed
    # BOTH runs one prebuilt fixture: make_cert_der self-signs with a
    # fresh EC key per build, so two builds yield different DER bytes
    # and fingerprints — a fixture artifact, not engine nondeterminism
    logs = logs_dir or os.path.join(work, "logs")
    try:
        if logs_dir is None:
            build_fixture(logs, n_leaves)
        per_log_full = n_leaves // N_LOGS
        # the STH must never overstate the recorded entries (get-entries
        # past the end fails the task, by design)
        assert per_log_full >= max_per_trigger, "need >= 1 trigger per log"
        _set_sth(logs, max_per_trigger)  # batch 0 = one trigger's worth

        def _start():
            return start_ingest(
                spark,
                logs,
                os.path.join(work, "table"),
                os.path.join(work, "ckpt"),
                available_now=False,
                max_per_trigger=max_per_trigger,
                processing_time="0 seconds",
            )

        # the FAIR pool is captured from the STARTING thread's local
        # properties by the stream-execution thread, so scoping the
        # start call is enough to pin every microbatch of this query
        q = run_in_scheduler_pool(spark, pool, _start) if pool else _start()
        t0 = time.time()
        # wait for batch 0 to commit, then reveal the full tree: from
        # here every trigger is pacing-bound at max_per_trigger per log
        while not q.recentProgress:
            if q.exception() is not None:
                raise RuntimeError(f"ingest query died: {q.exception()}")
            time.sleep(0.05)
        _set_sth(logs, per_log_full)
        done_rows = N_LOGS * per_log_full
        # accumulate progress by batchId while polling: recentProgress
        # retains only the last ~100 entries, so long runs would both
        # hang the summed-rows completion check and silently truncate
        # the recorded trigger series. Completion is judged on the
        # source's committed END OFFSETS (monotone, cap-proof).
        by_batch: dict[int, dict] = {}
        while _consumed(q) < done_rows and time.time() - t0 < 600:
            _raise_if_dead(q, "ingest query")
            for p in q.recentProgress:
                r = _progress_row(p)
                if r["batch"] is not None:
                    by_batch[r["batch"]] = r
            time.sleep(0.2)
        wall = time.time() - t0
        for p in q.recentProgress:
            r = _progress_row(p)
            if r["batch"] is not None:
                by_batch[r["batch"]] = r
        rows = [by_batch[b] for b in sorted(by_batch)]
        q.stop()
        q.awaitTermination(30)
        sink_rows = spark.read.parquet(os.path.join(work, "table")).count()
        steady = [r for r in rows if r["batch"] and r["rows"]]
        busy_s = sum(r["trigger_ms"] for r in steady) / 1000 if steady else 0
        out = {
            "leaves": done_rows,
            "max_per_trigger": max_per_trigger,
            "sink_rows": sink_rows,
            "wall_sec": round(wall, 2),
            "leaves_per_sec_steady": round(
                sum(r["rows"] for r in steady) / busy_s, 1
            )
            if busy_s
            else None,
            "n_triggers": len(rows),
            "triggers": rows,
        }
        if hash_sink:
            out["sink_rows"], out["sink_hash"] = _table_strhash(
                spark, os.path.join(work, "table"), canon={"ts": None}
            )
        return out
    finally:
        if own_work:
            shutil.rmtree(work, ignore_errors=True)


def bench_ingest_restart(
    spark, n_leaves: int = 24_000, max_per_trigger: int = 2048
) -> dict:
    """Measured restart recovery for the ingest path (T3/T7 evidence):
    kill the query mid-stream after a few committed triggers, restart it
    from the checkpoint, and record (a) recovery latency — start() to
    the first post-restart committed batch — and (b) exactly-once across
    the restart: the sink must hold the SAME rows an uninterrupted run
    produces (68,409 distinct (fingerprint, domain) rows at 24k leaves)
    with zero duplicate keys, even though the kill can interrupt an
    in-flight batch that then replays."""
    from ct_clickhouse_spark.streaming.ingest import start_ingest

    work = tempfile.mkdtemp(prefix="ctspark_stream_restart_")
    logs = os.path.join(work, "logs")
    table = os.path.join(work, "table")
    ckpt = os.path.join(work, "ckpt")
    try:
        build_fixture(logs, n_leaves)
        per_log_full = n_leaves // N_LOGS
        assert per_log_full >= max_per_trigger
        _set_sth(logs, max_per_trigger)

        def _start():
            return start_ingest(
                spark,
                logs,
                table,
                ckpt,
                available_now=False,
                max_per_trigger=max_per_trigger,
                processing_time="0 seconds",
            )

        q = _start()
        t0 = time.time()
        while not q.recentProgress:
            _raise_if_dead(q, "ingest query")
            time.sleep(0.05)
        _set_sth(logs, per_log_full)
        # let a few paced triggers commit, then kill mid-stream
        while len(q.recentProgress) < 4 and time.time() - t0 < 120:
            _raise_if_dead(q, "ingest query (pre-kill)")
            time.sleep(0.1)
        q.stop()
        q.awaitTermination(30)

        t0 = time.time()
        q = _start()
        while not q.recentProgress:
            _raise_if_dead(q, "restarted query")
            time.sleep(0.02)
        recovery_sec = time.time() - t0
        # drain the remainder (the restarted reader's first latestOffset
        # takes everything still pending, so one or two more batches)
        done_rows = N_LOGS * per_log_full
        while _consumed(q) < done_rows and time.time() - t0 < 300:
            _raise_if_dead(q, "restarted query (drain)")
            time.sleep(0.2)
        drained = _consumed(q) >= done_rows
        q.stop()
        q.awaitTermination(30)
        sink = spark.read.parquet(table)
        total = sink.count()
        distinct = sink.select("fingerprint", "domain").distinct().count()
        # BOTH failure directions of exactly-once: total != distinct is
        # duplication; total != expected is LOSS (a dropped committed
        # batch would pass a duplicates-only check). The unique cert
        # count is closed-form from build_fixture's dup_every rule.
        unique_per_log = per_log_full - (per_log_full - 1) // 20
        expected = N_LOGS * unique_per_log * 3
        return {
            "leaves": done_rows,
            "recovery_sec": round(recovery_sec, 2),
            "drained": drained,
            "sink_rows": total,
            "distinct_keys": distinct,
            "duplicate_rows": total - distinct,
            "expected_rows": expected,
            "exactly_once": bool(drained and total == distinct == expected),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def bench_ingest_drain(
    spark,
    watermark: str = "90 seconds",
    hi_per_log_per_sec: int = 256,
    lo_per_log_per_sec: int = 32,
    hi_secs: int = 240,
    lo_secs: int = 300,
    max_per_trigger: int = 1024,
) -> dict:
    """OBSERVED dedup-state eviction (r9 verdict #2 / round-10 item 1):
    every prior ingest run grew state monotonically to the end — correct
    inside a 1-hour watermark horizon on a <35 s run, but the
    state-is-bounded-by-rate-x-horizon claim stayed an extrapolation.
    This run crosses the horizon: a 90 s watermark (the production knob
    parameterized, streaming/ingest.py) under an ARRIVAL-THROTTLED
    protocol — the recorded logs' sth.json tree sizes grow by a fixed
    number of leaves per second, so arrival rate (not engine pacing)
    sets throughput, exactly how a live CT log feeds the reference's
    poller (ct_ingestor.py:24-25). Two phases:

      phase A (0..hi_secs):        hi leaves/log/s — state rises for
                                   ~90 s then PLATEAUS at rate x horizon
      phase B (hi_secs..+lo_secs): lo leaves/log/s — arrival drops 8x,
                                   state FALLS while ingest continues,
                                   re-plateauing at the lower rate

    The summary reports both plateaus and the rate-x-horizon prediction
    each should match; `drain_observed` requires state to fall by >2x
    across the phase boundary while triggers keep committing rows."""
    from ct_clickhouse_spark.streaming.ingest import start_ingest

    # validate the watermark BEFORE the multi-minute run, not at summary
    # time (a '1 hour' knob previously KeyError'd after the full run)
    _num, _unit = watermark.split()
    if _unit not in _WATERMARK_UNIT_S:
        raise ValueError(
            f"unsupported watermark unit {_unit!r}; "
            f"known: {sorted(_WATERMARK_UNIT_S)}"
        )
    float(_num)

    work = tempfile.mkdtemp(prefix="ctspark_stream_drain_")
    logs = os.path.join(work, "logs")
    try:
        per_log_full = hi_per_log_per_sec * hi_secs + lo_per_log_per_sec * lo_secs
        build_fixture(logs, per_log_full * N_LOGS)
        _set_sth(logs, hi_per_log_per_sec)  # one second's arrival
        q = start_ingest(
            spark,
            logs,
            os.path.join(work, "table"),
            os.path.join(work, "ckpt"),
            available_now=False,
            max_per_trigger=max_per_trigger,
            processing_time="0 seconds",
            watermark=watermark,
        )
        t0 = time.time()
        by_batch: dict[int, dict] = {}

        def _poll() -> None:
            _raise_if_dead(q, "drain ingest query")
            for p in q.recentProgress:
                r = _progress_row(p)
                b = r["batch"]
                if b is not None and b not in by_batch:
                    r["t"] = round(time.time() - t0, 1)
                    by_batch[b] = r

        # arrival clock: each second reveal that second's leaves
        while time.time() - t0 < hi_secs + lo_secs:
            el = time.time() - t0
            if el <= hi_secs:
                target = int(hi_per_log_per_sec * el)
            else:
                target = int(
                    hi_per_log_per_sec * hi_secs
                    + lo_per_log_per_sec * (el - hi_secs)
                )
            _set_sth(logs, max(1, min(per_log_full, target)))
            _poll()
            time.sleep(1.0)
        # reveal the tail and drain it
        _set_sth(logs, per_log_full)
        done_rows = N_LOGS * per_log_full
        while _consumed(q) < done_rows and time.time() - t0 < hi_secs + lo_secs + 120:
            _poll()
            time.sleep(0.5)
        wall = time.time() - t0
        _poll()
        q.stop()
        q.awaitTermination(30)
        rows = [by_batch[b] for b in sorted(by_batch)]
        sink_rows = spark.read.parquet(os.path.join(work, "table")).count()

        def _plateau(lo_t: float, hi_t: float) -> float | None:
            xs = [
                r["state_rows"]
                for r in rows
                if r["state_rows"] is not None and lo_t <= r["t"] <= hi_t
            ]
            return round(sum(xs) / len(xs), 1) if xs else None

        num, unit = watermark.split()
        horizon_s = float(num) * _WATERMARK_UNIT_S[unit]
        dpl = 3  # domains (state keys) per leaf in the fixture template
        # plateau = the last 60 s of each phase; phases are sized well
        # past horizon + watermark-update lag (~30 s observed) so both
        # windows are steady-state, not transients
        plateau_hi = _plateau(hi_secs - 60, hi_secs)
        plateau_lo = _plateau(hi_secs + lo_secs - 60, hi_secs + lo_secs)
        ingest_through_b = sum(
            r["rows"] for r in rows if r["t"] > hi_secs + 10 and r["rows"]
        )
        return {
            "watermark": watermark,
            "arrival_leaves_per_sec": {
                "phase_a": hi_per_log_per_sec * N_LOGS,
                "phase_b": lo_per_log_per_sec * N_LOGS,
            },
            "phase_secs": {"a": hi_secs, "b": lo_secs},
            "leaves": done_rows,
            "sink_rows": sink_rows,
            "wall_sec": round(wall, 2),
            "n_triggers": len(rows),
            "max_state_rows": max(
                (r["state_rows"] or 0) for r in rows
            ),
            "plateau_phase_a_rows": plateau_hi,
            "predicted_phase_a_rows": int(
                hi_per_log_per_sec * N_LOGS * dpl * horizon_s
            ),
            "plateau_phase_b_rows": plateau_lo,
            "predicted_phase_b_rows": int(
                lo_per_log_per_sec * N_LOGS * dpl * horizon_s
            ),
            # plateau / (rate x keys-per-leaf) = the horizon the state
            # actually spans: the configured watermark delay plus the
            # watermark-update lag (watermark advances one trigger behind)
            "effective_horizon_sec": round(
                plateau_hi / (hi_per_log_per_sec * N_LOGS * dpl), 1
            )
            if plateau_hi
            else None,
            "rows_ingested_during_phase_b": ingest_through_b,
            "drain_observed": bool(
                plateau_hi
                and plateau_lo
                and plateau_lo < plateau_hi / 2
                and ingest_through_b > 0
            ),
            "triggers": rows,
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _executor_pids() -> list[int]:
    """PIDs of live CoarseGrainedExecutorBackend JVMs (local-cluster
    mode spawns one per executor; plain local[] has none)."""
    import subprocess

    out = subprocess.run(
        ["ps", "-eo", "pid,args"], capture_output=True, text=True
    ).stdout
    pids = []
    for line in out.splitlines():
        if "CoarseGrainedExecutorBackend" in line and "grep" not in line:
            pids.append(int(line.split(None, 1)[0]))
    return pids


def bench_ingest_executor_kill(
    spark, n_leaves: int = 24_000, max_per_trigger: int = 2048
) -> dict:
    """Executor-LOSS fault injection (round-10 item 4): the r9 restart
    run killed the whole query and recovered from the checkpoint; the
    sharper fault is losing ONE executor JVM mid-trigger while the
    driver lives. Requires a local-cluster master (real executor
    processes). Protocol: same live-growth fixture as bench_ingest,
    wait for a few committed paced triggers, then SIGKILL one
    CoarseGrainedExecutorBackend; the standalone worker relaunches it,
    in-flight tasks retry, and the HDFS-backed state store reloads from
    the checkpoint. Pass = the run drains and the sink holds exactly
    the closed-form unique (fingerprint, domain) rows — 0 duplicates,
    0 loss — same check as bench_ingest_restart."""
    import signal

    from ct_clickhouse_spark.streaming.ingest import start_ingest

    assert "local-cluster" in spark.sparkContext.master, (
        "executor-kill bench needs SPARK_GRAFT_MASTER=local-cluster[...]"
        f" (got {spark.sparkContext.master})"
    )
    work = tempfile.mkdtemp(prefix="ctspark_stream_exkill_")
    logs = os.path.join(work, "logs")
    table = os.path.join(work, "table")
    try:
        build_fixture(logs, n_leaves)
        per_log_full = n_leaves // N_LOGS
        assert per_log_full >= max_per_trigger
        _set_sth(logs, max_per_trigger)
        before = _executor_pids()
        assert before, "no executor JVMs found — not a local-cluster run?"
        q = start_ingest(
            spark,
            logs,
            table,
            os.path.join(work, "ckpt"),
            available_now=False,
            max_per_trigger=max_per_trigger,
            processing_time="0 seconds",
        )
        t0 = time.time()
        while not q.recentProgress:
            _raise_if_dead(q, "exkill ingest query")
            time.sleep(0.05)
        _set_sth(logs, per_log_full)
        while len(q.recentProgress) < 4 and time.time() - t0 < 120:
            _raise_if_dead(q, "exkill ingest query (pre-kill)")
            time.sleep(0.1)
        batches_before_kill = len(q.recentProgress)
        victim = before[0]
        os.kill(victim, signal.SIGKILL)
        t_kill = time.time()
        done_rows = N_LOGS * per_log_full
        while _consumed(q) < done_rows and time.time() - t_kill < 300:
            _raise_if_dead(q, "exkill ingest query (drain)")
            time.sleep(0.2)
        drained = _consumed(q) >= done_rows
        wall = time.time() - t0
        q.stop()
        q.awaitTermination(30)
        after = _executor_pids()
        sink = spark.read.parquet(table)
        total = sink.count()
        distinct = sink.select("fingerprint", "domain").distinct().count()
        unique_per_log = per_log_full - (per_log_full - 1) // 20
        expected = N_LOGS * unique_per_log * 3
        return {
            "leaves": done_rows,
            "killed_pid": victim,
            "batches_before_kill": batches_before_kill,
            "executors_before": len(before),
            "executors_after": len(after),
            "respawned": victim not in after and len(after) >= len(before),
            "drain_after_kill_sec": round(time.time() - t_kill, 2)
            if drained
            else None,
            "wall_sec": round(wall, 2),
            "drained": drained,
            "sink_rows": total,
            "distinct_keys": distinct,
            "duplicate_rows": total - distinct,
            "expected_rows": expected,
            "exactly_once": bool(drained and total == distinct == expected),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def bench_rollup(
    spark,
    n_chunks: int = 8,
    state_width: int = 8,
    pool: str | None = None,
    hash_out: bool = False,
) -> dict:
    import datetime

    from pyspark.sql import functions as F

    from ct_clickhouse_spark.session import get_small_job_session, run_in_scheduler_pool
    from ct_clickhouse_spark.streaming.rollup import start_rollup

    # shuffle/state width sized to the KEY CARDINALITY (~480 live
    # (window, event_type) groups per trigger), not the corpus-width
    # session conf: every extra state partition pays open/commit/
    # snapshot fixed cost PER TRIGGER. Measured at sf1: width 8 runs
    # 1.79 s/trigger vs 3.83 s at width 32 — 2.2x — with identical
    # output. The same per-workload-SQLConf clone the maintenance
    # mutations use; a deployment with millions of live groups widens
    # it back out.
    if state_width:
        spark = get_small_job_session(spark, state_width)

    work = tempfile.mkdtemp(prefix="ctspark_rollup_bench_")
    src = os.path.join(work, "src")
    try:
        ev = spark.read.parquet(os.path.join(SF1_DIR, "events.parquet"))
        n = ev.count()
        max_ts = ev.agg(F.max("ts")).collect()[0][0]
        # ts-ordered chunks so the watermark advances monotonically
        # across triggers (one file per trigger), exactly how a live
        # stream would feed it
        ev.repartitionByRange(n_chunks, "ts").sortWithinPartitions(
            "ts"
        ).write.parquet(src + "/chunk=0")
        # the range write makes files ts-ordered but the file SOURCE
        # need not list them in range order -> give each chunk its own
        # lexicographic chunk=N dir, like the rollup tests
        chunks = sorted(
            f
            for f in os.listdir(src + "/chunk=0")
            if f.startswith("part-")
        )
        for i, f in enumerate(chunks[1:], start=1):
            dst = src + f"/chunk={i}"
            os.makedirs(dst)
            shutil.move(os.path.join(src + "/chunk=0", f), dst)
        # sentinel chunk far past everything: finalizes every window
        sentinel_ts = max_ts + datetime.timedelta(hours=12)
        spark.createDataFrame(
            [(10**9, sentinel_ts, 0, "sentinel", 0.0, "{}")],
            "event_id long, ts timestamp_ntz, user_id long, "
            "event_type string, value double, props string",
        ).coalesce(1).write.parquet(src + f"/chunk={len(chunks)}")
        # the file source orders by modification time: pin STRICTLY
        # ascending mtimes per chunk, else same-second mtimes let it
        # process chunks out of ts order, the watermark jumps ahead, and
        # late chunks get silently dropped (observed: 1820 of 3600
        # groups emitted before this fix)
        t_base = time.time() - 3600
        for i in range(len(chunks) + 1):
            d = src + f"/chunk={i}"
            for f in os.listdir(d):
                os.utime(os.path.join(d, f), (t_base + i * 10, t_base + i * 10))

        stream = (
            spark.readStream.schema(
                "event_id long, ts timestamp_ntz, user_id long, "
                "event_type string, value double, props string"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/chunk=*")
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .select("ts", "user_id", "event_type", "value")
        )
        t0 = time.time()

        def _start():
            return start_rollup(
                spark,
                stream,
                os.path.join(work, "rollup"),
                os.path.join(work, "ckpt"),
                available_now=True,
            )

        q = run_in_scheduler_pool(spark, pool, _start) if pool else _start()
        q.awaitTermination()
        wall = time.time() - t0
        rows = _progress_rows(q)
        out_rows = spark.read.parquet(os.path.join(work, "rollup")).count()
        busy_s = sum(r["trigger_ms"] or 0 for r in rows) / 1000
        # steady state excludes the first two triggers (plan compilation
        # + state-store init) and the sentinel/drain tail
        steady = [
            r for r in rows if (r["batch"] or 0) >= 2 and r["rows"] > 1000
        ]
        steady_s = sum(r["trigger_ms"] for r in steady) / 1000
        expected = (
            ev.select(
                F.date_trunc("hour", "ts").alias("h"), "event_type"
            )
            .distinct()
            .count()
        )
        out = {
            "events": n,
            "rollup_rows": out_rows,
            "expected_groups": expected,
            "complete": out_rows == expected,
            "wall_sec": round(wall, 2),
            "events_per_sec": round(n / busy_s, 1) if busy_s else None,
            "events_per_sec_steady": round(
                sum(r["rows"] for r in steady) / steady_s, 1
            )
            if steady_s
            else None,
            "n_triggers": len(rows),
            "triggers": rows,
        }
        if hash_out:
            # canon cols: the sketch's serialized bytes vary by merge
            # order (its estimate does not — verified SAME across solo
            # runs), and sum_value carries last-ulp FP addition-order
            # noise (the per-column diff isolated it as the only
            # unstable raw column); everything else hashes exact
            out["rollup_rows"], out["rollup_hash"] = _table_strhash(
                spark,
                os.path.join(work, "rollup"),
                canon={
                    "users_sketch": "hll_sketch_estimate(users_sketch)",
                    "sum_value": "round(sum_value, 6)",
                },
            )
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)


def bench_concurrent(
    spark, n_leaves: int = 24_000, max_per_trigger: int = 2048
) -> dict:
    """r12 (verdict #8): the PRODUCTION topology — ingest + rollup + tail
    all live on ONE session under FAIR pools — vs the solo runs every
    other bench measures. The tail consumes the concurrent ingest's own
    output directory (the real dataflow chain). Gates:
    - ingest sink table VALUE-IDENTICAL (rows + order-insensitive hash)
      to its solo run;
    - rollup output VALUE-IDENTICAL to its solo run;
    - tail delivered exactly the sink's row count (gap-free);
    and reports the per-query throughput interference factor
    (solo rate / concurrent rate)."""
    import threading

    from ct_clickhouse_spark.session import run_in_scheduler_pool
    from ct_clickhouse_spark.streaming.tail import tail_cert_domains

    # -- one fixture for BOTH phases (a rebuilt fixture re-signs with a
    #    fresh key -> different fingerprints; identity needs one input)
    work = tempfile.mkdtemp(prefix="ctspark_concurrent_")
    shared_logs = os.path.join(work, "logs")
    build_fixture(shared_logs, n_leaves)

    # -- solo baselines (identical params to the concurrent phase)
    solo_ingest = bench_ingest(
        spark, n_leaves, max_per_trigger, hash_sink=True, logs_dir=shared_logs
    )
    solo_rollup = bench_rollup(spark, hash_out=True)

    # -- concurrent phase
    table = os.path.join(work, "ingest", "table")
    os.makedirs(table, exist_ok=True)
    tail_rows = []
    tail_lock = threading.Lock()

    def on_rows(rows):
        with tail_lock:
            tail_rows.extend(rows)

    out: dict = {}
    errs: dict = {}

    def run(name, fn):
        try:
            out[name] = fn()
        except Exception as e:  # noqa: BLE001 — joined + reported below
            errs[name] = repr(e)

    try:
        t0 = time.time()
        threads = [
            threading.Thread(
                target=run,
                args=(
                    "ingest",
                    lambda: bench_ingest(
                        spark,
                        n_leaves,
                        max_per_trigger,
                        work=os.path.join(work, "ingest"),
                        pool="s_ingest",
                        hash_sink=True,
                        logs_dir=shared_logs,
                    ),
                ),
            ),
            threading.Thread(
                target=run,
                args=(
                    "rollup",
                    lambda: bench_rollup(spark, pool="s_rollup", hash_out=True),
                ),
            ),
        ]
        for t in threads:
            t.start()
        # tail starts beside them, polling the growing ingest table
        tail_q = run_in_scheduler_pool(
            spark,
            "s_tail",
            lambda: tail_cert_domains(
                spark,
                table,
                os.path.join(work, "tail_ckpt"),
                on_rows,
                available_now=False,
                poll_seconds=1,
            ),
        )
        for t in threads:
            t.join(timeout=900)
        concurrent_wall = round(time.time() - t0, 2)
        if errs:
            raise RuntimeError(f"concurrent queries failed: {errs}")
        # drain the tail to the final sink row count
        sink_rows = out["ingest"]["sink_rows"]
        t_drain = time.time()
        while len(tail_rows) < sink_rows and time.time() - t_drain < 120:
            _raise_if_dead(tail_q, "tail query")
            time.sleep(0.5)
        tail_q.stop()
        tail_q.awaitTermination(30)

        def factor(solo, conc):
            return round(solo / conc, 3) if solo and conc else None

        return {
            "leaves": n_leaves,
            "max_per_trigger": max_per_trigger,
            "concurrent_wall_sec": concurrent_wall,
            "ingest_identical": (
                out["ingest"]["sink_rows"] == solo_ingest["sink_rows"]
                and out["ingest"]["sink_hash"] == solo_ingest["sink_hash"]
            ),
            "rollup_identical": (
                out["rollup"]["rollup_rows"] == solo_rollup["rollup_rows"]
                and out["rollup"]["rollup_hash"] == solo_rollup["rollup_hash"]
            ),
            "tail_rows": len(tail_rows),
            "tail_gap_free": len(tail_rows) == sink_rows,
            "interference": {
                "ingest_rate_solo": solo_ingest["leaves_per_sec_steady"],
                "ingest_rate_concurrent": out["ingest"]["leaves_per_sec_steady"],
                "ingest_slowdown_x": factor(
                    solo_ingest["leaves_per_sec_steady"],
                    out["ingest"]["leaves_per_sec_steady"],
                ),
                "rollup_rate_solo": solo_rollup["events_per_sec_steady"],
                "rollup_rate_concurrent": out["rollup"]["events_per_sec_steady"],
                "rollup_slowdown_x": factor(
                    solo_rollup["events_per_sec_steady"],
                    out["rollup"]["events_per_sec_steady"],
                ),
            },
            "solo": {"ingest": solo_ingest, "rollup": solo_rollup},
            "concurrent": out,
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def bench_concurrent_kill(
    spark, n_leaves: int = 24_000, max_per_trigger: int = 2048
) -> dict:
    """r13 (r12 verdict #6): exactly-once through executor SIGKILL under
    the PRODUCTION topology. The r11 kill proof
    (BENCH_streaming_r11_rocksdb_kill.json) ran ingest SOLO on the
    local-cluster; production runs ingest + rollup + tail concurrently
    under FAIR pools, where a lost executor JVM takes live tasks of ALL
    queries with it at once. Protocol: shared fixture + the same pool
    topology as bench_concurrent; once the ingest sink shows >= 2
    committed trigger files (both sibling queries already live), SIGKILL
    one CoarseGrainedExecutorBackend; the standalone worker respawns it,
    in-flight tasks of every query retry, and each query's state store
    reloads from its own checkpoint. Gates:
    - ingest sink holds exactly the closed-form unique
      (fingerprint, domain) rows — 0 duplicates, 0 loss;
    - rollup output complete — exactly one row per (hour, event_type);
    - tail delivers exactly the sink's row count (gap-free)."""
    import signal
    import threading

    from ct_clickhouse_spark.session import run_in_scheduler_pool
    from ct_clickhouse_spark.streaming.tail import tail_cert_domains

    assert "local-cluster" in spark.sparkContext.master, (
        "concurrent-kill bench needs SPARK_GRAFT_MASTER=local-cluster[...]"
        f" (got {spark.sparkContext.master})"
    )
    # reduced-scale runs (the pytest gate) must still get >= 4 triggers
    # per log: >= 2 committed before the kill, >= 1 replayed/resumed after
    max_per_trigger = min(max_per_trigger, n_leaves // N_LOGS // 4)
    work = tempfile.mkdtemp(prefix="ctspark_conc_kill_")
    logs = os.path.join(work, "logs")
    build_fixture(logs, n_leaves)
    ingest_work = os.path.join(work, "ingest")
    table = os.path.join(ingest_work, "table")
    os.makedirs(table, exist_ok=True)
    tail_rows: list = []
    tail_lock = threading.Lock()

    def on_rows(rows):
        with tail_lock:
            tail_rows.extend(rows)

    out: dict = {}
    errs: dict = {}

    def run(name, fn):
        try:
            out[name] = fn()
        except Exception as e:  # noqa: BLE001 — joined + reported below
            errs[name] = repr(e)

    before = _executor_pids()
    assert before, "no executor JVMs found — not a local-cluster run?"
    try:
        t0 = time.time()
        threads = [
            threading.Thread(
                name="ingest",
                target=run,
                args=(
                    "ingest",
                    lambda: bench_ingest(
                        spark,
                        n_leaves,
                        max_per_trigger,
                        work=ingest_work,
                        pool="k_ingest",
                        logs_dir=logs,
                    ),
                ),
            ),
            threading.Thread(
                name="rollup",
                target=run,
                args=("rollup", lambda: bench_rollup(spark, pool="k_rollup")),
            ),
        ]
        for t in threads:
            t.start()
        tail_q = run_in_scheduler_pool(
            spark,
            "k_tail",
            lambda: tail_cert_domains(
                spark,
                table,
                os.path.join(work, "tail_ckpt"),
                on_rows,
                available_now=False,
                poll_seconds=1,
            ),
        )

        # kill once the sink shows committed progress (>= 2 trigger files
        # on disk — the query is mid-stream, not warming up)
        def committed_files() -> int:
            return sum(
                1
                for _, _, fs in os.walk(table)
                for f in fs
                if f.startswith("part-")
            )

        t_wait = time.time()
        while committed_files() < 2 and time.time() - t_wait < 180:
            if errs:  # a sibling query died during warmup — fail fast
                raise RuntimeError(f"query died pre-kill: {errs}")
            time.sleep(0.2)
        assert committed_files() >= 2, "ingest never committed pre-kill"
        victim = _executor_pids()[0]
        os.kill(victim, signal.SIGKILL)
        t_kill = time.time()
        for t in threads:
            t.join(timeout=900)
        # join(timeout) does NOT raise on expiry — a hung query thread
        # would otherwise surface as a KeyError on out[...] (and the
        # finally-rmtree would race the still-running thread). Fail with
        # the actual cause instead (r13 advice #4).
        hung = [t.name for t in threads if t.is_alive()]
        if hung:
            raise TimeoutError(
                f"concurrent queries still running after 900s join: {hung}"
            )
        if errs:
            raise RuntimeError(f"concurrent queries failed after kill: {errs}")
        sink = spark.read.parquet(table)
        total = sink.count()
        t_drain = time.time()
        while len(tail_rows) < total and time.time() - t_drain < 120:
            _raise_if_dead(tail_q, "tail query")
            time.sleep(0.5)
        tail_q.stop()
        tail_q.awaitTermination(30)
        distinct = sink.select("fingerprint", "domain").distinct().count()
        per_log_full = n_leaves // N_LOGS
        unique_per_log = per_log_full - (per_log_full - 1) // 20
        expected = N_LOGS * unique_per_log * 3
        after = _executor_pids()
        ingest_ok = bool(total == distinct == expected)
        return {
            "leaves": n_leaves,
            "max_per_trigger": max_per_trigger,
            "killed_pid": victim,
            "kill_after_sec": round(t_kill - t0, 2),
            "executors_before": len(before),
            "executors_after": len(after),
            "respawned": victim not in after and len(after) >= len(before),
            "wall_sec": round(time.time() - t0, 2),
            "ingest_sink_rows": total,
            "ingest_distinct_keys": distinct,
            "ingest_duplicate_rows": total - distinct,
            "ingest_expected_rows": expected,
            "ingest_exactly_once": ingest_ok,
            "rollup_rows": out["rollup"]["rollup_rows"],
            "rollup_expected_groups": out["rollup"]["expected_groups"],
            "rollup_complete": out["rollup"]["complete"],
            "tail_rows": len(tail_rows),
            "tail_gap_free": len(tail_rows) == total,
            "ok": bool(
                ingest_ok
                and out["rollup"]["complete"]
                and len(tail_rows) == total
            ),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--leaves", type=int, default=24_000)
    ap.add_argument("--scale-leaves", type=int, default=96_000)
    ap.add_argument("--out", default=None)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    from ct_clickhouse_spark.session import get_spark

    # width 8, not the 32-core default: streaming state pays open/
    # commit/snapshot fixed cost PER PARTITION PER TRIGGER, and these
    # workloads carry small live state (~480 rollup groups; <=274k
    # dedup keys). Measured at the reference ingest knob: 1,890 leaves/s
    # at width 8 vs 1,082 at width 32 (identical sink rows). A clone
    # session can't be used for the ingest runs — Python data-source
    # registration is session-local but its duplicate-name check is
    # JVM-wide (see sources/ct_log.register) — so the width is set on
    # the bench's root session.
    width = int(os.environ.get("SPARK_GRAFT_STREAM_WIDTH", "8"))
    # SPARK_GRAFT_STATE_PROVIDER=rocksdb runs the same benches with the
    # disk-backed state store (the 100 TB spill path of SCALING.md's
    # state-sizing rule); default stays the in-memory HDFS-backed
    # provider the recorded baselines used.
    provider = os.environ.get("SPARK_GRAFT_STATE_PROVIDER", "memory")
    extra_conf: dict[str, str] = {}
    if provider == "rocksdb":
        extra_conf["spark.sql.streaming.stateStore.providerClass"] = (
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider"
        )
    elif provider != "memory":
        raise SystemExit(f"unknown SPARK_GRAFT_STATE_PROVIDER {provider!r}")
    spark = get_spark(
        app_name="bench-streaming",
        shuffle_partitions=width,
        extra_conf=extra_conf,
    )
    spark.sparkContext.setLogLevel("ERROR")
    result: dict = {
        "metric": "streaming_throughput",
        "state_provider": provider,
        "runs": {},
    }
    if not args.only or args.only == "ingest":
        result["runs"]["ingest_512"] = bench_ingest(spark, args.leaves, 512)
        result["runs"]["ingest_4096"] = bench_ingest(
            spark, args.scale_leaves, 4096
        )
    if not args.only or args.only == "restart":
        result["runs"]["ingest_restart"] = bench_ingest_restart(spark)
    if args.only == "drain":
        # not in the default set: a ~6 min wall-clock run by design
        result["runs"]["ingest_drain"] = bench_ingest_drain(spark)
    if args.only == "drain10x":
        # r12 (verdict #7): the retention law at 10x state scale — a
        # 450 s watermark (5x) at 512 leaves/log/s (2x) holds a plateau
        # of rate x dpl x ~2xdelay ~= 4.3M state rows (the r11 law's
        # ~398k plateau was the extrapolation base). Phases sized past
        # the ~2x-delay effective horizon (900 s) plus the 60 s plateau
        # window. ~36 min wall by design; run under
        # SPARK_GRAFT_STATE_PROVIDER=rocksdb so the SST series shows the
        # state physically on disk.
        result["runs"]["ingest_drain_10x"] = bench_ingest_drain(
            spark,
            watermark="450 seconds",
            hi_per_log_per_sec=512,
            lo_per_log_per_sec=64,
            hi_secs=1080,
            lo_secs=1080,
            max_per_trigger=4096,
        )
    if args.only == "executor-kill":
        # needs SPARK_GRAFT_MASTER=local-cluster[...]
        result["runs"]["ingest_executor_kill"] = bench_ingest_executor_kill(
            spark
        )
    if not args.only or args.only == "rollup":
        result["runs"]["rollup_sf1"] = bench_rollup(spark, state_width=width)
    if args.only == "concurrent":
        result["runs"]["concurrent_topology"] = bench_concurrent(spark)
    if args.only == "concurrent-kill":
        # needs SPARK_GRAFT_MASTER=local-cluster[...]
        result["runs"]["concurrent_kill"] = bench_concurrent_kill(
            spark, args.leaves
        )
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
