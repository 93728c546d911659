"""Exactly-once under executor loss in the CONCURRENT topology (r12
verdict #6): the r11 SIGKILL proof ran ingest solo; production runs
ingest + rollup + tail on one session under FAIR pools, and a lost
executor JVM takes live tasks of all three with it. This gate drives
scripts/bench_streaming.py --only concurrent-kill in a SUBPROCESS — the
suite's session is local[8] in this JVM, and executor-loss needs real
executor processes (local-cluster) — at a reduced scale, and asserts the
same invariants the full-scale recorded artifact
(BENCH_streaming_r13_concurrent_kill.json) carries:
  - an executor was killed mid-stream and respawned;
  - the ingest sink holds exactly the closed-form unique rows;
  - the rollup output is complete (one row per (hour, event_type));
  - the tail delivered the sink's exact row count.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_concurrent_topology_survives_executor_sigkill():
    if not os.path.exists(os.path.join(REPO, ".benchdata/sf1/events.parquet")):
        pytest.skip("needs the generated .benchdata/sf1 events table")
    env = {
        **os.environ,
        # worker memory must cover the session's executor request
        # (SPARK_GRAFT_EXECUTOR_MEM, default 6g) — local-cluster refuses
        # to launch otherwise
        "SPARK_GRAFT_MASTER": "local-cluster[2,4,3072]",
        "SPARK_GRAFT_EXECUTOR_MEM": "3g",
        "SPARK_GRAFT_STATE_PROVIDER": "rocksdb",
    }
    proc = subprocess.run(
        [
            sys.executable,
            "scripts/bench_streaming.py",
            "--only",
            "concurrent-kill",
            "--leaves",
            "6000",
        ],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=840,
    )
    assert proc.returncode == 0, (
        f"bench exited {proc.returncode}\nstdout tail: {proc.stdout[-2000:]}"
        f"\nstderr tail: {proc.stderr[-2000:]}"
    )
    # the bench prints exactly one JSON result line (progress goes to
    # stderr); take the last parseable line defensively
    result = None
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            result = json.loads(line)
            break
        except json.JSONDecodeError:
            continue
    assert result, f"no JSON line in stdout: {proc.stdout[-2000:]}"
    run = result["runs"]["concurrent_kill"]
    assert run["respawned"], run
    assert run["ingest_exactly_once"], run
    assert run["ingest_duplicate_rows"] == 0, run
    assert run["rollup_complete"], run
    assert run["tail_gap_free"], run
    assert run["ok"], run
