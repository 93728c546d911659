#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Timing protocol: per query, one warm-up run then median of 5 timed runs
(each run executes the full plan to completion and materializes the
full result via Arrow toPandas), with
a JVM garbage collection immediately before every timed run: in a
50-query shared-JVM session, accumulated broadcast/shuffle/checkpoint
state otherwise lands multi-second GC pauses inside random measurements
(observed as 3-8x single-query outliers that move between runs). Median
of 5 additionally tolerates up to two residual stalls per query.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# per-slot timed repetitions (median taken). The driver's official runs
# use the default 5; large-SF growth studies (where one warm run per
# slot already answers the question and 5x would cost hours) dial it
# down via the env knob.
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))
SECTION_RUNS = 3  # diagnostic per-section attribution, cheaper than slots


def warm_page_cache(sf_dir: str) -> float:
    """Read every fixture byte once before the timed suite, pinning the
    OS page-cache state (r8 verdict #4): a same-code re-run on a
    cache-cold box drifted +24% median on payload-heavy slots, so the
    official protocol is warm-cache by construction — every run starts
    from the same storage state instead of whatever the box last did.
    Returns the seconds spent warming (reported, never timed)."""
    t0 = time.time()
    for f in sorted(os.listdir(sf_dir)):
        if f.endswith(".parquet"):
            with open(os.path.join(sf_dir, f), "rb") as fh:
                while fh.read(1 << 24):
                    pass
    return time.time() - t0


def main() -> None:
    import __spark_entry__ as entrymod
    from ct_clickhouse_spark.session import get_spark

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    warm_sec = warm_page_cache(SF_DIR)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    # Materialization is toPandas() (Arrow batches), not collect():
    # collect() builds one Python Row OBJECT per result row, and on a
    # ~1M-row result that costs ~7s of pure CPython object churn on top
    # of a 0.7s query (measured: evt_session_30m at sf1) — a harness
    # artifact, not engine cost. Arrow is both how an analytics client
    # consumes result sets at scale and how the correctness compare
    # fetches both engines (verify_driver/toPandas vs DuckDB .df(),
    # which is the symmetric numpy materialization bench_duckdb uses).
    first_run: dict[str, float] = {}
    for name, fn in entrymod.queries().items():
        try:
            # warm-up (also builds temp views and the per-(session, sf)
            # artifacts) — TIMED and recorded separately as the slot's
            # COLD cost (r8 verdict #5: artifact-cached slots otherwise
            # understate steady-state-cold cost in the headline). Page
            # cache is pinned (warm_page_cache), so first_run isolates
            # engine-side cold state: plan compilation + artifact builds.
            t0 = time.time()
            fn(spark, SF_DIR).toPandas()
            first_run[name] = round(time.time() - t0, 4)
            samples = []
            for _ in range(RUNS):
                # gc BEFORE each timed run, outside the timed window:
                # releasing dead broadcast/checkpoint blocks here (via
                # ContextCleaner) keeps their collection pauses out of
                # the measurement
                spark.sparkContext._jvm.System.gc()
                t0 = time.time()
                fn(spark, SF_DIR).toPandas()
                samples.append(time.time() - t0)
            timings[name] = round(statistics.median(samples), 4)
        except Exception as e:  # one broken query must not void the metric
            errors[name] = str(e)[:200]

    # Per-section attribution for merged slots: each tagged section is
    # timed independently (1 warmup + median of SECTION_RUNS) so a slot's
    # round-over-round delta names its cause without the SURVEY ledger.
    # Section timings are diagnostic — the headline metric stays the sum
    # of the SLOT timings above (sections re-run work the slots share).
    # SPARK_GRAFT_BENCH_SECTIONS=0 skips the diagnostic section pass —
    # the multi-run sf10 protocol times slots only (the headline and the
    # growth table never read sections)
    run_sections = os.environ.get("SPARK_GRAFT_BENCH_SECTIONS", "1") != "0"
    sections: dict[str, dict[str, float]] = {}
    for slot, secs in (
        getattr(entrymod, "sections", dict)().items() if run_sections else ()
    ):
        if slot not in timings:
            continue
        per: dict[str, float] = {}
        for sect, fn in secs.items():
            try:
                fn(spark, SF_DIR).toPandas()
                samples = []
                for _ in range(SECTION_RUNS):
                    spark.sparkContext._jvm.System.gc()
                    t0 = time.time()
                    fn(spark, SF_DIR).toPandas()
                    samples.append(time.time() - t0)
                per[sect] = round(statistics.median(samples), 4)
            except Exception as e:
                errors[f"{slot}.{sect}"] = str(e)[:200]
        if per:
            sections[slot] = per

    total = round(sum(timings.values()), 4)
    # The driver captures stdout's one JSON line and truncates oversized
    # lines (BENCH_r06.json came back `parsed: null`): keep the stdout
    # payload compact — slot timings only, floats capped at 3 dp — and
    # write the full diagnostic payload (per-section attribution, full
    # precision) to bench_full.json alongside the repo.
    compact = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if errors:
        compact["errors"] = {k: v[:80] for k, v in errors.items()}
    full = dict(
        compact,
        queries=timings,
        first_run=first_run,
        sections=sections,
        warm_cache_sec=round(warm_sec, 2),
    )
    if errors:
        full["errors"] = errors
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_full.json")
    with open(out, "w") as f:
        json.dump(full, f, indent=1)
    print(json.dumps(compact))
    spark.stop()


if __name__ == "__main__":
    main()
