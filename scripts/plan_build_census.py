#!/usr/bin/env python
"""Per-slot DataFrame BUILD cost census (no action executed).

Times `fn(spark, sf_dir)` alone — Python plan construction (py4j round
trips) plus Catalyst's eager per-Dataset analysis — which recurs on
every timed bench run. r15 measured ~15 s/pass across the 50 slots
(~30% of the headline); this script makes that number reproducible and
attributes it per slot so r16's plan-build cuts are before/after
checkable.

Protocol: one warm-up build per slot (also builds temp views and the
per-(session,sf) artifacts via a single full materialization of the
warm-up frame where the slot requires artifacts — controlled by
--materialize-warmup, default on so warm build cost matches the bench's
steady state), then median of N (default 5) pure builds.

Usage: python scripts/plan_build_census.py [--runs N] [--out FILE]
                                           [--slots name1,name2,...]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--out", default=None)
    ap.add_argument("--slots", default=None)
    ap.add_argument("--no-materialize-warmup", action="store_true")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from ct_clickhouse_spark.session import get_spark

    spark = get_spark(app_name="plan_build_census")
    spark.sparkContext.setLogLevel("ERROR")

    only = set(args.slots.split(",")) if args.slots else None
    builds: dict[str, float] = {}
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        # warm-up: materialize once so artifact builds / temp views are
        # in the same state a bench timed run sees
        df = fn(spark, SF_DIR)
        if not args.no_materialize_warmup:
            df.toPandas()
        samples = []
        for _ in range(args.runs):
            # same pre-sample GC discipline as bench.py: accumulated
            # py4j/broadcast state otherwise lands multi-second driver
            # GC pauses inside random samples (observed 4-28 s outliers
            # on eager-action slots in the un-GC'd first census run)
            spark.sparkContext._jvm.System.gc()
            t0 = time.time()
            fn(spark, SF_DIR)
            samples.append(time.time() - t0)
        builds[name] = round(statistics.median(samples), 4)
        print(f"{name}: {builds[name]:.3f}s  (samples: "
              f"{', '.join(f'{s:.3f}' for s in samples)})", flush=True)

    total = round(sum(builds.values()), 3)
    out = {"metric": "plan_build_total_sec", "value": total,
           "builds": builds, "sf_dir": SF_DIR, "runs": args.runs}
    print(json.dumps({"total": total}))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
