#!/usr/bin/env python
"""Compose BENCH_paired_r15.json from the four alternated bench runs.

Protocol: bench.py (driver protocol, slots only) run A/B/A/B in immediate
succession on one box state — OLD = the round-14-inherited tree (a7c73b0)
in a read-only worktree, NEW = the round-15 HEAD. Pairing cancels the
machine's between-session throughput drift (measured up to ~2-4x on
identical code), which is why the round's headline delta is read from
this artifact and not from benches hours apart.
"""

from __future__ import annotations

import json
import statistics
import sys


def load(path: str) -> dict:
    with open(path) as f:
        return json.loads(f.read().strip())


def main() -> None:
    old = [load(f"/tmp/paired_old_{i}.json") for i in (1, 2)]
    new = [load(f"/tmp/paired_new_{i}.json") for i in (1, 2)]
    # union of slot sets, with missing-side slots REPORTED instead of
    # crashing the composition or silently dropping new-only slots
    # (r15 advice): a slot absent from any run on a side gets null for
    # that side and lands in "incomparable".
    slot_sets = [set(r["queries"]) for r in old + new]
    all_slots = sorted(set().union(*slot_sets))
    rows, incomparable = {}, {}
    for s in all_slots:
        o_samples = [r["queries"][s] for r in old if s in r["queries"]]
        n_samples = [r["queries"][s] for r in new if s in r["queries"]]
        if len(o_samples) < len(old) or len(n_samples) < len(new):
            incomparable[s] = {
                "old_samples": o_samples,
                "new_samples": n_samples,
            }
            continue
        o = statistics.median(o_samples)
        n = statistics.median(n_samples)
        rows[s] = {"old": round(o, 3), "new": round(n, 3), "delta": round(n - o, 3)}
    label = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "r15 paired optimization bench (old=a7c73b0, new=r15 HEAD)"
    )
    out = {
        "metric": label,
        "protocol": (
            "bench.py, SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1, CPUS=32, "
            "SECTIONS=0, runs alternated OLD/NEW/OLD/NEW in immediate "
            "succession; per-slot value = median of the two runs per tree"
        ),
        "totals": {
            "old_runs": [r["value"] for r in old],
            "new_runs": [r["value"] for r in new],
            "old_median": round(statistics.median([r["value"] for r in old]), 3),
            "new_median": round(statistics.median([r["value"] for r in new]), 3),
        },
        "slots": rows,
    }
    if incomparable:
        out["incomparable"] = incomparable
    dest = sys.argv[1] if len(sys.argv) > 1 else "BENCH_paired_r15.json"
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)
    t = out["totals"]
    print(f"old total runs {t['old_runs']} -> median {t['old_median']}")
    print(f"new total runs {t['new_runs']} -> median {t['new_median']}")
    top = sorted(rows.items(), key=lambda kv: kv[1]["delta"])[:12]
    for s, r in top:
        print(f"{s:34s} old={r['old']:7.3f} new={r['new']:7.3f} delta={r['delta']:+.3f}")


if __name__ == "__main__":
    main()
