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
    slots = sorted(old[0]["queries"])
    rows = {}
    for s in slots:
        o = statistics.median([r["queries"][s] for r in old])
        n = statistics.median([r["queries"].get(s) for r in new])
        rows[s] = {"old": round(o, 3), "new": round(n, 3), "delta": round(n - o, 3)}
    out = {
        "metric": "r15 paired optimization bench (old=a7c73b0, new=r15 HEAD)",
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
