#!/usr/bin/env python
"""Collapse the BENCH_width_r11_w{4,8,16,32}.json artifacts into the
streaming width-law grid (round-11 item 6): per width, the steady
ingest rate at both trigger knobs, the rollup rate, and the per-trigger
state fixed cost — the capacity-planning curve for picking
spark.sql.shuffle.partitions on a stateful streaming job.

Usage: python scripts/summarize_width_grid.py BENCH_width_r11_w*.json
"""

from __future__ import annotations

import json
import re
import statistics
import sys


def main() -> int:
    rows = []
    for path in sorted(
        sys.argv[1:], key=lambda p: int(re.search(r"_w(\d+)\.json", p).group(1))
    ):
        d = json.load(open(path))
        w = int(re.search(r"_w(\d+)\.json", path).group(1))
        runs = d["runs"]

        def steady_trigger_ms(run, key="trigger_ms"):
            xs = [
                t[key]
                for t in run["triggers"][2:]
                if t.get(key) is not None and t.get("rows")
            ]
            return round(statistics.median(xs), 1) if xs else None

        rows.append(
            {
                "width": w,
                "ingest_512_leaves_per_sec": runs["ingest_512"][
                    "leaves_per_sec_steady"
                ],
                "ingest_512_trigger_ms_median": steady_trigger_ms(
                    runs["ingest_512"]
                ),
                "ingest_4096_leaves_per_sec": runs["ingest_4096"][
                    "leaves_per_sec_steady"
                ],
                "ingest_4096_trigger_ms_median": steady_trigger_ms(
                    runs["ingest_4096"]
                ),
                "restart_exactly_once": runs["ingest_restart"]["exactly_once"],
                "rollup_events_per_sec": runs["rollup_sf1"][
                    "events_per_sec_steady"
                ],
                "rollup_trigger_ms_median": steady_trigger_ms(
                    runs["rollup_sf1"]
                ),
                "rollup_complete": runs["rollup_sf1"]["complete"],
            }
        )
    print(json.dumps({"metric": "streaming_width_grid", "rows": rows}, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
