#!/usr/bin/env python
"""Render the BASELINE.md ratio table from bench.py (Spark) and
scripts/bench_duckdb.py (DuckDB) JSON outputs:

    python bench.py > spark.json
    SPARK_GRAFT_SF_DIR=... python scripts/bench_duckdb.py > duck.json
    python scripts/baseline_table.py spark.json duck.json
"""

from __future__ import annotations

import json
import sys

ROWS_ONLY_NOTE = "rows-only (sketch / FS metadata / stubbed parse or decode)"


def main(spark_path: str, duck_path: str) -> None:
    spark = json.load(open(spark_path))["queries"]
    duck = json.load(open(duck_path))["queries"]
    lines = ["| query | spark s | duckdb s | ratio | note |", "|---|---|---|---|---|"]
    tot_s = tot_d = 0.0
    for name, s in spark.items():
        d = duck.get(name)
        if d is None:
            lines.append(f"| {name} | {s:.3f} | — | — | {ROWS_ONLY_NOTE} |")
        else:
            tot_s += s
            tot_d += d
            ratio = s / d if d else float("inf")
            lines.append(f"| {name} | {s:.3f} | {d:.3f} | {ratio:.2f}x |  |")
    bar = "met" if tot_s <= 2 * tot_d else "NOT met"
    lines.append(
        f"| **oracle-comparable total** | **{tot_s:.1f}** | **{tot_d:.1f}** "
        f"| **{tot_s / tot_d:.2f}x** | bar: within 2x — {bar} |"
    )
    print("\n".join(lines))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
