#!/usr/bin/env python
"""Compose the sf10 matched Spark-vs-DuckDB table (r12 verdict #3) from a
CORRECTNESS_sf10_*.json certification artifact.

The certification already runs both engines on the same box, same data,
same session (certify_sf10.py records `spark_sec` next to `oracle_sec`
per oracle-mode slot — the matched-state protocol of
BENCH_matched_r10_sf1.json, just at sf10). This script only AGGREGATES:
per-slot ratio, the excused-class tags, and the headline
oracle-comparable ratio. Non-oracle slots (surrogate / pytest modes) have
no DuckDB denominator and are listed separately with their Spark time.

Excused classes (same two the sf1 table tags — both are protocol
artifacts, not engine wins/losses):
  floor  — the DuckDB oracle finishes under ~150 ms, below Spark's fixed
           local-mode job-scheduling floor; the ratio measures the floor,
           not the operator.
  kernel — the Spark side does real kernel work the oracle reads
           precomputed columns for (mm_media_stats decodes four codecs
           per row; its closed-form oracle is a byte-arithmetic scan).

Usage: python scripts/sf10_matched_table.py [CORRECTNESS_sf10_rN.json]
With no argument, the NEWEST full (all-slot) certification ledger is
used, ordered by content (verify_driver.sf10_cert_order_key), never
filesystem mtime. Slots with ok=false never enter the ratio (r13
advice #5 — a failed-verdict slot's timings are not a matched pair).
Prints the markdown table + one JSON summary line.
"""

from __future__ import annotations

import glob
import json
import os
import sys

FLOOR_ORACLE_SEC = 0.15
KERNEL_SLOTS = {"mm_media_stats"}


def _newest_full_cert() -> str:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from verify_driver import sf10_cert_order_key

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cands = glob.glob(os.path.join(repo, "CORRECTNESS_sf10_*.json"))
    # partial overlays (single-slot re-certs) are not a matched TABLE —
    # require the full slot census
    full = [
        p for p in cands if len(json.load(open(p)).get("queries", {})) >= 40
    ]
    if not full:
        raise SystemExit("no full CORRECTNESS_sf10_*.json ledger found")
    return max(full, key=sf10_cert_order_key)


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else _newest_full_cert()
    cert = json.load(open(path))
    queries = cert["queries"]

    matched = []
    unmatched = []
    skipped_not_ok = []
    for name, rec in queries.items():
        if not rec.get("ok"):
            skipped_not_ok.append(name)
        elif rec.get("mode") == "oracle" and rec.get("oracle_sec"):
            matched.append((name, rec))
        else:
            unmatched.append((name, rec))

    matched.sort(key=lambda kv: kv[1]["spark_sec"] / kv[1]["oracle_sec"], reverse=True)

    def tag(name: str, rec: dict) -> str:
        if name in KERNEL_SLOTS:
            return "kernel"
        if rec["oracle_sec"] < FLOOR_ORACLE_SEC:
            return "floor"
        return ""

    print(f"| slot | spark s | duckdb s | ratio | excused |")
    print("|---|---|---|---|---|")
    tot_s = tot_o = exc_s = exc_o = 0.0
    n_excused = 0
    for name, rec in matched:
        s, o = rec["spark_sec"], rec["oracle_sec"]
        t = tag(name, rec)
        tot_s += s
        tot_o += o
        if t:
            exc_s += s
            exc_o += o
            n_excused += 1
        print(f"| {name} | {s:.2f} | {o:.2f} | {s / o:.2f}x | {t} |")

    core_s, core_o = tot_s - exc_s, tot_o - exc_o
    summary = {
        "source": os.path.basename(path),
        "generated_utc": cert.get("generated_utc"),
        "skipped_not_ok": skipped_not_ok,
        "sf_dir": cert.get("sf_dir"),
        "n_matched": len(matched),
        "n_excused": n_excused,
        "spark_sec_total": round(tot_s, 1),
        "duckdb_sec_total": round(tot_o, 1),
        "ratio_all": round(tot_s / tot_o, 3),
        "spark_sec_core": round(core_s, 1),
        "duckdb_sec_core": round(core_o, 1),
        "ratio_core": round(core_s / core_o, 3),
        "unmatched": {
            name: {"mode": rec.get("mode"), "spark_sec": rec.get("spark_sec")}
            for name, rec in unmatched
        },
    }
    print()
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
