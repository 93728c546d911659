#!/usr/bin/env python
"""DuckDB baseline timings: run every oracle SQL (the equivalent ANSI query)
at the bench scale factor, median of 3 warm runs — the denominator for the
BASELINE.md spark/duckdb ratio table.

Adaptive protocol for big scale factors: a query whose FIRST run exceeds
SLOW_CUTOFF seconds records that single run (at sf1 the O(n^2)
embedding-closure oracle runs for tens of minutes — a warm+median-of-3
protocol would spend an hour re-measuring a number whose noise floor is
irrelevant at that magnitude). Optional argv name filters (substring
match, like verify_driver) rerun a subset."""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = 3
SLOW_CUTOFF = 60.0


def main() -> None:
    import duckdb

    import __spark_entry__ as entrymod
    from ct_clickhouse_spark.catalog import TABLE_NAMES, table_path

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(SF_DIR, t)}')"
        )
    filters = sys.argv[1:]
    timings = {}
    for name, sql in entrymod.oracle_sql().items():
        if filters and not any(f in name for f in filters):
            continue
        t0 = time.time()
        con.execute(sql).df()  # first run: warm-up OR the sample
        first = time.time() - t0
        if first > SLOW_CUTOFF:
            timings[name] = round(first, 4)
        else:
            samples = []
            for _ in range(RUNS):
                t0 = time.time()
                con.execute(sql).df()  # numpy materialization — the
                # symmetric choice to Spark's Arrow toPandas()
                samples.append(time.time() - t0)
            timings[name] = round(statistics.median(samples), 4)
        # progress to stderr so a killed long run still yields data
        print(f"{name}: {timings[name]}", file=sys.stderr, flush=True)
    print(json.dumps({"queries": timings, "sf_dir": SF_DIR}))


if __name__ == "__main__":
    main()
