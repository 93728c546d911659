#!/usr/bin/env python
"""DuckDB baseline timings: run every oracle SQL (the equivalent ANSI query)
at the bench scale factor, median of 3 warm runs — the denominator for the
BASELINE.md spark/duckdb ratio table."""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = 3


def main() -> None:
    import duckdb

    import __spark_entry__ as entrymod
    from ct_clickhouse_spark.catalog import TABLE_NAMES, table_path

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(SF_DIR, t)}')"
        )
    timings = {}
    for name, sql in entrymod.oracle_sql().items():
        con.execute(sql).fetchall()  # warm
        samples = []
        for _ in range(RUNS):
            t0 = time.time()
            con.execute(sql).fetchall()
            samples.append(time.time() - t0)
        timings[name] = round(statistics.median(samples), 4)
    print(json.dumps({"queries": timings, "sf_dir": SF_DIR}))


if __name__ == "__main__":
    main()
