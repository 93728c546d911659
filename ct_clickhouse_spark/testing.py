"""Oracle-differential test helpers (mirrors the round driver's compare).

Normalization: the driver compares row-count + sorted column names +
order-insensitive value hash. We normalize timestamps to second granularity
and floats to 6 significant digits so engine-level representation noise
(ns-vs-us pandas dtypes, float formatting) never masks a real mismatch.
"""

from __future__ import annotations

import datetime
import hashlib
import math


def norm_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="seconds")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return norm_cell(float(v))
    except ImportError:
        pass
    try:
        import numpy as np

        if isinstance(v, np.ndarray):
            return "[" + ",".join(norm_cell(x) for x in v.tolist()) + "]"
        if isinstance(v, np.generic):
            return norm_cell(v.item())
    except ImportError:
        pass
    return str(v)


def frame_signature(cols: list[str], rows) -> tuple[list[str], int, str]:
    """(sorted columns, row count, order-insensitive value hash)."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(norm_cell(r[i]) for i in order) for r in rows)
    digest = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return sorted(cols), len(rows), digest


def duckdb_fixture_connection(sf_dir: str):
    """A DuckDB connection with the 10 fixture tables registered as views,
    exactly like the driver's oracle environment."""
    import duckdb

    from .catalog import TABLE_NAMES, table_path

    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(sf_dir, name)}')"
        )
    return con


def assert_matches_oracle(spark_df, con, oracle_sql: str, name: str = "query") -> None:
    srows = [tuple(r) for r in spark_df.collect()]
    ssig = frame_signature(spark_df.columns, srows)
    res = con.execute(oracle_sql)
    dcols = [d[0] for d in res.description]
    dsig = frame_signature(dcols, res.fetchall())
    assert ssig == dsig, (
        f"{name}: spark {ssig} != duckdb {dsig}"
    )
