"""Oracle-differential test helpers (mirrors the round driver's compare).

The round driver fetches BOTH sides through pandas (Spark ``toPandas()``,
DuckDB ``.df()``), sorts columns by name, lexsorts rows, and hashes the
stringified values with NO numeric re-normalization. Two consequences,
both observed in round 1 (VERDICT.md "What's wrong"):
- dtype artifacts are REAL mismatches: DuckDB ``sum(INTEGER)`` returns
  HUGEINT -> pandas float64 -> "3.0" vs Spark's int64 "3". Oracles must
  CAST integer sums to BIGINT.
- non-scalar cells (array columns) crash the canonicalization
  (``TypeError: unhashable type: 'list'``); queries must only return
  scalar columns.
``pandas_signature``/``assert_matches_oracle`` reproduce that strict
behavior so local verification agrees with the driver. The older
``frame_signature`` (fetchall + float normalization) remains for unit
tests that compare engine-native row tuples.
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


def _pandas_cell(v) -> str:
    """Driver-faithful cell rendering: str() of the pandas-level value.

    Nulls of any dtype collapse to "NULL" (the one place we are *more*
    lenient than plain str(): pandas renders an int-col null as nan after
    the float64 coercion on one side and None on the other; the driver
    evidently treats them equal since round-1 rollup/cube queries with
    NULL group keys hash-matched). Array/list cells raise — the driver's
    canonicalization crashes on them, so failing loudly here is the
    faithful behavior."""
    import pandas as pd

    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        raise TypeError(
            "non-scalar cell in driver-compared result (array column?) — "
            "the round driver's pandas canonicalization crashes on these"
        )
    if v is None or v is pd.NaT or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    return str(v)


def pandas_signature(pdf) -> tuple[list[str], int, str]:
    """(sorted columns, row count, order-insensitive strict value hash)
    over a pandas DataFrame — the round driver's compare."""
    cols = sorted(pdf.columns)
    lines = sorted(
        "\x01".join(_pandas_cell(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    )
    digest = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return cols, len(pdf), digest


# Significant digits for the tolerance-mode float grid. The sf10
# certification proved exact str(double) hashing scale-unsound for big FP
# aggregates: a sum ~6e12 rounded to 2 decimals needs 15 significant
# digits to render, so engines whose addition orders differ by one ulp
# (rel ~1e-16) render apart. 9 significant digits keeps ~1e-9 relative
# agreement hashing identically while any real divergence (wrong rows,
# wrong aggregation) still splits the hash.
RTOL_SIG_DIGITS = 9


def _grid_cell(v) -> str:
    """Tolerance-mode cell rendering: floats snap to a RELATIVE grid
    (RTOL_SIG_DIGITS significant digits, scientific notation) so
    last-ulp FP-addition-order noise hashes identically on both engines;
    every non-float cell renders exactly as the strict compare does.
    A value that lands exactly on a grid boundary can still round apart
    — which is why the strict hash remains primary and this verdict is
    recorded BESIDE it, not instead of it."""
    if isinstance(v, float) or type(v).__name__.startswith("float"):
        f = float(v)
        if math.isnan(f):
            return "NULL"
        if f == 0.0:
            return "0"  # collapses -0.0 vs 0.0
        if math.isinf(f):
            return "inf" if f > 0 else "-inf"
        return f"{f:.{RTOL_SIG_DIGITS - 1}e}"
    return _pandas_cell(v)


def pandas_signature_rtol(pdf) -> tuple[list[str], int, str]:
    """(sorted columns, row count, order-insensitive RELATIVE-GRID value
    hash): the first-class tolerance verdict for scales where exact
    str(double) hashing is unsound (see _grid_cell). Emitted beside the
    strict hash by scripts/verify_driver.py on every run."""
    cols = sorted(pdf.columns)
    lines = sorted(
        "\x01".join(_grid_cell(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    )
    digest = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return cols, len(pdf), digest


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
    """Strict driver-faithful compare: both sides through pandas, str()
    values, no float re-rounding (see module docstring)."""
    ssig = pandas_signature(spark_df.toPandas())
    dsig = pandas_signature(con.execute(oracle_sql).df())
    assert ssig == dsig, (
        f"{name}: spark {ssig} != duckdb {dsig}"
    )
