"""Operator layer: composable DataFrame builders, each paired with a DuckDB
oracle where ANSI-SQL-expressible (driver correctness gate contract).

Modules export two dicts:
  QUERIES: dict[str, Callable[(SparkSession, sf_dir str), DataFrame]]
  ORACLES: dict[str, str]   # subset of QUERIES keys; missing => rows-only
"""
