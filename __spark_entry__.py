"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's
    /subdomains endpoint shape (filter + groupBy + max + orderBy;
    reference: api/app.py:111-116) over the cert_domains fact table."""
    from ct_clickhouse_spark.api_queries import subdomains

    return subdomains(spark, "/root/testdata/sf0.001")


def _modules():
    from ct_clickhouse_spark import api_queries
    from ct_clickhouse_spark.functions import udtfs
    from ct_clickhouse_spark.operators import (
        dedup,
        ingest_batch,
        multimodal,
        relational,
        similarity,
        text,
        windows,
    )

    return [
        api_queries,
        relational,
        windows,
        dedup,
        text,
        similarity,
        multimodal,
        udtfs,
        ingest_batch,
    ]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _modules():
        out.update(mod.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per queries() key (omitted => rows-only)."""
    out: dict[str, str] = {}
    for mod in _modules():
        out.update(mod.ORACLES)
    return out
