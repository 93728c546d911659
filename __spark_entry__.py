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


# The round driver records a correctness row only for the FIRST 50 entries
# of queries(). Ordering is therefore part of the contract: every
# oracle-backed query must come first (each gets a full row-count + schema
# + value-hash row), then rows-only queries in priority order (each gets a
# weaker rows-only row while slots remain). Rows-only entries past the
# window are still exercised by pytest (tests/test_operators.py).
_ROWS_ONLY_PRIORITY = [
    "dedup_minhash_signatures",  # round-1 driver error (array cell) — prove fixed
    "sim_lsh_pairs",
    "sim_ivf_topk",
    "sim_lsh_signatures",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash",
    "win_ntile_approx",
    "text_doc_fingerprint",
    "rel_approx_quantiles",
    "ref_stats_approx",
    "ref_table_sizes",
    "mm_decode_features",
    "ref_topk_sketch",
    "ingest_parse_batch",
    "ingest_parse_summary",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, oracle-backed
    queries first (see ordering note above)."""
    raw: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracles: dict[str, str] = {}
    for mod in _modules():
        raw.update(mod.QUERIES)
        oracles.update(mod.ORACLES)
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name in raw:
        if name in oracles:
            out[name] = raw[name]
    for name in _ROWS_ONLY_PRIORITY:
        if name in raw and name not in out:
            out[name] = raw[name]
    for name in raw:  # safety net for entries missing from the priority list
        if name not in out:
            out[name] = raw[name]
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per queries() key (omitted => rows-only)."""
    out: dict[str, str] = {}
    for mod in _modules():
        out.update(mod.ORACLES)
    return out
