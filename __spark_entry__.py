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
# of queries(). The surface is consolidated to EXACTLY 50 queries (41
# oracle-backed + 9 rows-only-by-nature) so every declared query — and
# with it every SURVEY §2 / north-star operator — gets a CORRECTNESS row.
# Oracle-backed entries are emitted first, then rows-only in this order:
_ROWS_ONLY_PRIORITY = [
    "dedup_sketch_signatures",  # scalar h0..h15 + simhash (r1 array-cell err fixed)
    "dedup_lsh_pairs",  # both LSH families (minhash + hyperplane) one slot
    "sim_ivf_topk",
    "rel_sketch_quantiles",
    "text_doc_fingerprint",
    "ref_sketches",
    "ref_table_sizes",
    "mm_decode_features",
    "ingest_parse_batch",
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


def sections() -> dict[str, dict[str, Callable[[SparkSession, str], DataFrame]]]:
    """Per-section callables for merged slots (bench attribution only —
    not part of the driver contract): slot name -> {section -> builder}.
    bench.py times each section beside the slot total so BENCH deltas
    self-attribute without the SURVEY ledger."""
    out: dict[str, dict[str, Callable[[SparkSession, str], DataFrame]]] = {}
    declared = queries()
    for mod in _modules():
        for slot, secs in getattr(mod, "SECTIONS", {}).items():
            if slot in declared:
                out[slot] = secs
    return out
