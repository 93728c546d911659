"""cert_domains synthesis: Spark and DuckDB dialects must build the
identical relation — this underpins every parity oracle."""

from __future__ import annotations

from ct_clickhouse_spark.cert_domains import (
    build_cert_domains,
    cert_domains_duckdb_sql,
)
from ct_clickhouse_spark.testing import frame_signature
from tests.conftest import SF_DIR


def test_spark_duckdb_identical_relation(spark, duck):
    df = build_cert_domains(spark, SF_DIR)
    srows = [tuple(r) for r in df.collect()]
    ssig = frame_signature(df.columns, srows)

    res = duck.execute(cert_domains_duckdb_sql())
    dcols = [d[0] for d in res.description]
    dsig = frame_signature(dcols, res.fetchall())
    assert ssig == dsig


def test_shape_and_duplicates(spark):
    df = build_cert_domains(spark, SF_DIR)
    n = df.count()
    n_distinct = df.distinct().count()
    # ~5% of certs are duplicated wholesale (cert_id % 20 == 0)
    assert n > n_distinct > 0
    # fingerprint is 64-char hex (FixedString(64) parity, init.sql:8)
    bad = df.filter("length(fingerprint) != 64").count()
    assert bad == 0
    # grain: one row per (cert, SAN name): every domain appears in its san
    from pyspark.sql import functions as F

    missing = df.filter(~F.array_contains("san", F.col("domain"))).count()
    assert missing == 0


def test_write_physical_layout(spark, tmp_path):
    from ct_clickhouse_spark.cert_domains import write_cert_domains

    out = str(tmp_path / "cert_domains")
    write_cert_domains(spark, SF_DIR, out)
    back = spark.read.parquet(out)
    # month partition column materialized Hive-style (init.sql:17 parity)
    assert "month" in back.columns
    assert back.count() == build_cert_domains(spark, SF_DIR).count()
    # partition pruning: a month-equality predicate must prune the scan
    months = [r.month for r in back.select("month").distinct().collect()]
    plan = back.filter(back.month == months[0])._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(month" in plan
