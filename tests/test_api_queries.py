"""Reference API query shapes vs their DuckDB oracles at sf0.001."""

from __future__ import annotations

import pytest

from ct_clickhouse_spark import api_queries
from ct_clickhouse_spark.testing import assert_matches_oracle
from tests.conftest import SF_DIR

ORACLE_BACKED = sorted(set(api_queries.QUERIES) & set(api_queries.ORACLES))


@pytest.mark.parametrize("name", ORACLE_BACKED)
def test_api_query_matches_oracle(spark, duck, name):
    df = api_queries.QUERIES[name](spark, SF_DIR)
    assert_matches_oracle(df, duck, api_queries.ORACLES[name], name)


def test_rows_only_queries_run(spark):
    for name in sorted(set(api_queries.QUERIES) - set(api_queries.ORACLES)):
        df = api_queries.QUERIES[name](spark, SF_DIR)
        assert df.count() >= 0, name


def test_topk_sketch_exact_at_small_cardinality(spark):
    """While the tracked-item capacity exceeds the key cardinality the
    approx_top_k sketch is exact: it must agree with the groupBy top-10
    (counts compared as sets — tie order among equal counts is free)."""
    from ct_clickhouse_spark.cert_domains import build_cert_domains
    from pyspark.sql import functions as F

    sketch = {
        (r.base_domain, r.est_count)
        for r in api_queries.base_domain_topk_sketch(spark, SF_DIR).collect()
    }
    cert = build_cert_domains(spark, SF_DIR)
    exact = [
        (r.base_domain, r.n)
        for r in cert.groupBy("base_domain")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "base_domain")
        .collect()
    ]
    cutoff = exact[9][1] if len(exact) >= 10 else 0
    must_have = {(d, n) for d, n in exact if n > cutoff}
    may_have = {(d, n) for d, n in exact if n >= cutoff}
    assert len(sketch) == min(10, len(exact))
    assert must_have <= sketch <= may_have


def test_tld_topk_plans_true_topk(spark):
    """ORDER BY + LIMIT must plan TakeOrderedAndProject, not a full sort
    (the reference hands this to ClickHouse; api/app.py:152-153)."""
    df = api_queries.tld_topk(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_human_readable_size():
    f = api_queries.human_readable_size
    assert f(0) == "0B"
    assert f(1023) == "1023.00B"
    assert f(1024) == "1.00KB"
    assert f(5 * 1024**3) == "5.00GB"
