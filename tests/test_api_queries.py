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
