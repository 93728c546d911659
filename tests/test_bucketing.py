"""Bucketed co-located joins: the 100 TB fact-fact join strategy.

SCALING.md claims bucketing on the join key removes the exchange from
lineitem ⋈ orders entirely — this test proves it at the plan level:
both tables written with bucketBy(8, key) -> the sort-merge join reads
bucket-aligned files and the physical plan contains NO shuffle Exchange.
"""

from __future__ import annotations

import re

import pytest

from ct_clickhouse_spark.catalog import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("warehouse"))
    load_table(spark, SF_DIR, "lineitem").write.bucketBy(8, "l_orderkey").sortBy(
        "l_orderkey"
    ).mode("overwrite").option("path", wh + "/li_b").saveAsTable("li_bucketed")
    load_table(spark, SF_DIR, "orders").write.bucketBy(8, "o_orderkey").sortBy(
        "o_orderkey"
    ).mode("overwrite").option("path", wh + "/o_b").saveAsTable("orders_bucketed")
    yield
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    joined = spark.table("li_bucketed").join(
        spark.table("orders_bucketed"),
        spark.table("li_bucketed").l_orderkey == spark.table("orders_bucketed").o_orderkey,
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    # co-located buckets: join without any Exchange (shuffle) operator
    assert re.search(r"Exchange (hash|range)partitioning", plan) is None, plan[:2000]
    assert "SortMergeJoin" in plan


def test_bucketed_join_result_matches_plain(spark, bucketed):
    plain = (
        load_table(spark, SF_DIR, "lineitem")
        .join(
            load_table(spark, SF_DIR, "orders"),
            load_table(spark, SF_DIR, "lineitem").l_orderkey
            == load_table(spark, SF_DIR, "orders").o_orderkey,
        )
        .count()
    )
    bucketed_count = (
        spark.table("li_bucketed")
        .join(
            spark.table("orders_bucketed"),
            spark.table("li_bucketed").l_orderkey
            == spark.table("orders_bucketed").o_orderkey,
        )
        .count()
    )
    assert bucketed_count == plain
