"""Source error handling: clear failures beat silent wrong answers."""

from __future__ import annotations

import pytest


def test_ct_log_source_requires_path():
    from ct_clickhouse_spark.sources.ct_log import CTLogStreamReader

    with pytest.raises(ValueError, match="path"):
        CTLogStreamReader({})


def test_catalog_rejects_schema_drift(spark, tmp_path):
    """A table whose file schema drifted must fail fast, not infer."""
    from ct_clickhouse_spark import catalog

    bad_dir = str(tmp_path)
    spark.range(3).selectExpr("id AS r_regionkey", "'x' AS wrong_col").write.parquet(
        bad_dir + "/region.parquet"
    )
    with pytest.raises(ValueError, match="schema drift"):
        catalog.load_table(spark, bad_dir, "region")


def test_tree_size_bounds_entries_read(spark, tmp_path):
    """sth.json tree_size < recorded entries: the source must stop at the
    tree size (a log's STH is authoritative; trailing entries are not yet
    merged into the tree)."""
    from tests.ctgen import make_cert_der, wrap_leaf, write_log_dir

    base = str(tmp_path / "logs")
    leaves = [wrap_leaf(make_cert_der([f"d{i}.example.com"], i + 1)) for i in range(5)]
    write_log_dir(base, "Test Log", leaves, tree_size=3)

    from ct_clickhouse_spark.sources.ct_log import register

    register(spark)
    q = (
        spark.readStream.format("ct_log")
        .option("path", base)
        .load()
        .writeStream.format("memory")
        .queryName("bounded")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM bounded").collect()
    assert len(rows) == 3
    assert sorted(r.entry_index for r in rows) == [0, 1, 2]
