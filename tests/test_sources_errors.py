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


def test_pacing_is_relative_to_committed_offset(tmp_path):
    """maxEntriesPerTrigger must clamp latestOffset against the COMMITTED
    offset — clamping in partitions() would silently skip entries."""
    import json
    import os

    from ct_clickhouse_spark.sources.ct_log import CTLogStreamReader

    d = tmp_path / "logs" / "biglog"
    os.makedirs(d)
    (d / "sth.json").write_text(json.dumps({"tree_size": 10}))
    (d / "entries.jsonl").write_text("")

    r = CTLogStreamReader({"path": str(tmp_path / "logs"), "maxentriespertrigger": "3"})
    assert r.initialOffset() == {"biglog": 0}
    # first batch (no commit yet): everything available
    assert r.latestOffset() == {"biglog": 10}
    r.commit({"biglog": 2})
    assert r.latestOffset() == {"biglog": 5}  # 2 committed + 3 paced
    r.commit({"biglog": 5})
    assert r.latestOffset() == {"biglog": 8}


def test_partitions_chunked_at_batch_size(tmp_path):
    import json
    import os

    from ct_clickhouse_spark.sources.ct_log import DEFAULT_BATCH, CTLogStreamReader

    d = tmp_path / "logs" / "biglog"
    os.makedirs(d)
    (d / "sth.json").write_text(json.dumps({"tree_size": 2000}))
    (d / "entries.jsonl").write_text("")

    r = CTLogStreamReader({"path": str(tmp_path / "logs")})
    parts = r.partitions({"biglog": 0}, {"biglog": 1200})
    bounds = sorted((p.start, p.end) for p in parts)
    assert bounds == [(0, DEFAULT_BATCH), (DEFAULT_BATCH, 1024), (1024, 1200)]


def test_read_raises_on_sth_overstating_entries(tmp_path):
    """RFC 6962 lets get-entries lag the STH, and RecordedTransport
    returns [] (not an error) for out-of-range reads: read() must RAISE
    on an empty response so Spark's task retry handles it — before the
    r9 fix the while-until-end loop spun that task forever."""
    import base64
    import json
    import os

    from ct_clickhouse_spark.sources.ct_log import (
        CTLogPartition,
        CTLogStreamReader,
    )

    d = tmp_path / "logs" / "laggy"
    os.makedirs(d)
    (d / "sth.json").write_text(json.dumps({"tree_size": 5}))
    leaf = base64.b64encode(b"\x00" * 20).decode()
    (d / "entries.jsonl").write_text(
        "\n".join(json.dumps({"leaf_input": leaf}) for _ in range(2)) + "\n"
    )

    r = CTLogStreamReader({"path": str(tmp_path / "logs")})
    part = CTLogPartition(r.transport, "laggy", 0, 5)
    it = r.read(part)
    assert next(it)[1] == 0  # in-range entries stream fine
    assert next(it)[1] == 1
    with pytest.raises(IOError, match="lagging"):
        list(it)  # range beyond the recorded entries must fail, not spin


def test_ct_log_register_is_idempotent(spark):
    """register() must be callable unconditionally: re-registering the
    same name raises DATA_SOURCE_ALREADY_EXISTS upstream (the duplicate
    check is JVM-wide even though resolution is session-local), and
    callers just mean 'make sure ct_log is available'."""
    from ct_clickhouse_spark.sources.ct_log import register

    register(spark)
    register(spark)  # second call must not raise
