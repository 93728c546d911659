"""Compaction: many small streaming-sink files -> few files, same data."""

from __future__ import annotations

from pyspark.sql import functions as F

from ct_clickhouse_spark.plans.maintenance import compact_parquet, data_file_stats
from tests.conftest import SF_DIR


def test_compaction_reduces_files_preserves_data(spark, tmp_path):
    from ct_clickhouse_spark.cert_domains import build_cert_domains
    from pyspark.sql import functions as F

    path = str(tmp_path / "fragmented")
    # simulate a streaming sink: 24 tiny files across month partitions
    df = build_cert_domains(spark, SF_DIR).withColumn(
        "month", F.date_format("ts", "yyyyMM")
    )
    df.repartition(24).write.partitionBy("month").parquet(path)

    before_rows = spark.read.parquet(path).count()
    before_sig = (
        spark.read.parquet(path).selectExpr("sum(cast(xxhash64(fingerprint, domain) as decimal(38,0))) s")
        .collect()[0].s
    )
    n_before, _ = data_file_stats(spark, path)
    assert n_before > 30  # 24 repartitions x several months

    b, a = compact_parquet(
        spark, path, sort_by=["base_domain", "domain", "fingerprint"]
    )
    assert b == n_before and a < b

    after = spark.read.parquet(path)
    assert after.count() == before_rows
    after_sig = after.selectExpr("sum(cast(xxhash64(fingerprint, domain) as decimal(38,0))) s").collect()[0].s
    assert after_sig == before_sig


def test_delete_where_partition_scoped(spark, tmp_path):
    """ALTER DELETE analog: only partitions containing matches are
    rewritten (unaffected partitions stay byte-identical), matching rows
    are gone, every other row survives."""
    from ct_clickhouse_spark.cert_domains import write_cert_domains
    from ct_clickhouse_spark.plans.maintenance import delete_where

    out = str(tmp_path / "cd")
    write_cert_domains(spark, SF_DIR, out)
    before = spark.read.parquet(out)
    months = sorted(r.month for r in before.select("month").distinct().collect())
    assert len(months) >= 2
    target_month = months[0]
    victim = (
        before.filter(F.col("month") == target_month)
        .select("fingerprint").first().fingerprint
    )
    n_before = before.count()
    n_victim = before.filter(F.col("fingerprint") == victim).count()
    assert n_victim > 0
    victim_months = {
        r.month
        for r in before.filter(F.col("fingerprint") == victim)
        .select("month").distinct().collect()
    }
    untouched = [m for m in months if m not in victim_months]
    assert untouched, "need at least one unaffected partition"

    def listing(month):
        import os
        d = os.path.join(out, f"month={month}")
        return sorted(
            (f, os.path.getsize(os.path.join(d, f)))
            for f in os.listdir(d) if f.endswith(".parquet")
        )

    files_before = {m: listing(m) for m in untouched}
    n_del, n_parts = delete_where(
        spark, out, F.col("fingerprint") == victim, partition_col="month"
    )
    assert n_del == n_victim and n_parts == len(victim_months)
    after = spark.read.parquet(out)
    assert after.filter(F.col("fingerprint") == victim).count() == 0
    assert after.count() == n_before - n_victim
    for m in untouched:
        assert listing(m) == files_before[m], f"partition {m} was rewritten"
    # no-match predicate: no write at all
    assert delete_where(
        spark, out, "fingerprint = 'no-such-fp'", partition_col="month"
    ) == (0, 0)


def test_delete_where_drops_fully_deleted_partition(spark, tmp_path):
    import os

    from ct_clickhouse_spark.plans.maintenance import delete_where

    out = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "id long, p string"
    )
    df.write.partitionBy("p").parquet(out)
    n_del, n_parts = delete_where(spark, out, "p = 'a'", partition_col="p")
    assert (n_del, n_parts) == (2, 1)
    assert not os.path.exists(os.path.join(out, "p=a"))
    assert [r.id for r in spark.read.parquet(out).collect()] == [3]


def test_delete_where_unpartitioned_swap(spark, tmp_path):
    from ct_clickhouse_spark.plans.maintenance import delete_where

    out = str(tmp_path / "u")
    spark.range(100).write.parquet(out)
    n_del, n = delete_where(spark, out, "id % 10 = 0")
    assert n_del == 10 and n == 1
    assert spark.read.parquet(out).count() == 90
    assert spark.read.parquet(out).filter("id % 10 = 0").count() == 0


def test_update_where_partition_scoped(spark, tmp_path):
    import os

    from ct_clickhouse_spark.plans.maintenance import update_where

    out = str(tmp_path / "upd")
    spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0)],
        "id long, p string, v double",
    ).write.partitionBy("p").parquet(out)

    def listing(p):
        d = os.path.join(out, f"p={p}")
        return sorted(
            (f, os.path.getsize(os.path.join(d, f)))
            for f in os.listdir(d) if f.endswith(".parquet")
        )

    b_files = listing("b")
    n_upd, n_parts = update_where(
        spark, out, "id = 1", {"v": "v * 2"}, partition_col="p"
    )
    assert (n_upd, n_parts) == (1, 1)
    rows = {r.id: r.v for r in spark.read.parquet(out).collect()}
    assert rows == {1: 20.0, 2: 20.0, 3: 30.0}
    assert listing("b") == b_files  # untouched partition byte-identical
    import pytest

    with pytest.raises(ValueError, match="partition column"):
        update_where(spark, out, "id = 1", {"p": "'c'"}, partition_col="p")


def test_merge_upsert_keeps_latest_version(spark, tmp_path):
    import os

    from ct_clickhouse_spark.plans.maintenance import merge_upsert

    out = str(tmp_path / "mu")
    spark.createDataFrame(
        [(1, "a", 1, "old1"), (2, "a", 5, "keep2"), (3, "b", 1, "old3")],
        "id long, p string, ver int, payload string",
    ).write.partitionBy("p").parquet(out)

    def listing(p):
        d = os.path.join(out, f"p={p}")
        return sorted(
            (f, os.path.getsize(os.path.join(d, f)))
            for f in os.listdir(d) if f.endswith(".parquet")
        )

    b_files = listing("b")
    updates = spark.createDataFrame(
        [(1, "a", 2, "new1"),     # higher ver -> replaces
         (2, "a", 3, "stale2"),   # LOWER ver -> existing row wins
         (4, "a", 1, "ins4"),     # new key -> insert
         (5, "c", 1, "ins5")],    # new partition -> created
        "id long, p string, ver int, payload string",
    )
    n_up, n_parts = merge_upsert(
        spark, out, updates, ["id"], partition_col="p", version_col="ver"
    )
    # 3 applied (the stale ver=3 row LOSES to the existing ver=5 and is
    # not counted), partitions a and c rewritten
    assert (n_up, n_parts) == (3, 2)
    rows = {r.id: (r.p, r.ver, r.payload) for r in spark.read.parquet(out).collect()}
    assert rows == {
        1: ("a", 2, "new1"),
        2: ("a", 5, "keep2"),
        3: ("b", 1, "old3"),
        4: ("a", 1, "ins4"),
        5: ("c", 1, "ins5"),
    }
    assert listing("b") == b_files  # untouched partition byte-identical
    # idempotent replay: applying the same batch again changes nothing
    merge_upsert(spark, out, updates, ["id"], partition_col="p", version_col="ver")
    again = {r.id: (r.p, r.ver, r.payload) for r in spark.read.parquet(out).collect()}
    assert again == rows


def test_delete_where_keeps_null_predicate_rows(spark, tmp_path):
    """SQL DELETE semantics: rows where the predicate evaluates NULL are
    KEPT (they used to vanish uncounted — neither deleted nor written
    back)."""
    from ct_clickhouse_spark.plans.maintenance import delete_where

    out = str(tmp_path / "np")
    spark.createDataFrame(
        [(1, "a", "x"), (2, "a", None), (3, "a", "y")],
        "id long, p string, name string",
    ).write.partitionBy("p").parquet(out)
    n_del, _ = delete_where(spark, out, "name = 'x'", partition_col="p")
    assert n_del == 1
    assert sorted(r.id for r in spark.read.parquet(out).collect()) == [2, 3]
    # unpartitioned path too
    out2 = str(tmp_path / "np2")
    spark.createDataFrame(
        [(1, "x"), (2, None), (3, "y")], "id long, name string"
    ).write.parquet(out2)
    delete_where(spark, out2, "name = 'x'")
    assert sorted(r.id for r in spark.read.parquet(out2).collect()) == [2, 3]


def test_delete_where_escaped_partition_value(spark, tmp_path):
    """Hive escapes special chars in partition dir names (':' ->
    '%3A'); dropping a fully-deleted partition must locate the real
    directory, not a hand-built unescaped path."""
    import os

    from ct_clickhouse_spark.plans.maintenance import delete_where

    out = str(tmp_path / "esc")
    spark.createDataFrame(
        [(1, "aa:bb"), (2, "plain")], "id long, p string"
    ).write.partitionBy("p").parquet(out)
    assert any(":" not in d and "%3A" in d for d in os.listdir(out) if d.startswith("p="))
    n_del, n_parts = delete_where(spark, out, "p = 'aa:bb'", partition_col="p")
    assert (n_del, n_parts) == (1, 1)
    assert [r.id for r in spark.read.parquet(out).collect()] == [2]
    assert not any("%3A" in d for d in os.listdir(out))


def test_update_where_assignments_see_original_values(spark, tmp_path):
    """All RHS expressions and the predicate evaluate against the
    ORIGINAL row: {'v': 'v * 2', 'w': 'v'} must set w to the OLD v, and
    the predicate must not re-evaluate against the updated column."""
    from ct_clickhouse_spark.plans.maintenance import update_where

    out = str(tmp_path / "orig")
    spark.createDataFrame(
        [(1, "a", 10.0, 0.0)], "id long, p string, v double, w double"
    ).write.partitionBy("p").parquet(out)
    n_upd, _ = update_where(
        spark, out, "v = 10", {"v": "v * 2", "w": "v"}, partition_col="p"
    )
    assert n_upd == 1
    row = spark.read.parquet(out).collect()[0]
    assert (row.v, row.w) == (20.0, 10.0)


def test_merge_upsert_duplicate_update_keys_deterministic(spark, tmp_path):
    """A batch with duplicate same-key rows and no version column must
    resolve deterministically (content-hash tiebreak): replaying the
    merge converges instead of flapping with task order."""
    from ct_clickhouse_spark.plans.maintenance import merge_upsert

    out = str(tmp_path / "dup")
    spark.createDataFrame(
        [(1, "a", "orig")], "id long, p string, payload string"
    ).write.partitionBy("p").parquet(out)
    updates = spark.createDataFrame(
        [(1, "a", "xx"), (1, "a", "yy")], "id long, p string, payload string"
    )
    merge_upsert(spark, out, updates, ["id"], partition_col="p")
    first = spark.read.parquet(out).collect()[0].payload
    assert first in ("xx", "yy")
    for _ in range(3):
        merge_upsert(
            spark, out, updates.repartition(5), ["id"], partition_col="p"
        )
        assert spark.read.parquet(out).collect()[0].payload == first


def test_merge_upsert_rejects_null_batch_partition(spark, tmp_path):
    """A NULL partition value in the update batch never matches isin(),
    so the merge would exclude the existing NULL-partition rows while
    dynamic overwrite still rewrote that directory with only the batch
    rows — silently dropping data. Guarded like delete/update_where."""
    import pytest

    from ct_clickhouse_spark.plans.maintenance import merge_upsert

    out = str(tmp_path / "mun")
    spark.createDataFrame(
        [(1, "a", "orig"), (2, None, "null-part")],
        "id long, p string, payload string",
    ).write.partitionBy("p").parquet(out)
    updates = spark.createDataFrame(
        [(3, None, "ins")], "id long, p string, payload string"
    )
    with pytest.raises(ValueError, match="NULL"):
        merge_upsert(spark, out, updates, ["id"], partition_col="p")
    # nothing was rewritten: the NULL-partition row survives intact
    rows = {r.id: r.payload for r in spark.read.parquet(out).collect()}
    assert rows == {1: "orig", 2: "null-part"}
