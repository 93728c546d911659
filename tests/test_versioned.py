"""Versioned-table atomic publish (r4 verdict #7): commit-marker
indirection replaces the two-rename swap window for unpartitioned
rewrites — a crash between "new version written" and "marker created"
must leave readers on the old consistent version."""

from __future__ import annotations

import os

import pytest


def _rows(spark, root):
    from ct_clickhouse_spark.plans.versioned import read_versioned

    return sorted(r.id for r in read_versioned(spark, root).collect())


def test_crash_between_write_and_commit_keeps_old_version(spark, tmp_path):
    from ct_clickhouse_spark.plans import versioned as V

    root = str(tmp_path / "vt")
    df1 = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    V.init_versioned(spark, root, df1)
    assert _rows(spark, root) == [1, 2, 3]

    # crash injection: the new version's data is FULLY written but the
    # process dies before commit_version — readers must not see it
    df2 = spark.createDataFrame([(9,)], "id long")
    vpath = V.begin_version(spark, root)
    df2.write.parquet(vpath)
    assert os.path.isdir(vpath.replace("file:", ""))  # data really on disk
    assert _rows(spark, root) == [1, 2, 3]  # reader still on v1

    # recovery: the next writer's prune sweeps the orphan, then its own
    # rewrite publishes atomically
    df3 = spark.createDataFrame([(7,), (8,)], "id long")
    V.rewrite_versioned(spark, root, df3)
    assert _rows(spark, root) == [7, 8]
    assert V.prune_versions(spark, root) == 0  # idempotent

    dirs = {v: ok for v, _, ok in V._version_dirs(spark, root)}
    # the crashed v2 orphan was swept; v1 retained (keep=2) + v3 current
    assert dirs == {1: True, 3: True}


def test_commit_is_one_marker_create_and_versions_prune(spark, tmp_path):
    from ct_clickhouse_spark.plans import versioned as V

    root = str(tmp_path / "vt2")
    V.init_versioned(spark, root, spark.createDataFrame([(1,)], "id long"))
    for i in range(2, 6):
        V.rewrite_versioned(
            spark, root, spark.createDataFrame([(i,)], "id long")
        )
    assert _rows(spark, root) == [5]
    committed = [v for v, _, ok in V._version_dirs(spark, root) if ok]
    assert len(committed) == V.DEFAULT_KEEP  # older generations pruned
    # previous generation stays readable (in-flight readers)
    prev = [p for v, p, ok in V._version_dirs(spark, root) if ok][0]
    assert sorted(r.id for r in spark.read.parquet(prev).collect()) == [4]
    # double-commit of the same version fails loudly (marker create is
    # exclusive), not silently
    cur = V.current_path(spark, root)
    with pytest.raises(Exception):
        V.commit_version(spark, root, cur)


def test_delete_where_and_compact_on_versioned_table(spark, tmp_path):
    from ct_clickhouse_spark.plans import versioned as V
    from ct_clickhouse_spark.plans.maintenance import (
        compact_parquet,
        delete_where,
    )

    root = str(tmp_path / "vt3")
    V.init_versioned(
        spark,
        root,
        spark.createDataFrame(
            [(i, "x" if i % 2 else "y") for i in range(10)], "id long, tag string"
        ).repartition(6),
    )
    n_del, _ = delete_where(spark, root, "tag = 'y'")
    assert n_del == 5
    assert _rows(spark, root) == [1, 3, 5, 7, 9]
    before, after = compact_parquet(spark, root)
    assert after <= before and after >= 1
    assert _rows(spark, root) == [1, 3, 5, 7, 9]
    # the whole history only ever contains version dirs + markers — no
    # __old / __compacting rename-trash from the plain-FS path
    assert all(
        d.startswith("v") for d in os.listdir(root) if not d.startswith(".")
    )


def test_scoped_mutations_guard_versioned_roots(spark, tmp_path):
    """update_where and merge_upsert must refuse a versioned root with a
    CLEAR error (delete_where's scoped mode already did) instead of a
    misleading UNABLE_TO_INFER_SCHEMA from reading version dirs as
    partitions."""
    from ct_clickhouse_spark.plans import versioned as V
    from ct_clickhouse_spark.plans.maintenance import merge_upsert, update_where

    root = str(tmp_path / "vtg")
    V.init_versioned(
        spark, root, spark.createDataFrame([(1, "a")], "id long, p string")
    )
    upd = spark.createDataFrame([(2, "a")], "id long, p string")
    with pytest.raises(ValueError, match="versioned"):
        update_where(spark, root, "id = 1", {"p": "'b'"}, partition_col="p")
    with pytest.raises(ValueError, match="versioned"):
        merge_upsert(spark, root, upd, ["id"], partition_col="p")


def test_prune_keep_never_deletes_current(spark, tmp_path):
    from ct_clickhouse_spark.plans import versioned as V

    root = str(tmp_path / "vtk")
    V.init_versioned(spark, root, spark.createDataFrame([(1,)], "id long"))
    V.rewrite_versioned(spark, root, spark.createDataFrame([(2,)], "id long"))
    V.prune_versions(spark, root, keep=0)  # clamped to 1
    assert sorted(r.id for r in V.read_versioned(spark, root).collect()) == [2]


def test_time_travel_pinned_reads(spark, tmp_path):
    """v1..v3 committed: each version pin-readable and byte-stable,
    pinned reads of pruned versions fail LOUDLY (never silent fallback),
    and retention keep=N bounds what is travel-able."""
    from ct_clickhouse_spark.plans import versioned as V

    root = str(tmp_path / "tt")
    V.init_versioned(spark, root, spark.createDataFrame([(1,)], "id long"))
    V.rewrite_versioned(
        spark, root, spark.createDataFrame([(2,), (3,)], "id long"), keep=3
    )
    V.rewrite_versioned(
        spark, root, spark.createDataFrame([(4,)], "id long"), keep=3
    )
    assert V.versions(spark, root) == [1, 2, 3]

    def ids(version=None):
        return sorted(
            r.id for r in V.read_versioned(spark, root, version).collect()
        )

    assert ids() == [4]  # newest by default
    assert ids(1) == [1] and ids(2) == [2, 3] and ids(3) == [4]

    # a later rewrite never mutates pinned history inside retention
    V.rewrite_versioned(
        spark, root, spark.createDataFrame([(5,)], "id long"), keep=3
    )
    assert ids(2) == [2, 3] and ids(3) == [4] and ids(4) == [5]
    assert V.versions(spark, root) == [2, 3, 4]  # v1 pruned (keep=3)

    with pytest.raises(FileNotFoundError, match="pruned or never"):
        V.read_versioned(spark, root, 1)
    with pytest.raises(FileNotFoundError, match="no committed version 99"):
        V.read_versioned(spark, root, 99)


def test_time_travel_never_reads_uncommitted(spark, tmp_path):
    """A crashed writer's directory is not a valid pin target."""
    from ct_clickhouse_spark.plans import versioned as V

    root = str(tmp_path / "ttu")
    V.init_versioned(spark, root, spark.createDataFrame([(1,)], "id long"))
    vpath = V.begin_version(spark, root)  # v2, never committed
    spark.createDataFrame([(9,)], "id long").write.parquet(vpath)
    assert V.versions(spark, root) == [1]
    with pytest.raises(FileNotFoundError, match="never .*committed|was never"):
        V.read_versioned(spark, root, 2)
