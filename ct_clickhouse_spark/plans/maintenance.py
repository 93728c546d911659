"""Storage maintenance: small-file compaction.

Streaming sinks produce one file per partition per micro-batch (the
reference's 512-row inserts would do the same, ct_ingestor.py:205-221);
MergeTree background merges solve this for ClickHouse (init.sql:16), so a
Parquet engine needs an explicit OPTIMIZE. At 100 TB this runs per
partition on a schedule, rewriting only partitions whose file count or
small-file ratio crosses a threshold.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

TARGET_FILE_BYTES = 128 * 1024 * 1024  # standard HDFS-ish target


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def data_file_stats(spark: SparkSession, path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) under path (recursive, parquet only)."""
    fs, jpath = _fs(spark, path)
    it = fs.listFiles(jpath, True)
    n = total = 0
    while it.hasNext():
        f = it.next()
        if f.getPath().getName().endswith(".parquet"):
            n += 1
            total += f.getLen()
    return n, total


def compact_parquet(
    spark: SparkSession,
    path: str,
    sort_by: list[str] | None = None,
    target_file_bytes: int = TARGET_FILE_BYTES,
    zorder_by: list[str] | None = None,
) -> tuple[int, int]:
    """Rewrite a (possibly partitioned) Parquet table into
    ceil(bytes/target) files, preserving Hive partition columns and
    optionally re-clustering so compaction restores data skipping:
    ``sort_by`` = linear sort-key skipping (MergeTree init.sql:18
    parity, perfect on the leading column); ``zorder_by`` = Morton
    clustering (plans/clustering.py) for balanced min/max skipping on
    EVERY listed column — the OPTIMIZE-ZORDER maintenance shape.

    Returns (files_before, files_after). The rewrite goes through a
    sibling temp dir + two renames; each rename's boolean return is
    checked, and the original directory is restored if the swap-in fails,
    so a reader can never be left with a missing table and the old copy
    is deleted only after the new path verifiably exists. (The window
    between the two renames is the known non-atomicity of plain-FS table
    swaps — a metastore pointer flip removes even that at 100 TB.)
    """
    if sort_by and zorder_by:
        raise ValueError("compact_parquet: give sort_by or zorder_by, not both")
    before, total = data_file_stats(spark, path)
    n_files = max(1, math.ceil(total / target_file_bytes))

    df = spark.read.parquet(path)
    partition_cols = [c for c in df.columns if c == "month"]
    tmp = path.rstrip("/") + "__compacting"
    if zorder_by:
        from .clustering import with_zorder_key

        # range partition on the z-key: each output file owns a
        # contiguous Morton range (per Hive partition when present)
        keyed = with_zorder_key(df, zorder_by)
        range_cols = [*partition_cols, "_zkey"]
        out = (
            keyed.repartitionByRange(n_files, *range_cols)
            .sortWithinPartitions(*range_cols)
            .drop("_zkey")
        )
    else:
        # partitioned tables shuffle on (n_files, partition cols): rows
        # of one Hive partition land in few tasks, total file count
        # ~= n_files
        out = (
            df.repartition(n_files)
            if not partition_cols
            else df.repartition(n_files, *partition_cols)
        )
    if sort_by:
        out = out.sortWithinPartitions(*sort_by)
    writer = out.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(tmp)

    fs, jpath = _fs(spark, path)
    _, jtmp = _fs(spark, tmp)
    trash = path.rstrip("/") + "__old"
    _, jtrash = _fs(spark, trash)
    if not fs.rename(jpath, jtrash):
        fs.delete(jtmp, True)
        raise IOError(f"compact_parquet: failed to move {path} aside to {trash}")
    if not fs.rename(jtmp, jpath):
        # restore the original before surfacing the error
        restored = fs.rename(jtrash, jpath)
        fs.delete(jtmp, True)
        raise IOError(
            f"compact_parquet: failed to swap in compacted data at {path}"
            + ("" if restored else f" AND could not restore original from {trash}")
        )
    if fs.exists(jpath):
        fs.delete(jtrash, True)

    after, _ = data_file_stats(spark, path)
    return before, after


def delete_where(
    spark: SparkSession,
    path: str,
    predicate,
    partition_col: str | None = None,
) -> tuple[int, int]:
    """Row-level delete from a Parquet table — the ClickHouse
    ``ALTER TABLE ... DELETE WHERE`` mutation analog, and the
    right-to-be-forgotten operation a training-data store needs
    (delete every row for a domain/fingerprint/user without rewriting
    the corpus).

    Partition-scoped like the ClickHouse mutation: with
    ``partition_col`` given (a Hive partition column), ONE pruned scan
    finds the partitions containing matches, and only those partitions
    are rewritten (dynamic partition overwrite keeps every other
    partition's files byte-identical — test-asserted). Partitions whose
    every row matches are dropped at the filesystem level (dynamic
    overwrite cannot write an empty partition). Without
    ``partition_col`` the whole table is rewritten through the same
    temp-dir + double-rename swap compaction uses.

    ``predicate`` is a Column or SQL string. Returns
    (rows_deleted, partitions_rewritten_or_dropped); (0, 0) means no
    match — and no write at all.
    """
    from pyspark.sql import functions as F

    cond = F.expr(predicate) if isinstance(predicate, str) else predicate
    df = spark.read.parquet(path)

    if partition_col is None:
        n_del = df.filter(cond).count()
        if n_del == 0:
            return 0, 0
        survivors = df.filter(~cond)
        tmp = path.rstrip("/") + "__deleting"
        survivors.write.mode("overwrite").parquet(tmp)
        fs, jpath = _fs(spark, path)
        _, jtmp = _fs(spark, tmp)
        trash = path.rstrip("/") + "__old"
        _, jtrash = _fs(spark, trash)
        if not fs.rename(jpath, jtrash):
            fs.delete(jtmp, True)
            raise IOError(f"delete_where: failed to move {path} aside")
        if not fs.rename(jtmp, jpath):
            restored = fs.rename(jtrash, jpath)
            fs.delete(jtmp, True)
            raise IOError(
                f"delete_where: failed to swap at {path}"
                + ("" if restored else " AND could not restore original")
            )
        fs.delete(jtrash, True)
        return n_del, 1

    # partition-scoped path: one pruned scan for affected partitions
    affected = (
        df.filter(cond)
        .groupBy(partition_col)
        .agg(F.count(F.lit(1)).alias("_n_del"))
        .collect()
    )
    if not affected:
        return 0, 0
    n_del = sum(int(r._n_del) for r in affected)
    values = [r[partition_col] for r in affected]

    scoped = df.filter(F.col(partition_col).isin(values))
    survivors = scoped.filter(~cond)
    surviving_values = {
        r[partition_col]
        for r in survivors.select(partition_col).distinct().collect()
    }
    if surviving_values:
        (
            survivors.filter(F.col(partition_col).isin(list(surviving_values)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(partition_col)
            .parquet(path)
        )
    # fully-deleted partitions: dynamic overwrite can't express "this
    # partition now has zero rows" — drop their directories
    fs, jpath = _fs(spark, path)
    jvm = spark._jvm
    for v in values:
        if v not in surviving_values:
            pdir = jvm.org.apache.hadoop.fs.Path(
                path.rstrip("/") + f"/{partition_col}={v}"
            )
            fs.delete(pdir, True)
    return n_del, len(values)


def update_where(
    spark: SparkSession,
    path: str,
    predicate,
    assignments: dict,
    partition_col: str,
) -> tuple[int, int]:
    """Row-level update — the ``ALTER TABLE ... UPDATE col = expr WHERE``
    mutation analog, partition-scoped exactly like ``delete_where``:
    one pruned scan finds the partitions containing matches, only those
    rewrite (every other partition's files stay byte-identical), and
    rows that don't match keep their values inside the rewritten
    partitions. ``assignments`` maps column name -> Column or SQL
    string. The partition column itself cannot be assigned (that is a
    row MOVE between directories — express it as delete + insert).
    Returns (rows_updated, partitions_rewritten)."""
    from pyspark.sql import functions as F

    if partition_col in assignments:
        raise ValueError(
            "update_where cannot reassign the partition column — a row "
            "move between partitions is delete + insert"
        )
    cond = F.expr(predicate) if isinstance(predicate, str) else predicate
    df = spark.read.parquet(path)
    affected = (
        df.filter(cond)
        .groupBy(partition_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .collect()
    )
    if not affected:
        return 0, 0
    n_upd = sum(int(r._n) for r in affected)
    values = [r[partition_col] for r in affected]

    scoped = df.filter(F.col(partition_col).isin(values))
    updated = scoped
    for col, expr in assignments.items():
        new_val = F.expr(expr) if isinstance(expr, str) else expr
        updated = updated.withColumn(
            col, F.when(cond, new_val).otherwise(F.col(col))
        )
    (
        updated.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )
    return n_upd, len(values)


def merge_upsert(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: list[str],
    partition_col: str,
    version_col: str | None = None,
) -> tuple[int, int]:
    """Upsert a batch into a partitioned table — the
    ReplacingMergeTree merge analog (ClickHouse dedups rows sharing the
    sort key at merge time, keeping the max ``ver`` when given;
    reference init.sql:16-18 uses plain MergeTree and re-deduplicates
    per query — this is the operator that makes dedup a property of the
    TABLE instead).

    Only partitions the update batch touches are rewritten: existing
    rows of those partitions union the updates, and one row per
    ``key_cols`` survives — highest ``version_col`` (ties broken toward
    the update) or simply the update row when no version column is
    given. Other partitions' files stay byte-identical. New partition
    values insert cleanly (dynamic overwrite creates them). Returns
    (rows_upserted, partitions_rewritten)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    values = [
        r[partition_col]
        for r in updates.select(partition_col).distinct().collect()
    ]
    if not values:
        return 0, 0
    n_upserted = updates.count()

    current = spark.read.parquet(path).filter(
        F.col(partition_col).isin(values)
    )
    cols = current.columns
    tagged = current.select(*cols).withColumn("_is_update", F.lit(0)).unionByName(
        updates.select(*cols).withColumn("_is_update", F.lit(1))
    )
    order = (
        [F.col(version_col).desc(), F.col("_is_update").desc()]
        if version_col
        else [F.col("_is_update").desc()]
    )
    w = Window.partitionBy(*key_cols).orderBy(*order)
    merged = (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_is_update")
    )
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )
    return n_upserted, len(values)
