"""Versioned table layout: atomic publish via commit markers.

The plain-FS table swap in ``maintenance._swap_in`` has a documented
non-atomic window between its two renames (move-aside, move-in) — a
reader listing the path at exactly the wrong moment sees a missing
table. ClickHouse closes this with its metadata layer; lakehouse
formats close it with manifest indirection (Iceberg snapshots, Delta
log). This module is that indirection in its minimal form:

    root/
      v00000001/ ... parquet files ... _COMMITTED
      v00000002/ ... parquet files ... _COMMITTED
      v00000003/ ... parquet files              <- crashed writer: invisible

Readers resolve "current" = the HIGHEST version directory containing the
``_COMMITTED`` marker; writers write a brand-new version directory and
publish it by creating that one marker file (a single atomic create —
there is never a moment with no committed version, and a crash between
"data written" and "marker created" leaves readers on the previous
version; the orphaned directory is swept by ``prune``). Old committed
versions are kept for ``keep`` generations — time travel for free, and
in-flight readers of the previous version never have files deleted out
from under them mid-scan.

Single-writer assumption, stated: concurrent writers could claim the
same version number (ClickHouse mutations serialize the same way). At
100 TB the marker create becomes a metastore/manifest-log CAS; the
reader/writer protocol is unchanged.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from .maintenance import _fs

COMMIT_MARKER = "_COMMITTED"
_VERSION_RE = re.compile(r"^v(\d{8})$")
DEFAULT_KEEP = 2


def _version_dirs(spark: SparkSession, root: str) -> list[tuple[int, str, bool]]:
    """[(version, path, committed)] ascending; [] for a missing root."""
    fs, jroot = _fs(spark, root)
    if not fs.exists(jroot):
        return []
    out = []
    for status in fs.listStatus(jroot):
        if not status.isDirectory():
            continue
        name = status.getPath().getName()
        m = _VERSION_RE.match(name)
        if not m:
            continue
        p = status.getPath().toString()
        _, jmarker = _fs(spark, p + "/" + COMMIT_MARKER)
        out.append((int(m.group(1)), p, fs.exists(jmarker)))
    return sorted(out)


def is_versioned(spark: SparkSession, root: str) -> bool:
    return bool(_version_dirs(spark, root))


def current_path(spark: SparkSession, root: str) -> str:
    """The newest COMMITTED version's directory — what readers scan."""
    committed = [p for _, p, ok in _version_dirs(spark, root) if ok]
    if not committed:
        raise FileNotFoundError(f"no committed version under {root}")
    return committed[-1]


def versions(spark: SparkSession, root: str) -> list[int]:
    """Committed version numbers, ascending — the time-travel surface.
    What is travel-able is exactly what retention kept: ``prune_versions``
    with keep=N guarantees the newest N remain pinned-readable."""
    return [v for v, _, ok in _version_dirs(spark, root) if ok]


def version_path(spark: SparkSession, root: str, version: int) -> str:
    """The directory of a SPECIFIC committed version. Raises
    FileNotFoundError if that version was never committed or has been
    pruned past retention — a pinned read never silently falls back to
    a different snapshot."""
    for v, p, ok in _version_dirs(spark, root):
        if v == version:
            if not ok:
                raise FileNotFoundError(
                    f"version {version} under {root} exists but was never "
                    f"committed (crashed writer) — not readable"
                )
            return p
    raise FileNotFoundError(
        f"no committed version {version} under {root} "
        f"(available: {versions(spark, root)}) — pruned or never written"
    )


def read_versioned(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """Read the newest committed snapshot, or — time travel — a PINNED
    earlier one (``version=N``). The lakehouse contract: a pinned read
    of any version inside the retention window (`keep` newest) sees
    byte-identical data no matter how many rewrites commit after it,
    because published version directories are immutable (writers only
    ever create NEW directories; prune only deletes beyond retention)."""
    if version is None:
        return spark.read.parquet(current_path(spark, root))
    return spark.read.parquet(version_path(spark, root, version))


def begin_version(spark: SparkSession, root: str) -> str:
    """Claim the next version directory (uncommitted — invisible to
    readers until ``commit_version``)."""
    dirs = _version_dirs(spark, root)
    nxt = (dirs[-1][0] + 1) if dirs else 1
    return root.rstrip("/") + f"/v{nxt:08d}"


def commit_version(spark: SparkSession, root: str, vpath: str) -> None:
    """Publish a fully written version directory: ONE marker-file create.
    This is the entire commit — nothing is renamed or deleted, so a crash
    on either side of this line leaves a consistent table."""
    fs, jmarker = _fs(spark, vpath.rstrip("/") + "/" + COMMIT_MARKER)
    out = fs.create(jmarker, False)  # fail, don't truncate, if it exists
    out.close()


def init_versioned(
    spark: SparkSession, root: str, df: DataFrame, partition_by: list[str] | None = None
) -> str:
    """Create a versioned table from ``df`` (first committed version)."""
    vpath = begin_version(spark, root)
    writer = df.write
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(vpath)
    commit_version(spark, root, vpath)
    return vpath


def rewrite_versioned(
    spark: SparkSession,
    root: str,
    df: DataFrame,
    partition_by: list[str] | None = None,
    keep: int = DEFAULT_KEEP,
) -> str:
    """Atomically replace the table contents with ``df``: write a new
    version directory, publish it with the marker create, prune old
    generations. The replaced version stays readable throughout."""
    vpath = begin_version(spark, root)
    writer = df.write
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(vpath)
    commit_version(spark, root, vpath)
    prune_versions(spark, root, keep=keep)
    return vpath


def prune_versions(spark: SparkSession, root: str, keep: int = DEFAULT_KEEP) -> int:
    """Delete committed versions beyond the newest ``keep``, plus any
    UNcommitted directory older than the newest committed version (an
    abandoned crashed write — a newer uncommitted dir may be an in-flight
    writer and is left alone). ``keep`` is clamped to >= 1: the CURRENT
    committed version is never deleted by prune (full removal of a table
    is an explicit recursive delete of the root, not a retention
    setting). Returns directories removed."""
    dirs = _version_dirs(spark, root)
    committed = [(v, p) for v, p, ok in dirs if ok]
    if not committed:
        return 0
    newest_committed = committed[-1][0]
    doomed = [p for v, p in committed[: -max(keep, 1)]]
    doomed += [p for v, p, ok in dirs if not ok and v < newest_committed]
    fs, _ = _fs(spark, root)
    n = 0
    for p in doomed:
        _, jp = _fs(spark, p)
        if fs.delete(jp, True):
            n += 1
    return n
