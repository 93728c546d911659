"""Z-order layout: key correctness (bit interleave), and the actual
data-skipping property — per-file footer stats must cluster EVERY
interleaved column, which a single-column sort cannot do."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ct_clickhouse_spark.catalog import load_table
from ct_clickhouse_spark.plans.clustering import (
    file_span_fractions,
    with_zorder_key,
    zorder_key,
    zorder_write,
)
from tests.conftest import SF_DIR


def test_zorder_key_interleaves_bits(spark):
    # buckets (0b11, 0b01) at 2 bits: dim0 bits land at positions 0 and 2,
    # dim1 at 1 and 3 -> 0b0111 = 7. Second row: (0b10, 0b11) ->
    # dim0: bit1 at pos2 = 4; dim1: bit0 at pos1 = 2, bit1 at pos3 = 8 -> 14.
    df = spark.createDataFrame([(3, 1), (2, 3)], "a long, b long")
    got = [
        r.z for r in df.select(zorder_key([F.col("a"), F.col("b")], bits=2).alias("z"))
        .collect()
    ]
    assert got == [7, 14]


def test_zorder_key_is_monotone_in_each_dim(spark):
    # fixing one dimension, the key grows with the other (locality basis)
    rows = [(a, 5) for a in range(8)]
    df = spark.createDataFrame(rows, "a long, b long")
    keys = [
        r.z
        for r in df.select(zorder_key([F.col("a"), F.col("b")], bits=3).alias("z"))
        .orderBy("a")
        .collect()
    ]
    assert keys == sorted(keys)


def test_with_zorder_key_no_driver_data(spark):
    events = load_table(spark, SF_DIR, "events")
    keyed = with_zorder_key(events, ["user_id", "event_id"])
    assert "_zkey" in keyed.columns
    # bounds frame joins back via broadcast: no shuffle Exchange on the big side
    plan = keyed._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_compact_with_zorder_restores_multi_column_skipping(spark, tmp_path):
    """OPTIMIZE-ZORDER shape: a fragmented unclustered table compacted
    with zorder_by must come out with far fewer files AND per-file
    min/max locality on both z-columns."""
    from ct_clickhouse_spark.plans.maintenance import compact_parquet

    events = load_table(spark, SF_DIR, "events").select("user_id", "event_id", "value")
    path = str(tmp_path / "frag")
    events.repartition(40).write.parquet(path)  # fragmented, unclustered
    before, after = compact_parquet(
        spark, path, zorder_by=["user_id", "event_id"],
        target_file_bytes=64 * 1024,
    )
    assert before == 40 and 1 <= after < 40
    spans = file_span_fractions(spark, path, ["user_id", "event_id"])
    if after >= 4:  # locality is only visible with multiple files
        assert spans["user_id"] < 0.8 and spans["event_id"] < 0.8, spans
    # data survived intact
    assert spark.read.parquet(path).count() == events.count()


def test_zorder_write_clusters_both_columns(spark, tmp_path):
    """The point of z-order: after zorder_write on (user_id, event_id),
    the mean per-file span fraction of BOTH columns is far below 1 (each
    file owns a contiguous Morton range ~ sqrt locality per dim), while a
    linear sort on user_id leaves event_id unclustered (~1.0)."""
    events = load_table(spark, SF_DIR, "events").select("user_id", "event_id", "value")
    n_files = 16

    zpath = str(tmp_path / "z")
    zorder_write(events, zpath, ["user_id", "event_id"], n_files)
    zspans = file_span_fractions(spark, zpath, ["user_id", "event_id"])

    lpath = str(tmp_path / "linear")
    (
        events.repartitionByRange(n_files, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(lpath)
    )
    lspans = file_span_fractions(spark, lpath, ["user_id", "event_id"])

    # linear: near-perfect on the sort column, useless on the other
    assert lspans["user_id"] < 0.2
    assert lspans["event_id"] > 0.8
    # z-order: strong on BOTH (sqrt(16)=4 -> ~0.25 ideal; allow slack for
    # bucket quantization and uneven file sizes)
    expect = 1 / math.sqrt(n_files)
    assert zspans["user_id"] < 3 * expect, zspans
    assert zspans["event_id"] < 3 * expect, zspans
