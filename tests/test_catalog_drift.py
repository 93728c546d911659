"""Schema-drift canary: every fixture table x every sf dir must round-trip
through ``load_table`` to the declared StructType.

Round 2 regression class: the driver regenerated fixtures and ``events.ts``
changed physical type (TIMESTAMP(NANOS) -> TIMESTAMP(MICROS)), which a
type-assuming loader turned into 6 oracle ERRORs. This test reads each
fixture's *physical* parquet schema with pyarrow and then asserts the
loader normalizes it to the catalog's logical schema, so any future fixture
regeneration that shifts a physical type fails here before the driver runs.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from ct_clickhouse_spark.catalog import SCHEMAS, load_table, table_path

SF_DIRS = [
    d
    for d in (
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    )
    if os.path.isdir(d)
]


def _physical_schema(path: str):
    if os.path.isdir(path):
        # Directory-style parquet: any one footer carries the file schema.
        part = next(
            os.path.join(path, f) for f in sorted(os.listdir(path)) if f.endswith(".parquet")
        )
        return pq.read_schema(part)
    return pq.read_schema(path)


@pytest.mark.parametrize("sf_dir", SF_DIRS)
@pytest.mark.parametrize("name", sorted(SCHEMAS))
def test_load_table_roundtrips_physical_schema(spark, sf_dir, name):
    path = table_path(sf_dir, name)
    if not os.path.exists(path):
        pytest.skip(f"{name} not present at {sf_dir}")
    # Physical read must succeed (guards corrupt/renamed fixtures)...
    physical = _physical_schema(path)
    assert physical.names, f"empty physical schema for {name} at {sf_dir}"
    # ...and the loader must normalize whatever is on disk to the declared
    # logical schema (load_table itself raises ValueError on drift).
    df = load_table(spark, sf_dir, name)
    got = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    want = {f.name: f.dataType.simpleString() for f in SCHEMAS[name].fields}
    assert got == want


def test_safe_widening_drift_is_normalized(spark, tmp_path):
    """A regeneration that widens a physical type (here: customer keys
    written as int32 instead of int64, acctbal as float32) must load and
    normalize to the declared schema, not error."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ct_clickhouse_spark.catalog import SCHEMAS

    tbl = pa.table(
        {
            "c_custkey": pa.array([1, 2, 3], pa.int32()),
            "c_name": pa.array(["a", "b", "c"]),
            "c_nationkey": pa.array([0, 1, 2], pa.int16()),
            "c_acctbal": pa.array([1.5, 2.5, 3.5], pa.float32()),
            "c_mktsegment": pa.array(["X", "Y", "Z"]),
        }
    )
    pq.write_table(tbl, str(tmp_path / "customer.parquet"))
    df = load_table(spark, str(tmp_path), "customer")
    got = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    want = {f.name: f.dataType.simpleString() for f in SCHEMAS["customer"].fields}
    assert got == want
    assert df.count() == 3


def test_real_drift_still_fails_fast(spark, tmp_path):
    """Narrowing or semantic changes are NOT silently cast: a string
    where a number is declared must raise, naming the column."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "r_regionkey": pa.array(["0", "1"]),  # string, declared int
            "r_name": pa.array(["A", "B"]),
        }
    )
    pq.write_table(tbl, str(tmp_path / "region.parquet"))
    with pytest.raises(ValueError, match="r_regionkey"):
        load_table(spark, str(tmp_path), "region")


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_events_ts_is_usable_timestamp(spark, sf_dir):
    """The exact round-2 failure: ts must be an actual timestamp that
    supports interval arithmetic after loading, whatever the file stored."""
    from pyspark.sql import functions as F

    events = load_table(spark, sf_dir, "events")
    row = (
        events.select(
            F.min("ts").alias("lo"),
            F.max(F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("hi"),
        )
        .collect()[0]
    )
    assert row.lo is not None and row.hi is not None and row.hi > row.lo


def test_read_events_propagates_non_nanos_errors(spark):
    """A missing path must raise the real error, NOT flip the session-wide
    nanosAsLong conf as a side effect of a blanket retry."""
    from ct_clickhouse_spark.catalog import _read_events

    conf_key = "spark.sql.legacy.parquet.nanosAsLong"
    before = spark.conf.get(conf_key, None)
    with pytest.raises(Exception) as exc:
        _read_events(spark, "/root/testdata/does-not-exist/events.parquet")
    assert "NANOS" not in str(exc.value)
    assert spark.conf.get(conf_key, None) == before


def test_tz_sensitive_cast_requires_utc_session(spark, tmp_path):
    """timestamp -> timestamp_ntz renders the instant in the session
    timezone; under a non-UTC session the loader must refuse rather than
    silently shift wall-clock values."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "ts": pa.array(
                [datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)],
                pa.timestamp("us", tz="UTC"),  # instant type -> spark TIMESTAMP
            ),
            "user_id": pa.array([1], pa.int64()),
            "event_type": pa.array(["click"]),
            "value": pa.array([1.0], pa.float64()),
            "props": pa.array(["{}"]),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    tz_key = "spark.sql.session.timeZone"
    spark.conf.set(tz_key, "America/New_York")
    try:
        with pytest.raises(ValueError, match="timezone"):
            load_table(spark, str(tmp_path), "events")
    finally:
        spark.conf.set(tz_key, "UTC")
    # back under UTC the same fixture loads and keeps the UTC wall clock
    df = load_table(spark, str(tmp_path), "events")
    ts = df.select("ts").collect()[0].ts
    assert ts == datetime.datetime(2024, 1, 1)
