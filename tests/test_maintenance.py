"""Compaction: many small streaming-sink files -> few files, same data."""

from __future__ import annotations

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
