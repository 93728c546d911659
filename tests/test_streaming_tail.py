"""Change-stream tail over the cert_domains table: every row is delivered
exactly once, including across restarts when new files land."""

from __future__ import annotations

from ct_clickhouse_spark.streaming.tail import tail_cert_domains
from tests.conftest import SF_DIR


def test_tail_delivers_all_rows_then_only_new(spark, tmp_path):
    from pyspark.sql import functions as F

    from ct_clickhouse_spark.cert_domains import write_cert_domains

    table = str(tmp_path / "cert_domains")
    ckpt = str(tmp_path / "ckpt")
    write_cert_domains(spark, SF_DIR, table)
    expected = spark.read.parquet(table).count()

    got: list[dict] = []
    q = tail_cert_domains(spark, table, ckpt, got.extend, available_now=True)
    q.awaitTermination(180)
    assert len(got) == expected
    assert {"ts", "domain", "fingerprint", "san"} <= set(got[0])

    # append a new file (into a fresh month partition, like the ingest
    # sink would) -> restart tail -> only the new rows arrive
    new = (
        spark.read.parquet(table)
        .limit(7)
        .withColumn("domain", F.concat(F.lit("tail-test."), "domain"))
        .drop("month")
    )
    new.write.mode("append").parquet(table + "/month=999912")

    got2: list[dict] = []
    q2 = tail_cert_domains(spark, table, ckpt, got2.extend, available_now=True)
    q2.awaitTermination(180)
    assert len(got2) == 7
    assert all(r["domain"].startswith("tail-test.") for r in got2)
