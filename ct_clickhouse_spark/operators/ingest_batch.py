"""Batch view of the ingestion dataflow, driver-visible.

The streaming pipeline (streaming/ingest.py) is exercised in tests; this
module exposes the same parse -> explode -> base-domain -> dedup chain as
batch ``queries()`` entries over the committed recorded-log fixture
(tests/fixtures/ct_logs — deterministic generated certs), so the driver's
gate also sees the X.509 parse UDF (F12), the RFC 6962 slicing (F11), the
explode fan-out (F15), the PSL base-domain UDF (F8), and exact dedup (D1)
end-to-end. Rows-only: certificate parsing has no ANSI-SQL oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.domains import base_domain_udf
from ..functions.x509 import parse_entries

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "tests",
    "fixtures",
    "ct_logs",
)


def _raw_entries_distributed(
    spark: SparkSession, log_dir: str = FIXTURE_DIR
) -> DataFrame:
    """Recorded get-entries wire format -> (log_name, entry_index,
    leaf_input binary) — the batch twin of the ct_log source's read(),
    as a DISTRIBUTED text scan (one split per file, and per HDFS block
    at scale): log_name from the file path, leaf decoded with JVM
    expressions — no driver-side file loop, no createDataFrame of
    materialized rows. entry_index is null: a global line number is not
    available to a parallel scan, and nothing downstream of the parse
    uses it (dedup is by fingerprint/domain); the streaming source is
    the component that tracks real offsets."""
    lines = spark.read.text(os.path.join(log_dir, "*", "entries.jsonl"))
    return lines.select(
        F.regexp_extract(
            F.input_file_name(), r".*/([^/]+)/entries\.jsonl", 1
        ).alias("log_name"),
        F.lit(None).cast("long").alias("entry_index"),
        F.unbase64(F.get_json_object("value", "$.leaf_input")).alias(
            "leaf_input"
        ),
    )


def parsed_cert_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full ingest chain in batch: parse -> explode -> base_domain ->
    dedup by (fingerprint, domain). sf_dir is unused (fixture-driven) but
    kept for the queries() signature. Input comes from the distributed
    text scan (_raw_entries_distributed) — the whole chain is
    executor-side end to end."""
    parsed = parse_entries(_raw_entries_distributed(spark))
    return (
        parsed.withColumn("domain", F.explode("domains"))
        .withColumn("base_domain", base_domain_udf(F.col("domain")))
        .withColumn("log_name", F.regexp_replace("log_name", " ", "_"))
        .dropDuplicates(["fingerprint", "domain"])
        .select("log_name", "fingerprint", "domain", "base_domain", "issuer")
    )


def parse_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-log ingest summary: parsed certs and exploded unique domains
    (garbage / precert leaves silently skipped, ct_ingestor.py:186-187)."""
    rows = parsed_cert_domains(spark, sf_dir)
    return rows.groupBy("log_name").agg(
        F.countDistinct("fingerprint").alias("n_certs"),
        F.count(F.lit(1)).alias("n_domains"),
    )


# parse_summary stays as a library function + pytest; as a driver query it
# was redundant with ingest_parse_batch (it is a projection of it).
QUERIES = {
    "ingest_parse_batch": parsed_cert_domains,  # rows-only (X.509 parse)
}

ORACLES: dict[str, str] = {}
