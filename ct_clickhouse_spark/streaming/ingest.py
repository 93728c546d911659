"""Streaming ingest pipeline: CT entries -> cert_domains table.

The reference's whole ingestion program (ingestion/ct_ingestor.py:151-230)
as ONE declarative streaming query:

  ct_log source (per-log partitions, checkpointed offsets)
    -> mapInPandas X.509 parse (functions/x509.py)       # ct_ingestor.py:184-187
    -> base-domain pandas UDF (functions/domains.py)     # ct_ingestor.py:146-147
    -> explode(domains) to per-domain rows               # ct_ingestor.py:189-203
    -> dropDuplicatesWithinWatermark on (fingerprint, domain)
    -> Parquet sink partitioned by month, checkpointed   # ct_ingestor.py:205-226

Differences from the reference, by design:
- REAL dedup: the reference only claims it (README.md:19); its insert path
  is at-least-once (crash between insert and offset write re-inserts,
  ct_ingestor.py:224-226). Here offsets commit atomically with the sink
  (exactly-once) AND dropDuplicatesWithinWatermark removes cross-batch
  duplicates with *bounded* state — unbounded dropDuplicates state is the
  100 TB trap (SURVEY §7 risk register).
- ts is still processing-time (reference: datetime.utcnow(),
  ct_ingestor.py:191) for parity; the watermark column is ts so late data
  semantics kick in if a real event-time is substituted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..functions.domains import base_domain_udf
from ..functions.x509 import parse_entries
from ..sources.ct_log import register

WATERMARK = "1 hour"


def ingest_stream(
    spark: SparkSession,
    log_dir: str | None = None,
    max_per_trigger: int = 512,
    urls: str | None = None,
    watermark: str = WATERMARK,
) -> DataFrame:
    """The unbounded cert_domains DataFrame (pre-sink). Source = either a
    recorded log directory (``log_dir``) or live HTTP endpoints
    (``urls`` = "Name=http://...," — the reference's transport,
    ct_ingestor.py:100-111).

    ``watermark`` bounds the dedup state horizon (default 1 hour — the
    production late-data allowance). The state-drain bench
    (scripts/bench_streaming.py --only drain) shortens it so a
    minutes-long run crosses the horizon and the state plateau/drain is
    *observed* rather than extrapolated from rate x horizon."""
    register(spark)
    reader = spark.readStream.format("ct_log").option(
        "maxEntriesPerTrigger", str(max_per_trigger)
    )
    if urls is not None and log_dir is not None:
        # mirror the source's own give-either-not-both contract instead
        # of silently dropping the path option
        raise ValueError("ingest_stream: give log_dir OR urls, not both")
    if urls is not None:
        reader = reader.option("urls", urls)
    else:
        if log_dir is None:
            raise ValueError("ingest_stream: give log_dir or urls")
        reader = reader.option("path", log_dir)
    raw = reader.load()
    parsed = parse_entries(raw)
    exploded = (
        # ts stays TIMESTAMP (not NTZ) until after the stateful dedup:
        # watermarks are only legal on TIMESTAMP columns
        parsed.withColumn("ts", F.current_timestamp())
        .withColumn("domain", F.explode("domains"))
        .withColumn("base_domain", base_domain_udf(F.col("domain")))
        .withColumn("log_name", F.regexp_replace("log_name", " ", "_"))
        .select(
            "ts",
            "domain",
            "base_domain",
            "fingerprint",
            "issuer",
            "subject",
            F.col("domains").alias("san"),
            "not_before",
            "not_after",
            "log_name",
        )
    )
    deduped = exploded.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["fingerprint", "domain"]
    )
    # normalize to the catalog's TIMESTAMP_NTZ after the stateful stage
    return deduped.withColumn("ts", F.col("ts").cast("timestamp_ntz"))


def start_ingest(
    spark: SparkSession,
    log_dir: str | None,
    table_path: str,
    checkpoint: str,
    available_now: bool = True,
    urls: str | None = None,
    max_per_trigger: int = 512,
    processing_time: str = "5 seconds",
    watermark: str = WATERMARK,
) -> StreamingQuery:
    """Start the ingest query. availableNow=True is the backfill/test mode
    (reference T4: frozen-log completion); the live-mode defaults mirror
    the reference's knobs — POLL_INTERVAL=5 s / BATCH_SIZE=512
    (ct_ingestor.py:24-25). The throughput bench
    (scripts/bench_streaming.py) overrides processing_time='0 seconds'
    to run triggers back-to-back and measure engine rate rather than the
    poll cadence."""
    df = ingest_stream(
        spark,
        log_dir,
        max_per_trigger=max_per_trigger,
        urls=urls,
        watermark=watermark,
    ).withColumn("month", F.date_format("ts", "yyyyMM"))
    writer = (
        df.writeStream.format("parquet")
        .option("path", table_path)
        .option("checkpointLocation", checkpoint)
        .partitionBy("month")
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def start_incremental_dedup(
    stream: DataFrame,
    corpus_bloom: list[int],
    corpus_keys: DataFrame,
    key: str,
    out_path: str,
    checkpoint: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Continuous vs-CORPUS dedup of an ingest stream — the streaming
    composition of ``operators.dedup.incremental_dedup``. Within-stream
    dedup is ``dropDuplicatesWithinWatermark`` (ingest_stream above);
    this removes rows whose ``key`` already exists in the HISTORICAL
    corpus, per micro-batch via foreachBatch:

    - the corpus Bloom sketch (the maintained artifact
      ``incremental_dedup`` documents) routes each batch: bloom-negative
      rows are definitely new and skip the anti-join;
    - the bloom-positive sliver is confirmed against ``corpus_keys``
      exactly, so false positives never drop a genuinely new row.

    foreachBatch is at-least-once; writing each batch's survivors into
    a ``batch_id=<id>`` partition with dynamic partition overwrite makes
    replay idempotent (a retried batch rewrites ITS OWN partition with
    the same rows, never appending duplicates or touching other
    batches) — the same upgrade-to-exactly-once the rollup sink uses
    with window ids. The sketch is a point-in-time snapshot of the
    corpus — rows arriving twice ACROSS batches are the within-stream
    dedup's job, not this operator's."""
    from ..operators.dedup import incremental_dedup

    def _dedup_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        survivors = incremental_dedup(
            batch, corpus_keys, key, prebuilt_bloom=corpus_bloom
        )
        (
            survivors.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_path)
        )

    writer = stream.writeStream.option(
        "checkpointLocation", checkpoint
    ).foreachBatch(_dedup_batch)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
