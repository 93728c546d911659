"""Change-stream tail (SURVEY T5/S8): the reference's /stream endpoint
re-polls ClickHouse with `ts > last` every 2 s (api/app.py:258-272) — a
fake change stream with skip bugs (SURVEY §3.3 step 4).

This is the real thing: a Structured Streaming file source over the
cert_domains table directory. New Parquet files appended by the ingest
pipeline become micro-batches; offsets live in the checkpoint, so there is
no boundary-timestamp race at all. ``foreachBatch`` hands each batch to a
push callback (SSE/websocket writer in serving; a list collector in tests).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StringType, StructField

from ..catalog import CERT_DOMAINS_SCHEMA


def tail_cert_domains(
    spark: SparkSession,
    table_path: str,
    checkpoint: str,
    on_rows: Callable[[list[dict]], None],
    available_now: bool = True,
    poll_seconds: int = 2,
) -> StreamingQuery:
    """Start the tail; on_rows receives each micro-batch as row dicts,
    ordered within the batch by (ts, fingerprint, domain)."""
    schema = CERT_DOMAINS_SCHEMA.add(StructField("month", StringType()))
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", "8").parquet(
        table_path
    )

    def _push(batch_df: DataFrame, epoch_id: int) -> None:
        rows = (
            batch_df.orderBy("ts", "fingerprint", "domain")
            .drop("month")
            .withColumn("san", F.array_join("san", ";"))
            .collect()
        )
        if rows:
            on_rows([r.asDict() for r in rows])

    writer = stream.writeStream.foreachBatch(_push).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        # the reference polls every 2 s (api/app.py:272)
        writer = writer.trigger(processingTime=f"{poll_seconds} seconds")
    return writer.start()
