"""``ct_log`` streaming source — the reference's ingestion loop as a real
Structured Streaming source (SURVEY S1/S2/S7, T1-T4, T6).

Reference behavior being re-expressed (ingestion/ct_ingestor.py):
- discover logs, one shared-nothing worker per log   (:240-247) -> one
  InputPartition per log per micro-batch (Spark tasks = the parallelism)
- per-log offset file advanced after insert           (:169, 224-226) ->
  the offset dict in the streaming-source contract; Spark checkpoints it
  atomically with the sink commit (exactly-once, fixing the reference's
  at-least-once crash window, T3)
- ``get-sth`` tree_size bounds each scan              (:102-105) ->
  ``latestOffset()``
- ``get-entries`` pages of <=512                      (:25, 108-111) ->
  ``maxEntriesPerTrigger`` option (per log, per batch)
- frozen log fully read -> worker exits               (:172-175) -> a
  partition simply stops producing once offset == tree_size

Transport: the reference speaks HTTP to public CT logs. This container is
offline, so the source reads a *recorded log directory* (option ``path``):
one subdirectory per log containing ``sth.json`` ({"tree_size": N}) and
``entries.jsonl`` (one {"leaf_input": base64} per line) — the exact wire
format of get-sth/get-entries responses. An HTTP transport is the same
class with fetch_sth/fetch_entries swapped to requests.get; the offset and
partitioning logic — the part Spark cares about — is identical.

Output schema: (log_name string, entry_index long, leaf_input binary).
"""

from __future__ import annotations

import base64
import json
import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SCHEMA = StructType(
    [
        StructField("log_name", StringType()),
        StructField("entry_index", LongType()),
        StructField("leaf_input", BinaryType()),
    ]
)

DEFAULT_BATCH = 512  # reference BATCH_SIZE (ct_ingestor.py:25)


def _discover_logs(path: str) -> list[str]:
    """Log names = subdirectories with an sth.json (the reference filters
    its log list to usable logs, ct_ingestor.py:77-97; recorded dirs are
    usable by construction)."""
    return sorted(
        d
        for d in os.listdir(path)
        if os.path.isfile(os.path.join(path, d, "sth.json"))
    )


def _tree_size(path: str, log: str) -> int:
    with open(os.path.join(path, log, "sth.json")) as f:
        return int(json.load(f)["tree_size"])


class CTLogPartition(InputPartition):
    def __init__(self, path: str, log: str, start: int, end: int):
        self.path = path
        self.log = log
        self.start = start
        self.end = end


class CTLogStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("ct_log source requires a 'path' option")
        self.max_per_trigger = int(options.get("maxentriespertrigger", DEFAULT_BATCH))
        self._committed: dict | None = None  # last offset Spark committed

    def initialOffset(self) -> dict:
        # offset 0 for every discovered log == the reference's fresh
        # offset files (ct_ingestor.py:26-38)
        return {log: 0 for log in _discover_logs(self.path)}

    def latestOffset(self) -> dict:
        """get-sth tree_size per log (ct_ingestor.py:102-105), paced by
        maxEntriesPerTrigger *relative to the committed offset* — pacing
        must happen here, not in partitions(): the end offset returned is
        what Spark records for the batch, so clamping later would silently
        skip the clamped-off entries."""
        sizes = {log: _tree_size(self.path, log) for log in _discover_logs(self.path)}
        if self._committed is None:
            return sizes  # first batch (or restart): take all available
        return {
            log: min(size, self._committed.get(log, 0) + self.max_per_trigger)
            for log, size in sizes.items()
        }

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        # one partition per <=DEFAULT_BATCH chunk per log: mirrors the
        # reference's get-entries paging (ct_ingestor.py:108-111) and gives
        # intra-log parallelism on backfill
        parts: list[InputPartition] = []
        for log, hi in end.items():
            lo = start.get(log, 0)
            for chunk_lo in range(lo, hi, DEFAULT_BATCH):
                parts.append(
                    CTLogPartition(self.path, log, chunk_lo, min(chunk_lo + DEFAULT_BATCH, hi))
                )
        return parts

    def read(self, partition: CTLogPartition) -> Iterator[tuple]:
        # get-entries [start, end) — recorded wire format
        entries_file = os.path.join(partition.path, partition.log, "entries.jsonl")
        with open(entries_file) as f:
            for idx, line in enumerate(f):
                if idx >= partition.end:
                    break
                if idx < partition.start:
                    continue
                leaf_b64 = json.loads(line)["leaf_input"]
                yield (partition.log, idx, base64.b64decode(leaf_b64))

    def commit(self, end: dict) -> None:
        # the reference writes offset files here (ct_ingestor.py:224-226);
        # Spark's checkpoint does it transactionally for us — we only keep
        # the high-water mark for latestOffset pacing.
        self._committed = dict(end)


class CTLogDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "ct_log"

    def schema(self) -> StructType:
        return SCHEMA

    def streamReader(self, schema: StructType) -> CTLogStreamReader:
        return CTLogStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(CTLogDataSource)
