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

Transport: the reference speaks HTTP to public CT logs
(ct_ingestor.py:100-110: requests.get with a 10 s timeout against
``<url>/ct/v1/get-sth`` and ``/ct/v1/get-entries?start=&end=``, where the
server may clamp the returned batch). Both transports exist behind one
seam (``_Transport``):
- ``DirTransport`` (option ``path``): a *recorded log directory* — one
  subdirectory per log containing ``sth.json`` ({"tree_size": N}) and
  ``entries.jsonl`` (one {"leaf_input": base64} per line), the exact wire
  format of the two endpoints. The offline-container default.
- ``HttpTransport`` (option ``urls`` = "Name=https://log/...,..."): live
  polling with stdlib urllib (timeouts, server-side batch clamping
  honored by looping until the range is covered). Exercised in tests
  against a local fixture server, including clamp and error paths.

Eligibility: when option ``registry`` points at a log_list.json, the log
set consulted by initialOffset/latestOffset is filtered through the same
retired/usable/temporal-interval rules as sources/log_list.py (option
``now`` pins the evaluation time) — the reference re-checks its registry
filters daily (ct_ingestor.py:63-70); here every offset poll re-lists and
re-filters, so a log retired mid-stream stops being ingested at the next
micro-batch.

Output schema: (log_name string, entry_index long, leaf_input binary).
"""

from __future__ import annotations

import base64
import json
import os
import urllib.request
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
HTTP_TIMEOUT_SEC = 10.0  # reference timeout (ct_ingestor.py:102,108)


class DirTransport:
    """Recorded-directory transport (offline default). Picklable — ships
    to read() tasks as plain state."""

    def __init__(self, path: str):
        self.path = path

    def list_logs(self) -> list[str]:
        return sorted(
            d
            for d in os.listdir(self.path)
            if os.path.isfile(os.path.join(self.path, d, "sth.json"))
        )

    def fetch_sth(self, log: str) -> int:
        with open(os.path.join(self.path, log, "sth.json")) as f:
            return int(json.load(f)["tree_size"])

    def fetch_entries(self, log: str, start: int, end: int) -> list[bytes]:
        """Leaf inputs for [start, end) — recorded files never clamp."""
        out: list[bytes] = []
        with open(os.path.join(self.path, log, "entries.jsonl")) as f:
            for idx, line in enumerate(f):
                if idx >= end:
                    break
                if idx < start:
                    continue
                out.append(base64.b64decode(json.loads(line)["leaf_input"]))
        return out


class HttpTransport:
    """Live RFC 6962 transport (reference ct_ingestor.py:100-110): get-sth
    for the tree size, get-entries with an inclusive end index; the server
    may clamp the batch — callers loop on the returned length. stdlib
    urllib so the seam has no optional dependency; Spark's task retry is
    the error-recovery layer (T6), so failures raise instead of spinning."""

    def __init__(self, logs: dict[str, str], timeout: float = HTTP_TIMEOUT_SEC):
        self.logs = dict(logs)  # name -> base url (no trailing slash)
        self.timeout = timeout

    def _get_json(self, url: str) -> dict:
        with urllib.request.urlopen(url, timeout=self.timeout) as resp:
            if resp.status != 200:
                raise IOError(f"GET {url} -> HTTP {resp.status}")
            return json.loads(resp.read().decode("utf-8"))

    def list_logs(self) -> list[str]:
        return sorted(self.logs)

    def fetch_sth(self, log: str) -> int:
        return int(self._get_json(f"{self.logs[log]}/ct/v1/get-sth")["tree_size"])

    def fetch_entries(self, log: str, start: int, end: int) -> list[bytes]:
        """One get-entries call for [start, end) (wire format is inclusive
        end). Returns what the server sent — possibly fewer than asked."""
        doc = self._get_json(
            f"{self.logs[log]}/ct/v1/get-entries?start={start}&end={end - 1}"
        )
        entries = doc.get("entries", [])
        if not entries:
            raise IOError(f"{log}: get-entries [{start},{end}) returned no entries")
        return [base64.b64decode(e["leaf_input"]) for e in entries]


def _parse_urls_option(urls: str) -> dict[str, str]:
    """'Name=https://a,Other=https://b' -> {name: url} (trailing / trimmed)."""
    out: dict[str, str] = {}
    for part in urls.split(","):
        name, _, url = part.partition("=")
        if not name.strip() or not url.strip():
            raise ValueError(f"urls option: bad entry {part!r} (want Name=url)")
        out[name.strip()] = url.strip().rstrip("/")
    return out


def _make_transport(options: dict):
    path = options.get("path")
    urls = options.get("urls")
    if path and urls:
        raise ValueError("ct_log source: give either 'path' or 'urls', not both")
    if path:
        return DirTransport(path)
    if urls:
        return HttpTransport(
            _parse_urls_option(urls),
            timeout=float(options.get("httptimeoutsec", HTTP_TIMEOUT_SEC)),
        )
    raise ValueError("ct_log source requires a 'path' (recorded dir) or 'urls' option")


class CTLogPartition(InputPartition):
    def __init__(self, transport, log: str, start: int, end: int):
        self.transport = transport
        self.log = log
        self.start = start
        self.end = end


# Reference re-fetches its log list on a 24 h cache (ct_ingestor.py:49-72).
REGISTRY_TTL_SEC = 86400.0


class CTLogStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.transport = _make_transport(options)
        self.max_per_trigger = int(options.get("maxentriespertrigger", DEFAULT_BATCH))
        self.registry = options.get("registry")
        self.now = options.get("now")  # ISO ts for eligibility; None = wall clock
        self.registry_ttl = float(options.get("registryttlsec", REGISTRY_TTL_SEC))
        self._eligible_cache: tuple[float, set[str]] | None = None
        self._committed: dict | None = None  # last offset Spark committed

    def _eligible(self) -> set[str]:
        """Eligible-log set from the registry document, re-read on a TTL
        (reference: 24 h log-list cache, ct_ingestor.py:49-72). The
        document parse is the cached part; ``registryttlsec=0`` re-reads
        on every offset poll so registry edits take effect next batch."""
        import time

        now = time.monotonic()
        if (
            self._eligible_cache is not None
            and now - self._eligible_cache[0] < self.registry_ttl
        ):
            return self._eligible_cache[1]
        from .log_list import eligible_log_names

        eligible = eligible_log_names(self.registry, self.now)
        self._eligible_cache = (now, eligible)
        return eligible

    def _logs(self) -> list[str]:
        """Available logs, filtered through the registry's eligibility
        rules when one is given (retired / not-usable-or-frozen / outside
        temporal interval are excluded — ct_ingestor.py:77-97).
        Eligibility is consulted on every offset poll; the registry
        document itself refreshes per ``registryttlsec``."""
        logs = self.transport.list_logs()
        if not self.registry:
            return logs
        return [log for log in logs if log in self._eligible()]

    def initialOffset(self) -> dict:
        # offset 0 for every discovered log == the reference's fresh
        # offset files (ct_ingestor.py:26-38)
        return {log: 0 for log in self._logs()}

    def latestOffset(self) -> dict:
        """get-sth tree_size per log (ct_ingestor.py:102-105), paced by
        maxEntriesPerTrigger *relative to the committed offset* — pacing
        must happen here, not in partitions(): the end offset returned is
        what Spark records for the batch, so clamping later would silently
        skip the clamped-off entries."""
        sizes = {log: self.transport.fetch_sth(log) for log in self._logs()}
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
                    CTLogPartition(
                        self.transport, log, chunk_lo, min(chunk_lo + DEFAULT_BATCH, hi)
                    )
                )
        return parts

    def read(self, partition: CTLogPartition) -> Iterator[tuple]:
        # get-entries [start, end); the server may clamp each response
        # (HttpTransport), so loop until the range is covered — the
        # reference advances its offset by len(entries) the same way
        # (ct_ingestor.py:205-224). An EMPTY response must raise, not
        # spin: RFC 6962 lets get-entries lag the STH (and a recorded
        # dir's sth.json can overstate entries.jsonl), and
        # DirTransport returns [] rather than raising for
        # out-of-range reads — without this check the task loops
        # forever. Raising hands recovery to Spark's task retry, the
        # same error layer as T6.
        cur = partition.start
        while cur < partition.end:
            batch = partition.transport.fetch_entries(partition.log, cur, partition.end)
            if not batch:
                raise IOError(
                    f"get-entries {partition.log}[{cur},{partition.end}) "
                    "returned no entries (tree lagging its STH?)"
                )
            for leaf in batch[: partition.end - cur]:
                yield (partition.log, cur, leaf)
                cur += 1

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
    """Idempotent for SAME-SESSION re-registration: callers must be able
    to say 'make sure ct_log is available' unconditionally, and a second
    register on the session that already has it raises
    DATA_SOURCE_ALREADY_EXISTS, which is swallowed here.

    Clone-session caveat (measured on Spark 4.1.2): Python data-source
    RESOLUTION is session-local, but the duplicate-name check consults
    state a ``newSession`` clone shares with its parent — so on a clone
    this call is a no-op (the swallow fires) AND the clone still cannot
    resolve ``format("ct_log")``; the subsequent read fails loudly with
    DATA_SOURCE_NOT_FOUND. Queries using this source must run on the
    session that first registered it (see scripts/bench_streaming.py's
    width note for the practical consequence)."""
    try:
        spark.dataSource.register(CTLogDataSource)
    except Exception as e:  # pragma: no cover - message-matched
        if "DATA_SOURCE_ALREADY_EXISTS" not in str(e):
            raise
