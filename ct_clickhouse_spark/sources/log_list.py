"""CT log-list discovery (SURVEY S3 + P8): the reference's cached JSON
registry, as a DataFrame pipeline.

Reference behavior (ingestion/ct_ingestor.py:49-97): fetch log_list.json
(24 h cache), then keep logs that are (a) not retired, (b) usable or
frozen, (c) whose temporal interval contains now. Here the JSON document
becomes a small dimension DataFrame via ``spark.read.json`` with an
explicit schema (no inference), and the eligibility rules are Column
predicates — the nested operators[].logs[] arrays are double-exploded.

`now` is a parameter (the reference hardwires wall-clock) so discovery is
deterministic and testable.

``eligible_log_names`` is the same rule set as a pure-Python function (no
SparkSession) so the ct_log streaming source can consult it from inside
initialOffset/latestOffset; a test pins the two implementations to each
other on shared fixtures.
"""

from __future__ import annotations

import datetime
import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
)

_STATE_KEYS = ["usable", "frozen", "retired", "pending", "qualified", "readonly", "rejected"]

LOG_LIST_SCHEMA = StructType(
    [
        StructField(
            "operators",
            ArrayType(
                StructType(
                    [
                        StructField("name", StringType()),
                        StructField(
                            "logs",
                            ArrayType(
                                StructType(
                                    [
                                        StructField("description", StringType()),
                                        StructField("log_id", StringType()),
                                        StructField("url", StringType()),
                                        StructField(
                                            "state",
                                            StructType(
                                                [
                                                    StructField(
                                                        k,
                                                        StructType(
                                                            [StructField("timestamp", StringType())]
                                                        ),
                                                    )
                                                    for k in _STATE_KEYS
                                                ]
                                            ),
                                        ),
                                        StructField(
                                            "temporal_interval",
                                            StructType(
                                                [
                                                    StructField("start_inclusive", StringType()),
                                                    StructField("end_exclusive", StringType()),
                                                ]
                                            ),
                                        ),
                                    ]
                                )
                            ),
                        ),
                    ]
                )
            ),
        )
    ]
)


def _parse_ts(s: str | None, default: datetime.datetime) -> datetime.datetime:
    if not s:
        return default
    dt = datetime.datetime.fromisoformat(s.replace("Z", "+00:00"))
    return dt.replace(tzinfo=None)


def eligible_log_names(log_list_path: str, now: str | None = None) -> set[str]:
    """Descriptions of eligible logs — discover_logs' rules, stdlib-only:
    (a) not retired, (b) usable or frozen, (c) temporal interval contains
    ``now`` (missing interval defaults open, ct_ingestor.py:86-87).
    ``now=None`` uses wall clock (the reference's behavior)."""
    with open(log_list_path) as f:
        doc = json.load(f)
    now_dt = (
        datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None)
        if now is None
        else _parse_ts(now, datetime.datetime(1970, 1, 1))
    )
    out: set[str] = set()
    for op in doc.get("operators", []) or []:
        for log in op.get("logs", []) or []:
            state = log.get("state") or {}
            if state.get("retired") is not None:
                continue
            if state.get("usable") is None and state.get("frozen") is None:
                continue
            ti = log.get("temporal_interval") or {}
            start = _parse_ts(ti.get("start_inclusive"), datetime.datetime(1970, 1, 1))
            end = _parse_ts(
                ti.get("end_exclusive"), datetime.datetime(9999, 12, 31, 23, 59, 59)
            )
            if not (start <= now_dt < end):
                continue
            out.add(log.get("description") or "unknown")
    return out


def discover_logs(spark: SparkSession, log_list_path: str, now: str) -> DataFrame:
    """Eligible logs as (operator, name, url, state).

    ``now`` is an ISO timestamp string; eligibility is evaluated with
    to_timestamp so missing intervals default open (the reference defaults
    1970..9999, ct_ingestor.py:86-87)."""
    raw = spark.read.schema(LOG_LIST_SCHEMA).json(log_list_path)
    logs = raw.select(F.explode("operators").alias("op")).select(
        F.col("op.name").alias("operator"), F.explode("op.logs").alias("log")
    )
    now_ts = F.to_timestamp(F.lit(now))
    start = F.coalesce(
        F.to_timestamp(F.regexp_replace("log.temporal_interval.start_inclusive", "Z$", "")),
        F.to_timestamp(F.lit("1970-01-01 00:00:00")),
    )
    end = F.coalesce(
        F.to_timestamp(F.regexp_replace("log.temporal_interval.end_exclusive", "Z$", "")),
        F.to_timestamp(F.lit("9999-12-31 23:59:59")),
    )
    return (
        logs.filter(F.col("log.state.retired").isNull())  # ct_ingestor.py:80-81
        .filter(  # usable or frozen (ct_ingestor.py:83-84)
            F.col("log.state.usable").isNotNull() | F.col("log.state.frozen").isNotNull()
        )
        .filter((start <= now_ts) & (now_ts < end))  # ct_ingestor.py:86-89
        .select(
            "operator",
            F.coalesce(F.col("log.description"), F.lit("unknown")).alias("name"),
            F.regexp_replace(F.coalesce(F.col("log.url"), F.lit("")), "/+$", "").alias("url"),
            F.when(F.col("log.state.usable").isNotNull(), "usable")
            .otherwise("frozen")
            .alias("state"),
        )
        .orderBy("operator", "name")
    )
