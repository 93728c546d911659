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
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
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


ASOF_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("purchase_ts", TimestampType()),
        StructField("view_ts", TimestampType()),
    ]
)

ASOF_STATE_SCHEMA = StructType([StructField("last_view_ts", TimestampType())])


def streaming_asof_last_view(events: DataFrame) -> DataFrame:
    """Streaming AS-OF join — the incremental twin of
    ``operators.windows.asof_last_view``: per purchase, the same user's
    latest view at-or-before it. State per user is ONE timestamp (the
    last view seen), so state size is bounded by user cardinality, never
    stream length.

    Rows are processed in (ts, side) order within each micro-batch (views
    before purchases at equal ts, matching the batch operator's inclusive
    semantics); across batches the operator assumes in-order arrival per
    key — the property the source's ordered per-log chunks provide. For
    out-of-order sources, buffer within the watermark horizon first
    (withWatermark + a sort inside the batch) — the state shape is
    unchanged.

    ``events`` must be unbounded with (event_id long, user_id long,
    ts timestamp, event_type string).
    """
    import pandas as pd

    def _update(key, pdf_iter, state: GroupState):
        (user_id,) = key
        last = state.get[0] if state.exists else None
        pdf = pd.concat(list(pdf_iter), ignore_index=True)
        pdf["_side"] = (pdf["event_type"] != "view").astype("int64")
        pdf = pdf.sort_values(["ts", "_side"], ignore_index=True)
        out = {"event_id": [], "purchase_ts": [], "view_ts": []}
        for ts, side, event_id in zip(pdf["ts"], pdf["_side"], pdf["event_id"]):
            if side == 0:
                last = ts
            else:
                out["event_id"].append(event_id)
                out["purchase_ts"].append(ts)
                out["view_ts"].append(last)
        if last is not None:
            state.update((last,))
        if out["event_id"]:
            yield pd.DataFrame(
                {
                    "event_id": out["event_id"],
                    "user_id": user_id,
                    "purchase_ts": out["purchase_ts"],
                    "view_ts": out["view_ts"],
                }
            )

    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=ASOF_OUTPUT_SCHEMA,
        stateStructType=ASOF_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


KMV_OUTPUT_SCHEMA = StructType(
    [
        StructField("window_id", LongType()),
        StructField("event_type", StringType()),
        StructField("users_kmv", ArrayType(DoubleType())),
    ]
)

KMV_STATE_SCHEMA = StructType([StructField("kmv", ArrayType(DoubleType()))])


def resolve_kmv_k(k: int | None) -> int:
    """The streaming default k MUST match the batch side
    (operators.sketches.DEFAULT_K == rollup.KMV_USERS_K): merging a
    smaller streamed sketch into a k=256 batch sketch and then
    estimating at k=256 silently misreads a saturated sketch as exact —
    the hazard kmv_distinct_estimate's own docstring warns about. One
    shared constant, resolved here so tests can pin the equality."""
    from ..operators.sketches import DEFAULT_K

    return DEFAULT_K if k is None else k


def streaming_window_kmv(
    events: DataFrame, k: int | None = None, window_hours: int = 1
) -> DataFrame:
    """Streaming maintenance of per-(window, event_type) KMV user
    sketches — the bounded-state typed aggregate Spark SQL doesn't
    expose, built as a custom stateful operator (the module's purpose).
    State per group is a sorted array of <= k doubles regardless of how
    many distinct users the window sees; collect_set-based state would
    grow with per-window cardinality, which is what a sketch exists to
    avoid.

    The hash is computed JVM-side BEFORE the stateful boundary with the
    same canonical expression as ``operators.sketches.kmv_sketch``
    (xxhash64 of the string cast, mapped to uniform [0,1)), so streamed
    sketches and batch-backfilled sketches are interchangeable — merge,
    intersect, and estimate together (tests pin streamed == batch).

    Emits the group's current sketch each micro-batch it changes
    (update mode); downstream range queries read the latest row per
    (window_id, event_type). ``events``: (ts timestamp, user_id,
    event_type)."""
    import pandas as pd

    from ..operators.sketches import _uniform_hash

    k = resolve_kmv_k(k)

    # NULL user_ids are excluded BEFORE hashing (xxhash64(NULL) is the
    # seed, not NULL — the same phantom-element hazard kmv_sketch guards)
    hashed = events.filter(F.col("user_id").isNotNull()).select(
        F.floor(F.unix_timestamp("ts") / (3600 * window_hours))
        .cast("long")
        .alias("window_id"),
        "event_type",
        _uniform_hash(F.col("user_id")).alias("_u"),
    )

    def _update(key, pdf_iter, state: GroupState):
        window_id, event_type = key
        vals = set(state.get[0]) if state.exists else set()
        for pdf in pdf_iter:
            vals.update(float(u) for u in pdf["_u"])
        sketch = sorted(vals)[:k]
        state.update((sketch,))
        yield pd.DataFrame(
            {
                "window_id": [window_id],
                "event_type": [event_type],
                "users_kmv": [sketch],
            }
        )

    return hashed.groupBy("window_id", "event_type").applyInPandasWithState(
        _update,
        outputStructType=KMV_OUTPUT_SCHEMA,
        stateStructType=KMV_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
