"""Custom stateful streaming operator via ``applyInPandasWithState``.

The escape hatch for semantics the built-in windowed aggregations can't
express: arbitrary per-key state, updated per micro-batch with Arrow
batch transfer (not row-at-a-time pickling), with timeout-driven
eviction so state stays bounded on an unbounded stream.

``running_user_totals`` is the engine's canonical example: per-user
lifetime event count + value sum + last event time, emitted as an update
stream. The same callable runs in batch tests via ``applyInPandas``
(state starts empty, one "batch" == one group), which is how the suite
pins the transition function's arithmetic without a streaming harness.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        # lifetime max event time — kept IN STATE so a late-arriving
        # batch can't move the emitted last_ts backwards
        StructField("last_ts", TimestampType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_ts", TimestampType()),
    ]
)


def _make_update_fn(idle_timeout_ms: int | None):
    def _update_user_totals(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        """Transition function: fold the micro-batch into (count, sum) state."""
        if state.hasTimedOut:
            state.remove()
            return
        n, total, last_ts = state.get if state.exists else (0, 0.0, None)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
            batch_max = pdf["ts"].max()
            if batch_max is not pd.NaT and (last_ts is None or batch_max > last_ts):
                last_ts = batch_max
        state.update((n, round(total, 2), last_ts))
        if idle_timeout_ms:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 2)],
                "last_ts": [last_ts],
            }
        )

    return _update_user_totals


def running_user_totals(
    events: DataFrame, *, idle_timeout_ms: int | None = None
) -> DataFrame:
    """Streaming: running per-user totals as an update stream.

    ``idle_timeout_ms`` evicts state for users idle that long — the
    bounded-state knob for continuous deployments. Leave ``None`` for
    bounded replays (``availableNow``): with a processing-time timeout
    armed, Spark keeps scheduling timeout-check batches and the replay
    never reaches the terminated state.
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _make_update_fn(idle_timeout_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )


def batch_user_totals(events: DataFrame) -> DataFrame:
    """Batch twin with identical output shape — pure DataFrame ops, used
    by the oracle to validate the aggregation the stateful op maintains."""
    import pyspark.sql.functions as F

    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(F.coalesce(F.col("value"), F.lit(0.0))), 2).alias("total_value"),
        F.max("ts").alias("last_ts"),
    )
