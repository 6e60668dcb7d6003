"""Custom stateful streaming operator via ``applyInPandasWithState``.

The escape hatch for semantics the built-in windowed aggregations can't
express: arbitrary per-key state, updated per micro-batch with Arrow
batch transfer (not row-at-a-time pickling), with timeout-driven
eviction so state stays bounded on an unbounded stream.

Spark 4's newer ``transformWithStateInPandas`` (typed ValueState/
ListState/MapState + timers) is the eventual upgrade path, but its
Python driver worker imports ``google.protobuf``, which is not
installed in this environment (verified: the query crashes with
STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE on the proto import) —
so ``applyInPandasWithState`` is deliberately the supported API here.

``running_user_totals`` is the engine's canonical example: per-user
lifetime event count + value sum + last event time, emitted as an update
stream. The same callable runs in batch tests via ``applyInPandas``
(state starts empty, one "batch" == one group), which is how the suite
pins the transition function's arithmetic without a streaming harness.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
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

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        # exact settled-cents accumulator (functions/exact.py convention):
        # integer folds are order-independent, so any micro-batch split or
        # replay converges to the batch twin's sum bit-for-bit — a double
        # accumulator would drift by summation order
        StructField("total_units", LongType()),
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
        n, units, last_ts = state.get if state.exists else (0, 0, None)
        for pdf in pdfs:
            n += len(pdf)
            # per-row settle to exact integer cents — floor(x*100 + 0.5)
            # on float64 is the same IEEE expression the batch twin's
            # settled_units column runs JVM-side, so the integer fold
            # matches it exactly regardless of batch boundaries
            vals = pdf["value"].fillna(0.0).to_numpy(dtype="float64")
            units += int(np.floor(vals * 100.0 + 0.5).astype("int64").sum())
            batch_max = pdf["ts"].max()
            if batch_max is not pd.NaT and (last_ts is None or batch_max > last_ts):
                last_ts = batch_max
        state.update((n, units, last_ts))
        if idle_timeout_ms:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [units / 100.0],
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

    from news_data_pipeline_spark.functions.exact import exact_sum

    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        exact_sum(F.coalesce(F.col("value"), F.lit(0.0))).alias("total_value"),
        F.max("ts").alias("last_ts"),
    )


HIGHWATER_STATE_SCHEMA = StructType([StructField("hwm", DoubleType())])
HIGHWATER_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
    ]
)


def _update_highwater(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Emit only rows that set a new lifetime per-user value maximum —
    event-driven emission (alerting shape), unlike the per-batch
    aggregate the totals operator emits.

    Maxima are evaluated in event-time order WITHIN each micro-batch;
    across batches the order is arrival order, so a late-arriving
    record that beats the current maximum still alerts (correct for
    alerting; an event-time-exact replay is the oracle-checked batch
    twin below). Rows with null ts or value don't participate.
    """
    if state.hasTimedOut:
        state.remove()
        return
    hwm = state.get[0] if state.exists else None
    recs = []
    for pdf in pdfs:
        clean = pdf.dropna(subset=["value", "ts"]).sort_values(["ts", "event_id"])
        for ts_v, v in zip(clean["ts"], clean["value"]):
            v = float(v)
            if hwm is None or v > hwm:
                hwm = v
                recs.append((key[0], ts_v, v))
    if hwm is not None:
        state.update((hwm,))
    if recs:
        yield pd.DataFrame(recs, columns=["user_id", "ts", "value"])


def user_value_highwater(events: DataFrame) -> DataFrame:
    """Streaming: per-user new-maximum events as an append-style update
    stream. State is one double per user — constant per key."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_highwater,
        outputStructType=HIGHWATER_OUTPUT_SCHEMA,
        stateStructType=HIGHWATER_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def batch_value_highwater(events: DataFrame) -> DataFrame:
    """Batch twin: rows beating the running per-user maximum."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    clean = events.where(F.col("value").isNotNull() & F.col("ts").isNotNull())
    return (
        clean.withColumn("prev_max", F.max("value").over(w))
        .where(F.col("prev_max").isNull() | (F.col("value") > F.col("prev_max")))
        .select("user_id", "ts", "value")
    )


FUNNEL_STATE_SCHEMA = StructType(
    [
        StructField("s_ts", TimestampType()),
        StructField("v_ts", TimestampType()),
        StructField("p_ts", TimestampType()),
    ]
)
FUNNEL_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("funnel_stage", StringType()),
    ]
)


def _funnel_stage(s, v, p) -> str:
    """Stage rule shared by the stream and batch twins: a user advances
    only if the stage's FIRST event is at or after the previous stage's
    first event (queries/streaming_batch.py::user_funnel_stages)."""
    if s is None:
        return "no_signup"
    if v is None or v < s:
        return "signup_only"
    if p is None or p < v:
        return "viewed"
    return "purchased"


def _update_funnel(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Transition: fold per-type minimum first-touch timestamps.

    Minimums are arrival-order-insensitive, so late or reordered
    micro-batches converge to the same state as the batch query — the
    stage emitted after the last batch touching a user is exact, with
    three nullable timestamps as the entire per-key state.
    """
    if state.hasTimedOut:
        state.remove()
        return
    s, v, p = state.get if state.exists else (None, None, None)

    def fold(cur, batch_min):
        if batch_min is pd.NaT or batch_min is None:
            return cur
        return batch_min if cur is None or batch_min < cur else cur

    for pdf in pdfs:
        clean = pdf.dropna(subset=["ts"])
        for tname, cur in (("signup", "s"), ("view", "v"), ("purchase", "p")):
            sel = clean.loc[clean["event_type"] == tname, "ts"]
            if len(sel):
                m = sel.min()
                if tname == "signup":
                    s = fold(s, m)
                elif tname == "view":
                    v = fold(v, m)
                else:
                    p = fold(p, m)
    state.update((s, v, p))
    yield pd.DataFrame(
        {"user_id": [key[0]], "funnel_stage": [_funnel_stage(s, v, p)]}
    )


def user_funnel_state(events: DataFrame) -> DataFrame:
    """Streaming funnel position per user as an update stream — the
    stateful twin of the oracled batch query ``user_funnel_stages``
    (same stage rule, same first-touch ordering semantics). State is
    three timestamps per user; because the fold is a min, replay order
    cannot change the converged answer."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_funnel,
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def batch_funnel_stages(events: DataFrame) -> DataFrame:
    """Batch twin: per-user stage via conditional mins (the same
    expression the oracled reporting query aggregates over)."""
    import pyspark.sql.functions as F

    def first_ts(t: str):
        return F.min(F.when(F.col("event_type") == t, F.col("ts")))

    per_user = events.groupBy("user_id").agg(
        first_ts("signup").alias("s"),
        first_ts("view").alias("v"),
        first_ts("purchase").alias("p"),
    )
    stage = (
        F.when(F.col("s").isNull(), F.lit("no_signup"))
        .when(
            F.col("v").isNull() | (F.col("v") < F.col("s")),
            F.lit("signup_only"),
        )
        .when(
            F.col("p").isNull() | (F.col("p") < F.col("v")), F.lit("viewed")
        )
        .otherwise(F.lit("purchased"))
    )
    return per_user.select("user_id", stage.alias("funnel_stage"))


RATE_STATE_SCHEMA = StructType(
    [
        StructField("hours", ArrayType(LongType())),
        StructField("counts", ArrayType(LongType())),
    ]
)
RATE_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("hour", TimestampType()),
        StructField("n_events", LongType()),
        StructField("mean_prev", DoubleType()),
        StructField("z", DoubleType()),
    ]
)


def _round_half_up(x: float, digits: int) -> float:
    """Spark's round(): HALF_UP on the double's exact binary value
    (java.math.BigDecimal.valueOf semantics via decimal.Decimal)."""
    import decimal

    q = decimal.Decimal(1).scaleb(-digits)
    return float(
        decimal.Decimal(x).quantize(q, rounding=decimal.ROUND_HALF_UP)
    )


def _score_rate_anomalies(hours: list, counts: list):
    """Shared scoring rule (stream + batch twin): z of each observed
    hour vs the trailing <=24 OBSERVED hours (rows, not calendar), with
    the batch query's exact rounding discipline — mean/std rounded to
    4dp BEFORE the z division, |z| >= 2 after its own 4dp round."""
    import statistics

    out = []
    for i in range(len(hours)):
        prev = counts[max(0, i - 24) : i]
        if len(prev) < 2:
            continue
        mean_prev = _round_half_up(statistics.fmean(prev), 4)
        std_prev = _round_half_up(statistics.stdev(prev), 4)
        if std_prev <= 0:
            continue
        z = _round_half_up((counts[i] - mean_prev) / std_prev, 4)
        if abs(z) >= 2.0:
            out.append((hours[i], counts[i], mean_prev, z))
    return out


def _update_rate(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold hourly counts into per-type state; emit the key's complete
    current anomaly list each batch (update semantics: the last
    emission is the converged answer). Counts are a sum-fold, so late
    or reordered batches converge like the funnel's min-fold."""
    if state.hasTimedOut:
        state.remove()
        return
    hours_arr, counts_arr = state.get if state.exists else ([], [])
    acc = dict(zip(hours_arr, counts_arr))
    for pdf in pdfs:
        clean = pdf.dropna(subset=["ts"])
        if not len(clean):
            continue
        floored = clean["ts"].dt.floor("h")
        for hour, cnt in floored.value_counts().items():
            epoch = int(hour.value // 1_000_000_000)
            acc[epoch] = acc.get(epoch, 0) + int(cnt)
    hours = sorted(acc)
    counts = [acc[h] for h in hours]
    state.update((hours, counts))
    scored = _score_rate_anomalies(hours, counts)
    if scored:
        yield pd.DataFrame(
            {
                "event_type": [key[0]] * len(scored),
                "hour": [pd.Timestamp(h, unit="s") for h, _, _, _ in scored],
                "n_events": [n for _, n, _, _ in scored],
                "mean_prev": [m for _, _, m, _ in scored],
                "z": [z for _, _, _, z in scored],
            }
        )


def streaming_rate_anomalies(events: DataFrame) -> DataFrame:
    """Streaming twin of the oracled batch query
    ``event_rate_anomalies``: per-type hourly counts live in state
    (two parallel arrays), each micro-batch re-emits the key's full
    anomaly list, and the rounding discipline is byte-identical to the
    batch side (HALF_UP at 4dp on mean/std before the z division).
    Production note: on an unbounded stream, cap state by dropping
    hours older than the watermark minus 25 hours — on bounded
    replays the whole per-type history is a few hundred ints."""
    return events.groupBy("event_type").applyInPandasWithState(
        _update_rate,
        outputStructType=RATE_OUTPUT_SCHEMA,
        stateStructType=RATE_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
