"""Custom stateful streaming operator: applyInPandasWithState sessionizer.

Where native ``session_window`` covers gap-merged aggregation, a custom
state handler covers arbitrary per-key session logic (custom rollups,
emit-on-close). State is one (count, sum, start, last) tuple per user,
so state size is bounded by live keys — the scale contract for stateful
streaming.

Two eviction strategies:

- :func:`stateful_sessionize` (NoTimeout): the finite AvailableNow
  replay emits still-open sessions with closed=False at the end — the
  oracle-comparable variant (ProcessingTimeTimeout crashes the pandas
  state worker under AvailableNow on this Spark build — EOF in
  PythonRunner).
- :func:`stateful_sessionize_with_timeout` (EventTimeTimeout): the
  PRODUCTION eviction pattern for unbounded streams — each group arms a
  timeout at last_event + gap; when the WATERMARK passes it, the open
  session is emitted as timeout-closed and its state removed. State
  size stays bounded by live (in-gap) keys regardless of stream length.
  Sessions still open when a finite replay ends stay in state (they
  would emit on the next batch of a live stream), so this variant is
  checked by invariants, not a row-for-row oracle.
"""

from __future__ import annotations

import uuid
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

from kickstarter_etl_pipeline_spark.streaming.events_stream import (
    _checkpoint_dir,
    read_events_stream,
)

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("duration_us", T.LongType()),
        T.StructField("closed", T.BooleanType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("s", T.DoubleType()),
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
    ]
)

GAP_US = 30 * 60 * 1_000_000


def _session_fn(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this batch's events into the user's running session; emit a
    closed row whenever a gap larger than GAP_US splits the stream, plus
    one open (closed=False) row for the session still accumulating."""
    (user_id,) = key
    n, s, start_us, last_us = state.get if state.exists else (0, 0.0, None, None)
    rows: list[list] = []
    # Arrow delivers the group as MULTIPLE chunks (maxRecordsPerBatch);
    # sorting each chunk independently would fold events out of global
    # time order for groups that span chunks. Concatenate first, sort
    # once, with event_id as the tie-break (same total order as the SQL
    # oracle's ORDER BY us, event_id).
    chunks = [pdf for pdf in batches if len(pdf)]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values(["ts", "event_id"])
        for ts, value in zip(pdf["ts"], pdf["value"]):
            us = int(ts.value // 1_000)  # pandas ns → µs
            if last_us is not None and us - last_us > GAP_US:
                rows.append([user_id, n, round(s, 4), last_us - start_us, True])
                n, s, start_us = 0, 0.0, None
            if start_us is None:
                start_us = us
            n += 1
            s += float(value)
            last_us = us
    state.update((n, s, start_us, last_us))
    rows.append([user_id, n, round(s, 4), last_us - start_us, False])
    yield pd.DataFrame(rows, columns=[f.name for f in SESSION_SCHEMA.fields])


TIMEOUT_SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("closed_by_timeout", T.BooleanType()),
    ]
)


def _session_timeout_fn(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Gap sessionizer with event-time timeout eviction: gap-splits emit
    closed sessions inline; the still-open session emits when the
    watermark passes last_event + GAP (state removed — bounded memory)."""
    (user_id,) = key
    cols = [f.name for f in TIMEOUT_SESSION_SCHEMA.fields]
    if state.hasTimedOut:
        n, s, start_us, last_us = state.get
        state.remove()
        yield pd.DataFrame([[user_id, n, round(s, 4), True]], columns=cols)
        return
    n, s, start_us, last_us = state.get if state.exists else (0, 0.0, None, None)
    rows: list[list] = []
    chunks = [pdf for pdf in batches if len(pdf)]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values(["ts", "event_id"])
        for ts, value in zip(pdf["ts"], pdf["value"]):
            us = int(ts.value // 1_000)
            if last_us is not None and us - last_us > GAP_US:
                rows.append([user_id, n, round(s, 4), False])
                n, s, start_us = 0, 0.0, None
            if start_us is None:
                start_us = us
            n += 1
            s += float(value)
            last_us = us
    state.update((n, s, start_us, last_us))
    # Arm the event-time timeout: fires once the watermark passes the
    # session gap after the last event (ms epoch per the state API).
    state.setTimeoutTimestamp(last_us // 1_000 + GAP_US // 1_000)
    if rows:
        yield pd.DataFrame(rows, columns=cols)


def stateful_sessionize_with_timeout(
    spark: SparkSession, sf_dir: str, watermark: str = "1 minute"
) -> DataFrame:
    """Run the event-time-timeout sessionizer over the events fixture
    (AvailableNow) and return the emitted rows. Production eviction
    semantics — see module docstring."""
    stream = read_events_stream(spark, sf_dir).withWatermark("ts", watermark)
    sessions = stream.groupBy("user_id").applyInPandasWithState(
        _session_timeout_fn,
        outputStructType=TIMEOUT_SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    name = f"stateful_timeout_{uuid.uuid4().hex[:8]}"
    checkpoint = _checkpoint_dir("ks_stateful_to_ckpt_")
    query = (
        sessions.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(name)


def stateful_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the custom stateful sessionizer over the events fixture with
    AvailableNow and return the emitted session rows."""
    stream = read_events_stream(spark, sf_dir)
    sessions = stream.groupBy("user_id").applyInPandasWithState(
        _session_fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = f"stateful_sessions_{uuid.uuid4().hex[:8]}"
    checkpoint = _checkpoint_dir("ks_stateful_ckpt_")
    query = (
        sessions.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(name)
