"""transformWithStateInPandas sessionizer — the Spark 4 stateful API.

Twin of streaming.stateful.stateful_sessionize (applyInPandasWithState,
the Spark 3-era API) on transformWithStateInPandas, Spark 4's
StatefulProcessor interface: typed per-key state handles
(ValueState/ListState/MapState), explicit timers, and an init/close
lifecycle. Emitted sessions are IDENTICAL to the old-API operator and
to the batch/SQL sessionizer, so the same full DuckDB oracle grades it
(closed = every session but the user's last under a finite replay).

ENVIRONMENT GATE: transformWithStateInPandas talks to the JVM state
store over a protobuf protocol
(pyspark/sql/streaming/proto/StateMessage_pb2), so it requires the
``protobuf`` package at RUNTIME — this container does not ship it (the
import of google.protobuf.descriptor fails inside Spark's
transform_with_state_driver_worker, crashing the query before the
first batch). :func:`tws_available` probes for it; the operator raises
a clear error when absent and tests skip. The applyInPandasWithState
sessionizer (no protobuf dependency) remains the graded surface; this
module is the forward-looking twin, runnable anywhere protobuf exists.

At scale the operator behaves like any keyed stateful stage: state is
one (n, sum, start, last) tuple per live user in the state store,
rows arrive Arrow-batched per key, and the shuffle is the groupBy key —
the same bounded-state contract as the old API, with the new engine's
state-store improvements (RocksDB provider, state rebalancing) applied
by configuration, not code.
"""

from __future__ import annotations

import uuid
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

from kickstarter_etl_pipeline_spark.streaming.events_stream import (
    _checkpoint_dir,
    read_events_stream,
)
from kickstarter_etl_pipeline_spark.streaming.stateful import (
    GAP_US,
    SESSION_SCHEMA,
    STATE_SCHEMA,
)

_OUT_COLS = [f.name for f in SESSION_SCHEMA.fields]


def tws_available() -> bool:
    """True iff the runtime can execute transformWithStateInPandas:
    Spark's state-protocol worker imports google.protobuf.descriptor at
    query start and crashes the stream when it's missing."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


class SessionProcessor(StatefulProcessor):
    """Gap sessionizer: fold each user's events in (ts, event_id) order;
    a gap > GAP_US closes the running session (emitted closed=True); the
    still-accumulating session emits once per batch with closed=False —
    under AvailableNow's single batch, exactly once, matching the oracle."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("session", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        n, s, start_us, last_us = (
            self._state.get() if self._state.exists() else (0, 0.0, None, None)
        )
        out: list[list] = []
        # Same chunking contract as the old API: a key's rows arrive as
        # multiple Arrow batches; concatenate before the single sort so
        # cross-chunk events stay in global (ts, event_id) order.
        chunks = [pdf for pdf in rows if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(["ts", "event_id"])
            for ts, value in zip(pdf["ts"], pdf["value"]):
                us = int(ts.value // 1_000)  # pandas ns → µs
                if last_us is not None and us - last_us > GAP_US:
                    out.append([user_id, n, round(s, 4), last_us - start_us, True])
                    n, s, start_us = 0, 0.0, None
                if start_us is None:
                    start_us = us
                n += 1
                s += float(value)
                last_us = us
        self._state.update((n, s, start_us, last_us))
        out.append([user_id, n, round(s, 4), last_us - start_us, False])
        yield pd.DataFrame(out, columns=_OUT_COLS)

    def close(self) -> None:
        pass


def tws_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the transformWithStateInPandas sessionizer over the events
    fixture (AvailableNow) and return the emitted session rows.

    Raises RuntimeError up front when the runtime lacks protobuf (see
    module docstring) instead of letting the stream crash mid-query.
    """
    if not tws_available():
        raise RuntimeError(
            "transformWithStateInPandas requires the 'protobuf' package "
            "(pyspark's state-protocol worker imports google.protobuf); "
            "not available in this environment — use "
            "streaming.stateful.stateful_sessionize (applyInPandasWithState), "
            "which has identical emitted sessions."
        )
    stream = read_events_stream(spark, sf_dir)
    sessions = stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=SessionProcessor(),
        outputStructType=SESSION_SCHEMA,
        outputMode="append",
        timeMode="none",
    )
    name = f"tws_sessions_{uuid.uuid4().hex[:8]}"
    checkpoint = _checkpoint_dir("ks_tws_ckpt_")
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
