"""Kafka source parity for the events stream.

The engine's streaming queries consume :func:`read_events_stream`
(file source). In production the same events arrive on a Kafka topic;
this module provides the drop-in twin: identical output schema and
normalization, only the source swapped. Everything downstream
(watermarks, windows, stateful sessionizer, sinks) is source-agnostic,
so the swap is one function call.

Layering (mirrors the JDBC sink, sources.sinks.write_jdbc):

- :func:`kafka_reader_options` — pure config dict, unit-testable.
- :func:`parse_kafka_events` — Kafka wire frame → normalized events
  frame. Works on ANY DataFrame with the wire schema, so it is fully
  tested against the batch reader WITHOUT a broker (round-trip the
  fixture rows through JSON `value` bytes).
- :func:`read_events_kafka` — readStream.format("kafka") + parse.

Environment note: this container ships neither a broker nor the
spark-sql-kafka connector jar, so `read_events_kafka` is exercised in
tests up to the data-source-resolution error (same policy as the JDBC
sink); `parse_kafka_events` — all the logic — is fully tested.
Against a real cluster, add the connector package
(`spark.jars.packages=org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>`).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession, functions as F

from kickstarter_etl_pipeline_spark import schemas
from kickstarter_etl_pipeline_spark.session import ensure_runtime_confs


def kafka_reader_options(
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    fail_on_data_loss: bool = True,
) -> dict[str, str]:
    """Reader options for the Kafka events source (pure, unit-testable).

    ``maxOffsetsPerTrigger`` bounds micro-batch size so a backlogged
    topic can't produce an unboundedly large first batch after
    downtime; ``failOnDataLoss=true`` surfaces retention-expired
    offsets as errors instead of silent gaps (flip only for lossy
    monitoring pipelines).
    """
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": "true" if fail_on_data_loss else "false",
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def parse_kafka_events(raw: DataFrame) -> DataFrame:
    """Kafka wire frame → the normalized events frame.

    Input carries Kafka's fixed columns (``value: binary`` holds the
    event as JSON with ``ts`` in int64 MICROseconds since epoch — the
    same µs precision as the parquet fixture's TIMESTAMP(µs) column).
    Output schema and timestamp normalization are identical to
    :func:`..streaming.events_stream.read_events_stream`, so every
    downstream operator works unchanged. Malformed payloads yield NULL
    columns (from_json PERMISSIVE default) rather than killing the
    stream; route them to a dead-letter sink with
    ``filter(col("event_id").isNull())`` if the topic is untrusted.
    """
    parsed = raw.select(
        F.from_json(F.col("value").cast("string"), schemas.EVENTS_WIRE).alias("_e")
    ).select("_e.*")
    return parsed.withColumn("ts", F.timestamp_micros(F.col("ts")))


def read_events_kafka(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str = "events",
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming events from a Kafka topic — drop-in twin of
    :func:`..streaming.events_stream.read_events_stream`."""
    ensure_runtime_confs(spark)
    reader = spark.readStream.format("kafka")
    for k, v in kafka_reader_options(
        bootstrap_servers, topic, starting_offsets, max_offsets_per_trigger
    ).items():
        reader = reader.option(k, v)
    return parse_kafka_events(reader.load())


def events_as_kafka_wire(events: DataFrame) -> DataFrame:
    """Re-encode a NORMALIZED events frame (``ts`` as a timestamp) as
    Kafka wire rows (test helper: proves parse_kafka_events ∘
    events_as_kafka_wire = identity on the fixture without a broker).
    The wire payload carries ``ts`` as int64 µs per EVENTS_WIRE."""
    payload = F.to_json(
        F.struct(
            "event_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
    )
    return events.select(
        F.col("event_id").cast("string").cast("binary").alias("key"),
        payload.cast("binary").alias("value"),
        F.lit("events").alias("topic"),
        (F.col("event_id") % 8).cast("int").alias("partition"),
        F.col("event_id").alias("offset"),
        F.current_timestamp().alias("timestamp"),
        F.lit(0).alias("timestampType"),
    )
