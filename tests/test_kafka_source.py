"""Kafka source parity (config + parse layers — no broker in the
container, same test policy as the JDBC sink)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from kickstarter_etl_pipeline_spark import schemas
from kickstarter_etl_pipeline_spark.streaming.kafka_source import (
    events_as_kafka_wire,
    kafka_reader_options,
    parse_kafka_events,
    read_events_kafka,
)


def test_kafka_reader_options_complete():
    opts = kafka_reader_options(
        "broker1:9092,broker2:9092",
        "events",
        starting_offsets="latest",
        max_offsets_per_trigger=50_000,
        fail_on_data_loss=False,
    )
    assert opts == {
        "kafka.bootstrap.servers": "broker1:9092,broker2:9092",
        "subscribe": "events",
        "startingOffsets": "latest",
        "failOnDataLoss": "false",
        "maxOffsetsPerTrigger": "50000",
    }
    # Defaults: earliest + fail-on-loss, no trigger cap.
    d = kafka_reader_options("b:9092", "t")
    assert d["startingOffsets"] == "earliest"
    assert d["failOnDataLoss"] == "true"
    assert "maxOffsetsPerTrigger" not in d


def test_kafka_parse_roundtrip_matches_stream_reader(spark, sf_dir):
    """parse_kafka_events ∘ events_as_kafka_wire == the file-stream
    reader's normalization, row for row — proves the source swap changes
    nothing downstream."""
    from kickstarter_etl_pipeline_spark.sources.readers import load_table

    batch = load_table(spark, sf_dir, "events")
    expected = batch.select(
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    parsed = parse_kafka_events(events_as_kafka_wire(expected))
    assert parsed.schema == expected.schema
    assert parsed.count() == expected.count()
    assert parsed.exceptAll(expected).count() == 0
    assert expected.exceptAll(parsed).count() == 0


def test_kafka_parse_malformed_payload_yields_nulls(spark):
    wire = spark.createDataFrame(
        [(bytearray(b"k"), bytearray(b"{not json"), "events", 0, 0)],
        "key binary, value binary, topic string, partition int, offset long",
    )
    out = parse_kafka_events(wire).collect()
    assert len(out) == 1
    assert out[0]["event_id"] is None  # dead-letter-filterable, stream survives


def test_read_events_kafka_surface(spark):
    """No connector jar in the container: the reader must fail at DATA
    SOURCE RESOLUTION (proving the surface is wired), not before."""
    with pytest.raises(Exception, match="(?i)kafka|data.?source|DATA_SOURCE_NOT_FOUND"):
        read_events_kafka(spark, "localhost:9092", "events").schema
