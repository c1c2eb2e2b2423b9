"""Fixture-layout canary: fail loudly and specifically on any physical
ts-type drift in the driver-generated events fixture.

Round-4 regression postmortem: the fixtures changed from int64-ns to
parquet TIMESTAMP(µs); the batch reader's type guard absorbed it while
the streaming readers (fixed declared schema + unconditional ns→µs
division) silently collapsed January 2024 into ~43 minutes of 1970,
breaking 2 oracle queries and 7 tests. This canary pins the contract
every events consumer relies on: whatever the on-disk layout, batch and
stream readers must surface the SAME µs wall-clock instants, in the
fixture's real (2024) range.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kickstarter_etl_pipeline_spark.scratch import run_scratch_dir
from kickstarter_etl_pipeline_spark.sources.readers import load_table
from kickstarter_etl_pipeline_spark.streaming.events_stream import (
    stream_events_to_parquet,
)


def test_events_ts_same_range_batch_and_stream(spark, sf_dir):
    batch = load_table(spark, sf_dir, "events")
    assert dict(batch.dtypes)["ts"] == "timestamp_ntz"
    b_min, b_max = batch.agg(F.min("ts"), F.max("ts")).first()

    # Any unit mix-up (ns read as µs, µs read as ns, s vs ms) moves the
    # range out of the fixture's generation year by orders of magnitude.
    assert b_min.year == 2024, f"batch ts min {b_min} — unit drift?"
    assert b_max.year == 2024, f"batch ts max {b_max} — unit drift?"

    streamed = stream_events_to_parquet(
        spark,
        sf_dir,
        run_scratch_dir("canary_out_"),
        run_scratch_dir("canary_ckpt_"),
    )
    s_min, s_max = streamed.agg(
        F.min(F.col("ts").cast("timestamp_ntz")),
        F.max(F.col("ts").cast("timestamp_ntz")),
    ).first()

    assert (s_min, s_max) == (b_min, b_max), (
        f"stream reader disagrees with batch reader: "
        f"stream=({s_min}, {s_max}) batch=({b_min}, {b_max})"
    )
    assert streamed.count() == batch.count()
