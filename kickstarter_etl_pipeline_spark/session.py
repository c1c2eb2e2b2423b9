"""SparkSession construction and runtime configuration.

The engine works with any SparkSession (the test driver provides its
own), so the configs that MUST hold for correctness are split out as
*runtime* confs applied idempotently by :func:`ensure_runtime_confs`
at the top of every public operator entry point:

- ``spark.sql.session.timeZone=UTC`` — date/time extraction must be
  timezone-stable so results match a timezone-naive oracle.
- ``spark.sql.legacy.parquet.nanosAsLong=true`` — legacy-layout guard:
  early fixture generations stored ``events.ts`` as TIMESTAMP(NANOS),
  which Spark's Parquet reader otherwise rejects; with the conf it
  surfaces as int64 and the readers convert explicitly. Current
  fixtures store TIMESTAMP(µs), which this conf does not affect
  (see sources.readers.load_table / streaming read_events_raw_stream).

Performance confs (AQE, shuffle partitions, broadcast threshold) are
also runtime-settable and applied here; they are safe no-ops when the
session was already configured.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Runtime (non-static) confs required for correct, scale-ready plans.
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Dims up to ~64 MB broadcast instead of shuffling the fact side.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Externally-provided sessions (the test driver's) default to 200
    # shuffle partitions — wasteful at local scale, and streaming aggs
    # can't AQE-coalesce them. Matched to local cores instead.
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    # The custom connector (sources/python_datasource.py) implements
    # pushFilters; Spark 4.1 gates Python-data-source pushdown behind
    # this flag and errors on a pushFilters implementation without it.
    "spark.sql.python.filterPushdown.enabled": "true",
}


def ensure_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply required runtime confs to an existing session (idempotent).

    ``spark.sql.shuffle.partitions`` is special-cased: the intent of
    that entry is to fix Spark's wasteful out-of-the-box 200 on
    externally-provided sessions, NOT to stomp a deliberately sized
    session — an ``isolated_session`` child pinning a small state-store
    partition count for a streaming query must keep its value even
    though every streaming reader funnels through here.
    """
    for key, value in RUNTIME_CONFS.items():
        try:
            current = spark.conf.get(key, None)
            if key == "spark.sql.shuffle.partitions" and current not in (
                None,
                "200",
            ):
                continue
            if current != value:
                spark.conf.set(key, value)
        except Exception:
            # Static conf on this build — keep going; readers degrade
            # gracefully (load_table handles both nanos-as-long on/off).
            pass
    return spark


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "kickstarter-etl-spark", master: str | None = None) -> SparkSession:
    """Build (or reuse) a session tuned for local[N] testing.

    In local mode the driver is the only JVM, so driver memory is the
    one memory knob; shuffle partitions are matched to cores instead of
    the 200 default (AQE coalesces further at runtime).
    """
    cpus = default_parallelism()
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for key, value in RUNTIME_CONFS.items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return ensure_runtime_confs(spark)
