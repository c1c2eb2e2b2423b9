"""Sinks: Parquet/table append, idempotent append, partitioned fact layout.

The reference loads via sqlite3 ``executemany`` (S3, ``src/etl_pipeline.py:
197-201,272-277``) and relies on ``INSERT OR IGNORE`` for idempotency (S4,
``:198,229,246``). Spark-first equivalents:

- plain append       → ``df.write.mode('append')`` (parallel, partitioned)
- INSERT OR IGNORE   → left-anti join against the existing keys, then append
- fact layout        → partition by the date key so date-range queries prune
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def append_ignore_existing(
    spark: SparkSession, df: DataFrame, path: str, keys: list[str]
) -> int:
    """Idempotent append (reference ``INSERT OR IGNORE`` semantics, S4).

    Rows whose ``keys`` already exist at ``path`` are skipped via a
    left-anti join; the rest are appended. Returns the number of rows
    appended. The anti join shuffles only on re-runs; first write is a
    plain parallel append.
    """
    if os.path.exists(path):
        existing = spark.read.parquet(path).select(*keys)
        fresh = df.join(existing, on=keys, how="left_anti")
    else:
        fresh = df
    n = fresh.count()
    if n:
        fresh.write.mode("append").parquet(path)
    return n
