"""The full reference pipeline, end-to-end: extract → inspect → transform → load.

Mirrors the reference ``__main__`` flow (``src/etl_pipeline.py:285-315``)
including its logging narrative, against a Spark warehouse instead of
SQLite. One lazy plan per phase; the only actions are the logged counts
and the warehouse writes.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession

from kickstarter_etl_pipeline_spark import schemas
from kickstarter_etl_pipeline_spark.logging_config import configure_logger
from kickstarter_etl_pipeline_spark.operators import transform as X
from kickstarter_etl_pipeline_spark.plans.star import kickstarter_star
from kickstarter_etl_pipeline_spark.plans.warehouse import load_warehouse
from kickstarter_etl_pipeline_spark.sources.readers import read_csv


def inspect_data(df: DataFrame, logger: logging.Logger) -> None:
    """V1/V2/A1: schema + state distribution, logged (reference :66-81)."""
    logger.info("--- Starting Initial Data Inspection ---")
    logger.info("Schema: %s", df.schema.simpleString())
    for row in X.state_distribution(df).collect():
        logger.info("state %s: %d", row[0], row["count"])
    logger.info("Initial data inspection completed.")


def run_pipeline(
    spark: SparkSession,
    csv_path: str,
    db: str = "kickstarter_wh",
    infer_schema: bool = False,
    logger: logging.Logger | None = None,
) -> dict[str, int] | None:
    """Returns per-table load counts, or None when extraction failed
    (the reference's None contract, src/etl_pipeline.py:289-291)."""
    logger = logger or configure_logger()
    logger.info("START OF KICKSTARTER ETL PIPELINE")

    raw = read_csv(
        spark,
        csv_path,
        schema=None if infer_schema else schemas.KICKSTARTER_RAW,
        infer=infer_schema,
    )
    if raw is None:
        logger.critical("Extraction failed — terminating execution.")
        return None
    logger.info("Extraction completed: %d rows, %d columns", raw.count(), len(raw.columns))
    inspect_data(raw, logger)

    transformed = X.transform_kickstarter(raw)
    n_raw, n_kept = raw.count(), transformed.count()
    if n_raw - n_kept:
        logger.warning("Removed %d rows with null 'name' (NOT NULL constraint).", n_raw - n_kept)
    logger.info("Transformation completed: %d rows, %d columns", n_kept, len(transformed.columns))
    logger.info("Null values in 'pledged_usd': %d", X.null_count(transformed, "pledged_usd"))

    star = kickstarter_star(raw)
    counts = load_warehouse(spark, star, db=db)
    for table, n in counts.items():
        logger.info("%s loaded with %d records.", table, n)
    logger.info("END OF ETL PIPELINE.")
    return counts
