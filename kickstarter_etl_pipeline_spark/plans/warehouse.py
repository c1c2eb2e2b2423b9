"""Warehouse DDL + load: the reference's create_db_schema / load_data
as catalog-managed Spark tables.

The reference executes ``sql/create_tables.sql`` against SQLite
(``src/etl_pipeline.py:146-161``) then bulk-inserts. Spark-first: the
same star schema is declared with ``CREATE TABLE IF NOT EXISTS`` DDL
against the session catalog (parquet-backed managed tables), and the
load is a set-based write. ``IF NOT EXISTS`` maps 1:1; PK/FK/UNIQUE are
not enforced by Spark — they hold by construction (distinct + window
keys upstream, SURVEY.md §1.1).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from kickstarter_etl_pipeline_spark.plans.star import StarSchema

#: Star-schema DDL (mirrors reference sql/create_tables.sql:1-43; types
#: per SURVEY.md §1.2 mapping — INTEGER→INT/BIGINT, REAL→DOUBLE, TEXT→STRING).
WAREHOUSE_DDL: dict[str, str] = {
    "dim_state": """
        CREATE TABLE IF NOT EXISTS {db}.dim_state (
            state_key INT NOT NULL,
            state_name STRING NOT NULL,
            is_successful INT NOT NULL
        ) USING parquet
    """,
    "dim_category": """
        CREATE TABLE IF NOT EXISTS {db}.dim_category (
            category_key INT NOT NULL,
            main_category_name STRING NOT NULL,
            sub_category_name STRING NOT NULL
        ) USING parquet
    """,
    "dim_date": """
        CREATE TABLE IF NOT EXISTS {db}.dim_date (
            date_key INT NOT NULL,
            full_date STRING NOT NULL,
            year INT NOT NULL,
            quarter INT NOT NULL,
            month INT NOT NULL,
            day INT NOT NULL,
            day_of_week STRING NOT NULL,
            is_weekend INT NOT NULL
        ) USING parquet
    """,
    "fact_campaigns": """
        CREATE TABLE IF NOT EXISTS {db}.fact_campaigns (
            campaign_id BIGINT NOT NULL,
            name STRING NOT NULL,
            backers BIGINT,
            pledged_usd DOUBLE,
            goal_usd DOUBLE,
            duration_days DOUBLE,
            state_key INT,
            category_key INT,
            launched_date_key INT
        ) USING parquet
        PARTITIONED BY (launched_date_key)
    """,
}


def create_warehouse_schema(spark: SparkSession, db: str = "kickstarter_wh") -> None:
    """S2: execute the DDL script statement-by-statement, idempotently."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    for ddl in WAREHOUSE_DDL.values():
        spark.sql(ddl.format(db=db))


def load_warehouse(spark: SparkSession, star: StarSchema, db: str = "kickstarter_wh") -> dict[str, int]:
    """Load a built star schema into the warehouse tables (overwrite —
    the reference's fresh-database run). The fact table is partitioned
    by date key so date-range queries prune partitions at 100 TB."""
    create_warehouse_schema(spark, db)
    counts = {}
    for name, df in (
        ("dim_state", star.dim_state),
        ("dim_category", star.dim_category),
        ("dim_date", star.dim_date),
    ):
        df.write.mode("overwrite").insertInto(f"{db}.{name}", overwrite=True)
        counts[name] = spark.table(f"{db}.{name}").count()
    star.fact.select(
        "campaign_id", "name", "backers", "pledged_usd", "goal_usd",
        "duration_days", "state_key", "category_key", "launched_date_key",
    ).write.mode("overwrite").insertInto(f"{db}.fact_campaigns", overwrite=True)
    counts["fact_campaigns"] = spark.table(f"{db}.fact_campaigns").count()
    return counts
