"""Explicit schemas for every source and warehouse table.

The reference infers all types from CSV (reference ``src/etl_pipeline.py:53``
— pandas ``read_csv`` with no dtype) and declares only the warehouse DDL
(reference ``sql/create_tables.sql:1-43``). At 100 TB, inference is slow and
nondeterministic, so the engine declares StructTypes for everything and keeps
inference as an opt-in parity mode (sources.readers.read_csv).

Types follow SURVEY.md §1.2: money stays DoubleType (the reference and its
SQLite warehouse use float64/REAL, and the DuckDB oracle hashes doubles);
0/1 flags stay IntegerType, not BooleanType, to match reference semantics.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- Raw Kickstarter CSV (reference logs/etl_pipeline.log:10-24; 15 cols) ---
# Note the literal column name "usd pledged" (embedded space) — preserved
# here, dropped by the final projection exactly like the reference.
KICKSTARTER_RAW = T.StructType(
    [
        T.StructField("ID", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("category", T.StringType()),
        T.StructField("main_category", T.StringType()),
        T.StructField("currency", T.StringType()),
        T.StructField("deadline", T.StringType()),
        T.StructField("goal", T.DoubleType()),
        T.StructField("launched", T.StringType()),
        T.StructField("pledged", T.DoubleType()),
        T.StructField("state", T.StringType()),
        T.StructField("backers", T.LongType()),
        T.StructField("country", T.StringType()),
        T.StructField("usd pledged", T.DoubleType()),
        T.StructField("usd_pledged_real", T.DoubleType()),
        T.StructField("usd_goal_real", T.DoubleType()),
    ]
)

# --- Warehouse star schema (reference sql/create_tables.sql:1-43) ---
DIM_STATE = T.StructType(
    [
        T.StructField("state_key", T.IntegerType(), False),
        T.StructField("state_name", T.StringType(), False),
        T.StructField("is_successful", T.IntegerType(), False),
    ]
)

DIM_CATEGORY = T.StructType(
    [
        T.StructField("category_key", T.IntegerType(), False),
        T.StructField("main_category_name", T.StringType(), False),
        T.StructField("sub_category_name", T.StringType(), False),
    ]
)

DIM_DATE = T.StructType(
    [
        T.StructField("date_key", T.IntegerType(), False),
        T.StructField("full_date", T.StringType(), False),
        T.StructField("year", T.IntegerType(), False),
        T.StructField("quarter", T.IntegerType(), False),
        T.StructField("month", T.IntegerType(), False),
        T.StructField("day", T.IntegerType(), False),
        T.StructField("day_of_week", T.StringType(), False),
        T.StructField("is_weekend", T.IntegerType(), False),
    ]
)

FACT_CAMPAIGNS = T.StructType(
    [
        T.StructField("campaign_id", T.LongType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("backers", T.LongType()),
        T.StructField("pledged_usd", T.DoubleType()),
        T.StructField("goal_usd", T.DoubleType()),
        T.StructField("duration_days", T.DoubleType()),
        T.StructField("state_key", T.IntegerType()),
        T.StructField("category_key", T.IntegerType()),
        T.StructField("launched_date_key", T.IntegerType()),
    ]
)

# --- Driver fixture tables (/root/testdata/sf*/; FIXTURES.md §B) ---
# events.ts is TIMESTAMP(NANOS) on disk; with the nanosAsLong conf it
# reads as LongType and load_table converts it to TimestampNTZ (µs).
EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # raw int64 nanoseconds on disk
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

#: All fixture table names shipped by the driver (TESTDATA.md).
FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
