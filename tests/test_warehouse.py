"""Warehouse DDL (S2) + load round-trip, and logging config (S6)."""

from __future__ import annotations

import logging
import os

import shutil

import pytest

from kickstarter_etl_pipeline_spark.logging_config import configure_logger
from kickstarter_etl_pipeline_spark.plans.star import kickstarter_star
from kickstarter_etl_pipeline_spark.plans.warehouse import create_warehouse_schema, load_warehouse
from tests.test_transform_kickstarter import raw_rows


@pytest.fixture(autouse=True)
def clean_warehouse(spark):
    """Orphan managed-table dirs from a previous session's in-memory
    catalog block CREATE TABLE (LOCATION_ALREADY_EXISTS) — clear both the
    catalog entry and the filesystem location."""
    spark.sql("DROP DATABASE IF EXISTS wh_test CASCADE")
    warehouse_dir = spark.conf.get("spark.sql.warehouse.dir", "").removeprefix("file:")
    if warehouse_dir:
        shutil.rmtree(f"{warehouse_dir}/wh_test.db", ignore_errors=True)
    yield


def test_warehouse_ddl_idempotent(spark):
    create_warehouse_schema(spark, db="wh_test")
    create_warehouse_schema(spark, db="wh_test")  # IF NOT EXISTS → no error
    tables = {r.tableName for r in spark.sql("SHOW TABLES IN wh_test").collect()}
    assert {"dim_state", "dim_category", "dim_date", "fact_campaigns"} <= tables


def test_warehouse_load_and_query(spark):
    star = kickstarter_star(raw_rows(spark))
    counts = load_warehouse(spark, star, db="wh_test")
    assert counts == {"dim_state": 2, "dim_category": 3, "dim_date": 2, "fact_campaigns": 3}
    # Star join through the catalog (the README.md:77-79 manual check, automated)
    res = spark.sql(
        """
        SELECT s.state_name, count(*) AS n
        FROM wh_test.fact_campaigns f
        JOIN wh_test.dim_state s ON f.state_key = s.state_key
        GROUP BY s.state_name ORDER BY s.state_name
        """
    ).collect()
    assert [(r["state_name"], r["n"]) for r in res] == [("failed", 1), ("successful", 2)]


def test_configure_logger_rotating(tmp_path=None):
    scratch = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch")
    log_file = os.path.join(scratch, "logs", "etl.log")
    logger = configure_logger("WhTestLogger", log_file=log_file)
    logger.info("hello warehouse")
    logger2 = configure_logger("WhTestLogger", log_file=log_file)  # idempotent
    assert logger is logger2 and len(logger.handlers) == 2
    for h in logger.handlers:
        h.flush()
    with open(log_file) as fh:
        line = fh.read()
    assert "WhTestLogger - INFO - hello warehouse" in line
    assert any(
        isinstance(h, logging.handlers.RotatingFileHandler) and h.maxBytes == 5 * 1024 * 1024
        for h in logger.handlers
    )


def test_snapshot_crash_safety(spark, tmp_path):
    """A dangling uncommitted v-dir (writer crashed before the pointer
    swap) is invisible: latest stays at the committed version and
    reading the dangling version raises."""
    import pytest as _pytest

    from kickstarter_etl_pipeline_spark.sources.sinks import (
        read_snapshot,
        snapshot_version,
        write_snapshot,
    )

    table = str(tmp_path / "t")
    df = spark.range(10).withColumnRenamed("id", "k")
    assert write_snapshot(spark, df, table) == 1
    assert write_snapshot(spark, df.filter("k < 5"), table) == 2
    # simulate a crash: v=3 data lands but the pointer never swaps
    df.filter("k < 2").write.parquet(table + "/v=3")
    assert snapshot_version(spark, table) == 2
    assert read_snapshot(spark, table).count() == 5
    assert read_snapshot(spark, table, version=1).count() == 10
    with _pytest.raises(ValueError):
        read_snapshot(spark, table, version=3)


def test_snapshot_pointer_loss_recovery(spark, tmp_path):
    """A lost _VERSION pointer (crash inside the swap window) must not
    strand committed snapshots: snapshot_version falls back to the
    highest v=K dir with _SUCCESS, reads resolve, and the next write
    allocates past the recovered version."""
    import os

    from kickstarter_etl_pipeline_spark.sources.sinks import (
        read_snapshot,
        snapshot_version,
        write_snapshot,
    )

    table = str(tmp_path / "t")
    df = spark.range(10).withColumnRenamed("id", "k")
    assert write_snapshot(spark, df, table) == 1
    assert write_snapshot(spark, df.filter("k < 5"), table) == 2
    os.remove(table + "/_VERSION")  # simulate the swap-window crash
    assert snapshot_version(spark, table) == 2
    assert read_snapshot(spark, table).count() == 5
    assert read_snapshot(spark, table, version=1).count() == 10
    # a partially-written v-dir (no _SUCCESS) stays invisible to the scan
    os.makedirs(table + "/v=7")
    assert snapshot_version(spark, table) == 2
    assert write_snapshot(spark, df.filter("k < 2"), table) == 3
    assert read_snapshot(spark, table).count() == 2
