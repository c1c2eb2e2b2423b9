"""Two-phase stop/resume transformWithState surfaces
(streaming/tws_recovery.py): RocksDB restart recovery, file-source
exactly-once, and TTL eviction — parity-tested against batch aggregates
at SF_SMOKE (the DuckDB twins grade the same invariants in certify)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from kickstarter_etl_pipeline_spark.streaming.tws_sessionize import tws_available
from tests.conftest import SF_SMOKE

pytestmark = pytest.mark.skipif(
    not tws_available(), reason="no protobuf runtime (real or vendored)"
)


def _expected(spark):
    from kickstarter_etl_pipeline_spark.sources.readers import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    row = ev.select(F.min(us).alias("mn"), F.max(us).alias("mx")).first()
    cut = (int(row["mn"]) + int(row["mx"])) // 2
    return (
        ev.withColumn("_us", us)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_total"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.sum(F.when(F.col("_us") > cut, 1).otherwise(0)).alias("n_b"),
        )
        .filter(F.col("n_b") > 0)
        .collect()
    )


def test_restart_totals_recover_and_exactly_once(spark):
    """Phase-2 totals must equal the batch aggregate over BOTH halves:
    state loss would undercount, a re-read of half A would inflate."""
    from kickstarter_etl_pipeline_spark.streaming.tws_recovery import (
        tws_restart_totals,
    )

    got = {
        r["user_id"]: (r["n_total"], r["sum_value"])
        for r in tws_restart_totals(spark, SF_SMOKE).collect()
    }
    want = {r["user_id"]: (r["n_total"], r["sum_value"]) for r in _expected(spark)}
    assert got == want


def test_ttl_state_evicts_between_phases(spark):
    """The TTL'd counter must come back EMPTY at phase 2 (n_ttl = half-B
    count) while its no-TTL twin carries the full count — and the
    differential must actually differentiate (some user has phase-1
    history, else the test proves nothing)."""
    from kickstarter_etl_pipeline_spark.streaming.tws_recovery import (
        tws_ttl_counts,
    )

    got = {
        r["user_id"]: (r["n_keep"], r["n_ttl"])
        for r in tws_ttl_counts(spark, SF_SMOKE).collect()
    }
    want = {r["user_id"]: (r["n_total"], r["n_b"]) for r in _expected(spark)}
    assert got == want
    assert any(keep > ttl for keep, ttl in got.values()), (
        "no user carried phase-1 history — the eviction differential is vacuous"
    )


def test_state_schema_evolution_across_restart(spark):
    """Phase 2 re-opens the phase-1 state with a WIDENED schema under
    the Avro encoding: the old count field must carry both halves, the
    added sum field must cover half B only (Avro NULL default at
    evolution time) — and the differential must differentiate (some
    user has phase-1 history AND half-B value, else evolution of
    non-empty state was never exercised)."""
    from kickstarter_etl_pipeline_spark.sources.readers import load_table
    from kickstarter_etl_pipeline_spark.streaming.tws_recovery import (
        tws_evolved_totals,
    )

    ev = load_table(spark, SF_SMOKE, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    row = ev.select(F.min(us).alias("mn"), F.max(us).alias("mx")).first()
    cut = (int(row["mn"]) + int(row["mx"])) // 2
    want = {
        r["user_id"]: (r["n_total"], r["sum_b"])
        for r in ev.withColumn("_us", us)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_total"),
            F.round(
                F.sum(F.when(F.col("_us") > cut, F.col("value")).otherwise(0.0)), 4
            ).alias("sum_b"),
            F.sum(F.when(F.col("_us") > cut, 1).otherwise(0)).alias("n_b"),
        )
        .filter(F.col("n_b") > 0)
        .collect()
    }
    got = {
        r["user_id"]: (r["n_total"], r["sum_b_value"])
        for r in tws_evolved_totals(spark, SF_SMOKE).collect()
    }
    assert got == want
    ev_counts = {
        r["user_id"]: r["n"]
        for r in ev.withColumn("_us", us)
        .filter(F.col("_us") > cut)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert any(
        n_total > ev_counts[u] for u, (n_total, _) in got.items()
    ), "no user carried phase-1 state through the evolution — vacuous"


def test_state_at_rest_equals_half_a_fold(spark):
    """Reading the typed ValueState straight from the checkpoint after
    a half-A-only run must reproduce the half-A batch fold exactly —
    and the store must hold NO user absent from half A."""
    from kickstarter_etl_pipeline_spark.sources.readers import load_table
    from kickstarter_etl_pipeline_spark.streaming.tws_recovery import (
        tws_state_at_rest,
    )

    ev = load_table(spark, SF_SMOKE, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    row = ev.select(F.min(us).alias("mn"), F.max(us).alias("mx")).first()
    cut = (int(row["mn"]) + int(row["mx"])) // 2
    want = {
        r["user_id"]: (r["n"], r["s"])
        for r in ev.withColumn("_us", us)
        .filter(F.col("_us") <= cut)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("s"))
        .collect()
    }
    got = {
        r["user_id"]: (r["n_total"], r["sum_value"])
        for r in tws_state_at_rest(spark, SF_SMOKE).collect()
    }
    assert got == want and len(got) > 0
