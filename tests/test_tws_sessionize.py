"""transformWithStateInPandas sessionizer (Spark 4 StatefulProcessor).

Round 13 un-gated the operator: the vendored pure-Python protobuf
wire-format runtime (vendor/pure_protobuf) satisfies Spark's state
protocol imports, and the query plans on an isolated child session
pinning the RocksDB state store provider (column-family support). The
parity test runs a LIVE streaming query — every ValueState get/update
crosses the JVM state server as wire bytes the shim encoded — and pins
the emitted sessions equal to the applyInPandasWithState twin's. The
fail-fast gate is exercised by forcing the availability probe to False
(no skip either way)."""

from __future__ import annotations

import pytest

from kickstarter_etl_pipeline_spark.streaming.tws_sessionize import (
    tws_available,
    tws_sessionize,
)
from tests.conftest import SF_SMOKE


def test_gate_fails_fast_when_probe_reports_missing(spark, monkeypatch):
    import kickstarter_etl_pipeline_spark.streaming.tws_sessionize as mod

    monkeypatch.setattr(mod, "tws_available", lambda: False)
    with pytest.raises(RuntimeError, match="protobuf"):
        mod.tws_sessionize(spark, SF_SMOKE)


def test_protobuf_runtime_is_importable():
    """The vendored shim (or a real protobuf) must make the state
    protocol importable in this container — the round-13 un-gating."""
    assert tws_available()
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    assert sm.StateRequest(version=2).SerializeToString() == b"\x08\x02"


def test_tws_matches_old_api(spark):
    from kickstarter_etl_pipeline_spark.streaming.stateful import (
        stateful_sessionize,
    )

    new = {tuple(r) for r in tws_sessionize(spark, SF_SMOKE).collect()}
    old = {tuple(r) for r in stateful_sessionize(spark, SF_SMOKE).collect()}
    assert new == old
    assert new  # non-empty: the stream really emitted sessions


def test_tws_timeout_matches_old_api(spark):
    """The event-time-TIMER sessionizer equals the old API's
    EventTimeTimeout operator row-for-row — including the strict
    watermark boundary for timer firing and the state eviction."""
    from kickstarter_etl_pipeline_spark.streaming.stateful import (
        stateful_sessionize_with_timeout,
    )
    from kickstarter_etl_pipeline_spark.streaming.tws_sessionize import (
        tws_sessionize_with_timeout,
    )

    new = sorted(
        map(tuple, tws_sessionize_with_timeout(spark, SF_SMOKE).collect())
    )
    old = sorted(
        map(tuple, stateful_sessionize_with_timeout(spark, SF_SMOKE).collect())
    )
    assert new == old
    assert any(r[3] for r in new)  # at least one timer-evicted session
    assert any(not r[3] for r in new)  # and at least one gap-split
