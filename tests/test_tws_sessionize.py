"""transformWithStateInPandas sessionizer (Spark 4 StatefulProcessor).

The operator is environment-gated: Spark's state-protocol worker needs
the protobuf package, absent in this container. When available, the
emitted sessions must equal the applyInPandasWithState twin's exactly
(same oracle); when absent, the operator must fail fast with a clear
error rather than crashing the stream mid-query.
"""

from __future__ import annotations

import pytest

from kickstarter_etl_pipeline_spark.streaming.tws_sessionize import (
    tws_available,
    tws_sessionize,
)
from tests.conftest import SF_SMOKE


def test_gate_fails_fast_without_protobuf(spark):
    if tws_available():
        pytest.skip("protobuf present — gate inactive, parity test covers it")
    with pytest.raises(RuntimeError, match="protobuf"):
        tws_sessionize(spark, SF_SMOKE)


@pytest.mark.skipif(not tws_available(), reason="protobuf not installed")
def test_tws_matches_old_api(spark):
    from kickstarter_etl_pipeline_spark.streaming.stateful import stateful_sessionize

    new = {tuple(r) for r in tws_sessionize(spark, SF_SMOKE).collect()}
    old = {tuple(r) for r in stateful_sessionize(spark, SF_SMOKE).collect()}
    assert new == old
