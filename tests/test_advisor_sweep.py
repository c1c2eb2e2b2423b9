"""Advisor self-sweep contract (r14): every CRITICAL the advisor
raises against the engine's own registry must be a documented true
positive — the sweep is how a new scale hazard fails loudly instead of
shipping. The full-registry run is the per-round artifact
(ADVISOR_SWEEP.json); here a SUBSET sweep pins the contract shape and
the expected-critical ledger cheaply."""

from __future__ import annotations

import os

from kickstarter_etl_pipeline_spark.advisor_sweep import EXPECTED_CRITICAL

SF_SMOKE = os.environ.get("SPARK_GRAFT_SMOKE_SF", "/root/testdata/sf0.001")


def test_expected_critical_names_are_registered():
    from kickstarter_etl_pipeline_spark.queries import queries

    assert EXPECTED_CRITICAL <= set(queries())


def test_subset_sweep_flags_only_the_documented_true_positive(spark):
    """A mixed subset — the documented true positive plus a spread of
    formerly-flagged (now proven-bounded) plans — must flag exactly
    EXPECTED_CRITICAL ∩ subset and nothing else."""
    from kickstarter_etl_pipeline_spark.plans.inspect import advise
    from kickstarter_etl_pipeline_spark.queries import queries

    reg = queries()
    subset = [
        "embedding_near_dup_exact",  # the documented true positive
        "embedding_topk",
        "ann_lsh_topk",
        "kendall_tau_nations",
        "events_gap_fill",
        "rolling_active_users",
        "welch_ttest_report",
        "theil_sen_daily_trend",
        "t_closeness_report",
        "source_ks_drift",
        "mean_excess_report",
    ]
    flagged = {
        name
        for name in subset
        if any(
            f.startswith("CRITICAL") for f in advise(reg[name](spark, SF_SMOKE))
        )
    }
    assert flagged == (set(subset) & EXPECTED_CRITICAL), flagged
