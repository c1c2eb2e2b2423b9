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


def test_missed_raw_pushdown_classifier():
    """r15 advisor precision: the PushedFilters-empty rule WARNs only
    when a bare raw-column conjunct failed to push with no semantic
    barrier below the Filter; derived-expression predicates and
    window-pinned raw filters are demoted (all 53 r14 WARN paths were
    of those kinds). Synthetic plan texts pin both directions."""
    from kickstarter_etl_pipeline_spark.plans.inspect import _missed_raw_pushdown

    def plan(filter_cond: str, mid_op: str = "") -> str:
        mid_tree = f"   +- {mid_op} (3)\n    " if mid_op else ""
        mid_detail = f"\n(3) {mid_op}\nInput [1]: [a#1L]\n" if mid_op else ""
        return (
            "== Physical Plan ==\n"
            "Filter (2)\n"
            f"{mid_tree}+- Scan parquet  (1)\n"
            "\n\n"
            "(1) Scan parquet \n"
            "Output [1]: [a#1L]\n"
            "ReadSchema: struct<a:bigint>\n"
            f"{mid_detail}"
            "\n(2) Filter\n"
            f"Condition : {filter_cond}\n"
        )

    # bare raw-column predicate, no barrier: a genuine miss -> True
    assert _missed_raw_pushdown(plan("(isnotnull(a#1L) AND (a#1L > 5))"))
    # derived-expression predicate: never pushable -> False
    assert not _missed_raw_pushdown(plan("(size(split(a#1L, x, -1), false) > 0)"))
    # bare conjunct buried in a CASE: not a top-level pushable -> False
    assert not _missed_raw_pushdown(
        plan("CASE WHEN NOT ((a#1L % 10) = 0) THEN true ELSE isnotnull(a#1L) END")
    )
    # raw predicate pinned above a Window: pushing would change results -> False
    assert not _missed_raw_pushdown(plan("(a#1L = 5)", mid_op="Window"))
    # raw predicate above an ExistingRDD checkpoint: no pushdown machinery -> False
    ckpt = (
        "== Physical Plan ==\n"
        "Filter (2)\n"
        "+- Scan ExistingRDD (1)\n"
        "\n\n(1) Scan ExistingRDD\nOutput [1]: [a#1L]\n"
        "\n(2) Filter\nCondition : (a#1L > 5)\n"
    )
    assert not _missed_raw_pushdown(ckpt)
