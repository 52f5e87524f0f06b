"""Round-8 regression test: customer_rfm rank-pass materialization
(VERDICT r7 task 3). The other round-7 tasks (stateful late-row
contract, bench replay-determinism / dual-total) shipped in round 9 —
their regression tests live in tests/test_round9_ops.py."""

from __future__ import annotations

import re


def _count_window_nodes(plan: str) -> int:
    """Count physical Window node HEADERS in a rendered plan tree — the
    match is anchored to the start-of-line tree-drawing prefix and the
    node's ``Window [`` argument bracket, so neither other node kinds
    sharing the prefix (WindowGroupLimit) nor Window-mentions inside
    expression text can over-count, across Spark versions and AQE
    re-renders. (A plain tree walk via ``children()`` cannot work:
    AdaptiveSparkPlanExec is a leaf node that hides its subtree.)"""
    return len(re.findall(r"(?m)^[\s+:*!-]*(?:\(\d+\) )?Window \[", plan))


def test_customer_rfm_rank_passes_share_one_scan(spark, sf_dir):
    """The r8 shape checkpointed between three exact_group_rank passes
    (one Window surviving per materialized pass); round 9 fused them
    into exact_multi_rank — the final physical plan must now contain
    exactly THREE Window nodes (one per rank column, composed in one
    plan) chained over exactly ONE ExistingRDD scan of the
    single checkpointed per-customer frame: nothing upstream
    re-executes, and the offset lookups are literal maps (no extra
    joins — any Scan count > 1 means a regression re-introduced a
    re-scan or a join-back)."""
    from udacity_dsnd_projects_spark.operators import analytics as a

    df = a.customer_rfm(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert _count_window_nodes(plan) == 3, plan[:2000]
    assert plan.count("Scan ExistingRDD") == 1, plan[:2000]
