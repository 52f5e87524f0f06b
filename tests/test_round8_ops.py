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
    into exact_multi_rank, and round 15 deleted the second orders scan
    (the corpus-max date now derives from the checkpointed per-customer
    rollup via a broadcast, instead of its own full orders pass). The
    final physical plan must contain exactly THREE Window nodes (one
    per rank column, composed in one plan) chained over ONE ExistingRDD
    scan of the single checkpointed per-customer frame, plus exactly
    one more ExistingRDD scan inside the broadcast max subtree — and NO
    parquet scan at all (orders is read exactly once, when the
    checkpoint materializes; any FileScan here means a re-scan
    regressed in). AQE may append an '== Initial Plan ==' section that
    re-renders the same tree — count only the executed plan."""
    from udacity_dsnd_projects_spark.operators import analytics as a

    df = a.customer_rfm(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert _count_window_nodes(plan) == 3, plan[:2000]
    assert plan.count("Scan ExistingRDD") == 2, plan[:2000]
    assert plan.count("Scan parquet") == 0, plan[:2000]
