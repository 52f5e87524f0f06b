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


def test_customer_rfm_rank_passes_materialized_once(spark, sf_dir):
    """The three exact_group_rank passes are checkpointed between each
    other: the final physical plan must contain exactly ONE Window node
    (the monetary pass) — the recency/frequency passes collapse to
    ExistingRDD scans of their localCheckpoint materializations instead
    of re-executing ~3x inside the downstream passes' sketch/count/rank
    scans."""
    from udacity_dsnd_projects_spark.operators import analytics as a

    df = a.customer_rfm(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert _count_window_nodes(plan) == 1, plan[:2000]
    assert "Scan ExistingRDD" in plan
