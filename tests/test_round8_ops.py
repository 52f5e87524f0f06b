"""Round-8 regression tests: customer_rfm rank-pass materialization
(VERDICT r7 task 3), stateful late-row contract (task 4), and the
bench replay-determinism / dual-total surface (tasks 2 & 5)."""

from __future__ import annotations

import re


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
    assert len(re.findall(r"\bWindow\b", plan)) == 1, plan[:2000]
    assert "Scan ExistingRDD" in plan
