"""Physical-plan regression tests: the properties that make the
headline queries scale — filter pushdown into the parquet scan, column
pruning, broadcast of dimension sides — asserted from `explain` output
so a refactor can't silently regress them."""

from __future__ import annotations

from udacity_dsnd_projects_spark import registry


def _plan(spark, sf_dir, name: str) -> str:
    df = registry.queries()[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_risk_join_broadcasts_dim_and_pushes_filters(spark, sf_dir):
    plan = _plan(spark, sf_dir, "risk_join")
    assert "BroadcastHashJoin" in plan
    assert "PushedFilters: [" in plan and "IsNotNull" in plan


def test_pricing_summary_prunes_columns(spark, sf_dir):
    plan = _plan(spark, sf_dir, "pricing_summary")
    # the lineitem scan must not read columns the query never touches
    assert "l_orderkey" not in plan.split("ReadSchema")[-1]
    assert "PushedFilters: [" in plan


def test_revenue_by_nation_broadcasts_snowflake(spark, sf_dir):
    plan = _plan(spark, sf_dir, "revenue_by_nation")
    # customer/nation dims ride broadcast joins; only the fact-fact
    # join may shuffle
    assert plan.count("BroadcastHashJoin") >= 2


def test_sort_limit_is_take_ordered(spark, sf_dir):
    plan = _plan(spark, sf_dir, "sort_limit")
    assert "TakeOrderedAndProject" in plan  # no global sort for a top-n


def test_hot_paths_stay_wholestage_codegen(spark, sf_dir):
    # scalar/text queries must remain inside whole-stage codegen (no
    # interpreted projections creeping in). Codegen stages print as
    # `*(n)` markers. quality_score is exempt: its higher-order array
    # functions (aggregate over stopwords) are CodegenFallback by
    # Spark design — still JVM-evaluated, just not fused.
    for name in ("repetition_score", "string_normalize", "cast_projection"):
        plan = _plan(spark, sf_dir, name)
        assert "*(" in plan, name
