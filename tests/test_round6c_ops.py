"""Round-6 third-wave operators: near-dup graph observability
(source overlap, cluster histogram, triangles) and per-type OLS trend.

Oracle equality runs via the registry parameterization in
tests/test_queries.py; these pin oracle-independent properties.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from udacity_dsnd_projects_spark.functions.curation import (
    dup_cluster_histogram,
    near_dup_components,
    near_dup_triangles,
    source_overlap_matrix,
)
from udacity_dsnd_projects_spark.operators.analytics import value_trend_by_type

SF = "/root/testdata/sf0.001"


# --- source_overlap_matrix -------------------------------------------------
def test_overlap_matrix_is_unordered_and_normalized(spark):
    rows = source_overlap_matrix(spark, SF).collect()
    assert rows, "the corpus LSH graph has pairs"
    for r in rows:
        assert r.source_a <= r.source_b
        assert r.n_pairs > 0
    assert abs(sum(r.pair_share for r in rows) - 1.0) < 1e-4


# --- dup_cluster_histogram -------------------------------------------------
def test_histogram_accounts_for_every_clustered_doc(spark):
    hist = dup_cluster_histogram(spark, SF).collect()
    assert hist
    # a component only contains docs that appear in >=1 pair
    assert all(r.cluster_size >= 2 for r in hist)
    assert all(r.n_docs == r.cluster_size * r.n_clusters for r in hist)
    total_docs = sum(r.n_docs for r in hist)
    assert total_docs == near_dup_components(spark, SF).count()


# --- near_dup_triangles ----------------------------------------------------
def test_triangle_summary_bounds(spark):
    row = near_dup_triangles(spark, SF).first()
    assert row.n_edges > 0
    assert row.n_wedges >= row.n_triangles  # each triangle closes a wedge
    if row.transitivity is not None:
        assert 0.0 <= row.transitivity <= 1.0


def test_triangle_count_matches_bruteforce(spark):
    """Exact check against a driver-side brute force over the (small)
    test pair graph."""
    from udacity_dsnd_projects_spark.functions.dedup import lsh_pairs_for
    from udacity_dsnd_projects_spark.sources.catalog import load_table

    edges = {
        (r.doc_a, r.doc_b)
        for r in lsh_pairs_for(
            load_table(spark, "documents", SF).select("doc_id", "text")
        ).collect()
    }
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = sum(
        1
        for a, b in edges
        for c in adj[a] & adj[b]
        if b < c
    )
    row = near_dup_triangles(spark, SF).first()
    assert row.n_triangles == tri
    wedges = sum(len(n) * (len(n) - 1) // 2 for n in adj.values())
    assert row.n_wedges == wedges


# --- value_trend_by_type ---------------------------------------------------
def test_trend_matches_numpy_ols(spark):
    """slope/intercept/r2 must agree with numpy's OLS on the same
    daily aggregates (catches any moment-formula or scaling slip)."""
    import numpy as np

    from udacity_dsnd_projects_spark.sources.catalog import load_table

    ev = load_table(spark, "events", SF)
    daily = (
        ev.groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.sum(F.col("value").cast("decimal(30,6)")).alias("y"))
        .collect()
    )
    by_type: dict[str, list] = {}
    for r in daily:
        by_type.setdefault(r.event_type, []).append((r.d, float(r.y)))
    got = {r.event_type: r for r in value_trend_by_type(spark, SF).collect()}
    assert set(got) == set(by_type)
    for t, pts in by_type.items():
        pts.sort()
        d0 = pts[0][0]
        x = np.array([(d - d0).days for d, _ in pts], dtype=float)
        y = np.array([v for _, v in pts])
        r = got[t]
        assert r.n_days == len(pts)
        if len(pts) < 2 or np.var(x) == 0:
            assert r.slope is None
            continue
        slope, intercept = np.polyfit(x, y, 1)
        assert math.isclose(r.slope, slope, rel_tol=1e-4, abs_tol=1e-4)
        assert math.isclose(r.intercept, intercept, rel_tol=1e-4, abs_tol=1e-3)
        if np.var(y) > 0:
            r2 = np.corrcoef(x, y)[0, 1] ** 2
            assert math.isclose(r.r2, r2, rel_tol=1e-4, abs_tol=1e-6)
