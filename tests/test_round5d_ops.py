"""Round-5 fifth batch (relational2 + training): plan properties and
edge semantics for the TPC-H Q2/Q5/Q6/Q8/Q9/Q10/Q14/Q16/Q18/Q19
shapes plus the sliding-window chunker and curriculum scheduler.
Value correctness is covered by tests/test_queries.py's oracle
replica; these tests pin the SCALE properties (pushdown, broadcast,
no stray shuffles) and the deterministic top-k tie-break."""

from __future__ import annotations

from pyspark.sql import functions as F

from udacity_dsnd_projects_spark import registry
from udacity_dsnd_projects_spark.operators import relational2 as rel2


def _plan(spark, sf_dir, name: str) -> str:
    df = registry.queries()[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_forecast_revenue_pushes_all_predicates(spark, sf_dir):
    # Q6 is the pushdown benchmark: date + discount + quantity must
    # all reach the parquet scan, and only the 4 touched columns load
    plan = _plan(spark, sf_dir, "forecast_revenue")
    pushed = plan.split("PushedFilters: [")[1].split("]")[0]
    assert "l_shipdate" in pushed
    assert "l_discount" in pushed
    assert "l_quantity" in pushed
    read = plan.split("ReadSchema")[-1]
    assert "l_orderkey" not in read and "l_returnflag" not in read


def test_regional_supplier_volume_broadcasts_all_dims(spark, sf_dir):
    # Q5: region/nation/customer/supplier all ride broadcasts; the
    # only hash shuffle left is orders⋈lineitem on orderkey
    plan = _plan(spark, sf_dir, "regional_supplier_volume")
    # at the test SF even the date-pruned orders side fits the
    # broadcast threshold, so ALL joins may be broadcast — the scale
    # property asserted is "no dim ever rides a shuffle join"
    assert plan.count("BroadcastHashJoin") >= 3


def test_bracket_revenue_single_pass_no_shuffle(spark, sf_dir):
    # Q19: broadcast part + one global aggregate — lineitem rows must
    # never cross an exchange (only the 1-row partial-agg exchange)
    plan = _plan(spark, sf_dir, "bracket_revenue")
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan.split("BroadcastExchange")[0]


def test_returned_item_top20_is_take_ordered_and_tie_stable(spark, sf_dir):
    plan = _plan(spark, sf_dir, "returned_item_customers")
    # top-20 must be a TakeOrdered, not a global sort materialization
    assert "TakeOrderedAndProject" in plan
    # the boundary row is deterministic: ordering includes custkey
    df = registry.queries()["returned_item_customers"](spark, sf_dir)
    rows = df.collect()
    assert len(rows) == 20
    assert len({r.c_custkey for r in rows}) == 20


def test_min_cost_supplier_keeps_ties(spark, sf_dir):
    # Q2 preserves EVERY supplier achieving the per-part minimum. An
    # independent aggregate-then-join recomputation (different plan
    # shape from the operator's window-min) must agree on the exact
    # (part, supplier) winner set — a row_number()==1 regression that
    # arbitrarily drops tied suppliers fails this set equality.
    from udacity_dsnd_projects_spark.sources.catalog import load_table

    df = registry.queries()["min_cost_supplier"](spark, sf_dir)
    got = {(r.p_partkey, r.s_suppkey) for r in df.collect()}

    part = load_table(spark, "part", sf_dir).filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") <= 10)
    ).select("p_partkey")
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir).filter(
        F.col("r_name") == "EUROPE"
    )
    euro = nation.join(
        region, nation["n_regionkey"] == region["r_regionkey"]
    ).select("n_nationkey")
    supp = load_table(spark, "supplier", sf_dir).join(
        euro, F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_partkey",
        "l_suppkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit"),
    )
    costs = (
        li.join(part, F.col("l_partkey") == part["p_partkey"])
        .join(supp, F.col("l_suppkey") == supp["s_suppkey"])
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("unit").alias("cost"))
    )
    mins = costs.groupBy("l_partkey").agg(F.min("cost").alias("mn"))
    expected = {
        (r.l_partkey, r.l_suppkey)
        for r in costs.join(mins, "l_partkey")
        .filter(F.col("cost") == F.col("mn"))
        .collect()
    }
    assert got == expected and len(got) > 0


def test_large_volume_orders_threshold_is_strict(spark, sf_dir):
    df = registry.queries()["large_volume_orders"](spark, sf_dir)
    assert df.filter(F.col("total_qty") <= rel2.LARGE_ORDER_QTY).count() == 0


def test_market_share_bounded_and_promo_pct_bounded(spark, sf_dir):
    shares = registry.queries()["national_market_share"](spark, sf_dir)
    bad = shares.filter(
        (F.col("mkt_share") < 0) | (F.col("mkt_share") > 1)
    ).count()
    assert bad == 0
    promo = registry.queries()["promo_revenue_share"](spark, sf_dir)
    bad = promo.filter(
        (F.col("promo_pct") < 0) | (F.col("promo_pct") > 100)
    ).count()
    assert bad == 0


def test_part_supplier_diversity_excludes_blocklist(spark, sf_dir):
    # the blocklist must actually remove suppliers from segment
    # counts: an unblocked recomputation strictly exceeds the
    # operator's total, by exactly the blocked pairs' contribution
    from udacity_dsnd_projects_spark.sources.catalog import load_table

    df = registry.queries()["part_supplier_diversity"](spark, sf_dir)
    got = {
        (r.p_brand, r.p_type, r.p_size): r.supplier_cnt for r in df.collect()
    }

    part = load_table(spark, "part", sf_dir).filter(
        (F.col("p_brand") != "Brand#9") & (F.col("p_type") != "PROMO")
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    rel = (
        load_table(spark, "lineitem", sf_dir)
        .select("l_partkey", "l_suppkey")
        .distinct()
        .join(part, F.col("l_partkey") == part["p_partkey"])
    )
    blocked = load_table(spark, "supplier", sf_dir).filter(
        F.col("s_acctbal") < rel2.BLOCKED_SUPPLIER_BAL
    ).select("s_suppkey")
    assert blocked.count() > 0  # the proxy blocklist is non-vacuous
    unblocked = {
        (r.p_brand, r.p_type, r.p_size): r.n
        for r in rel.groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("n"))
        .collect()
    }
    # same segment keys (a segment served ONLY by blocked suppliers
    # would vanish — assert that isn't silently happening here), every
    # segment's count bounded by the unblocked one, and the blocklist
    # visibly bites somewhere
    assert set(got) == set(unblocked)
    assert all(got[k] <= unblocked[k] for k in got)
    assert any(got[k] < unblocked[k] for k in got)


# --- training.py: sliding windows + curriculum -----------------------------


def test_sliding_window_chunks_no_shuffle_and_tiling(spark, sf_dir):
    from udacity_dsnd_projects_spark.functions import training as tr

    plan = _plan(spark, sf_dir, "sliding_window_chunks")
    # row-local explode: the whole operator is one scan, zero exchanges
    assert "Exchange" not in plan
    df = registry.queries()["sliding_window_chunks"](spark, sf_dir)
    w, s = tr.WINDOW_TOKS, tr.WINDOW_STRIDE
    # starts advance by exactly the stride and every non-final window
    # is full-size; the final window reaches the end of the doc
    assert df.filter(F.col("start_tok") != F.col("win_id") * s).count() == 0
    last = df.groupBy("doc_id").agg(F.max("win_id").alias("mx"))
    nonfinal = df.join(last, "doc_id").filter(F.col("win_id") < F.col("mx"))
    assert nonfinal.filter(F.col("win_len") != w).count() == 0
    assert df.filter(F.col("win_len") <= 0).count() == 0


def test_curriculum_order_phases_balanced_and_positions_dense(spark, sf_dir):
    from udacity_dsnd_projects_spark.functions import training as tr

    df = registry.queries()["curriculum_order"](spark, sf_dir)
    sizes = df.groupBy("phase").agg(
        F.count(F.lit(1)).alias("n"), F.max("position").alias("mx"),
        F.min("position").alias("mn"),
        F.countDistinct("position").alias("nd"),
    )
    rows = sizes.collect()
    assert len(rows) == tr.CURRICULUM_PHASES
    # NTILE balance: phase sizes differ by at most 1
    ns = [r.n for r in rows]
    assert max(ns) - min(ns) <= 1
    # positions are dense 1..n within each phase
    for r in rows:
        assert (r.mn, r.mx, r.nd) == (1, r.n, r.n)


def test_window_chunks_matches_python_reference_on_random_docs(spark):
    """Property check: the chunker's Spark-side window math equals a
    straightforward Python reference on random token counts — pinned
    over the seam where the single-window case meets the multi-window
    ceil-division (n ≤ W vs n > W), including exact-boundary lengths.

    hypothesis would shrink failures better, but a Spark round-trip
    per example is too slow for its default budget — a deterministic
    sweep over every length around the boundaries plus a coarse tail
    covers the same seam."""
    import hashlib

    from udacity_dsnd_projects_spark.functions.training import (
        WINDOW_STRIDE as S,
        WINDOW_TOKS as W,
        window_chunks,
    )
    from pyspark.sql import types as T

    lengths = sorted(
        set(
            list(range(1, 2))
            + list(range(W - 2, W + 3))
            + list(range(W + S - 2, W + S + 3))
            + list(range(W + 2 * S - 2, W + 2 * S + 3))
            + [200, 333, 500]
        )
    )
    rows = [
        (i, " ".join(f"w{(i * 31 + j) % 13}" for j in range(n)))
        for i, n in enumerate(lengths)
    ]
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    got = {
        (r.doc_id, r.win_id): (r.start_tok, r.win_len, r.win_hash)
        for r in window_chunks(spark.createDataFrame(rows, schema)).collect()
    }

    expected = {}
    for i, n in enumerate(lengths):
        toks = [f"w{(i * 31 + j) % 13}" for j in range(n)]
        n_win = 1 if n <= W else -((n - W) // -S) + 1  # ceil div
        for k in range(n_win):
            start = k * S
            window = toks[start : start + W]
            expected[(i, k)] = (
                start,
                len(window),
                hashlib.md5(" ".join(window).encode()).hexdigest(),
            )
    assert got == expected


def test_skew_profile_is_take_ordered_over_key_frame(spark, sf_dir):
    # top-k must be a TakeOrdered over the ALREADY-AGGREGATED key
    # frame (one hash aggregate pair for the groupBy, a broadcast for
    # the 1-row totals), never a global sort of fact rows
    plan = _plan(spark, sf_dir, "skew_profile")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    df = registry.queries()["skew_profile"](spark, sf_dir)
    rows = df.collect()
    assert 0 < len(rows) <= 10
    # shares are a probability mass subset; ratios positive
    assert all(0 < r.row_share <= 1 and r.skew_ratio > 0 for r in rows)
    assert sum(r.row_share for r in rows) <= 1.0 + 1e-9


def test_corpus_datacard_single_scan_and_sane_ranges(spark, sf_dir):
    # one documents scan feeds every column (the planted-copy union
    # reads the same table twice in the logical plan, but no column
    # outside the five per-doc inputs is read), and the ratio columns
    # are probability-ranged with a non-trivial dup rate overall
    df = registry.queries()["corpus_datacard"](spark, sf_dir)
    rows = df.collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.pct_en <= 1.0
        assert 0.0 <= r.mean_quality <= 1.0
        assert 0.0 <= r.dup_rate < 1.0
        assert r.total_tokens > 0 and r.n_docs > 0
    assert any(r.dup_rate > 0 for r in rows)  # planted dups visible
    plan = _plan(spark, sf_dir, "corpus_datacard")
    # the planted-copy union produces TWO documents scans — the
    # untouched column must be pruned from EVERY one of them
    segments = plan.split("ReadSchema")[1:]
    assert segments
    for seg in segments:
        assert "n_chars" not in seg.split("\n")[0]


def test_rolling_distinct_users_matches_bruteforce_on_sample_days(spark, sf_dir):
    # spot-check trailing-window semantics directly: for three spine
    # days, the reported count equals a brute-force distinct over
    # events in [d-6, d]
    import datetime as dt

    from udacity_dsnd_projects_spark.operators.timeseries import (
        ROLLING_WINDOW_DAYS,
    )
    from udacity_dsnd_projects_spark.sources.catalog import load_table

    df = registry.queries()["rolling_distinct_users"](spark, sf_dir)
    rows = {r.day: r.active_users_7d for r in df.collect()}
    days = sorted(rows)
    assert len(days) >= ROLLING_WINDOW_DAYS
    ev = (
        load_table(spark, "events", sf_dir)
        .select(F.to_date("ts").alias("day"), "user_id")
        .distinct()
        .collect()
    )
    for probe in (days[0], days[len(days) // 2], days[-1]):
        lo = probe - dt.timedelta(days=ROLLING_WINDOW_DAYS - 1)
        expect = len(
            {
                r.user_id
                for r in ev
                if lo.date() <= r.day <= probe.date()
            }
        )
        assert rows[probe] == expect, probe


def test_dominant_suppliers_reuses_the_pair_exchange(spark, sf_dir):
    # both branches of the per_ps ⋈ agg(per_ps) self-join must share
    # the per-(part, supplier) shuffle — executed plan shows a
    # ReusedExchange, i.e. the fact scan + wide exchange ran once
    df = registry.queries()["dominant_part_suppliers"](spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan


def test_exact_quantiles_match_bruteforce_rank_definition(spark, sf_dir):
    import math

    from udacity_dsnd_projects_spark.operators.analytics import QUANTILE_PROBES
    from udacity_dsnd_projects_spark.sources.catalog import load_table

    got = {
        r.quantile: r.value
        for r in registry.queries()["exact_quantiles"](spark, sf_dir).collect()
    }
    vals = sorted(
        (r.l_extendedprice, r.l_orderkey, r.l_linenumber)
        for r in load_table(spark, "lineitem", sf_dir)
        .select("l_extendedprice", "l_orderkey", "l_linenumber")
        .collect()
    )
    n = len(vals)
    for q in QUANTILE_PROBES:
        assert got[q] == vals[math.ceil(q * n) - 1][0], q


def test_exact_quantiles_never_global_sorts(spark, sf_dir):
    # the rank primitive must keep the total order distributed: a
    # single-task global sort would appear as a rangepartitioning
    # exchange — assert it never does
    plan = _plan(spark, sf_dir, "exact_quantiles")
    assert "rangepartitioning" not in plan
