"""Round-5 batch-4 operators: relational shapes + time-series faces.

The oracle equivalence for each of these runs in tests/test_queries.py;
here we pin the semantic properties the oracle alone can't see (the
zero-count retention of the outer join, session-operator duality, grid
density of the resample) and the plan shapes that make them scale.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from udacity_dsnd_projects_spark.operators import relational as rel
from udacity_dsnd_projects_spark.operators import timeseries as ts
from udacity_dsnd_projects_spark.operators.windows import sessionize
from udacity_dsnd_projects_spark.sources.catalog import load_table


def test_order_distribution_accounts_for_every_customer(spark, sf_dir):
    """The LEFT OUTER join must keep zero-order customers: the
    distribution's customer total equals the dimension's row count."""
    dist = rel.customer_order_distribution(spark, sf_dir)
    total = dist.agg(F.sum("n_customers")).first()[0]
    n_cust = load_table(spark, "customer", sf_dir).count()
    assert total == n_cust


def test_top_revenue_suppliers_hits_global_max(spark, sf_dir):
    """Every returned supplier carries the same (maximal) revenue."""
    rows = rel.top_revenue_suppliers(spark, sf_dir).collect()
    assert rows
    revs = {r["total_revenue"] for r in rows}
    assert len(revs) == 1


def test_lone_late_supplier_blames_are_bounded_by_orders(spark, sf_dir):
    blamed = rel.lone_late_supplier_orders(spark, sf_dir)
    total_blames = blamed.agg(F.sum("n_held_orders")).first()[0] or 0
    n_orders = load_table(spark, "orders", sf_dir).count()
    assert total_blames <= n_orders


def test_small_quantity_revenue_broadcasts_the_part_dim(spark, sf_dir):
    plan = (
        rel.small_quantity_revenue(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_gap_fill_grid_is_dense_and_locf_holds(spark, sf_dir):
    g = ts.timeseries_gap_fill(spark, sf_dir)
    per_user = g.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("hr").alias("lo"),
        F.max("hr").alias("hi"),
    )
    bad = per_user.filter(
        F.col("n")
        != (F.unix_timestamp("hi") - F.unix_timestamp("lo")) / 3600 + 1
    )
    assert bad.count() == 0, "spine has holes"
    # the spine starts at each user's first OBSERVED hour, so LOCF
    # always has a value to carry: value_filled is never NULL, and the
    # grid boundary rows are observed
    assert g.filter(F.col("value_filled").isNull()).count() == 0
    firsts = g.join(
        g.groupBy("user_id").agg(F.min("hr").alias("hr")), ["user_id", "hr"]
    )
    assert firsts.filter(F.col("is_observed") != 1).count() == 0
    # filler rows really carry the PREVIOUS observed value
    from pyspark.sql import Window as W

    w = (
        W.partitionBy("user_id")
        .orderBy("hr")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    carried = g.withColumn(
        "prev_obs",
        F.last(F.when(F.col("is_observed") == 1, F.col("value_filled")), True).over(w),
    )
    mismatch = carried.filter(
        (F.col("is_observed") == 0) & (F.col("value_filled") != F.col("prev_obs"))
    )
    assert mismatch.count() == 0


def test_session_window_agrees_with_gaps_and_islands(spark, sf_dir):
    """The native session_window face and the lag/cumsum sessionize
    must carve the same sessions — EXCEPT where their boundary rules
    genuinely differ: sessionize measures gaps at WHOLE-SECOND
    resolution (``unix_timestamp``; new session iff truncated gap >
    1800) while session_window splits at the exact microsecond gap
    >= 1800s, so any true gap in [1800s, 1801s) may split one and not
    the other. Users with a gap inside that band are excluded; for
    everyone else the two operators must agree exactly."""
    ev = load_table(spark, "events", sf_dir)
    from pyspark.sql import Window as W

    wv = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(wv))
    band_users = [
        r["user_id"]
        for r in ev.withColumn("g", gap_us)
        .filter(
            (F.col("g") >= 1800 * 1_000_000) & (F.col("g") < 1801 * 1_000_000)
        )
        .select("user_id")
        .distinct()
        .collect()
    ]
    native = (
        ts.session_window_rollup(spark, sf_dir)
        .filter(~F.col("user_id").isin(band_users))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"), F.sum("n_events").alias("n_ev"))
    )
    manual = (
        sessionize(spark, sf_dir)
        .filter(~F.col("user_id").isin(band_users))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"), F.sum("n_events").alias("n_ev"))
    )
    assert native.exceptAll(manual).count() == 0
    assert manual.exceptAll(native).count() == 0


def test_idle_customer_balance_customers_have_no_recent_orders(spark, sf_dir):
    seg = rel.idle_customer_balance(spark, sf_dir)
    # the counted customers really have zero post-cutoff orders
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir).filter(
        F.col("o_orderdate") >= F.lit(rel.IDLE_CUTOFF).cast("timestamp")
    )
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal")).first()[0]
    )
    rich_idle = (
        cust.filter(F.col("c_acctbal") > avg_bal)
        .join(orders, cust["c_custkey"] == orders["o_custkey"], "left_anti")
        .count()
    )
    total = seg.agg(F.sum("n_customers")).first()[0] or 0
    assert total == rich_idle


# --------------------------------------------------------------------------
# batch-4 second wave: selection / clustering / multimodal dedup
# --------------------------------------------------------------------------
from udacity_dsnd_projects_spark.functions import multimodal as mm
from udacity_dsnd_projects_spark.functions import selection as sel
from udacity_dsnd_projects_spark.functions.pipeline import cluster_quality


def test_dsir_scores_target_language_higher(spark, sf_dir):
    """The importance score must separate the distributions it was
    built from: mean score of target-lang docs > mean of the rest."""
    scored = sel.dsir_importance_weights(spark, sf_dir).filter(
        F.col("n_feats") > 0
    )
    rows = (
        scored.withColumn(
            "is_target", (F.col("lang") == sel.DSIR_TARGET_LANG).cast("int")
        )
        .groupBy("is_target")
        .agg(F.avg("score").alias("m"))
        .collect()
    )
    means = {r["is_target"]: r["m"] for r in rows}
    assert means[1] > means[0]


def test_weighted_reservoir_sample_takes_k_per_stratum(spark, sf_dir):
    out = sel.weighted_reservoir_sample(spark, sf_dir)
    sizes = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    strata = {
        r["lang"]: r["n"]
        for r in load_table(spark, "documents", sf_dir)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for lang, n in sizes.items():
        assert n == min(sel.RESERVOIR_K, strata[lang])
    # rerun-stability: no RNG state anywhere
    again = sel.weighted_reservoir_sample(spark, sf_dir)
    assert out.exceptAll(again).count() == 0


def test_weighted_reservoir_plan_pushes_group_limit(spark, sf_dir):
    plan = (
        sel.weighted_reservoir_sample(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan and "Partial" in plan, plan


def test_cluster_quality_accounts_for_every_vector(spark, sf_dir):
    cq = cluster_quality(spark, sf_dir)
    total = cq.agg(F.sum("n_vecs")).first()[0]
    n_vecs = load_table(spark, "embeddings", sf_dir).count()
    assert total == n_vecs
    assert cq.filter(F.col("inertia") < 0).count() == 0


def test_media_dedup_collapses_every_injected_recrawl(spark, sf_dir):
    out = mm.media_dedup(spark, sf_dir)
    copies = out.filter(F.col("media_id") >= mm.MEDIA_DUP_OFFSET)
    # every injected copy is flagged and points at its original
    bad = copies.filter(
        (F.col("is_dup") != 1)
        | (F.col("keeper_id") != F.col("media_id") - mm.MEDIA_DUP_OFFSET)
    )
    assert copies.count() > 0
    assert bad.count() == 0
    # originals keep themselves (no cross-payload collisions)
    originals = out.filter(F.col("media_id") < mm.MEDIA_DUP_OFFSET)
    assert originals.filter(F.col("is_dup") == 1).count() == 0


# --------------------------------------------------------------------------
# batch-4 third wave: containment dedup / Gopher rules / CCNet buckets
# --------------------------------------------------------------------------
from udacity_dsnd_projects_spark.functions import dedup as dd
from udacity_dsnd_projects_spark.functions import text as tx


def test_containment_dominates_jaccard(spark, sf_dir):
    """C >= J always (min(|A|,|B|) <= |A∪B|), and the face must
    surface at least one asymmetric pair the Jaccard gate would
    score strictly lower."""
    pairs = dd.shingle_containment_pairs(spark, sf_dir)
    assert pairs.filter(F.col("containment") < F.col("jaccard")).count() == 0
    assert pairs.count() > 0


def test_gopher_passes_is_conjunction_of_rules(spark, sf_dir):
    g = tx.gopher_quality_filter(spark, sf_dir)
    bad = g.filter(
        F.col("passes")
        != (
            F.col("rule_tok_range")
            * F.col("rule_mean_len")
            * F.col("rule_symbol_ratio")
            * F.col("rule_alpha_words")
            * F.col("rule_stopwords")
        )
    )
    assert bad.count() == 0
    # the gate must actually discriminate on this corpus
    n_pass = g.agg(F.sum("passes")).first()[0]
    assert 0 < n_pass < g.count()


def test_ccnet_buckets_are_balanced_terciles(spark, sf_dir):
    b = tx.ccnet_perplexity_bucket(spark, sf_dir)
    per = (
        b.groupBy("lang", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            (F.max("n") - F.min("n")).alias("spread"),
        )
        .collect()
    )
    for r in per:
        assert r["n_buckets"] == 3
        assert r["spread"] <= 1  # tercile sizes differ by at most one
    # head really is less perplexing than tail, per lang
    hm = (
        b.groupBy("lang")
        .pivot("bucket_label", ["head", "tail"])
        .agg(F.avg("cross_entropy"))
        .collect()
    )
    for r in hm:
        assert r["head"] < r["tail"]


# --------------------------------------------------------------------------
# batch-4 fourth wave: BM25 lexical retrieval
# --------------------------------------------------------------------------
from udacity_dsnd_projects_spark.functions import search as srch


def test_bm25_returns_topk_per_query_and_self_retrieves(spark, sf_dir):
    out = srch.bm25_search(spark, sf_dir)
    per_q = {
        r["query_id"]: r["n"]
        for r in out.groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert len(per_q) == srch.N_QUERIES
    for n in per_q.values():
        assert n <= srch.BM25_TOPK
    # ranks are contiguous from 1 and scores are non-increasing in rank
    from pyspark.sql import Window as W

    w = W.partitionBy("query_id").orderBy("rk")
    bad = (
        out.withColumn("prev_rk", F.lag("rk").over(w))
        .withColumn("prev_score", F.lag("score").over(w))
        .filter(
            (F.coalesce(F.col("prev_rk"), F.lit(0)) != F.col("rk") - 1)
            | (
                F.col("prev_score").isNotNull()
                & (F.col("prev_score") < F.col("score"))
            )
        )
    )
    assert bad.count() == 0
    # at least one query self-retrieves the doc it was cut from (all
    # of them do on larger corpora; tiny SF makes common-word queries
    # ambiguous, so only existence is asserted here)
    assert out.filter(F.col("query_id") == F.col("doc_id")).count() >= 1


def test_bm25_plan_prunes_postings_and_pushes_group_limit(spark, sf_dir):
    plan = (
        srch.bm25_search(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # top-k executes as WindowGroupLimit (map-side pre-limit)
    assert "WindowGroupLimit" in plan and "Partial" in plan, plan
    # the query-term set joins in as a broadcast (postings are pruned
    # to queried terms, never a full inverted index)
    assert "BroadcastHashJoin" in plan


def test_hybrid_fusion_ranks_dual_mode_hits_highest(spark, sf_dir):
    """An item found by BOTH retrieval modes must outscore any item
    found by one mode at the same single-mode rank, and the fused
    frame preserves both source ranks for triage."""
    out = srch.hybrid_retrieval_fusion(spark, sf_dir)
    both = out.filter(
        F.col("lex_rk").isNotNull() & F.col("vec_rk").isNotNull()
    )
    single = out.filter(
        F.col("lex_rk").isNull() | F.col("vec_rk").isNull()
    )
    if both.count() > 0 and single.count() > 0:
        best_single = single.agg(F.max("rrf")).first()[0]
        worst_both_possible = 2.0 / (srch.RRF_K + srch.BM25_TOPK)
        # structural bound: a dual hit at worst ranks still beats a
        # single hit at best rank iff 2/(K+k) > 1/(K+1) — holds for
        # K=60, k=10
        assert worst_both_possible > 1.0 / (srch.RRF_K + 1)
        assert best_single <= 1.0 / (srch.RRF_K + 1) + 1e-12
    # every fused rank list is contiguous from 1
    per_q = out.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("fused_rk").alias("mx")
    )
    assert per_q.filter(F.col("n") != F.col("mx")).count() == 0


def test_media_digest_is_utf8_md5_even_for_non_ascii(spark):
    """ORACLE_MEDIA_DEDUP hashes the VARCHAR in DuckDB while the Spark
    face hashes cast(text AS BINARY); both are md5 over UTF-8 bytes.
    The fixture corpus is ASCII, so pin the equivalence on a non-ASCII
    payload here (the docstring's claim, made falsifiable)."""
    import hashlib

    samples = ["héllo wörld", "日本語テキスト", "emoji 🚀 test", "plain"]
    df = spark.createDataFrame([(s,) for s in samples], ["text"])
    got = {
        r["text"]: r["digest"]
        for r in df.select(
            "text", F.md5(F.col("text").cast("binary")).alias("digest")
        ).collect()
    }
    for s in samples:
        assert got[s] == hashlib.md5(s.encode("utf-8")).hexdigest()


def test_checkpointed_ops_scan_the_corpus_once(spark, sf_dir):
    """The checkpoint placements are load-bearing: without them the
    postings/digest subtrees re-evaluate per consumer (observed as 4-6
    parquet scans). Lock the collapsed plans."""
    import re

    for fn, cap in [
        (srch.bm25_search, 1),
        (mm.media_dedup, 0),  # digest checkpoint covers everything
    ]:
        plan = (
            fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        )
        n = len(re.findall(r"FileScan parquet", plan))
        assert n <= cap, f"{fn.__name__}: {n} parquet scans (cap {cap})"
