"""Behavioral + plan tests for the round-5 second batch: domain-level
curation, snapshot diff / CDC merge, epoch upsampling, and the kNN
graph. (Oracle equivalence for every registered face is in
test_queries.py.)"""

from __future__ import annotations

import math

from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# Domain-level curation
# --------------------------------------------------------------------------
def test_domain_filter_consistent_with_stats(spark, sf_dir):
    from udacity_dsnd_projects_spark.functions import web as w

    stats = {r["domain"]: r["avg_quality"] for r in w.domain_stats(spark, sf_dir).collect()}
    kept = w.domain_quality_filter(spark, sf_dir).collect()
    kept_domains = {r["domain"] for r in kept}
    expect = {d for d, q in stats.items() if q >= w.DOMAIN_MIN_AVG_QUALITY}
    assert kept_domains == expect
    # a real split: the gate must actually drop some domains and keep some
    assert 0 < len(expect) < len(stats)
    for r in kept:
        assert r["avg_quality"] >= w.DOMAIN_MIN_AVG_QUALITY


def test_domain_filter_broadcasts_domain_list(spark, sf_dir):
    """The good-domain list is metadata-sized: the corpus-side join
    must be a broadcast, never a corpus shuffle."""
    from udacity_dsnd_projects_spark.functions import web as w

    plan = (
        w.domain_quality_filter(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan


def test_domain_cardinality(spark, sf_dir):
    from udacity_dsnd_projects_spark.functions import web as w

    doms = w.doc_domains(spark, sf_dir)
    n = doms.select("domain").distinct().count()
    # sources × DOMAIN_MOD residues (every combination present at any sf)
    n_src = doms.sparkSession.read.parquet(f"{sf_dir}/documents.parquet").select(
        "source"
    ).distinct().count()
    assert n <= n_src * w.DOMAIN_MOD
    assert n >= n_src  # every source maps to at least one domain


# --------------------------------------------------------------------------
# Snapshot diff
# --------------------------------------------------------------------------
def test_snapshot_diff_statuses_line_up_with_residues(spark, sf_dir):
    from udacity_dsnd_projects_spark.functions import snapshot as s

    rows = s.snapshot_diff(spark, sf_dir).collect()
    by_status: dict[str, set[int]] = {}
    for r in rows:
        by_status.setdefault(r["status"], set()).add(r["doc_id"])
        if r["status"] == "added":
            assert r["old_md5"] is None and r["new_md5"] is not None
        elif r["status"] == "removed":
            assert r["new_md5"] is None and r["old_md5"] is not None
        else:
            assert r["old_md5"] != r["new_md5"]
    # removed rows are exactly the offset clones
    assert all(d >= s.SNAP_ID_OFFSET for d in by_status["removed"])
    # added rows are exactly the residue class missing from OLD
    assert all(d % s.SNAP_ADDED_MOD == 3 for d in by_status["added"])
    # changed rows carry the stale-revision residue and are not "added"
    assert all(
        d % s.SNAP_CHANGED_MOD == 2 and d % s.SNAP_ADDED_MOD != 3
        for d in by_status["changed"]
    )
    assert by_status["added"] and by_status["removed"] and by_status["changed"]


def test_snapshot_diff_hashes_before_join(spark, sf_dir):
    """Only (id, md5) may cross the exchange — the full text column
    must be projected away below the join."""
    from udacity_dsnd_projects_spark.functions import snapshot as s

    plan = (
        s.snapshot_diff(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    joins = [ln for ln in plan.splitlines() if "SortMergeJoin" in ln or "ShuffledHashJoin" in ln]
    assert joins, plan
    assert all("text" not in ln for ln in joins), joins


# --------------------------------------------------------------------------
# CDC merge
# --------------------------------------------------------------------------
def test_cdc_merge_semantics(spark, sf_dir):
    from udacity_dsnd_projects_spark.functions import snapshot as s

    out = {r["doc_id"]: r for r in s.cdc_merge(spark, sf_dir).collect()}
    # deletes win (seq 3 is the max everywhere it exists)
    assert all(d % s.CDC_DELETE_MOD != 2 for d in out)
    for d, r in out.items():
        if d % 3 != 0 and d % s.CDC_REVISE_MOD == 1:
            assert r["last_seq"] == 2  # revision superseded the base row
        elif d % 3 == 0:
            assert d % s.CDC_INSERT_MOD == 0 and r["last_seq"] == 2
        else:
            assert r["last_seq"] == 1
    assert out  # non-empty merge result


def test_cdc_merge_argmax_not_window(spark, sf_dir):
    """Latest-wins must be the map-side-combined max(struct), not a
    row_number window (partial aggregation visible in the plan)."""
    from udacity_dsnd_projects_spark.functions import snapshot as s

    plan = (
        s.cdc_merge(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan, plan
    assert "partial_max" in plan or "HashAggregate" in plan, plan


# --------------------------------------------------------------------------
# Mixture upsampling
# --------------------------------------------------------------------------
def test_mixture_upsample_epoch_counts(spark, sf_dir):
    from udacity_dsnd_projects_spark.functions import pipeline as p

    rows = p.mixture_upsample(spark, sf_dir).collect()
    per_doc: dict[int, list] = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r)
    for d, rs in per_doc.items():
        w = rs[0]["up_weight"]
        assert 0 < w <= p.UPSAMPLE_MAX_W
        # epochs are 1..n with n = floor(w) or floor(w)+1
        epochs = sorted(r["epoch"] for r in rs)
        assert epochs == list(range(1, len(epochs) + 1))
        assert len(epochs) in (math.floor(w), math.floor(w) + 1)


def test_mixture_upsample_balances_sources(spark, sf_dir):
    """Achieved token mass per source should land near the uniform
    FACTOR-scaled share (Bernoulli fractional epochs → loose bound),
    and at least one source must genuinely repeat (epoch 2 exists)."""
    from udacity_dsnd_projects_spark.functions import pipeline as p

    df = p.mixture_upsample(spark, sf_dir)
    assert df.filter(F.col("epoch") >= 2).count() > 0
    got = {
        r["source"]: r["t"]
        for r in df.groupBy("source").agg(F.sum("n_tok").alias("t")).collect()
    }
    tot = sum(got.values())
    mean = tot / len(got)
    for src, t in got.items():
        # uncapped sources sit within ±40% of the mean share; capped
        # ones (tiny sources at MAX_W epochs) may fall below
        assert t < mean * 1.8, (src, t, mean)


def test_mixture_upsample_deterministic(spark, sf_dir):
    from udacity_dsnd_projects_spark.functions import pipeline as p

    a = sorted(map(tuple, p.mixture_upsample(spark, sf_dir).collect()))
    b = sorted(map(tuple, p.mixture_upsample(spark, sf_dir).collect()))
    assert a == b


# --------------------------------------------------------------------------
# kNN graph
# --------------------------------------------------------------------------
def test_knn_graph_shape(spark, sf_dir):
    from udacity_dsnd_projects_spark.functions import similarity as sim

    rows = sim.knn_graph(spark, sf_dir).collect()
    assert rows
    per_vec: dict[int, list] = {}
    for r in rows:
        assert r["vec_id"] != r["nbr_id"]
        assert 1 <= r["rn"] <= sim.KNN_K
        per_vec.setdefault(r["vec_id"], []).append(r)
    for v, rs in per_vec.items():
        assert len(rs) <= sim.KNN_K
        # ranks are dense from 1 and ordered by descending cosine
        rs.sort(key=lambda r: r["rn"])
        assert [r["rn"] for r in rs] == list(range(1, len(rs) + 1))
        cosines = [r["cosine"] for r in rs]
        assert cosines == sorted(cosines, reverse=True)


def test_knn_graph_edges_are_within_cluster_and_symmetric_candidates(spark, sf_dir):
    """Every edge must connect two members of the same k-means cluster
    (the IVF-style recall contract), and the underlying pair substrate
    is symmetric — if (a→b) ranked, b saw the same pair as candidate."""
    from udacity_dsnd_projects_spark.functions import similarity as sim

    cluster = {
        r["vec_id"]: r["cluster"]
        for r in sim._cluster_members(spark, sf_dir).collect()
    }
    edges = sim.knn_graph(spark, sf_dir).collect()
    for r in edges:
        assert cluster[r["vec_id"]] == cluster[r["nbr_id"]]


def test_knn_graph_window_group_limit_pushdown(spark, sf_dir):
    """rank<=K over the maximal-cardinality vec_id partition must ride
    WindowGroupLimit (map-side pre-limit before the exchange)."""
    from udacity_dsnd_projects_spark.functions import similarity as sim

    plan = (
        sim.knn_graph(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan and "Partial" in plan, plan


# --------------------------------------------------------------------------
# nation_trade_volume (TPC-H Q7 shape)
# --------------------------------------------------------------------------
def test_nation_trade_volume_plan(spark, sf_dir):
    """Nation dims must broadcast; the shipdate filter must reach the
    lineitem parquet scan as a pushed filter."""
    from udacity_dsnd_projects_spark.operators import analytics as an

    q = an.nation_trade_volume(spark, sf_dir)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2, plan
    scan = q._jdf.queryExecution().sparkPlan().toString()
    assert "l_shipdate" in scan and "PushedFilters" in scan, scan


def test_nation_trade_volume_bounds(spark, sf_dir):
    from udacity_dsnd_projects_spark.operators import analytics as an

    rows = an.nation_trade_volume(spark, sf_dir).collect()
    assert rows
    years = {r["ship_year"] for r in rows}
    assert years <= {1996, 1997}
    # output is metadata-sized: nations² × years at most
    assert len(rows) <= 25 * 25 * 2
    assert all(r["volume"] > 0 and r["n_lines"] > 0 for r in rows)


# --------------------------------------------------------------------------
# pack_efficiency
# --------------------------------------------------------------------------
def test_pack_efficiency_consistent_with_bins(spark, sf_dir):
    from udacity_dsnd_projects_spark.functions import pipeline as p

    bins = p.seq_pack_bins(spark, sf_dir).collect()
    eff = {(r["lang"], r["bin"]): r for r in p.pack_efficiency(spark, sf_dir).collect()}
    agg: dict[tuple, list[int]] = {}
    for r in bins:
        agg.setdefault((r["lang"], r["bin"]), []).append(r["n_tok"])
    assert set(agg) == set(eff)
    for k, toks in agg.items():
        e = eff[k]
        assert e["n_docs"] == len(toks)
        assert e["used_tokens"] == sum(toks)
        assert e["overflow_tokens"] == max(0, sum(toks) - p.SEQ_PACK_BUDGET)
        # a bin overflows by at most one document minus one token
        if e["overflow_tokens"] > 0:
            assert e["overflow_tokens"] < max(toks)


# --------------------------------------------------------------------------
# vocab_oov_rate
# --------------------------------------------------------------------------
def test_vocab_oov_rate_consistent_with_coverage_vocab(spark, sf_dir):
    from udacity_dsnd_projects_spark.functions import text as t

    vocab = {r["token"] for r in t.vocab_coverage(spark, sf_dir).collect()}
    rows = t.vocab_oov_rate(spark, sf_dir).collect()
    assert rows
    for r in rows[:50]:
        assert 0 <= r["n_oov"] <= r["n_tok"]
        assert 0.0 <= r["oov_rate"] <= 1.0
    # spot-check one document end-to-end against the vocab set
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(3).collect()
    by_id = {r["doc_id"]: r for r in rows}
    for d in docs:
        toks = d["text"].strip().lower().split()
        oov = sum(1 for tok in toks if tok not in vocab)
        assert by_id[d["doc_id"]]["n_tok"] == len(toks)
        assert by_id[d["doc_id"]]["n_oov"] == oov


# --------------------------------------------------------------------------
# nfc_normalize
# --------------------------------------------------------------------------
def test_nfc_normalize_residue_semantics(spark, sf_dir):
    """Decomposed residues (0: e+U+0301, 2: A+U+030A) must compose —
    one code point shorter; precomposed (1) and plain (3) unchanged."""
    from udacity_dsnd_projects_spark.functions import text as t

    for r in t.nfc_normalize(spark, sf_dir).collect():
        if r["doc_id"] % 4 in (0, 2):
            assert r["changed"] is True
            assert r["n_raw_cp"] - r["n_nfc_cp"] == 1
        else:
            assert r["changed"] is False
            assert r["n_raw_cp"] == r["n_nfc_cp"]


# --------------------------------------------------------------------------
# ANN recall report
# --------------------------------------------------------------------------
def test_ann_recall_matches_set_intersection(spark, sf_dir):
    from udacity_dsnd_projects_spark.functions import similarity as sim

    bf: dict[int, set[int]] = {}
    for r in sim.cosine_topk_bruteforce(spark, sf_dir).collect():
        bf.setdefault(r["query_id"], set()).add(r["vec_id"])
    ivf: dict[int, set[int]] = {}
    for r in sim.cosine_topk_ivf(spark, sf_dir).collect():
        ivf.setdefault(r["query_id"], set()).add(r["vec_id"])
    rep = {r["query_id"]: r for r in sim.ann_recall_report(spark, sf_dir).collect()}
    assert set(rep) == set(bf)
    for q, hits in bf.items():
        n = len(hits & ivf.get(q, set()))
        assert rep[q]["n_hits"] == n
        assert abs(rep[q]["recall"] - n / sim.TOP_K) < 1e-9
        assert 0.0 <= rep[q]["recall"] <= 1.0


# --------------------------------------------------------------------------
# Near-dup rate by source
# --------------------------------------------------------------------------
def test_near_dup_rate_by_source_consistent(spark, sf_dir):
    from udacity_dsnd_projects_spark.functions import curation as cur

    rows = cur.near_dup_rate_by_source(spark, sf_dir).collect()
    n_dup_total = sum(r["n_near_dup"] for r in rows)
    assert n_dup_total == cur.near_dup_components(spark, sf_dir).count()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    totals = {r["source"]: r["n"] for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert {r["source"]: r["n_docs"] for r in rows} == totals
    for r in rows:
        assert 0 <= r["n_near_dup"] <= r["n_docs"]
        assert 0.0 <= r["dup_rate"] <= 1.0


def test_merge_changelog_edge_semantics(spark):
    """Crafted-log MERGE edges the synthesized corpus can't produce:
    reinsert-after-delete (upsert with HIGHER seq than the tombstone
    wins), delete-of-absent-key (no-op), and a pure-delete key
    (absent from output)."""
    from pyspark.sql import types as T

    from udacity_dsnd_projects_spark.functions.snapshot import merge_changelog

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("seq", T.LongType()),
            T.StructField("op", T.StringType()),
            T.StructField("content_md5", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    rows = [
        (1, 1, "upsert", "a1", 10),  # plain key
        (2, 1, "upsert", "b1", 11),
        (2, 2, "delete", None, None),
        (2, 3, "upsert", "b3", 12),  # reinsert AFTER delete
        (3, 5, "delete", None, None),  # delete of never-present key
        (4, 1, "upsert", "d1", 13),
        (4, 9, "delete", None, None),  # pure delete wins
    ]
    out = {
        r["doc_id"]: (r["last_seq"], r["content_md5"], r["n_chars"])
        for r in merge_changelog(spark.createDataFrame(rows, schema)).collect()
    }
    assert out == {1: (1, "a1", 10), 2: (3, "b3", 12)}


def test_late_order_priorities_semi_join_plan(spark, sf_dir):
    """The EXISTS must plan as a LEFT SEMI join (probe side dedups per
    key inside the join — no distinct-after-join blowup)."""
    from udacity_dsnd_projects_spark.operators import analytics as an

    q = an.late_order_priorities(spark, sf_dir)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan, plan
    rows = q.collect()
    assert rows and all(r["n_late_orders"] > 0 for r in rows)
