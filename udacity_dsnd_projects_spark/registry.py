"""Query registry — the single source of truth wired into
``__spark_entry__.py``.

Each entry: name -> (spark_query_fn, duckdb_oracle_sql | None).
``spark_query_fn(spark, sf_dir) -> DataFrame``. Oracle SQL runs on the
same parquet tables in DuckDB (views pre-registered by the driver).
Column names are aliased identically on both sides — the driver's
compare sorts columns by name before hashing.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from udacity_dsnd_projects_spark.functions import corpus as _corp
from udacity_dsnd_projects_spark.functions import curation as _cur
from udacity_dsnd_projects_spark.functions import dedup as _dedup
from udacity_dsnd_projects_spark.functions import graph as _graph
from udacity_dsnd_projects_spark.functions import multimodal as _mm
from udacity_dsnd_projects_spark.functions import pipeline as _pipe
from udacity_dsnd_projects_spark.functions import scalar as _scalar
from udacity_dsnd_projects_spark.functions import search as _search
from udacity_dsnd_projects_spark.functions import selection as _sel
from udacity_dsnd_projects_spark.functions import snapshot as _snap
from udacity_dsnd_projects_spark.functions import similarity as _sim
from udacity_dsnd_projects_spark.functions import text as _text
from udacity_dsnd_projects_spark.functions import training as _train
from udacity_dsnd_projects_spark.functions import web as _web
from udacity_dsnd_projects_spark import metrics as _metrics
from udacity_dsnd_projects_spark.operators import aggregations as _agg
from udacity_dsnd_projects_spark.operators import analytics as _an
from udacity_dsnd_projects_spark.operators import envelope as _env
from udacity_dsnd_projects_spark.operators import joins as _joins
from udacity_dsnd_projects_spark.operators import projections as _proj
from udacity_dsnd_projects_spark.operators import relational as _rel
from udacity_dsnd_projects_spark.operators import relational2 as _rel2
from udacity_dsnd_projects_spark.operators import risk_join as _risk
from udacity_dsnd_projects_spark.operators import timeseries as _ts
from udacity_dsnd_projects_spark.operators import setops as _setops
from udacity_dsnd_projects_spark.operators import skew as _skew
from udacity_dsnd_projects_spark.operators import windows as _win

QueryFn = Callable[[SparkSession, str], DataFrame]

#: name -> (query_fn, oracle_sql or None for non-SQL-expressible ops)
_REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def register(name: str, fn: QueryFn, oracle: str | None) -> None:
    # contract check, not a debug assert: must survive python -O
    if name in _REGISTRY:
        raise ValueError(f"duplicate query registration: {name}")
    _REGISTRY[name] = (fn, oracle)


def queries() -> dict[str, QueryFn]:
    return {name: fn for name, (fn, _) in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in _REGISTRY.items() if sql is not None}


# ==========================================================================
# DRIVER-VERIFICATION WINDOW — the driver's CORRECTNESS report truncates
# at the first 50 entries of ``queries()`` (confirmed empirically in
# rounds 1-5), so dict ORDER is part of the contract. Since round 6 the
# window is DECLARED as an explicit tuple at the bottom of this module
# (``_ROUND6_WINDOW``) and ``_REGISTRY`` is reordered once after all
# registrations — the register() blocks below are grouped by theme, not
# by window membership. Rotation policy: every query whose
# implementation changed this round, plus every query that has never
# received a driver verdict, goes in the window; remaining slots
# re-verify the STALEST prior greens. Everything behind the window stays
# covered by the local oracle replica (tests/test_queries.py) running
# under driver-identical session confs (session.get_spark pins the
# timestamp confs — see round-3 postmortem in VERDICT.md).
# ==========================================================================

# --- ROUND-5 PRIORITY: changed this round / never driver-verified ----------
# block-size cap added (impl + oracle mirror — VERDICT r4 item 1)
register("fuzzy_name_pairs", _joins.fuzzy_name_pairs, _joins.ORACLE_FUZZY_NAME_PAIRS)
# NEW: mixture plan materialized as a deterministic hash-threshold sample
register("mixture_sample", _pipe.mixture_sample, _pipe.ORACLE_MIXTURE_SAMPLE)
register(
    "mixture_sample_accounting",
    _pipe.mixture_sample_accounting,
    _pipe.ORACLE_MIXTURE_SAMPLE_ACCOUNTING,
)
# NEW: new-batch-vs-snapshot dedup behind a distributed Bloom pre-filter
register(
    "incremental_dedup", _dedup.incremental_dedup, _dedup.ORACLE_INCREMENTAL_DEDUP
)
# NEW: quality-aware near-dup cluster representative
register("dedup_priority", _cur.dedup_priority, _cur.ORACLE_DEDUP_PRIORITY)
# NEW: bigram collocations by PMI
register("token_bigram_pmi", _text.token_bigram_pmi, _text.ORACLE_TOKEN_BIGRAM_PMI)
# NEW: winsorized per-stratum scaling on exact ranks
register("robust_scale", _pipe.robust_scale, _pipe.ORACLE_ROBUST_SCALE)
# NEW: top-k retrieval over the int8-quantized index
register(
    "quantized_cosine_topk",
    _sim.quantized_cosine_topk,
    _sim.ORACLE_QUANTIZED_COSINE_TOPK,
)
# NEW: SemDeDup-shape within-cluster embedding dedup
register("semantic_dedup", _sim.semantic_dedup, _sim.ORACLE_SEMANTIC_DEDUP)
# NEW: vocabulary coverage curve on the total-order primitives
register("vocab_coverage", _text.vocab_coverage, _text.ORACLE_VOCAB_COVERAGE)
# NEW: per-domain curation rollup + domain-level quality gate
register("domain_stats", _web.domain_stats, _web.ORACLE_DOMAIN_STATS)
register(
    "domain_quality_filter",
    _web.domain_quality_filter,
    _web.ORACLE_DOMAIN_QUALITY_FILTER,
)
# NEW: snapshot compare + changelog MERGE semantics
register("snapshot_diff", _snap.snapshot_diff, _snap.ORACLE_SNAPSHOT_DIFF)
register("cdc_merge", _snap.cdc_merge, _snap.ORACLE_CDC_MERGE)
# NEW: epoch-repeat upsampling for under-represented sources
register("mixture_upsample", _pipe.mixture_upsample, _pipe.ORACLE_MIXTURE_UPSAMPLE)
# NEW: within-cluster top-k cosine neighbor graph
register("knn_graph", _sim.knn_graph, _sim.ORACLE_KNN_GRAPH)
# NEW (round 6): incremental IVF index maintenance + drift readout
register(
    "ivf_index_upsert", _sim.ivf_index_upsert, _sim.ORACLE_IVF_INDEX_UPSERT
)
register(
    "ivf_staleness_report",
    _sim.ivf_staleness_report,
    _sim.ORACLE_IVF_STALENESS_REPORT,
)
# NEW (round 6): the exported char-bigram LM (train/score
# decomposition of perplexity_score); Markov event-transition rollup
register("char_bigram_lm", _text.char_bigram_lm, _text.ORACLE_CHAR_BIGRAM_LM)
register(
    "event_transition_matrix",
    _an.event_transition_matrix,
    _an.ORACLE_EVENT_TRANSITION_MATRIX,
)
# NEW (round 6): tokenizer-induction pair counts; split-contamination
# report over the LSH pair substrate
register("bpe_pair_counts", _text.bpe_pair_counts, _text.ORACLE_BPE_PAIR_COUNTS)
# NEW (round 12): the tokenizer-induction loop CLOSED — bpe_pair_counts
# iterated to an ordered merge table, plus the corpus re-tokenized with
# it. NOTE: constructing either runs the training loop (2 actions per
# merge round on the vocab frame — the same documented eager exception
# as guard_metrics_report); plan-only tooling must skip them.
register(
    "bpe_learn_merges",
    _text.bpe_learn_merges,
    _text.ORACLE_BPE_LEARN_MERGES,
)
register(
    "bpe_apply_merges",
    _text.bpe_apply_merges,
    _text.ORACLE_BPE_APPLY_MERGES,
)
# NEW (round 12): the training-prep integration — mixture weights
# re-planned on merge-aware token counts (same eager-loop exception)
register(
    "bpe_token_mixture_weights",
    _text.bpe_token_mixture_weights,
    _text.ORACLE_BPE_TOKEN_MIXTURE_WEIGHTS,
)
# NEW (round 12): the second tokenizer artifact — the post-merge
# subword vocabulary with corpus frequencies (same eager-loop
# exception; reads the learn loop's final checkpointed vocab)
register(
    "bpe_vocab_table",
    _text.bpe_vocab_table,
    _text.ORACLE_BPE_VOCAB_TABLE,
)
# NEW (round 12): the merge-budget tuning curve — corpus units after
# every merge stage (the tokenizer family's ivf_probe_sweep analog;
# same eager-loop exception, readouts aggregate the loop's
# checkpointed stage frames)
register(
    "bpe_compression_sweep",
    _text.bpe_compression_sweep,
    _text.ORACLE_BPE_COMPRESSION_SWEEP,
)
# NEW (round 12): sequence packing on merge-aware unit counts — the
# third consumer of the learned tokenizer (same eager-loop exception;
# the running count is the bucketed distributed prefix-sum)
register(
    "bpe_seq_pack_bins",
    _text.bpe_seq_pack_bins,
    _text.ORACLE_BPE_SEQ_PACK_BINS,
)
# NEW (round 13): within-document chunking on merge-aware unit budgets
# — the BPE consumer the family stopped short of (VERDICT r12 task 3):
# the training-chunk artifact itself, all row-local (zero exchanges)
register(
    "bpe_encode_chunks",
    _text.bpe_encode_chunks,
    _text.ORACLE_BPE_ENCODE_CHUNKS,
)
# NEW (round 13): the tokenizer family's consistency gate — corpus
# unit total via the final stage frame vs via the baked replace chain
# (the ann_probe_agreement pattern; VERDICT r12 task 8)
register(
    "bpe_unit_total_agreement",
    _text.bpe_unit_total_agreement,
    _text.ORACLE_BPE_UNIT_TOTAL_AGREEMENT,
)
# NEW (round 13): exact dedup of the training SEQUENCES — the
# hash-before-shuffle recipe on chunk_hash, no text ever shuffled
register(
    "chunk_dedup",
    _text.chunk_dedup,
    _text.ORACLE_CHUNK_DEDUP,
)
# NEW (round 14): the training writer consuming chunk_dedup's keepers
# — deduped chunks fill fixed unit bins (the report→action step;
# VERDICT r13 task 2; eager-loop + prefix-sum exception)
register(
    "pack_deduped_chunks",
    _text.pack_deduped_chunks,
    _text.ORACLE_PACK_DEDUPED_CHUNKS,
)
# NEW (round 14): the chunk path's conservation gate — packed units +
# saved units must equal the pre-dedup chunk total, each side from a
# different frame (the bpe_unit_total_agreement pattern on the writer)
register(
    "chunk_dedup_accounting",
    _text.chunk_dedup_accounting,
    _text.ORACLE_CHUNK_DEDUP_ACCOUNTING,
)
# NEW (round 14): the packed bins dealt round-robin into epoch shards
# under shard_assign's deterministic md5 shuffle — the chunk spine's
# last writer step (documents → chunks → dedup → pack → shards; same
# eager-loop + prefix-sum/rank exception as the packer it consumes)
register(
    "shard_packed_chunks",
    _text.shard_packed_chunks,
    _text.ORACLE_SHARD_PACKED_CHUNKS,
)
# NEW (round 15): curriculum ordering over the packed bins —
# easy-to-hard by the bin's longest sequence, NTILE phases with a
# deterministic md5 within-phase shuffle (VERDICT r14 task 5; the
# chunk spine's ordering policy; same eager-loop + rank exception)
register(
    "curriculum_pack_order",
    _text.curriculum_pack_order,
    _text.ORACLE_CURRICULUM_PACK_ORDER,
)
# NEW (round 12): tokenizer train/eval drift — merges learned on the
# snapshot half only, fertility compared across halves per source
# (same eager-loop exception)
register(
    "tokenizer_drift_report",
    _text.tokenizer_drift_report,
    _text.ORACLE_TOKENIZER_DRIFT_REPORT,
)
# NEW (round 12): the packing accounting twin on merge-aware units
# (same eager-loop exception)
register(
    "bpe_pack_efficiency",
    _text.bpe_pack_efficiency,
    _text.ORACLE_BPE_PACK_EFFICIENCY,
)
# NEW (round 12): tokenizer reproducibility — merges learned
# independently per half, compared step by step (eager, TWO loops)
register(
    "bpe_merge_stability",
    _text.bpe_merge_stability,
    _text.ORACLE_BPE_MERGE_STABILITY,
)
register(
    "split_leakage_report",
    _cur.split_leakage_report,
    _cur.ORACLE_SPLIT_LEAKAGE_REPORT,
)
# NEW (round 12): the leakage report's ACTION face — drop the train
# side of every cross-split near-dup pair, eval stays frozen
register(
    "deleak_split",
    _cur.deleak_split,
    _cur.ORACLE_DELEAK_SPLIT,
)
# NEW (round 6): label-noise detection over the kNN substrate;
# per-source embedding drift monitor
register(
    "knn_label_agreement",
    _sim.knn_label_agreement,
    _sim.ORACLE_KNN_LABEL_AGREEMENT,
)
register(
    "embedding_drift_by_source",
    _sim.embedding_drift_by_source,
    _sim.ORACLE_EMBEDDING_DRIFT_BY_SOURCE,
)
# NEW (round 6, second wave): LSH self-grading + snapshot novelty +
# tokenizer fertility + market basket + daily volume anomaly
register(
    "minhash_calibration_report",
    _dedup.minhash_calibration_report,
    _dedup.ORACLE_MINHASH_CALIBRATION_REPORT,
)
# NEW (round 9): SimHash-side calibration readout (VERDICT r8 task 9)
register(
    "simhash_calibration_report",
    _dedup.simhash_calibration_report,
    _dedup.ORACLE_SIMHASH_CALIBRATION_REPORT,
)
register("ngram_novelty", _dedup.ngram_novelty, _dedup.ORACLE_NGRAM_NOVELTY)
register(
    "tokenizer_fertility",
    _text.tokenizer_fertility,
    _text.ORACLE_TOKENIZER_FERTILITY,
)
register(
    "market_basket_pairs",
    _an.market_basket_pairs,
    _an.ORACLE_MARKET_BASKET_PAIRS,
)
register(
    "daily_type_anomaly",
    _an.daily_type_anomaly,
    _an.ORACLE_DAILY_TYPE_ANOMALY,
)
# NEW (round 11): the probe-depth tuning curve over the IVF index —
# recall vs candidate-scan cost at hamming depth 0..PROBE_HAMMING
register(
    "ivf_probe_sweep",
    _sim.ivf_probe_sweep,
    _sim.ORACLE_IVF_PROBE_SWEEP,
)
# NEW (round 11): the sequential companion — CUSUM level-shift screen
# per event type (exact-integer S_t numerator; KS-scaled flag)
register(
    "cusum_changepoint_report",
    _an.cusum_changepoint_report,
    _an.ORACLE_CUSUM_CHANGEPOINT_REPORT,
)
# NEW (round 6, third wave): near-dup graph observability + OLS trend
register(
    "source_overlap_matrix",
    _cur.source_overlap_matrix,
    _cur.ORACLE_SOURCE_OVERLAP_MATRIX,
)
register(
    "dup_cluster_histogram",
    _cur.dup_cluster_histogram,
    _cur.ORACLE_DUP_CLUSTER_HISTOGRAM,
)
register(
    "near_dup_triangles",
    _cur.near_dup_triangles,
    _cur.ORACLE_NEAR_DUP_TRIANGLES,
)
register(
    "value_trend_by_type",
    _an.value_trend_by_type,
    _an.ORACLE_VALUE_TREND_BY_TYPE,
)
register(
    "session_path_topk",
    _an.session_path_topk,
    _an.ORACLE_SESSION_PATH_TOPK,
)
register("customer_rfm", _an.customer_rfm, _an.ORACLE_CUSTOMER_RFM)
register(
    "ship_latency_quantiles",
    _an.ship_latency_quantiles,
    _an.ORACLE_SHIP_LATENCY_QUANTILES,
)
register(
    "label_separation_report",
    _sim.label_separation_report,
    _sim.ORACLE_LABEL_SEPARATION_REPORT,
)
register(
    "dedup_method_agreement",
    _dedup.dedup_method_agreement,
    _dedup.ORACLE_DEDUP_METHOD_AGREEMENT,
)
register(
    "nation_supplier_hhi",
    _an.nation_supplier_hhi,
    _an.ORACLE_NATION_SUPPLIER_HHI,
)
register("dow_seasonality", _an.dow_seasonality, _an.ORACLE_DOW_SEASONALITY)
register(
    "user_type_entropy", _an.user_type_entropy, _an.ORACLE_USER_TYPE_ENTROPY
)
register(
    "quantization_error_report",
    _sim.quantization_error_report,
    _sim.ORACLE_QUANTIZATION_ERROR_REPORT,
)
# NEW: TPC-H Q7-shape bilateral trade rollup (widest relational join tree)
register(
    "nation_trade_volume", _an.nation_trade_volume, _an.ORACLE_NATION_TRADE_VOLUME
)
# NEW: packing-budget fill/overflow accounting
register("pack_efficiency", _pipe.pack_efficiency, _pipe.ORACLE_PACK_EFFICIENCY)
# NEW: per-doc OOV rate against the exact-ranked top-N vocabulary
register("vocab_oov_rate", _text.vocab_oov_rate, _text.ORACLE_VOCAB_OOV_RATE)
# NEW: Unicode NFC normalization (vectorized pandas face; UAX#15 oracle)
register("nfc_normalize", _text.nfc_normalize, _text.ORACLE_NFC_NORMALIZE)
# NEW: IVF recall@K measured against exact brute force
register(
    "ann_recall_report", _sim.ann_recall_report, _sim.ORACLE_ANN_RECALL_REPORT
)
# NEW (round 12): the deployed-depth consistency gate — ivf_probe_sweep's
# row at PROBE_HAMMING must equal ann_recall_report's aggregate (the
# cross-face identity VERDICT r11 asked to make driver-visible)
register(
    "ann_probe_agreement",
    _sim.ann_probe_agreement,
    _sim.ORACLE_ANN_PROBE_AGREEMENT,
)
# NEW: per-source near-dup triage dashboard
register(
    "near_dup_rate_by_source",
    _cur.near_dup_rate_by_source,
    _cur.ORACLE_NEAR_DUP_RATE_BY_SOURCE,
)
# NEW: TPC-H Q4-shape EXISTS/semi-join aggregate
register(
    "late_order_priorities",
    _an.late_order_priorities,
    _an.ORACLE_LATE_ORDER_PRIORITIES,
)
# NEW (batch 4): classic warehouse shapes the headline set didn't cover
register(
    "customer_order_distribution",
    _rel.customer_order_distribution,
    _rel.ORACLE_CUSTOMER_ORDER_DISTRIBUTION,
)
register(
    "idle_customer_balance",
    _rel.idle_customer_balance,
    _rel.ORACLE_IDLE_CUSTOMER_BALANCE,
)
register(
    "small_quantity_revenue",
    _rel.small_quantity_revenue,
    _rel.ORACLE_SMALL_QUANTITY_REVENUE,
)
register(
    "top_revenue_suppliers",
    _rel.top_revenue_suppliers,
    _rel.ORACLE_TOP_REVENUE_SUPPLIERS,
)
register(
    "lone_late_supplier_orders",
    _rel.lone_late_supplier_orders,
    _rel.ORACLE_LONE_LATE_SUPPLIER_ORDERS,
)
# NEW (batch 4): DSIR importance weights + A-ES weighted sampling
register(
    "dsir_importance_weights",
    _sel.dsir_importance_weights,
    _sel.ORACLE_DSIR_IMPORTANCE_WEIGHTS,
)
register(
    "weighted_reservoir_sample",
    _sel.weighted_reservoir_sample,
    _sel.ORACLE_WEIGHTED_RESERVOIR_SAMPLE,
)
# NEW (batch 4): clustering health report; binary-payload dedup
register("cluster_quality", _pipe.cluster_quality, _pipe.ORACLE_CLUSTER_QUALITY)
register("media_dedup", _mm.media_dedup, _mm.ORACLE_MEDIA_DEDUP)
# NEW (batch 4): BM25 lexical retrieval (keyword twin of cosine top-k)
register("bm25_search", _search.bm25_search, _search.ORACLE_BM25_SEARCH)
register(
    "hybrid_retrieval_fusion",
    _search.hybrid_retrieval_fusion,
    _search.ORACLE_HYBRID_RETRIEVAL_FUSION,
)
# NEW (batch 4): asymmetric containment dedup; Gopher rule gate;
# CCNet head/middle/tail perplexity split
register(
    "shingle_containment_pairs",
    _dedup.shingle_containment_pairs,
    _dedup.ORACLE_SHINGLE_CONTAINMENT_PAIRS,
)
register(
    "gopher_quality_filter",
    _text.gopher_quality_filter,
    _text.ORACLE_GOPHER_QUALITY_FILTER,
)
register(
    "ccnet_perplexity_bucket",
    _text.ccnet_perplexity_bucket,
    _text.ORACLE_CCNET_PERPLEXITY_BUCKET,
)
# NEW (batch 4): time-series resample/LOCF + native session_window face
register(
    "timeseries_gap_fill", _ts.timeseries_gap_fill, _ts.ORACLE_TIMESERIES_GAP_FILL
)
register(
    "session_window_rollup",
    _ts.session_window_rollup,
    _ts.ORACLE_SESSION_WINDOW_ROLLUP,
)
# synthesize_urls :443 coverage fix changed the raw-URL corpus
register("url_normalize", _web.url_normalize, _web.ORACLE_URL_NORMALIZE)
register("url_dedup", _web.url_dedup, _web.ORACLE_URL_DEDUP)
# stratum-size guard added (grouped-map scale contract now enforced)
register(  # applyInPandas grouped-map face, asserted-identical -> same oracle
    "lang_zscore_pandas", _pipe.lang_zscore_pandas, _pipe.ORACLE_LANG_ZSCORE
)
# curation.py changed in r4 while this sat behind the window since r2
register("corpus_curation", _cur.corpus_curation, _cur.ORACLE_CORPUS_CURATION)
# broadcast-rank rewrite landed r4 — keep a fresh driver green on record
register("trade_pagerank", _graph.trade_pagerank, _graph.ORACLE_TRADE_PAGERANK)
# ranks.py offset join-back made null-safe this round — every
# exact_group_rank / exact_group_cumsum caller re-verifies:
register("decile_stats", _an.decile_stats, _an.ORACLE_DECILE_STATS)
register(
    "quality_topk_filter", _cur.quality_topk_filter, _cur.ORACLE_QUALITY_TOPK_FILTER
)
register("seq_pack_bins", _pipe.seq_pack_bins, _pipe.ORACLE_SEQ_PACK_BINS)
register("seq_pack_concat", _pipe.seq_pack_concat, _pipe.ORACLE_SEQ_PACK_CONCAT)
register("shard_assign", _pipe.shard_assign, _pipe.ORACLE_SHARD_ASSIGN)

# --- Window filler: prior-round greens re-verified while slots exist -------
register("lang_zscore", _pipe.lang_zscore, _pipe.ORACLE_LANG_ZSCORE)

# --- TPC-H long-tail shapes + round-5 additions (rotated into the
# round-6 window via _ROUND6_WINDOW; all driver-verified r6) ----------------
register(
    "regional_supplier_volume",
    _rel2.regional_supplier_volume,
    _rel2.ORACLE_REGIONAL_SUPPLIER_VOLUME,
)
register("forecast_revenue", _rel2.forecast_revenue, _rel2.ORACLE_FORECAST_REVENUE)
register(
    "national_market_share",
    _rel2.national_market_share,
    _rel2.ORACLE_NATIONAL_MARKET_SHARE,
)
register("product_profit", _rel2.product_profit, _rel2.ORACLE_PRODUCT_PROFIT)
register(
    "returned_item_customers",
    _rel2.returned_item_customers,
    _rel2.ORACLE_RETURNED_ITEM_CUSTOMERS,
)
register(
    "promo_revenue_share",
    _rel2.promo_revenue_share,
    _rel2.ORACLE_PROMO_REVENUE_SHARE,
)
register(
    "part_supplier_diversity",
    _rel2.part_supplier_diversity,
    _rel2.ORACLE_PART_SUPPLIER_DIVERSITY,
)
register(
    "large_volume_orders",
    _rel2.large_volume_orders,
    _rel2.ORACLE_LARGE_VOLUME_ORDERS,
)
register("bracket_revenue", _rel2.bracket_revenue, _rel2.ORACLE_BRACKET_REVENUE)
register(
    "min_cost_supplier", _rel2.min_cost_supplier, _rel2.ORACLE_MIN_COST_SUPPLIER
)
register(
    "sliding_window_chunks",
    _train.sliding_window_chunks,
    _train.ORACLE_SLIDING_WINDOW_CHUNKS,
)
register(
    "curriculum_order", _train.curriculum_order, _train.ORACLE_CURRICULUM_ORDER
)
register(
    "language_confusion_matrix",
    _text.language_confusion_matrix,
    _text.ORACLE_LANGUAGE_CONFUSION_MATRIX,
)
register("skew_profile", _skew.skew_profile, _skew.ORACLE_SKEW_PROFILE)
register(
    "corpus_datacard", _cur.corpus_datacard, _cur.ORACLE_CORPUS_DATACARD
)
register(
    "important_part_value",
    _rel2.important_part_value,
    _rel2.ORACLE_IMPORTANT_PART_VALUE,
)
register(
    "dominant_part_suppliers",
    _rel2.dominant_part_suppliers,
    _rel2.ORACLE_DOMINANT_PART_SUPPLIERS,
)
register("unpivot_agg", _agg.unpivot_agg, _agg.ORACLE_UNPIVOT_AGG)
register(
    "rolling_distinct_users",
    _ts.rolling_distinct_users,
    _ts.ORACLE_ROLLING_DISTINCT_USERS,
)
register("exact_quantiles", _an.exact_quantiles, _an.ORACLE_EXACT_QUANTILES)
register(
    "grouping_sets_agg", _agg.grouping_sets_agg, _agg.ORACLE_GROUPING_SETS_AGG
)
register("timestamp_convert", _scalar.timestamp_convert, _scalar.ORACLE_TIMESTAMP_CONVERT)
register("rolling_avg_24h", _an.rolling_avg_24h, _an.ORACLE_ROLLING_AVG_24H)
register("cosine_scores_pandas", _sim.cosine_scores_pandas, _sim.ORACLE_COSINE_SCORES)
register(
    "media_feature_pipeline", _mm.media_feature_summary, _mm.ORACLE_MEDIA_FEATURE_SUMMARY
)
register(
    "simhash_fingerprints_pandas",
    _dedup.simhash_fingerprints_pandas,
    _dedup.ORACLE_SIMHASH_FINGERPRINTS,
)
register("substring_dedup", _corp.substring_dedup, _corp.ORACLE_SUBSTRING_DEDUP)
register(
    "source_mixture_weights",
    _pipe.source_mixture_weights,
    _pipe.ORACLE_SOURCE_MIXTURE_WEIGHTS,
)
register("embedding_quantize", _sim.embedding_quantize, _sim.ORACLE_EMBEDDING_QUANTIZE)
register(
    "salted_supplier_rollup", _skew.salted_supplier_rollup, _skew.ORACLE_SALTED_SUPPLIER_ROLLUP
)
register(
    "decayed_user_score", _an.decayed_user_score, _an.ORACLE_DECAYED_USER_SCORE
)
register("hourly_event_rollup", _an.hourly_event_rollup, _an.ORACLE_HOURLY_EVENT_ROLLUP)
register("sessionize", _win.sessionize, _win.ORACLE_SESSIONIZE)
register("funnel_conversion", _an.funnel_conversion, _an.ORACLE_FUNNEL_CONVERSION)
register("weekly_retention", _an.weekly_retention, _an.ORACLE_WEEKLY_RETENTION)
register("repetition_score", _pipe.repetition_score, _pipe.ORACLE_REPETITION_SCORE)
# ==========================================================================
# BEHIND THE 50-ENTRY WINDOW — every query below is driver-green from a
# prior round (CORRECTNESS_r01..r04.json), a redundant face of a
# verified query sharing the same oracle, or a no-oracle estimator
# checked with tolerance tests in pytest. All remain registered and
# covered by the local oracle replica every round.
# ==========================================================================

# rotated out this round (r4/r3 green, implementations untouched)
register(
    "ngram_contamination",
    _pipe.ngram_contamination,
    _pipe.ORACLE_NGRAM_CONTAMINATION,
)
register("hash_split", _pipe.hash_split, _pipe.ORACLE_HASH_SPLIT)
register(
    "stratified_sample", _pipe.stratified_sample, _pipe.ORACLE_STRATIFIED_SAMPLE
)
register("pii_scrub", _pipe.pii_scrub, _pipe.ORACLE_PII_SCRUB)
# NEW (round 10): the triage readout BEFORE the scrub action — per
# (lang, source) PII-type prevalence, sharing the scrubber's regexes
register(
    "pii_prevalence_report",
    _pipe.pii_prevalence_report,
    _pipe.ORACLE_PII_PREVALENCE_REPORT,
)
# NEW (round 11): the raw-markup contamination gate — per-source
# HTML/markdown/entity residue the extractor left behind (fix the
# SOURCE, like near_dup_rate_by_source)
register(
    "markup_density_report",
    _web.markup_density_report,
    _web.ORACLE_MARKUP_DENSITY_REPORT,
)
# NEW (round 12): the markup ACTION face — strip the residue the
# report diagnoses (same RE_* component constants, clean_md5-verified)
register("markup_strip", _web.markup_strip, _web.ORACLE_MARKUP_STRIP)
# NEW (round 11): the k-anonymity ACTION face — publish the QI count
# table with small cells suppressed into a reconciling residual row
register(
    "k_anonymize_release",
    _pipe.k_anonymize_release,
    _pipe.ORACLE_K_ANONYMIZE_RELEASE,
)
# NEW (round 9): structured-data privacy gate next to pii_scrub's text
# redaction
register(
    "k_anonymity_report",
    _pipe.k_anonymity_report,
    _pipe.ORACLE_K_ANONYMITY_REPORT,
)
# NEW (round 9): the homogeneity-attack companion gate — groups large
# enough to pass k-anonymity can still share one sensitive value
register(
    "l_diversity_report",
    _pipe.l_diversity_report,
    _pipe.ORACLE_L_DIVERSITY_REPORT,
)
# NEW (round 9): the third classic gate — distribution distance
# (normalized 1-D EMD) of each QI group vs the global sensitive mix
register(
    "t_closeness_report",
    _pipe.t_closeness_report,
    _pipe.ORACLE_T_CLOSENESS_REPORT,
)
# NEW (round 9): the decontamination ACTION ngram_contamination only
# diagnoses — drop flagged docs, emit the per-lang retention rollup
register(
    "decontaminate_corpus",
    _pipe.decontaminate_corpus,
    _pipe.ORACLE_DECONTAMINATE_CORPUS,
)
register("kmeans_assign", _pipe.kmeans_assign, _pipe.ORACLE_KMEANS_ASSIGN)
register(
    "near_dup_components",
    _cur.near_dup_components,
    _cur.ORACLE_NEAR_DUP_COMPONENTS,
)
register("tfidf_top_terms", _text.tfidf_top_terms, _text.ORACLE_TFIDF_TOP_TERMS)
register(
    "frame_sample_stats", _mm.frame_sample_stats, _mm.ORACLE_FRAME_SAMPLE_STATS
)
register(
    "media_resize_stats", _mm.media_resize_stats, _mm.ORACLE_MEDIA_RESIZE_STATS
)
register("passage_dedup", _corp.passage_dedup, _corp.ORACLE_PASSAGE_DEDUP)
# NEW (round 9): CCNet/C4-style within-source boilerplate REMOVAL with
# verified cleaned-text reconstruction (the action passage_dedup only
# diagnoses)
register(
    "boilerplate_strip",
    _corp.boilerplate_strip,
    _corp.ORACLE_BOILERPLATE_STRIP,
)
register(
    "passage_source_matrix",
    _corp.passage_source_matrix,
    _corp.ORACLE_PASSAGE_SOURCE_MATRIX,
)
register("word_entropy", _corp.word_entropy, _corp.ORACLE_WORD_ENTROPY)
register(
    "embedding_centroids",
    _corp.embedding_centroids,
    _corp.ORACLE_EMBEDDING_CENTROIDS,
)
register(
    "interval_count_join",
    _joins.interval_count_join,
    _joins.ORACLE_INTERVAL_COUNT_JOIN,
)
register("risk_join", _risk.risk_join, _risk.ORACLE_RISK_JOIN)
register("iqr_outliers", _an.iqr_outliers, _an.ORACLE_IQR_OUTLIERS)
register("price_histogram", _agg.price_histogram, _agg.ORACLE_PRICE_HISTOGRAM)
register("corr_panel", _agg.corr_panel, _agg.ORACLE_CORR_PANEL)
register("scd2_history", _win.scd2_history, _win.ORACLE_SCD2_HISTORY)
register("perplexity_score", _text.perplexity_score, _text.ORACLE_PERPLEXITY_SCORE)
register(
    "redis_envelope_decode", _env.redis_envelope_decode, _env.ORACLE_REDIS_ENVELOPE_DECODE
)
register("token_stats", _text.token_stats, _text.ORACLE_TOKEN_STATS)
register("quality_score", _text.quality_score, _text.ORACLE_QUALITY_SCORE)
register("language_id", _text.language_id, _text.ORACLE_LANGUAGE_ID)

register("doc_fingerprint", _text.doc_fingerprint, _text.ORACLE_DOC_FINGERPRINT)
register("exact_dedup", _dedup.exact_dedup, _dedup.ORACLE_EXACT_DEDUP)
register(
    "ngram_jaccard_pairs", _dedup.ngram_jaccard_pairs, _dedup.ORACLE_NGRAM_JACCARD_PAIRS
)
register(
    "minhash_signatures", _dedup.minhash_signatures_q, _dedup.ORACLE_MINHASH_SIGNATURES
)
register("minhash_lsh_pairs", _dedup.minhash_lsh_pairs, _dedup.ORACLE_MINHASH_LSH_PAIRS)
register(
    "simhash_fingerprints",
    _dedup.simhash_fingerprints,
    _dedup.ORACLE_SIMHASH_FINGERPRINTS,
)
register(
    "simhash_near_dup_pairs",
    _dedup.simhash_near_dup_pairs,
    _dedup.ORACLE_SIMHASH_NEAR_DUP_PAIRS,
)

# --- Similarity search — r2/r3 green ----------------------------------------
register(
    "cosine_topk_bruteforce",
    _sim.cosine_topk_bruteforce,
    _sim.ORACLE_COSINE_TOPK_BRUTEFORCE,
)
register("cosine_topk_ivf", _sim.cosine_topk_ivf, _sim.ORACLE_COSINE_TOPK_IVF)
register(
    "embedding_lsh_buckets",
    _sim.embedding_lsh_buckets,
    _sim.ORACLE_EMBEDDING_LSH_BUCKETS,
)
register("embedding_near_dup", _sim.embedding_near_dup, _sim.ORACLE_EMBEDDING_NEAR_DUP)

# --- Multimodal — r2/r3 green ------------------------------------------------
register("media_byte_stats", _mm.media_byte_stats, _mm.ORACLE_MEDIA_BYTE_STATS)
# NEW (round 11): container-vs-content gate — sniff each payload's
# magic header against the declared modality (planted mismatches; the
# oracle recomputes from the planting rule while Spark sniffs bytes)
register(
    "media_type_mismatch_report",
    _mm.media_type_mismatch_report,
    _mm.ORACLE_MEDIA_TYPE_MISMATCH_REPORT,
)

# --- Headline analytics (bench workload) — r2/r3 green -----------------------
register("pricing_summary", _an.pricing_summary, _an.ORACLE_PRICING_SUMMARY)
register("revenue_by_nation", _an.revenue_by_nation, _an.ORACLE_REVENUE_BY_NATION)
register(
    "top_unshipped_orders", _an.top_unshipped_orders, _an.ORACLE_TOP_UNSHIPPED_ORDERS
)

# --- Projections / filters (§2.3, P1-P9) — r1/r2 green ----------------------
register("cast_projection", _proj.cast_projection, _proj.ORACLE_CAST_PROJECTION)
register("json_parse_flatten", _proj.json_parse_flatten, _proj.ORACLE_JSON_PARSE_FLATTEN)
register("array_explode", _proj.array_explode, _proj.ORACLE_ARRAY_EXPLODE)
register("base64_roundtrip", _proj.base64_roundtrip, _proj.ORACLE_BASE64_ROUNDTRIP)
register("null_reject_filter", _proj.null_reject_filter, _proj.ORACLE_NULL_REJECT_FILTER)
register(
    "topic_dispatch_filter", _proj.topic_dispatch_filter, _proj.ORACLE_TOPIC_DISPATCH_FILTER
)
register("value_routing", _proj.value_routing, _proj.ORACLE_VALUE_ROUTING)
register("array_subscript", _proj.array_subscript, _proj.ORACLE_ARRAY_SUBSCRIPT)
register(
    "column_equality_filter",
    _proj.column_equality_filter,
    _proj.ORACLE_COLUMN_EQUALITY_FILTER,
)

# --- Joins (§2.4, J1-J3 + additions) — r1/r2 green --------------------------
register("join_broadcast_dim", _joins.join_broadcast_dim, _joins.ORACLE_JOIN_BROADCAST_DIM)
register(
    "join_enrichment_chain",
    _joins.join_enrichment_chain,
    _joins.ORACLE_JOIN_ENRICHMENT_CHAIN,
)
register("join_left", _joins.join_left, _joins.ORACLE_JOIN_LEFT)
register("join_asof", _joins.join_asof, _joins.ORACLE_JOIN_ASOF)
register("join_semi", _joins.join_semi, _joins.ORACLE_JOIN_SEMI)
register("join_anti", _joins.join_anti, _joins.ORACLE_JOIN_ANTI)
register("join_full_outer", _joins.join_full_outer, _joins.ORACLE_JOIN_FULL_OUTER)
register("join_cross", _joins.join_cross, _joins.ORACLE_JOIN_CROSS)

# --- Aggregations (§2.5, A1-A4 + additions) — r1/r2 green -------------------
register("grouped_count", _agg.grouped_count, _agg.ORACLE_GROUPED_COUNT)
register("latest_per_key", _agg.latest_per_key, _agg.ORACLE_LATEST_PER_KEY)
register("avg_per_group", _agg.avg_per_group, _agg.ORACLE_AVG_PER_GROUP)
register("stats_per_group", _agg.stats_per_group, _agg.ORACLE_STATS_PER_GROUP)
register("table_profile", _agg.table_profile, _agg.ORACLE_TABLE_PROFILE)
register("rollup_agg", _agg.rollup_agg, _agg.ORACLE_ROLLUP_AGG)
register("pivot_agg", _agg.pivot_agg, _agg.ORACLE_PIVOT_AGG)
register("distinct_values", _agg.distinct_values, _agg.ORACLE_DISTINCT_VALUES)
register("count_distinct", _agg.count_distinct, _agg.ORACLE_COUNT_DISTINCT)
register("approx_count_distinct", _agg.approx_count_distinct, None)  # estimator
register("quantile_sketch", _agg.quantile_sketch, None)  # estimator
register("cube_agg", _agg.cube_agg, _agg.ORACLE_CUBE_AGG)

# --- Windows / sorts / limits (§2.6) — r1/r2 green --------------------------
register("window_rank", _win.window_rank, _win.ORACLE_WINDOW_RANK)
register("window_running_sum", _win.window_running_sum, _win.ORACLE_WINDOW_RUNNING_SUM)
register("top_k_per_group", _win.top_k_per_group, _win.ORACLE_TOP_K_PER_GROUP)
register("sort_limit", _win.sort_limit, _win.ORACLE_SORT_LIMIT)
register("window_lag_lead", _win.window_lag_lead, _win.ORACLE_WINDOW_LAG_LEAD)

# --- Set operations (§2.6) — r1/r2 green ------------------------------------
register("union_fan_in", _setops.union_fan_in, _setops.ORACLE_UNION_FAN_IN)
register("set_except", _setops.set_except, _setops.ORACLE_SET_EXCEPT)
register("set_intersect", _setops.set_intersect, _setops.ORACLE_SET_INTERSECT)

# --- Scalar functions (§2.7, F1-F12) — r1/r2 green --------------------------
register("split_derive", _scalar.split_derive, _scalar.ORACLE_SPLIT_DERIVE)
register("string_normalize", _scalar.string_normalize, _scalar.ORACLE_STRING_NORMALIZE)
register("case_when_mapping", _scalar.case_when_mapping, _scalar.ORACLE_CASE_WHEN_MAPPING)
register("date_parts", _scalar.date_parts, _scalar.ORACLE_DATE_PARTS)
register(
    "arithmetic_rounding", _scalar.arithmetic_rounding, _scalar.ORACLE_ARITHMETIC_ROUNDING
)
register("json_get", _scalar.json_get, _scalar.ORACLE_JSON_GET)
register(
    "json_map_explode", _scalar.json_map_explode, _scalar.ORACLE_JSON_MAP_EXPLODE
)

# --- Redundant faces sharing an in/previously-verified oracle ---------------
register("risk_join_sql", _risk.risk_join_sql, _risk.ORACLE_RISK_JOIN)  # dup face
# round-6 twin faces (VERDICT r5 item 6): plan-equality asserted in
# tests/test_round6_ops.py, oracles shared with the primary faces
register("unpivot_agg_sql", _agg.unpivot_agg_sql, _agg.ORACLE_UNPIVOT_AGG)
register(
    "grouping_sets_agg_df",
    _agg.grouping_sets_agg_df,
    _agg.ORACLE_GROUPING_SETS_AGG,
)

# NEW (round 10): per-stratum quality-distribution drift — the
# t-closeness EMD machinery pointed at the corpus-curation question
# (does this lang × source stratum's quality mix still look like the
# corpus?)
register(
    "quality_drift_report",
    _cur.quality_drift_report,
    _cur.ORACLE_QUALITY_DRIFT_REPORT,
)
# NEW (round 12): the drift gate's ACTION face — quarantine every doc
# in a drifted stratum via one broadcast join of the metadata-sized
# report onto the corpus (inherits the report's eager checkpoint)
register(
    "quarantine_drifting_sources",
    _cur.quarantine_drifting_sources,
    _cur.ORACLE_QUARANTINE_DRIFTING_SOURCES,
)
# NEW (round 10): driver-visible face of the observe-API guard metrics
# — proves the zero-extra-scan counters equal a direct aggregation.
# EAGER by necessity: unlike every other entry, building this frame
# RUNS a full-corpus action at construction time (observe counters
# only exist after the job they ride), so plan-only tooling (EXPLAIN
# sweeps, plan-shape tests) should skip it or accept the scan.
register(
    "guard_metrics_report",
    _metrics.guard_metrics_report,
    _metrics.ORACLE_GUARD_METRICS_REPORT,
)
# NEW (round 10): embedding-space eval-leakage gate — the semantic
# sibling of ngram_contamination (paraphrase leakage n-grams miss)
register(
    "semantic_contamination",
    _sim.semantic_contamination,
    _sim.ORACLE_SEMANTIC_CONTAMINATION,
)
# NEW (round 10): MOSS winnowing — position-robust substring
# fingerprints (the guarantee neither MinHash nor the full rolling
# hash provides)
register(
    "winnowing_fingerprints",
    _dedup.winnowing_fingerprints,
    _dedup.ORACLE_WINNOWING_FINGERPRINTS,
)
# NEW (round 10): the MOSS match stage over the winnowed index —
# capped inverted-index self-join, containment-of-the-smaller score
register(
    "winnowing_overlap_pairs",
    _dedup.winnowing_overlap_pairs,
    _dedup.ORACLE_WINNOWING_OVERLAP_PAIRS,
)
# NEW (round 10): winnowing's self-grading readout — per-source
# fingerprint density vs the theoretical 2/(w+1)
register(
    "winnowing_density_report",
    _dedup.winnowing_density_report,
    _dedup.ORACLE_WINNOWING_DENSITY_REPORT,
)
# NEW (round 11): the MOSS ACTION face — winnowing overlap clusters
# retain their highest-quality member (dedup_priority keeper policy),
# keeper payload verified bit-for-bit by md5 (the clean_md5 pattern)
register("winnowing_strip", _cur.winnowing_strip, _cur.ORACLE_WINNOWING_STRIP)
# NEW (round 11): the crawl-triage funnel — per source, how much of
# the corpus each dedup screen (exact / MinHash-LSH / winnowing) flags
register(
    "screen_funnel_report",
    _cur.screen_funnel_report,
    _cur.ORACLE_SCREEN_FUNNEL_REPORT,
)
# NEW (round 10): cross-method validation of the two decontamination
# gates (verbatim n-gram vs paraphrase embedding), the
# dedup_method_agreement pattern
register(
    "contamination_method_agreement",
    _pipe.contamination_method_agreement,
    _pipe.ORACLE_CONTAMINATION_METHOD_AGREEMENT,
)
# NEW (round 10): pre-index vector-sanity gate — null / non-finite /
# zero-norm / ragged-dimension counts + norm stats per label, one scan
register(
    "embedding_health_report",
    _sim.embedding_health_report,
    _sim.ORACLE_EMBEDDING_HEALTH_REPORT,
)
# NEW (round 10): per-shard token-mass straggler readout for
# shard_assign — payload fused into the global-rank scan, no 2nd scan
register(
    "shard_balance_report",
    _pipe.shard_balance_report,
    _pipe.ORACLE_SHARD_BALANCE_REPORT,
)

# ==========================================================================
# DRIVER WINDOW (round 6) — the driver's CORRECTNESS report truncates at
# the first 50 entries of ``queries()``, so dict order is a contract.
# Instead of physically reordering the register() blocks each round, the
# window is DECLARED below and ``_REGISTRY`` is reordered once after all
# registrations: window entries first (in tuple order), everything else
# behind in original registration order. Future rotations edit one tuple.
# ==========================================================================

#: Queries that must receive a driver verdict in round 6: the 21 round-5
#: overflow queries (never driver-verified — VERDICT r5 item 1) plus
#: everything added or semantically changed this round.
_ROUND6_NEEDS_VERDICT = (
    # --- round-5 overflow (local-replica green only, never in a window) ---
    "regional_supplier_volume",
    "forecast_revenue",
    "national_market_share",
    "product_profit",
    "returned_item_customers",
    "promo_revenue_share",
    "part_supplier_diversity",
    "large_volume_orders",
    "bracket_revenue",
    "min_cost_supplier",
    "important_part_value",
    "dominant_part_suppliers",
    "sliding_window_chunks",
    "curriculum_order",
    "language_confusion_matrix",  # ADVICE r5: recall_share -> row_share
    "skew_profile",
    "corpus_datacard",
    "unpivot_agg",  # ADVICE r5: max_balance now rounds in decimal
    "rolling_distinct_users",
    "exact_quantiles",
    "grouping_sets_agg",  # ADVICE r5: parameterized sql(), no temp view
    # --- brand-new in round 6 ---
    "ivf_index_upsert",
    "ivf_staleness_report",
    "unpivot_agg_sql",
    "grouping_sets_agg_df",
    "knn_label_agreement",
    "embedding_drift_by_source",
    "bpe_pair_counts",
    "split_leakage_report",
    "char_bigram_lm",
    "event_transition_matrix",
    "minhash_calibration_report",
    "ngram_novelty",
    "tokenizer_fertility",
    "market_basket_pairs",
    "daily_type_anomaly",
    "source_overlap_matrix",
    "dup_cluster_histogram",
    "near_dup_triangles",
    "value_trend_by_type",
    "session_path_topk",
    "customer_rfm",
    "quantization_error_report",
    "ship_latency_quantiles",
    "label_separation_report",
    "dedup_method_agreement",
    "nation_supplier_hhi",
    "dow_seasonality",
    "user_type_entropy",
)

#: Window fillers — stalest prior driver greens (last verdict r1, then
#: r2, alphabetical within a round; estimators without oracles stay
#: behind the window so every window entry carries a full hash check).
_ROUND6_STALE_REVERIFY = (
    # last driver verdict: round 1
    "arithmetic_rounding",
    "array_subscript",
    "column_equality_filter",
    "count_distinct",
    "cube_agg",
    "date_parts",
    "distinct_values",
    "join_anti",
    "join_cross",
    "join_full_outer",
    "join_semi",
    "json_get",
    "json_map_explode",
    "risk_join_sql",
    "set_intersect",
    "window_lag_lead",
    # last driver verdict: round 2 (stalest first, alphabetical)
    "array_explode",
    "avg_per_group",
    "base64_roundtrip",
    "case_when_mapping",
    "cast_projection",
    "grouped_count",
    "join_asof",
    "join_broadcast_dim",
    "join_enrichment_chain",
    "join_left",
    "json_parse_flatten",
    "latest_per_key",
    "null_reject_filter",
)

_WINDOW = 50
_ROUND6_WINDOW = _ROUND6_NEEDS_VERDICT + _ROUND6_STALE_REVERIFY[
    : _WINDOW - len(_ROUND6_NEEDS_VERDICT)
]

# ==========================================================================
# DRIVER WINDOW (round 8) — round 7 was a null round (no builder commits,
# driver re-verified the round-6 window verbatim), so the whole r1/r2
# stale backlog — 44 queries whose newest driver verdict is 6–7 rounds
# old (VERDICT r7 task 1) — now fits in one window alongside 5 round-3
# fillers. Staleness derived by unioning CORRECTNESS_r{1..7}.json.
# ==========================================================================

#: The 44 r1/r2-stale queries (last driver verdict round 1 or 2; every
#: one re-checked green by the local oracle replica each round since).
#: Order: r1 cohort first (stalest), then r2, alphabetical within each.
_ROUND8_STALE_BACKLOG = (
    # last driver verdict: round 1 (15)
    "array_subscript",
    "column_equality_filter",
    "count_distinct",
    "cube_agg",
    "date_parts",
    "distinct_values",
    "join_anti",
    "join_cross",
    "join_full_outer",
    "join_semi",
    "json_get",
    "json_map_explode",
    "risk_join_sql",
    "set_intersect",
    "window_lag_lead",
    # last driver verdict: round 2 (29)
    "array_explode",
    "avg_per_group",
    "base64_roundtrip",
    "case_when_mapping",
    "cast_projection",
    "grouped_count",
    "join_asof",
    "join_broadcast_dim",
    "join_enrichment_chain",
    "join_left",
    "json_parse_flatten",
    "latest_per_key",
    "null_reject_filter",
    "pivot_agg",
    "revenue_by_nation",
    "rollup_agg",
    "set_except",
    "sort_limit",
    "split_derive",
    "stats_per_group",
    "string_normalize",
    "table_profile",
    "top_k_per_group",
    "top_unshipped_orders",
    "topic_dispatch_filter",
    "union_fan_in",
    "value_routing",
    "window_rank",
    "window_running_sum",
)

#: Queries whose implementation changed in round 8 and therefore need a
#: fresh driver verdict (rotation contract): customer_rfm gained
#: localCheckpoints between its three exact_group_rank passes (VERDICT
#: r7 task 3) — result-identical by design, but the driver should prove
#: it.
_ROUND8_NEEDS_VERDICT = ("customer_rfm",)

#: Window fillers — the 5 stalest round-3 greens (alphabetical; the
#: remaining 8 r3 queries head the round-9 reverify queue).
_ROUND8_R3_FILLERS = (
    "cosine_topk_bruteforce",
    "cosine_topk_ivf",
    "doc_fingerprint",
    "embedding_lsh_buckets",
    "embedding_near_dup",
)

_ROUND8_WINDOW = (
    _ROUND8_NEEDS_VERDICT + _ROUND8_STALE_BACKLOG + _ROUND8_R3_FILLERS
)

#: Queries added AFTER the round-8 window filled. Round 9 MUST rotate
#: these to the window front before re-verifying anything else — build
#: the round-9 guard from this list, not hand-collected.
_ROUND9_ROTATION_CANDIDATES: tuple[str, ...] = ()

# --- Import-time guards (contract checks, not debug asserts: must
# --- survive python -O) ----------------------------------------------------
if len(_ROUND8_WINDOW) != _WINDOW:
    raise RuntimeError(
        f"round-8 window holds {len(_ROUND8_WINDOW)} entries, need {_WINDOW}"
    )
if len(set(_ROUND8_WINDOW)) != _WINDOW:
    raise RuntimeError("duplicate name in the round-8 window")
for _q in _ROUND8_WINDOW + _ROUND9_ROTATION_CANDIDATES:
    if _q not in _REGISTRY:
        raise RuntimeError(f"window/rotation query not registered: {_q}")
for _q in _ROUND8_NEEDS_VERDICT + _ROUND8_STALE_BACKLOG:
    if _q not in _ROUND8_WINDOW:
        raise RuntimeError(
            f"changed/stale query outside the {_WINDOW}-entry window: {_q}"
        )
for _q in _ROUND9_ROTATION_CANDIDATES:
    if _q in _ROUND8_WINDOW:
        raise RuntimeError(
            f"round-8 overflow query {_q} sits INSIDE the window — it would "
            "displace a round-8 verdict"
        )

# ==========================================================================
# DRIVER WINDOW (round 9) — the round-8 window cleared the r1/r2
# backlog, leaving the 8 remaining round-3 greens and the 39 round-4
# greens as the stalest verdicts (VERDICT r8 task 2; staleness derived
# by unioning CORRECTNESS_r{1..8}.json). 3 round-9 needs-verdict
# entries + all 47 r3/r4 stales saturate the window exactly (no
# fillers — see _ROUND9_R5_FILLERS).
# ==========================================================================

#: Queries whose implementation changed (or that are NEW) in round 9
#: and therefore need a fresh driver verdict (rotation contract):
#: - simhash_calibration_report: NEW — hamming-side calibration
#:   readout (VERDICT r8 task 9).
#: - daily_type_anomaly: scoring half extracted into
#:   score_daily_counts (shared with the new streaming monitor face) —
#:   result-identical by design, but the driver should prove it.
#: - customer_rfm: the three exact_group_rank passes fused into one
#:   exact_multi_rank (one sketch scan, one grouping-sets count scan,
#:   three windows in one plan) — bit-identical ranks by design,
#:   ~40% faster measured; the driver should prove the identity.
_ROUND9_NEEDS_VERDICT = (
    "simhash_calibration_report",
    "daily_type_anomaly",
    "customer_rfm",
)

#: The 47 stale queries: the 8 r3-era greens first (stalest), then the
#: 39 r4-era greens, alphabetical within each cohort.
_ROUND9_STALE_BACKLOG = (
    # last driver verdict: round 3 (8)
    "exact_dedup",
    "media_byte_stats",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "pricing_summary",
    "simhash_fingerprints",
    "simhash_near_dup_pairs",
    # last driver verdict: round 4 (39)
    "corr_panel",
    "cosine_scores_pandas",
    "decayed_user_score",
    "embedding_centroids",
    "embedding_quantize",
    "frame_sample_stats",
    "funnel_conversion",
    "hash_split",
    "hourly_event_rollup",
    "interval_count_join",
    "iqr_outliers",
    "kmeans_assign",
    "language_id",
    "media_feature_pipeline",
    "media_resize_stats",
    "near_dup_components",
    "ngram_contamination",
    "passage_dedup",
    "passage_source_matrix",
    "perplexity_score",
    "pii_scrub",
    "price_histogram",
    "quality_score",
    "redis_envelope_decode",
    "repetition_score",
    "risk_join",
    "rolling_avg_24h",
    "salted_supplier_rollup",
    "scd2_history",
    "sessionize",
    "simhash_fingerprints_pandas",
    "source_mixture_weights",
    "stratified_sample",
    "substring_dedup",
    "tfidf_top_terms",
    "timestamp_convert",
    "token_stats",
    "weekly_retention",
    "word_entropy",
)

#: No round-5 fillers: 3 needs-verdict + 47 stale saturate the window
#: exactly; the 50 r5 greens head the round-10 reverify queue.
_ROUND9_R5_FILLERS: tuple[str, ...] = ()

_ROUND9_WINDOW = (
    _ROUND9_NEEDS_VERDICT + _ROUND9_STALE_BACKLOG + _ROUND9_R5_FILLERS
)

#: Queries added or CHANGED after the round-9 window saturated (3
#: needs-verdict + 47 stale = 50 exactly). Round 10 MUST rotate these
#: to the window front before re-verifying anything else — build the
#: round-10 guard from this list, not hand-collected. The first three
#: are result-identical plan improvements (local oracle replica green
#: at sf0.01 AND sf0.1) awaiting their driver verdict; every entry
#: after them is a NEW operator needing a FIRST verdict, not an
#: identity check:
#: - quality_topk_filter: length+TTR rank passes fused into one
#:   exact_multi_rank (grouped) — pass-1 window no longer re-executes
#:   ~3x inside pass 2's scans.
#: - curriculum_order: phase frame materialized before the position
#:   pass (same 3x re-execution fix).
#: - vocab_coverage: rank frame materialized before the cumsum pass
#:   (same fix).
#: - boilerplate_strip: NEW — CCNet/C4-style within-source boilerplate
#:   removal with verified cleaned-text reconstruction.
#: - k_anonymity_report: NEW — QI group-size release audit (the
#:   structured-data privacy gate next to pii_scrub).
#: - l_diversity_report: NEW — the homogeneity-attack companion gate
#:   (distinct sensitive values per QI group, not group size).
#: - decontaminate_corpus: NEW — the decontamination action face
#:   (drop docs flagged by the ngram_contamination signal, per-lang
#:   retention rollup).
#: - t_closeness_report: NEW — the third privacy gate (normalized
#:   1-D EMD of each QI group's sensitive distribution vs global).
_ROUND10_ROTATION_CANDIDATES: tuple[str, ...] = (
    "quality_topk_filter",
    "curriculum_order",
    "vocab_coverage",
    "boilerplate_strip",
    "k_anonymity_report",
    "l_diversity_report",
    "decontaminate_corpus",
    "t_closeness_report",
)

# --- Import-time guards (contract checks, not debug asserts: must
# --- survive python -O) ----------------------------------------------------
if len(_ROUND9_WINDOW) != _WINDOW:
    raise RuntimeError(
        f"round-9 window holds {len(_ROUND9_WINDOW)} entries, need {_WINDOW}"
    )
if len(set(_ROUND9_WINDOW)) != _WINDOW:
    raise RuntimeError("duplicate name in the round-9 window")
for _q in _ROUND9_WINDOW + _ROUND10_ROTATION_CANDIDATES:
    if _q not in _REGISTRY:
        raise RuntimeError(f"window/rotation query not registered: {_q}")
for _q in _ROUND9_NEEDS_VERDICT + _ROUND9_STALE_BACKLOG:
    if _q not in _ROUND9_WINDOW:
        raise RuntimeError(
            f"changed/stale query outside the {_WINDOW}-entry window: {_q}"
        )
for _q in _ROUND10_ROTATION_CANDIDATES:
    if _q in _ROUND9_WINDOW:
        raise RuntimeError(
            f"round-9 overflow query {_q} sits INSIDE the window — it would "
            "displace a round-9 verdict"
        )

# ==========================================================================
# DRIVER WINDOW (round 10) — the 8 _ROUND10_ROTATION_CANDIDATES lead
# (3 result-identical perf changes + 5 NEW operators needing a FIRST
# verdict; VERDICT r9 task 2), then the 42 stalest oracle-backed r5
# greens (staleness derived by unioning CORRECTNESS_r{1..9}.json; the
# r5 cohort is 48 candidates after quality_topk_filter/vocab_coverage
# moved into the needs-verdict block, so 6 leftovers head round 11 —
# see _ROUND11_R5_LEFTOVERS). The two r1-era estimators
# (approx_count_distinct, quantile_sketch) stay OUT by design: every
# in-window entry must be oracle-backed, and they are tolerance-tested
# instead.
# ==========================================================================

#: t_closeness_report changed again IN round 10 (the EMD accumulation
#: hardened to pre-rounded DECIMAL terms per the cross-engine float
#: rule, VERDICT r9 task 3) — it was already a first-verdict rotation
#: candidate, so it still needs exactly one verdict.
_ROUND10_NEEDS_VERDICT = _ROUND10_ROTATION_CANDIDATES

#: The 42 stalest oracle-backed queries: all r5-era greens,
#: alphabetical (one flat cohort — every candidate shares the same
#: last-verdict round).
_ROUND10_STALE_BACKLOG = (
    "ann_recall_report",
    "bm25_search",
    "ccnet_perplexity_bucket",
    "cdc_merge",
    "cluster_quality",
    "corpus_curation",
    "customer_order_distribution",
    "decile_stats",
    "dedup_priority",
    "domain_quality_filter",
    "domain_stats",
    "dsir_importance_weights",
    "fuzzy_name_pairs",
    "gopher_quality_filter",
    "hybrid_retrieval_fusion",
    "idle_customer_balance",
    "incremental_dedup",
    "knn_graph",
    "lang_zscore",
    "lang_zscore_pandas",
    "late_order_priorities",
    "lone_late_supplier_orders",
    "media_dedup",
    "mixture_sample",
    "mixture_sample_accounting",
    "mixture_upsample",
    "nation_trade_volume",
    "near_dup_rate_by_source",
    "nfc_normalize",
    "pack_efficiency",
    "quantized_cosine_topk",
    "robust_scale",
    "semantic_dedup",
    "seq_pack_bins",
    "seq_pack_concat",
    "session_window_rollup",
    "shard_assign",
    "shingle_containment_pairs",
    "small_quantity_revenue",
    "snapshot_diff",
    "timeseries_gap_fill",
    "token_bigram_pmi",
)

#: The 6 r5 greens the 42 stale slots could not hold — they MUST head
#: round 11's stale backlog (stalest remaining cohort).
_ROUND11_R5_LEFTOVERS = (
    "top_revenue_suppliers",
    "trade_pagerank",
    "url_dedup",
    "url_normalize",
    "vocab_oov_rate",
    "weighted_reservoir_sample",
)

_ROUND10_WINDOW = _ROUND10_NEEDS_VERDICT + _ROUND10_STALE_BACKLOG

#: Queries added or CHANGED after the round-10 window filled. Round 11
#: MUST rotate these to the window front before re-verifying anything
#: else — build the round-11 guard from this list, not hand-collected.
#: Both are NEW round-10 operators needing a FIRST verdict:
#: - quality_drift_report: per-(lang, source) quality-distribution EMD
#:   gate (the t-closeness grid machinery over the document corpus).
#: - guard_metrics_report: observe-API guard counters returned as a
#:   one-row frame so the driver proves they equal direct aggregates.
#: - semantic_contamination: embedding-space eval-leakage gate (top-1
#:   cosine vs a broadcast benchmark set, scale-relative DECIMAL flag).
#: - winnowing_fingerprints: MOSS winnowing fingerprint set — the
#:   position-robust substring-matching fingerprint.
#: - winnowing_overlap_pairs: the MOSS match stage over that index.
#: - winnowing_density_report: the family's calibration readout
#:   (observed fingerprint density vs the theoretical 2/(w+1)).
#: - contamination_method_agreement: n-gram vs embedding gate overlap
#:   statistics (the dedup_method_agreement pattern).
#: - embedding_health_report: pre-index vector-sanity gate (null /
#:   non-finite / zero-norm / ragged-dimension counts + norm stats,
#:   per label via rollup — one scan, labels+1 rows).
#: - shard_balance_report: per-shard token-mass straggler readout for
#:   shard_assign (docs are balanced by construction; token mass is
#:   what stragglers follow) — payload fused into the rank scan.
#: - ngram_jaccard_pairs: CHANGED late in round 10 (the capped
#:   inverted-index self-join factored into the shared
#:   _capped_pair_counts substrate — result-identical by design, but
#:   its last verdict predates the refactor; the containment /
#:   winnowing co-users of the substrate are already in the r10
#:   window or above).
_ROUND11_ROTATION_CANDIDATES: tuple[str, ...] = (
    "quality_drift_report",
    "guard_metrics_report",
    "semantic_contamination",
    "winnowing_fingerprints",
    "winnowing_overlap_pairs",
    "winnowing_density_report",
    "contamination_method_agreement",
    "embedding_health_report",
    "shard_balance_report",
    "ngram_jaccard_pairs",
    # NEW late in round 10: PII prevalence triage gate (see the
    # register() call for the rationale) — first verdict pending.
    "pii_prevalence_report",
    # CHANGED late in round 10: conversion denominator wrapped in
    # NULLIF on both engine sides so an entrant-less funnel reports
    # NULL instead of an ANSI divide-by-zero — result-identical on any
    # corpus with signup events.
    "funnel_conversion",
    # CHANGED late in round 10: NULL media payloads now yield null
    # features per the extract_features docstring contract instead of
    # crashing the Arrow worker — result-identical on non-null
    # corpora. (nfc_normalize got the same NULL-propagation fix but
    # already sits in the round-10 window's stale backlog.)
    "media_feature_pipeline",
)

# --- Import-time guards (contract checks, not debug asserts: must
# --- survive python -O) ----------------------------------------------------
if len(_ROUND10_WINDOW) != _WINDOW:
    raise RuntimeError(
        f"round-10 window holds {len(_ROUND10_WINDOW)} entries, need {_WINDOW}"
    )
if len(set(_ROUND10_WINDOW)) != _WINDOW:
    raise RuntimeError("duplicate name in the round-10 window")
for _q in (
    _ROUND10_WINDOW + _ROUND11_ROTATION_CANDIDATES + _ROUND11_R5_LEFTOVERS
):
    if _q not in _REGISTRY:
        raise RuntimeError(f"window/rotation query not registered: {_q}")
for _q in _ROUND10_NEEDS_VERDICT + _ROUND10_STALE_BACKLOG:
    if _q not in _ROUND10_WINDOW:
        raise RuntimeError(
            f"changed/stale query outside the {_WINDOW}-entry window: {_q}"
        )
for _q in _ROUND11_ROTATION_CANDIDATES + _ROUND11_R5_LEFTOVERS:
    if _q in _ROUND10_WINDOW:
        raise RuntimeError(
            f"round-10 overflow query {_q} sits INSIDE the window — it would "
            "displace a round-10 verdict"
        )

# ==========================================================================
# DRIVER WINDOW (round 11) — the 13 _ROUND11_ROTATION_CANDIDATES lead
# (10 NEW round-10 operators needing a FIRST verdict + 3 changed
# post-window: ngram_jaccard_pairs / funnel_conversion /
# media_feature_pipeline; VERDICT r10 task 1), then the 6 r5 leftovers
# (stalest cohort — declared at _ROUND11_R5_LEFTOVERS), then the 31
# alphabetically-first of the 47 r7-era greens (staleness derived by
# unioning CORRECTNESS_r{1..10}.json; the 16 r7 leftovers head round
# 12's backlog — see _ROUND12_R7_LEFTOVERS). The two r1-era estimators
# (approx_count_distinct, quantile_sketch) stay OUT by design: every
# in-window entry must be oracle-backed, and they are tolerance-tested
# instead.
# ==========================================================================

_ROUND11_NEEDS_VERDICT = _ROUND11_ROTATION_CANDIDATES

#: 6 r5 leftovers first (the stalest greens anywhere), then the 31
#: alphabetically-first r7 greens (one flat cohort — every r7
#: candidate shares the same last-verdict round, so alphabetical is
#: the declared tiebreak).
_ROUND11_STALE_BACKLOG = _ROUND11_R5_LEFTOVERS + (
    "arithmetic_rounding",
    "bpe_pair_counts",
    "bracket_revenue",
    "char_bigram_lm",
    "corpus_datacard",
    "dedup_method_agreement",
    "dominant_part_suppliers",
    "dow_seasonality",
    "dup_cluster_histogram",
    "embedding_drift_by_source",
    "event_transition_matrix",
    "exact_quantiles",
    "forecast_revenue",
    "grouping_sets_agg",
    "grouping_sets_agg_df",
    "important_part_value",
    "ivf_index_upsert",
    "ivf_staleness_report",
    "knn_label_agreement",
    "label_separation_report",
    "language_confusion_matrix",
    "large_volume_orders",
    "market_basket_pairs",
    "min_cost_supplier",
    "minhash_calibration_report",
    "nation_supplier_hhi",
    "national_market_share",
    "near_dup_triangles",
    "ngram_novelty",
    "part_supplier_diversity",
    "product_profit",
)

#: The 16 r7 greens the 31 stale slots could not hold — they MUST head
#: round 12's stale backlog (stalest remaining cohort after this
#: round's verdicts land).
_ROUND12_R7_LEFTOVERS = (
    "promo_revenue_share",
    "quantization_error_report",
    "regional_supplier_volume",
    "returned_item_customers",
    "rolling_distinct_users",
    "session_path_topk",
    "ship_latency_quantiles",
    "skew_profile",
    "sliding_window_chunks",
    "source_overlap_matrix",
    "split_leakage_report",
    "tokenizer_fertility",
    "unpivot_agg",
    "unpivot_agg_sql",
    "user_type_entropy",
    "value_trend_by_type",
)

_ROUND11_WINDOW = _ROUND11_NEEDS_VERDICT + _ROUND11_STALE_BACKLOG

#: Queries added or CHANGED after the round-11 window filled. Round 12
#: MUST rotate these to the window front before re-verifying anything
#: else — build the round-12 guard from this list, not hand-collected.
#: - winnowing_strip: NEW round-11 operator (the MOSS action face) —
#:   first verdict pending.
#: - everything else: result-identical plan changes from round 11's
#:   layout-aware substrate spread (_spread_for_hashing — the shingle
#:   /winnowing/vectorized-kernel openers now skip the text-sized
#:   exchange when the scan already parallelizes) and, for the
#:   connected-components consumers, the CC loop's scoped
#:   constraint-propagation disable. The in-window co-users
#:   (ngram_jaccard_pairs, minhash_calibration_report,
#:   dedup_method_agreement, ngram_novelty, dup_cluster_histogram,
#:   near_dup_triangles, the winnowing trio) get their round-11
#:   verdicts on the changed plans; these are the consumers whose last
#:   verdict predates the change. source_overlap_matrix also appears
#:   in _ROUND12_R7_LEFTOVERS (it is both stale AND changed) — round
#:   12's window builder dedupes.
_ROUND12_ROTATION_CANDIDATES: tuple[str, ...] = (
    "winnowing_strip",
    # NEW round-11 operators, first verdict pending:
    "markup_density_report",
    "k_anonymize_release",
    "cusum_changepoint_report",
    "media_type_mismatch_report",
    "ivf_probe_sweep",
    "screen_funnel_report",
    "corpus_curation",
    "dedup_priority",
    "incremental_dedup",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "near_dup_components",
    "near_dup_rate_by_source",
    "shingle_containment_pairs",
    "simhash_calibration_report",
    "simhash_fingerprints",
    "simhash_fingerprints_pandas",
    "simhash_near_dup_pairs",
    "source_overlap_matrix",
)

if len(_ROUND11_WINDOW) != _WINDOW:
    raise RuntimeError(
        f"round-11 window holds {len(_ROUND11_WINDOW)} entries, need {_WINDOW}"
    )
if len(set(_ROUND11_WINDOW)) != _WINDOW:
    raise RuntimeError("duplicate name in the round-11 window")
for _q in (
    _ROUND11_WINDOW + _ROUND12_ROTATION_CANDIDATES + _ROUND12_R7_LEFTOVERS
):
    if _q not in _REGISTRY:
        raise RuntimeError(f"window/rotation query not registered: {_q}")
for _q in _ROUND11_NEEDS_VERDICT + _ROUND11_STALE_BACKLOG:
    if _q not in _ROUND11_WINDOW:
        raise RuntimeError(
            f"changed/stale query outside the {_WINDOW}-entry window: {_q}"
        )
for _q in _ROUND12_ROTATION_CANDIDATES + _ROUND12_R7_LEFTOVERS:
    if _q in _ROUND11_WINDOW:
        raise RuntimeError(
            f"round-11 overflow query {_q} sits INSIDE the window — it would "
            "displace a round-11 verdict"
        )

# ==========================================================================
# DRIVER WINDOW (round 12) — the 20 _ROUND12_ROTATION_CANDIDATES lead
# (7 NEW round-11 operators needing a FIRST verdict + 13
# result-identical plan changes from the layout-aware substrate spread
# and the CC-loop rework; VERDICT r11 task 1), then the 15 remaining
# r7 leftovers (source_overlap_matrix is deduped — it sits in BOTH
# overflow lists and rides in with the candidates), then the 15
# alphabetically-first of the 49 r8-era greens (the stalest bulk after
# this round's verdicts; staleness derived by unioning
# CORRECTNESS_r{1..11}.json). The 34 r8 greens the window cannot hold
# are declared at _ROUND13_R8_LEFTOVERS. The two r1-era estimators
# stay OUT by design (tolerance-tested, no oracle).
# ==========================================================================

_ROUND12_NEEDS_VERDICT = _ROUND12_ROTATION_CANDIDATES

#: 15 r7 leftovers first (the stalest greens anywhere once the
#: candidates carry source_overlap_matrix), then the 15
#: alphabetically-first r8 greens (one flat cohort — every r8
#: candidate shares the same last-verdict round, so alphabetical is
#: the declared tiebreak).
_ROUND12_STALE_BACKLOG = tuple(
    q for q in _ROUND12_R7_LEFTOVERS if q not in _ROUND12_ROTATION_CANDIDATES
) + (
    "array_explode",
    "array_subscript",
    "avg_per_group",
    "base64_roundtrip",
    "case_when_mapping",
    "cast_projection",
    "column_equality_filter",
    "cosine_topk_bruteforce",
    "cosine_topk_ivf",
    "count_distinct",
    "cube_agg",
    "date_parts",
    "distinct_values",
    "doc_fingerprint",
    "embedding_lsh_buckets",
)

#: The 34 r8 greens the 15 stale slots could not hold — they MUST head
#: round 13's stale backlog (stalest remaining cohort after this
#: round's verdicts land).
_ROUND13_R8_LEFTOVERS = (
    "embedding_near_dup",
    "grouped_count",
    "join_anti",
    "join_asof",
    "join_broadcast_dim",
    "join_cross",
    "join_enrichment_chain",
    "join_full_outer",
    "join_left",
    "join_semi",
    "json_get",
    "json_map_explode",
    "json_parse_flatten",
    "latest_per_key",
    "null_reject_filter",
    "pivot_agg",
    "revenue_by_nation",
    "risk_join_sql",
    "rollup_agg",
    "set_except",
    "set_intersect",
    "sort_limit",
    "split_derive",
    "stats_per_group",
    "string_normalize",
    "table_profile",
    "top_k_per_group",
    "top_unshipped_orders",
    "topic_dispatch_filter",
    "union_fan_in",
    "value_routing",
    "window_lag_lead",
    "window_rank",
    "window_running_sum",
)

_ROUND12_WINDOW = _ROUND12_NEEDS_VERDICT + _ROUND12_STALE_BACKLOG

#: Queries added or CHANGED after the round-12 window filled. Round 13
#: MUST rotate these to the window front before re-verifying anything
#: else — build the round-13 guard from this list, not hand-collected.
#: (Populated as round 12 lands operators; media_type_mismatch_report
#: is NOT here — its tie-break fix landed BEFORE its first verdict,
#: inside this round's window.)
#: - bpe_learn_merges / bpe_apply_merges: NEW round-12 operators (the
#:   closed tokenizer-induction loop) — first verdicts pending.
#: - markup_strip: NEW round-12 operator (the markup action face) —
#:   first verdict pending.
#: - bpe_token_mixture_weights: NEW round-12 operator (mixture weights
#:   on merge-aware token counts) — first verdict pending.
#: - bpe_vocab_table: NEW round-12 operator (the post-merge subword
#:   vocabulary) — first verdict pending.
#: - bpe_compression_sweep / bpe_seq_pack_bins: NEW round-12 operators
#:   (the merge-budget curve + merge-aware packing) — first verdicts
#:   pending.
#: - ann_probe_agreement: NEW round-12 operator (the deployed-depth
#:   sweep↔report consistency gate) — first verdict pending.
#: - tokenizer_drift_report: NEW round-12 operator (train/eval
#:   fertility drift per source) — first verdict pending.
#: - deleak_split / quarantine_drifting_sources: NEW round-12
#:   operators (the leakage and drift reports' action faces) — first
#:   verdicts pending.
#: - bpe_pack_efficiency / bpe_merge_stability: NEW round-12 operators
#:   (packing accounting on merge-aware units; per-half merge
#:   reproducibility) — first verdicts pending.
_ROUND13_ROTATION_CANDIDATES: tuple[str, ...] = (
    "deleak_split",
    "quarantine_drifting_sources",
    "bpe_pack_efficiency",
    "bpe_merge_stability",
    "bpe_learn_merges",
    "bpe_apply_merges",
    "markup_strip",
    "bpe_token_mixture_weights",
    "bpe_vocab_table",
    "bpe_compression_sweep",
    "bpe_seq_pack_bins",
    "ann_probe_agreement",
    "tokenizer_drift_report",
)

if len(_ROUND12_WINDOW) != _WINDOW:
    raise RuntimeError(
        f"round-12 window holds {len(_ROUND12_WINDOW)} entries, need {_WINDOW}"
    )
if len(set(_ROUND12_WINDOW)) != _WINDOW:
    raise RuntimeError("duplicate name in the round-12 window")
for _q in (
    _ROUND12_WINDOW + _ROUND13_ROTATION_CANDIDATES + _ROUND13_R8_LEFTOVERS
):
    if _q not in _REGISTRY:
        raise RuntimeError(f"window/rotation query not registered: {_q}")
for _q in _ROUND12_NEEDS_VERDICT + _ROUND12_STALE_BACKLOG:
    if _q not in _ROUND12_WINDOW:
        raise RuntimeError(
            f"changed/stale query outside the {_WINDOW}-entry window: {_q}"
        )
for _q in _ROUND13_ROTATION_CANDIDATES + _ROUND13_R8_LEFTOVERS:
    if _q in _ROUND12_WINDOW:
        raise RuntimeError(
            f"round-12 overflow query {_q} sits INSIDE the window — it would "
            "displace a round-12 verdict"
        )

# ==========================================================================
# DRIVER WINDOW (round 13) — the 13 _ROUND13_ROTATION_CANDIDATES lead
# (every round-12 operator gets its FIRST driver verdict; VERDICT r12
# task 1), then the 34 _ROUND13_R8_LEFTOVERS (the stalest cohort — r8
# greens the round-12 window could not hold), then the 3
# alphabetically-first of the 40 r9-era greens (staleness derived by
# unioning CORRECTNESS_r{1..12}.json; every r9 candidate shares the
# same last-verdict round, so alphabetical is the declared tiebreak).
# The 37 r9 greens the window cannot hold are declared at
# _ROUND14_R9_LEFTOVERS. The two r1-era estimators stay OUT by design
# (tolerance-tested, no oracle).
# ==========================================================================

_ROUND13_NEEDS_VERDICT = _ROUND13_ROTATION_CANDIDATES

#: 34 r8 leftovers first (the stalest greens anywhere), then the 3
#: alphabetically-first r9 greens.
_ROUND13_STALE_BACKLOG = _ROUND13_R8_LEFTOVERS + (
    "corr_panel",
    "cosine_scores_pandas",
    "customer_rfm",
)

#: The 37 r9 greens the 3 stale slots could not hold — they MUST head
#: round 14's stale backlog (stalest remaining cohort after this
#: round's verdicts land).
_ROUND14_R9_LEFTOVERS = (
    "daily_type_anomaly",
    "decayed_user_score",
    "embedding_centroids",
    "embedding_quantize",
    "exact_dedup",
    "frame_sample_stats",
    "hash_split",
    "hourly_event_rollup",
    "interval_count_join",
    "iqr_outliers",
    "kmeans_assign",
    "language_id",
    "media_byte_stats",
    "media_resize_stats",
    "ngram_contamination",
    "passage_dedup",
    "passage_source_matrix",
    "perplexity_score",
    "pii_scrub",
    "price_histogram",
    "pricing_summary",
    "quality_score",
    "redis_envelope_decode",
    "repetition_score",
    "risk_join",
    "rolling_avg_24h",
    "salted_supplier_rollup",
    "scd2_history",
    "sessionize",
    "source_mixture_weights",
    "stratified_sample",
    "substring_dedup",
    "tfidf_top_terms",
    "timestamp_convert",
    "token_stats",
    "weekly_retention",
    "word_entropy",
)

#: Queries added or CHANGED after the round-13 window filled. Round 14
#: MUST rotate these to the window front before re-verifying anything
#: else — build the round-14 guard from this list, not hand-collected.
#: - bpe_encode_chunks: NEW round-13 operator (within-document chunking
#:   on merge-aware unit budgets — VERDICT r12 task 3) — first verdict
#:   pending.
#: - bpe_unit_total_agreement: NEW round-13 operator (loop-world vs
#:   baked-replace-world corpus unit total, the ann_probe_agreement
#:   pattern — VERDICT r12 task 8) — first verdict pending.
#: - chunk_dedup: NEW round-13 operator (exact dedup of the training
#:   sequences over chunk_hash) — first verdict pending.
_ROUND14_ROTATION_CANDIDATES: tuple[str, ...] = (
    "bpe_encode_chunks",
    "bpe_unit_total_agreement",
    "chunk_dedup",
)

_ROUND13_WINDOW = _ROUND13_NEEDS_VERDICT + _ROUND13_STALE_BACKLOG

if len(_ROUND13_WINDOW) != _WINDOW:
    raise RuntimeError(
        f"round-13 window holds {len(_ROUND13_WINDOW)} entries, need {_WINDOW}"
    )
if len(set(_ROUND13_WINDOW)) != _WINDOW:
    raise RuntimeError("duplicate name in the round-13 window")
for _q in (
    _ROUND13_WINDOW + _ROUND14_ROTATION_CANDIDATES + _ROUND14_R9_LEFTOVERS
):
    if _q not in _REGISTRY:
        raise RuntimeError(f"window/rotation query not registered: {_q}")
for _q in _ROUND13_NEEDS_VERDICT + _ROUND13_STALE_BACKLOG:
    if _q not in _ROUND13_WINDOW:
        raise RuntimeError(
            f"changed/stale query outside the {_WINDOW}-entry window: {_q}"
        )
for _q in _ROUND14_ROTATION_CANDIDATES + _ROUND14_R9_LEFTOVERS:
    if _q in _ROUND13_WINDOW:
        raise RuntimeError(
            f"round-13 overflow query {_q} sits INSIDE the window — it would "
            "displace a round-13 verdict"
        )

# ==========================================================================
# DRIVER WINDOW (round 14) — the 3 _ROUND14_ROTATION_CANDIDATES lead
# (every round-13 operator gets its FIRST driver verdict; VERDICT r13
# task 1), then the 37 _ROUND14_R9_LEFTOVERS (the stalest cohort — the
# r9 greens rounds 10–13 could not hold; this EMPTIES the r9 cohort),
# then the 10 alphabetically-first of the 45 r10-era greens (staleness
# derived by unioning CORRECTNESS_r{1..13}.json; every r10 candidate
# shares the same last-verdict round, so alphabetical is the declared
# tiebreak). The 35 r10 greens the window cannot hold are declared at
# _ROUND15_R10_LEFTOVERS. The two r1-era estimators stay OUT by design
# (tolerance-tested, no oracle).
# ==========================================================================

_ROUND14_NEEDS_VERDICT = _ROUND14_ROTATION_CANDIDATES

#: 37 r9 leftovers first (the stalest greens anywhere — emptying the
#: r9 cohort), then the 10 alphabetically-first r10 greens.
_ROUND14_STALE_BACKLOG = _ROUND14_R9_LEFTOVERS + (
    "ann_recall_report",
    "bm25_search",
    "boilerplate_strip",
    "ccnet_perplexity_bucket",
    "cdc_merge",
    "cluster_quality",
    "curriculum_order",
    "customer_order_distribution",
    "decile_stats",
    "decontaminate_corpus",
)

#: The 35 r10 greens the 10 stale slots could not hold — they MUST
#: head round 15's stale backlog (stalest remaining cohort after this
#: round's verdicts land).
_ROUND15_R10_LEFTOVERS = (
    "domain_quality_filter",
    "domain_stats",
    "dsir_importance_weights",
    "fuzzy_name_pairs",
    "gopher_quality_filter",
    "hybrid_retrieval_fusion",
    "idle_customer_balance",
    "k_anonymity_report",
    "knn_graph",
    "l_diversity_report",
    "lang_zscore",
    "lang_zscore_pandas",
    "late_order_priorities",
    "lone_late_supplier_orders",
    "media_dedup",
    "mixture_sample",
    "mixture_sample_accounting",
    "mixture_upsample",
    "nation_trade_volume",
    "nfc_normalize",
    "pack_efficiency",
    "quality_topk_filter",
    "quantized_cosine_topk",
    "robust_scale",
    "semantic_dedup",
    "seq_pack_bins",
    "seq_pack_concat",
    "session_window_rollup",
    "shard_assign",
    "small_quantity_revenue",
    "snapshot_diff",
    "t_closeness_report",
    "timeseries_gap_fill",
    "token_bigram_pmi",
    "vocab_coverage",
)

#: Queries added or CHANGED after the round-14 window filled. Round 15
#: MUST rotate these to the window front before re-verifying anything
#: else — build the round-15 guard from this list, not hand-collected.
#: - pack_deduped_chunks: NEW round-14 operator (the training writer
#:   consuming chunk_dedup's keepers — VERDICT r13 task 2) — first
#:   verdict pending.
#: - chunk_dedup_accounting: NEW round-14 operator (packed + saved =
#:   pre-dedup conservation gate on the writer) — first verdict
#:   pending.
#: - shard_packed_chunks: NEW round-14 operator (packed bins dealt
#:   into epoch shards — the chunk spine's last writer step) — first
#:   verdict pending.
_ROUND15_ROTATION_CANDIDATES: tuple[str, ...] = (
    "pack_deduped_chunks",
    "chunk_dedup_accounting",
    "shard_packed_chunks",
)

_ROUND14_WINDOW = _ROUND14_NEEDS_VERDICT + _ROUND14_STALE_BACKLOG

if len(_ROUND14_WINDOW) != _WINDOW:
    raise RuntimeError(
        f"round-14 window holds {len(_ROUND14_WINDOW)} entries, need {_WINDOW}"
    )
if len(set(_ROUND14_WINDOW)) != _WINDOW:
    raise RuntimeError("duplicate name in the round-14 window")
for _q in (
    _ROUND14_WINDOW + _ROUND15_ROTATION_CANDIDATES + _ROUND15_R10_LEFTOVERS
):
    if _q not in _REGISTRY:
        raise RuntimeError(f"window/rotation query not registered: {_q}")
for _q in _ROUND14_NEEDS_VERDICT + _ROUND14_STALE_BACKLOG:
    if _q not in _ROUND14_WINDOW:
        raise RuntimeError(
            f"changed/stale query outside the {_WINDOW}-entry window: {_q}"
        )
for _q in _ROUND15_ROTATION_CANDIDATES + _ROUND15_R10_LEFTOVERS:
    if _q in _ROUND14_WINDOW:
        raise RuntimeError(
            f"round-14 overflow query {_q} sits INSIDE the window — it would "
            "displace a round-14 verdict"
        )

# ==========================================================================
# DRIVER WINDOW (round 15) — the 3 _ROUND15_ROTATION_CANDIDATES lead
# (every round-14 chunk-writer operator gets its FIRST driver verdict;
# VERDICT r14 task 1), then the 35 _ROUND15_R10_LEFTOVERS (the stalest
# cohort — this EMPTIES the r10 cohort), then the 12 alphabetically-
# first of the 50 r11-era greens (staleness derived by unioning
# CORRECTNESS_r{1..14}.json; every r11 candidate shares the same
# last-verdict round, so alphabetical is the declared tiebreak). The
# 38 r11 greens the window cannot hold are declared at
# _ROUND16_R11_LEFTOVERS. The two r1-era estimators stay OUT by design
# (tolerance-tested, no oracle).
# ==========================================================================

_ROUND15_NEEDS_VERDICT = _ROUND15_ROTATION_CANDIDATES

#: 35 r10 leftovers first (the stalest greens anywhere — emptying the
#: r10 cohort), then the 12 alphabetically-first r11 greens.
_ROUND15_STALE_BACKLOG = _ROUND15_R10_LEFTOVERS + (
    "arithmetic_rounding",
    "bpe_pair_counts",
    "bracket_revenue",
    "char_bigram_lm",
    "contamination_method_agreement",
    "corpus_datacard",
    "dedup_method_agreement",
    "dominant_part_suppliers",
    "dow_seasonality",
    "dup_cluster_histogram",
    "embedding_drift_by_source",
    "embedding_health_report",
)

#: The 38 r11 greens the 12 stale slots could not hold — they MUST
#: head round 16's stale backlog (stalest remaining cohort after this
#: round's verdicts land).
_ROUND16_R11_LEFTOVERS = (
    "event_transition_matrix",
    "exact_quantiles",
    "forecast_revenue",
    "funnel_conversion",
    "grouping_sets_agg",
    "grouping_sets_agg_df",
    "guard_metrics_report",
    "important_part_value",
    "ivf_index_upsert",
    "ivf_staleness_report",
    "knn_label_agreement",
    "label_separation_report",
    "language_confusion_matrix",
    "large_volume_orders",
    "market_basket_pairs",
    "media_feature_pipeline",
    "min_cost_supplier",
    "minhash_calibration_report",
    "nation_supplier_hhi",
    "national_market_share",
    "near_dup_triangles",
    "ngram_jaccard_pairs",
    "ngram_novelty",
    "part_supplier_diversity",
    "pii_prevalence_report",
    "product_profit",
    "quality_drift_report",
    "semantic_contamination",
    "shard_balance_report",
    "top_revenue_suppliers",
    "trade_pagerank",
    "url_dedup",
    "url_normalize",
    "vocab_oov_rate",
    "weighted_reservoir_sample",
    "winnowing_density_report",
    "winnowing_fingerprints",
    "winnowing_overlap_pairs",
)

#: Queries added or CHANGED after the round-15 window filled. Round 16
#: MUST rotate these to the window front before re-verifying anything
#: else — build the round-16 guard from this list, not hand-collected.
#: - curriculum_pack_order: NEW round-15 operator (NTILE curriculum
#:   phases over the packed bins — VERDICT r14 task 5) — first verdict
#:   pending.
_ROUND16_ROTATION_CANDIDATES: tuple[str, ...] = (
    "curriculum_pack_order",
)

_ROUND15_WINDOW = _ROUND15_NEEDS_VERDICT + _ROUND15_STALE_BACKLOG

if len(_ROUND15_WINDOW) != _WINDOW:
    raise RuntimeError(
        f"round-15 window holds {len(_ROUND15_WINDOW)} entries, need {_WINDOW}"
    )
if len(set(_ROUND15_WINDOW)) != _WINDOW:
    raise RuntimeError("duplicate name in the round-15 window")
for _q in (
    _ROUND15_WINDOW + _ROUND16_ROTATION_CANDIDATES + _ROUND16_R11_LEFTOVERS
):
    if _q not in _REGISTRY:
        raise RuntimeError(f"window/rotation query not registered: {_q}")
for _q in _ROUND15_NEEDS_VERDICT + _ROUND15_STALE_BACKLOG:
    if _q not in _ROUND15_WINDOW:
        raise RuntimeError(
            f"changed/stale query outside the {_WINDOW}-entry window: {_q}"
        )
for _q in _ROUND16_ROTATION_CANDIDATES + _ROUND16_R11_LEFTOVERS:
    if _q in _ROUND15_WINDOW:
        raise RuntimeError(
            f"round-15 overflow query {_q} sits INSIDE the window — it would "
            "displace a round-15 verdict"
        )

# Reorder so the driver's first-50 truncation sees exactly _ROUND15_WINDOW.
_REGISTRY = {name: _REGISTRY[name] for name in _ROUND15_WINDOW} | {
    name: entry
    for name, entry in _REGISTRY.items()
    if name not in set(_ROUND15_WINDOW)
}
