"""Lexical full-text retrieval: BM25 top-k search over the documents
corpus — the keyword-side complement to the embedding ANN faces
(functions/similarity.py): a corpus user runs BOTH lexical and vector
retrieval (and often fuses them), so the engine carries both.

Robertson-Spärck Jones BM25 with the standard k1/b parameters; the
query workload is a deterministic slice of the corpus itself (first
:data:`N_QUERIES` documents' leading tokens), the same
fixture-derived-queries pattern the cosine top-k faces use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_dsnd_projects_spark.functions.pipeline import _ORACLE_TOKS, _toks
from udacity_dsnd_projects_spark.sources.catalog import load_table

#: BM25 shape parameters (the universal defaults).
BM25_K1 = 1.2
BM25_B = 0.75
#: Query workload: the first N docs by id supply the queries — the
#: SAME constant as the cosine faces (imported, not redefined:
#: hybrid_retrieval_fusion is only meaningful when both modes answer
#: the identical query set).
from udacity_dsnd_projects_spark.functions.similarity import (  # noqa: E402
    N_QUERIES,
)
#: ...each query being the doc's first QUERY_TERMS tokens (distinct).
QUERY_TERMS = 5
#: Results per query.
BM25_TOPK = 10


def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k document retrieval for a bounded query set.

    Scale shape — the inverted-index discipline:

    1. the query-term table (queries × ≤QUERY_TERMS rows) is metadata-
       sized and broadcasts everywhere; the corpus is NEVER exploded
       into a full inverted index — the posting build is an inner join
       of the exploded corpus against the broadcast term set, so only
       postings for queried terms materialize (term-pruned scan, the
       same trick the IVF face uses to probe buckets instead of the
       whole file);
    2. document frequencies for those terms are one map-side-combined
       groupBy over the pruned postings; avgdl is a 1-row broadcast;
    3. per-(query, doc) scores accumulate in DECIMAL — each term's
       contribution is rounded once at 8 dp, so the sum is
       order-independent and engine-identical;
    4. top-k per query is ``row_number() <= k`` over the query
       partition, which Catalyst executes as WindowGroupLimit
       (map-side pre-limit; plan-asserted in tests — low-cardinality
       partition keys are safe exactly because of the pushdown).
    """
    from pyspark.sql import Observation

    docs = load_table(spark, "documents", sf_dir)
    d = docs.select("doc_id", _toks().alias("toks")).select(
        "doc_id", "toks", F.size("toks").cast("double").alias("dl")
    )
    # qterms is metadata-sized; postings are term-PRUNED (queried terms
    # only) and therefore tiny relative to the corpus. Checkpoint both:
    # postings feed df_tbl AND the scoring join, and without the
    # materialization Catalyst re-evaluates the whole corpus explode
    # for each consumer (observed as 6 parquet scans in the plan; 2
    # after).
    qterms = (
        d.filter(F.col("doc_id") < N_QUERIES)
        .select(
            F.col("doc_id").alias("query_id"),
            F.explode(F.slice("toks", 1, QUERY_TERMS)).alias("term"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    # Corpus stats (N, avgdl) ride the postings materialization as
    # observe() metrics instead of a SECOND full-corpus tokenize scan
    # (guide §1.2 — n_and_avg used to be its own d.agg pass). Exactness
    # under observe's nondeterministic merge order: count and sum(dl)
    # are integer-valued doubles (dl = size(toks)), whose addition is
    # exact and therefore order-independent; avg(dl) is internally
    # sum/count, so __avgdl below is the bit-identical double.
    obs = Observation()
    # PRUNE BEFORE AGGREGATING: the broadcast semi-join on term sits
    # below the groupBy, so only queried-term occurrences ever reach
    # the tf shuffle — Catalyst won't push an inner join under an
    # aggregate on its own, and joining after the groupBy would
    # materialize tf for EVERY corpus term (the full inverted index
    # this operator exists to avoid).
    postings = (
        d.observe(
            obs,
            F.count(F.lit(1)).cast("double").alias("__n"),
            F.sum("dl").alias("__sumdl"),
        )
        .select("doc_id", "dl", F.explode("toks").alias("term"))
        .join(F.broadcast(qterms.select("term").distinct()), "term")
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
        .localCheckpoint(eager=True)
    )
    stats = obs.get
    n_lit = F.lit(stats["__n"])
    avgdl_lit = F.lit(
        None if not stats["__n"] else stats["__sumdl"] / stats["__n"]
    )
    df_tbl = postings.groupBy("term").agg(
        F.countDistinct("doc_id").cast("double").alias("df")
    )
    idf = F.log((n_lit - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    term_scores = postings.join(F.broadcast(df_tbl), "term").select(
        "term",
        "doc_id",
        F.round(
            idf
            * (F.col("tf") * (BM25_K1 + 1))
            / (
                F.col("tf")
                + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / avgdl_lit)
            ),
            8,
        )
        .cast("decimal(20,8)")
        .alias("ts"),
    )
    scored = (
        qterms.join(term_scores, "term")
        .groupBy("query_id", "doc_id")
        .agg(F.sum("ts").alias("__score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__score").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= BM25_TOPK)
        .select(
            "query_id",
            "doc_id",
            F.col("__score").cast("double").alias("score"),
            F.col("rk").cast("long").alias("rk"),
        )
    )


ORACLE_BM25_SEARCH = f"""
WITH d AS (
  SELECT doc_id, {_ORACLE_TOKS} AS toks,
         CAST(len({_ORACLE_TOKS}) AS DOUBLE) AS dl
  FROM documents
), stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(dl) AS avgdl FROM d
), qterms AS (
  SELECT DISTINCT doc_id AS query_id, unnest(toks[1:{QUERY_TERMS}]) AS term
  FROM d WHERE doc_id < {N_QUERIES}
), postings AS (
  SELECT doc_id, dl, term, CAST(COUNT(*) AS DOUBLE) AS tf FROM (
    SELECT doc_id, dl, unnest(toks) AS term FROM d
  ) t
  WHERE term IN (SELECT term FROM qterms)
  GROUP BY doc_id, dl, term
), df_tbl AS (
  SELECT term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
  FROM postings GROUP BY term
), term_scores AS (
  SELECT p.term, p.doc_id,
         CAST(ROUND(ln((s.n - f.df + 0.5) / (f.df + 0.5) + 1.0)
               * (p.tf * ({BM25_K1} + 1))
               / (p.tf + {BM25_K1}
                  * (1 - {BM25_B} + {BM25_B} * p.dl / s.avgdl)), 8)
              AS DECIMAL(20,8)) AS ts
  FROM postings p JOIN df_tbl f ON p.term = f.term CROSS JOIN stats s
), scored AS (
  SELECT q.query_id, t.doc_id, SUM(t.ts) AS score
  FROM qterms q JOIN term_scores t ON q.term = t.term
  GROUP BY q.query_id, t.doc_id
)
SELECT query_id, doc_id, CAST(score AS DOUBLE) AS score,
       CAST(rk AS BIGINT) AS rk
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY score DESC, doc_id) AS rk
  FROM scored
) t WHERE rk <= {BM25_TOPK}
"""


# --------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion of BM25 and cosine top-k
# --------------------------------------------------------------------------
#: RRF dampening constant (the standard 60 from Cormack et al.).
RRF_K = 60
#: Fused results per query.
RRF_TOPK = 10


def hybrid_retrieval_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of the two retrieval modes the engine
    carries: BM25 lexical ranks (:func:`bm25_search`) and brute-force
    cosine ranks (functions/similarity.py::cosine_topk_bruteforce),
    fused as ``Σ 1/(RRF_K + rank)`` per (query, item) — the standard
    hybrid-search combiner (Cormack et al., SIGIR'09), rank-only so
    the incomparable score scales never need calibration. Queries are
    the same first-8 ids in both modes, and doc_id/vec_id share the
    corpus id space (the fixture's multimodal contract: row i's text
    and embedding describe the same item).

    Scale shape: both inputs end at per-query top-k, so the fusion
    operates on (queries × k)-sized frames — metadata, regardless of
    corpus size; the FULL OUTER join keeps single-mode hits (rank
    contribution 0 from the missing side via coalesce). Each RRF term
    is an exact double of small-integer arithmetic evaluated in a
    FIXED expression order (a two-term projection, not a float
    aggregation), so cross-engine totals are bit-identical. Final
    top-k is WindowGroupLimit again."""
    from udacity_dsnd_projects_spark.functions.similarity import (
        cosine_topk_bruteforce,
    )

    lex = bm25_search(spark, sf_dir).select(
        "query_id",
        F.col("doc_id").alias("item_id"),
        F.col("rk").alias("lex_rk"),
    )
    vec = cosine_topk_bruteforce(spark, sf_dir).select(
        "query_id",
        F.col("vec_id").alias("item_id"),
        F.col("rn").cast("long").alias("vec_rk"),
    )
    fused = lex.join(vec, ["query_id", "item_id"], "full_outer").select(
        "query_id",
        "item_id",
        "lex_rk",
        "vec_rk",
        F.round(
            F.coalesce(1.0 / (F.lit(RRF_K) + F.col("lex_rk")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(RRF_K) + F.col("vec_rk")), F.lit(0.0)),
            8,
        ).alias("rrf"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf").desc(), F.col("item_id")
    )
    return (
        fused.withColumn("fused_rk", F.row_number().over(w))
        .filter(F.col("fused_rk") <= RRF_TOPK)
        .select(
            "query_id",
            "item_id",
            "lex_rk",
            "vec_rk",
            "rrf",
            F.col("fused_rk").cast("long").alias("fused_rk"),
        )
    )


def _oracle_hybrid() -> str:
    from udacity_dsnd_projects_spark.functions.similarity import (
        ORACLE_COSINE_TOPK_BRUTEFORCE,
    )

    return f"""
WITH lex AS ({ORACLE_BM25_SEARCH}),
vec AS ({ORACLE_COSINE_TOPK_BRUTEFORCE}),
fused AS (
  SELECT COALESCE(l.query_id, v.query_id) AS query_id,
         COALESCE(l.doc_id, v.vec_id) AS item_id,
         l.rk AS lex_rk, v.rn AS vec_rk,
         ROUND(COALESCE(1.0 / ({RRF_K} + l.rk), 0.0)
               + COALESCE(1.0 / ({RRF_K} + v.rn), 0.0), 8) AS rrf
  FROM lex l
  FULL OUTER JOIN vec v
    ON l.query_id = v.query_id AND l.doc_id = v.vec_id
)
SELECT query_id, item_id, lex_rk, CAST(vec_rk AS BIGINT) AS vec_rk, rrf,
       CAST(fused_rk AS BIGINT) AS fused_rk
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY rrf DESC, item_id) AS fused_rk
  FROM fused
) t WHERE fused_rk <= {RRF_TOPK}
"""


ORACLE_HYBRID_RETRIEVAL_FUSION = _oracle_hybrid()
