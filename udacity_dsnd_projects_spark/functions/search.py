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
#: Query workload: the first N docs by id supply the queries...
N_QUERIES = 8
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
    docs = load_table(spark, "documents", sf_dir)
    d = docs.select("doc_id", _toks().alias("toks")).select(
        "doc_id", "toks", F.size("toks").cast("double").alias("dl")
    )
    n_and_avg = d.agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.avg("dl").alias("__avgdl"),
    )
    qterms = (
        d.filter(F.col("doc_id") < N_QUERIES)
        .select(
            F.col("doc_id").alias("query_id"),
            F.explode(F.slice("toks", 1, QUERY_TERMS)).alias("term"),
        )
        .distinct()
    )
    postings = (
        d.select("doc_id", "dl", F.explode("toks").alias("term"))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
        .join(F.broadcast(qterms.select("term").distinct()), "term")
    )
    df_tbl = postings.groupBy("term").agg(
        F.countDistinct("doc_id").cast("double").alias("df")
    )
    idf = F.log(
        (F.col("__n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    term_scores = (
        postings.join(F.broadcast(df_tbl), "term")
        .crossJoin(F.broadcast(n_and_avg))
        .select(
            "term",
            "doc_id",
            F.round(
                idf
                * (F.col("tf") * (BM25_K1 + 1))
                / (
                    F.col("tf")
                    + BM25_K1
                    * (1 - BM25_B + BM25_B * F.col("dl") / F.col("__avgdl"))
                ),
                8,
            )
            .cast("decimal(20,8)")
            .alias("ts"),
        )
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
