"""Training-data SELECTION operators: importance weighting toward a
target distribution (the DSIR shape — Xie et al., "Data Selection for
Language Models via Importance Resampling", arXiv:2302.03169) and
deterministic weighted sampling without replacement (the A-ES /
Efraimidis-Spirakis exponential-keys scheme, re-keyed on salted-md5
uniforms so reruns are bit-identical).

Both are pure JVM plans: hashed n-gram featurization is md5 integer
arithmetic, log-ratio tables are bucket-count-sized broadcasts, and
the per-document score accumulates in DECIMAL so cross-engine float
summation order can't perturb the result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_dsnd_projects_spark.functions.pipeline import (
    _ORACLE_TOKS,
    _oracle_ngrams,
    _toks,
    _word_ngrams,
)
from udacity_dsnd_projects_spark.sources.catalog import load_table

#: Hashed-feature dimensionality (DSIR uses 10k buckets at corpus
#: scale; 512 keeps every bucket populated at test SF — one constant).
DSIR_BUCKETS = 512

#: The importance target: documents whose lang matches this value play
#: the high-quality target distribution, the full corpus is the raw
#: distribution (DSIR §2: target = formal text, raw = web crawl).
DSIR_TARGET_LANG = "en"

#: Weighted-reservoir defaults: strata and per-stratum sample size.
RESERVOIR_K = 40
#: Salt for the reservoir's uniform variates — independent of the
#: mixture sampler's MIX_SALT and shard_assign's unsalted md5.
RESERVOIR_SALT = "res:"

_U60 = float(1 << 60)


def _bucket(gram: F.Column) -> F.Column:
    """Hashed feature id on [0, DSIR_BUCKETS): first 60 bits of md5,
    mod B — exact integer arithmetic, identical in any engine."""
    return (
        F.conv(F.substring(F.md5(gram), 1, 15), 16, 10).cast("long")
        % DSIR_BUCKETS
    )


def _doc_buckets(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, bucket) — one row per word-bigram occurrence.
    Docs under two tokens contribute no features (the same >= n guard
    the repetition/contamination n-gram family uses)."""
    toks = docs.select("doc_id", "lang", _toks().alias("toks")).filter(
        F.size("toks") >= 2
    )
    return toks.select(
        "doc_id",
        "lang",
        F.explode(_word_ngrams(F.col("toks"), 2)).alias("g"),
    ).select("doc_id", "lang", _bucket(F.col("g")).alias("bucket"))


def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance score per document: hashed-bigram bag-of-words
    log-likelihood ratio between the target distribution (lang =
    :data:`DSIR_TARGET_LANG`) and the raw corpus, with add-one
    smoothing over the :data:`DSIR_BUCKETS` feature buckets. Positive
    scores mark documents that look like the target; downstream,
    sampling proportional to ``exp(score)`` is the "importance
    resampling" step (the sampler itself is :func:`mixture_sample`'s
    hash-threshold machinery — this operator produces its weights).

    Scale shape: two feature-count rollups keyed on bucket (at most B
    groups — map-side combined to metadata size), folded into ONE
    B-row log-ratio table that broadcasts onto a single scoring scan
    of the corpus; the per-doc sum is keyed on doc_id (fully
    parallel) and accumulates in DECIMAL(20,6) — the per-bucket
    log-ratios are rounded once, so the total is order-independent
    and engine-identical. No UDFs, no driver-side data beyond the
    B-row table."""
    docs = load_table(spark, "documents", sf_dir)
    # One bigram explode for the whole operator: reduce the raw gram
    # stream to per-(doc, bucket) COUNTS first (one map-side-combined
    # shuffle; frame size = docs × distinct-buckets-per-doc, far
    # smaller than the gram stream) and checkpoint — the count table
    # then feeds BOTH distributions and the scoring join, instead of
    # re-running the explode three times (the perplexity_score
    # doc_grams pattern).
    feats = (
        _doc_buckets(docs)
        .groupBy("doc_id", "lang", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    both = feats.groupBy("bucket").agg(
        F.sum(
            F.when(F.col("lang") == DSIR_TARGET_LANG, F.col("n")).otherwise(0)
        ).alias("tc"),
        F.sum("n").alias("rc"),
    )
    # one explicit partition: the default splits 512 metadata rows
    # defaultParallelism ways — ~32 near-empty tasks per action over
    # the ratio subtree (the localframe.py lesson; DSIR_BUCKETS is a
    # constant, so this is scale-independent)
    spine = spark.range(0, DSIR_BUCKETS, 1, 1).select(
        F.col("id").alias("bucket")
    )
    counts = spine.join(both, "bucket", "left").select(
        "bucket",
        F.coalesce("tc", F.lit(0)).alias("tc"),
        F.coalesce("rc", F.lit(0)).alias("rc"),
    )
    totals = counts.agg(
        F.sum("tc").alias("__tt"), F.sum("rc").alias("__tr")
    )
    ratio = counts.crossJoin(F.broadcast(totals)).select(
        "bucket",
        F.round(
            F.log(F.col("tc") + 1)
            - F.log(F.col("rc") + 1)
            + F.log(F.col("__tr") + F.lit(DSIR_BUCKETS))
            - F.log(F.col("__tt") + F.lit(DSIR_BUCKETS)),
            6,
        )
        .cast("decimal(20,6)")
        .alias("lr"),
    )
    scored = (
        feats.join(F.broadcast(ratio), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("n").alias("n_feats"),
            F.sum(F.col("n") * F.col("lr")).alias("__s"),
        )
    )
    return docs.join(scored, "doc_id", "left").select(
        "doc_id",
        "lang",
        F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
        F.coalesce(F.col("__s").cast("double"), F.lit(0.0)).alias("score"),
    )


ORACLE_DSIR_IMPORTANCE_WEIGHTS = f"""
WITH toks AS (
  SELECT doc_id, lang, {_ORACLE_TOKS} AS toks FROM documents
  WHERE len({_ORACLE_TOKS}) >= 2
), grams AS (
  SELECT doc_id, lang, unnest({_oracle_ngrams(2)}) AS g FROM toks
), feats AS (
  SELECT doc_id, lang,
         CAST(concat('0x', substr(md5(g), 1, 15)) AS BIGINT)
           % {DSIR_BUCKETS} AS bucket
  FROM grams
), spine AS (
  SELECT range AS bucket FROM range({DSIR_BUCKETS})
), counts AS (
  SELECT spine.bucket,
         COALESCE(tc.c, 0) AS tc, COALESCE(rc.c, 0) AS rc
  FROM spine
  LEFT JOIN (SELECT bucket, COUNT(*) AS c FROM feats
             WHERE lang = '{DSIR_TARGET_LANG}' GROUP BY bucket) tc
    ON spine.bucket = tc.bucket
  LEFT JOIN (SELECT bucket, COUNT(*) AS c FROM feats GROUP BY bucket) rc
    ON spine.bucket = rc.bucket
), ratio AS (
  SELECT bucket,
         CAST(ROUND(ln(tc + 1) - ln(rc + 1)
                    + ln((SELECT SUM(rc) FROM counts) + {DSIR_BUCKETS})
                    - ln((SELECT SUM(tc) FROM counts) + {DSIR_BUCKETS}),
                    6) AS DECIMAL(20,6)) AS lr
  FROM counts
), scored AS (
  SELECT f.doc_id, COUNT(*) AS n_feats, SUM(r.lr) AS s
  FROM feats f JOIN ratio r ON f.bucket = r.bucket
  GROUP BY f.doc_id
)
SELECT d.doc_id, d.lang,
       CAST(COALESCE(s.n_feats, 0) AS BIGINT) AS n_feats,
       COALESCE(CAST(s.s AS DOUBLE), 0.0) AS score
FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
"""


def weighted_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement, k per
    stratum: the Efraimidis-Spirakis A-ES scheme — each document draws
    a uniform ``u`` and the k largest ``u^(1/w)`` win, which samples
    exactly proportional-to-weight without replacement. Two
    substitutions make it engine-exact and rerun-stable: ``u`` is the
    salted-md5 60-bit variate (no RNG state), and the key compares as
    ``ln(u)/w`` (monotone in ``u^(1/w)``; avoids cross-engine ``pow``
    while ln + one divide on well-separated uniforms can't reorder).
    Weight = ``n_chars``: longer documents proportionally likelier —
    the "sample by token mass" recipe.

    Scale shape: key computation is pure JVM hash/log arithmetic in
    the scan; per-stratum top-k is ``rank() <= k`` over the lang
    partition, which Catalyst executes as WindowGroupLimit (per-
    partition local top-k BEFORE the shuffle — plan-asserted in
    tests/test_round5c_ops.py, same contract as stratified_sample)."""
    docs = load_table(spark, "documents", sf_dir)
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit(RESERVOIR_SALT), F.col("doc_id").cast("string"))
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        + 1
    ).cast("double") / F.lit(_U60)
    keyed = docs.select(
        "doc_id",
        "lang",
        F.col("n_chars").alias("weight"),
        (F.log(u) / F.col("n_chars")).alias("__key"),
    )
    w = Window.partitionBy("lang").orderBy(
        F.col("__key").desc(), F.col("doc_id")
    )
    return (
        keyed.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= RESERVOIR_K)
        .select("lang", "doc_id", "weight", F.col("rk").cast("long").alias("rk"))
    )


ORACLE_WEIGHTED_RESERVOIR_SAMPLE = f"""
WITH keyed AS (
  SELECT doc_id, lang, n_chars AS weight,
         ln((CAST(concat('0x', substr(md5('{RESERVOIR_SALT}'
                || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) + 1)
            / {_U60:.1f}) / n_chars AS k
  FROM documents
)
SELECT lang, doc_id, weight, CAST(rk AS BIGINT) AS rk FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY k DESC, doc_id)
         AS rk
  FROM keyed
) t WHERE rk <= {RESERVOIR_K}
"""
