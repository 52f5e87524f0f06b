"""Training-corpus preparation: sliding context-window chunking and
deterministic curriculum scheduling.

These extend the LLM-pipeline block (SURVEY §2 extensions) past
packing/sharding/mixture into the two remaining pre-training data
moves: cutting long documents into overlapping context windows
(the standard fixed-length-with-overlap chunker every pretraining
tokenization job runs) and emitting a reproducible curriculum order
(short-to-long schedule with a deterministic within-phase shuffle —
no ``rand()``, so a re-run or a resumed job sees the identical
order).

Reference parity: the reference has no training-prep surface; these
follow the same Spark-first rules as functions/pipeline.py — window
hashes are computed BEFORE any exchange, the chunker is a row-local
explode (zero shuffles), and the curriculum's global order comes from
the distributed exact-rank primitive (operators/ranks.py), never a
partition-less ``row_number() over ()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_dsnd_projects_spark.functions.pipeline import _ORACLE_TOKS, _toks
from udacity_dsnd_projects_spark.operators.ranks import (
    exact_group_rank,
    ntile_from_rank,
)
from udacity_dsnd_projects_spark.sources.catalog import load_table

#: Context-window size in tokens and the stride between window starts
#: (stride < window → ``WINDOW_TOKS - WINDOW_STRIDE`` tokens of
#: overlap carried into the next window, the usual boundary-context
#: trick). Small against real tokenizer contexts on purpose: the
#: corpus averages ~60 tokens/doc and every SF must exercise the
#: multi-window path.
WINDOW_TOKS = 48
WINDOW_STRIDE = 32

#: Curriculum phases (quartiles of the short-to-long order).
CURRICULUM_PHASES = 4


def sliding_window_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cut each document into fixed-size token windows advancing by
    :data:`WINDOW_STRIDE` — the last window may be short, and a
    document at or under :data:`WINDOW_TOKS` tokens yields exactly
    one window. Emits ``(doc_id, win_id, start_tok, win_len,
    win_hash)``; the hash stands in for the materialized window so
    downstream exchanges (dedup, contamination checks) move 32-byte
    keys instead of text.

    Scale shape: a SINGLE documents scan exploding one struct array
    that carries all four derived fields — NO shuffle anywhere
    (plan-asserted); the window count is exact integer ceil-division
    via double floor (operands are tiny integers, the IEEE quotient
    cannot round across an integer boundary, and DuckDB evaluates
    the identical expression); hashing happens inside the same
    codegen stage as the explode. At 100 TB this is embarrassingly
    parallel and bounded by scan throughput."""
    return window_chunks(load_table(spark, "documents", sf_dir))


def window_chunks(docs: DataFrame) -> DataFrame:
    """The chunking transform itself, over any frame with
    ``(doc_id, text)`` — shared verbatim by the batch query face above
    and the streaming face (stateless, so it runs unchanged under a
    ``readStream`` in append mode; tests/test_streaming.py asserts
    stream == batch)."""
    w, s = WINDOW_TOKS, WINDOW_STRIDE
    d = docs.select("doc_id", _toks().alias("t")).filter(F.size("t") >= 1)
    n = F.size("t")
    n_win = F.when(n <= w, F.lit(1)).otherwise(
        F.floor((n - w + (s - 1)) / s).cast("long") + 1
    )
    wins = F.transform(
        F.sequence(F.lit(0), n_win - 1),
        lambda i: F.struct(
            i.cast("long").alias("win_id"),
            (i * s).cast("long").alias("start_tok"),
            F.least(F.lit(w), n - i * s).cast("long").alias("win_len"),
            F.md5(F.concat_ws(" ", F.slice("t", i * s + 1, w))).alias(
                "win_hash"
            ),
        ),
    )
    return d.select(
        "doc_id", F.explode(wins).alias("__w")
    ).select("doc_id", "__w.win_id", "__w.start_tok", "__w.win_len", "__w.win_hash")


ORACLE_SLIDING_WINDOW_CHUNKS = rf"""
WITH t AS (
  SELECT doc_id, {_ORACLE_TOKS} AS toks FROM documents
  WHERE len({_ORACLE_TOKS}) >= 1
), n AS (
  SELECT doc_id, toks, len(toks) AS nt,
         CASE WHEN len(toks) <= {WINDOW_TOKS} THEN 1
              ELSE CAST(floor((len(toks) - {WINDOW_TOKS}
                               + {WINDOW_STRIDE - 1}) / {WINDOW_STRIDE})
                        AS BIGINT) + 1
         END AS n_win
  FROM t
)
SELECT doc_id,
       i AS win_id,
       i * {WINDOW_STRIDE} AS start_tok,
       least({WINDOW_TOKS}, nt - i * {WINDOW_STRIDE}) AS win_len,
       md5(array_to_string(list_slice(toks, i * {WINDOW_STRIDE} + 1,
                                      i * {WINDOW_STRIDE} + {WINDOW_TOKS}),
                           ' ')) AS win_hash
FROM n, UNNEST(range(0, n_win)) AS u(i)
"""


def curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic curriculum schedule: documents ordered
    short-to-long into :data:`CURRICULUM_PHASES` equal phases
    (NTILE semantics, reconstructed from exact ranks), then
    deterministically shuffled WITHIN each phase by md5(doc_id) — the
    schedule a curriculum-learning pretraining run replays
    identically on every attempt.

    Scale shape: both orderings ride the distributed exact-rank
    primitive (range-bucketed parallel windows + broadcast bucket
    offsets — operators/ranks.py), so no step funnels the corpus
    through one task; the md5 shuffle key is computed before the
    rank's exchange. Output is one row per document:
    ``(doc_id, phase, position)`` with ``position`` 1-based inside
    the phase."""
    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", "n_chars", F.md5(F.col("doc_id").cast("string")).alias("__k")
    )
    ranked = exact_group_rank(
        docs,
        [],
        "n_chars",
        ["doc_id"],
        rank_col="__rk",
        count_col="__cnt",
    )
    # the rank primitive range-buckets on a NUMERIC column; equal-length
    # lowercase-hex strings sort exactly like their numeric value, so a
    # 60-bit prefix is the bucket key and the full digest breaks its
    # (vanishingly rare) prefix collisions — order identical to
    # ORDER BY __k, doc_id
    phased = ranked.select(
        "doc_id",
        "__k",
        F.conv(F.substring("__k", 1, 15), 16, 10).cast("long").alias("__kn"),
        ntile_from_rank(F.col("__rk"), F.col("__cnt"), CURRICULUM_PHASES)
        .cast("int")
        .alias("phase"),
        # the position pass scans its input 3x (sketch, counts, final
        # window) — materialize so the length-rank window above runs
        # once, not 3x; one slim row per document at any scale
    ).localCheckpoint(eager=True)
    return exact_group_rank(
        phased,
        ["phase"],
        "__kn",
        ["__k", "doc_id"],
        rank_col="position",
        # __kn is a 60-bit md5 prefix — uniform on [0, 16^15): buckets
        # from arithmetic, no quantile sketch pass (ranks.py)
        uniform_domain=(0.0, float(16**15)),
    ).select("doc_id", "phase", F.col("position").cast("long").alias("position"))


ORACLE_CURRICULUM_ORDER = f"""
WITH phased AS (
  SELECT doc_id,
         md5(CAST(doc_id AS VARCHAR)) AS k,
         CAST(NTILE({CURRICULUM_PHASES})
              OVER (ORDER BY n_chars, doc_id) AS INTEGER) AS phase
  FROM documents
)
SELECT doc_id, phase,
       row_number() OVER (PARTITION BY phase ORDER BY k, doc_id) AS position
FROM phased
"""
