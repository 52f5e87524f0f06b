"""Corpus-level structure operators (round-2 additions): passage-level
dedup, source-overlap matrix, unigram entropy, and label centroids.

These fill the remaining gaps of a web-scale training-data pipeline
(reference has no analog — these extend the engine the way RefinedWeb/
Gopher-style curation stacks extend a crawler):

- ``passage_dedup`` — exact dedup at sub-document granularity. C4/
  RefinedWeb drop *passages* repeated across the corpus (boilerplate,
  navigation chrome, license headers) even when whole documents are
  unique. Documents here are single-line word streams, so the passage
  unit is a fixed ``CHUNK_W``-word window rather than a newline split;
  the operator shape (chunk → hash → corpus-wide count → per-doc
  rollup) is identical either way.
- ``passage_source_matrix`` — which sources share boilerplate: the
  source×source matrix of shared duplicated chunks. The standard
  "which crawls/dumps overlap" diagnostic before mixing sources.
- ``word_entropy`` — per-doc unigram Shannon entropy, the classic
  gibberish/boilerplate quality signal complementing
  ``pipeline.repetition_score`` (low entropy = repetitive or
  template text).
- ``embedding_centroids`` — per-label mean vector in long form, the
  reduction underlying cluster profiling, nearest-class-mean
  classification, and drift monitoring.

Scale shapes (100 TB standard):

- ``passage_dedup``: chunks are hashed to 32-byte md5 before any
  exchange, so the shuffle carries (doc_id, hash), never text. Two
  exchanges: one on chunk-hash for the corpus-wide count, one on
  doc_id for the rollup.
- ``passage_source_matrix``: groupBy-bucket pair generation (the
  dedup.py pattern) — the per-hash bucket is a *source set*, bounded
  by the number of sources, not by corpus size, so the in-row pair
  expansion is O(sources²) worst-case regardless of data volume. No
  self-join → the chunking subtree is evaluated once (self-joins
  re-evaluate both sides; see memory of Catalyst self-join recompute).
- ``word_entropy``: two exchanges with map-side combine, carrying
  (doc_id, word, count) then (doc_id, partial-sums). The entropy
  rewrite  H = ln n − (Σ c·ln c)/n  turns the per-word probability
  form into plain SUMs, so the whole thing is an ordinary two-level
  aggregation — no window, no collect_list of word histograms.
- ``embedding_centroids``: one exchange of K×dim partial sums
  (groupBy label with ``EMB_DIM`` avg aggregates over array slots —
  map-side combine reduces every partition to ≤K rows before the
  shuffle). The corpus is never exploded; the long-form output comes
  from posexploding the K aggregated rows only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_dsnd_projects_spark.functions.pipeline import _ORACLE_TOKS, _toks
from udacity_dsnd_projects_spark.sources.catalog import load_table

#: Passage window: 16 words ≈ a sentence — long enough that an exact
#: cross-doc repeat means shared boilerplate, short enough to catch
#: partial-document duplication. (RefinedWeb operates on lines; the
#: synthetic corpus has no newlines, so a fixed word window stands in.)
CHUNK_W = 16

#: Embedding dimensionality of the corpus (embeddings.parquet is
#: fixed-width float[64]; validated by tests).
EMB_DIM = 64


def _chunks(toks: Column, w: int = CHUNK_W) -> Column:
    """Array of md5 hashes of consecutive ``w``-word windows (the last
    window may be shorter). Hashing happens before any shuffle so
    downstream exchanges carry 32-byte keys, not text."""
    return F.transform(
        F.sequence(F.lit(0), F.floor((F.size(toks) - 1) / w)),
        lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i * w + 1, w))),
    )


def _oracle_chunks(w: int = CHUNK_W, toks: str = "toks") -> str:
    return (
        f"list_transform(range(0, CAST(ceil(len({toks}) / {w}.0) AS BIGINT)), "
        f"i -> md5(array_to_string(list_slice({toks}, i*{w}+1, (i+1)*{w}), ' ')))"
    )


def _chunk_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, h) — one row per passage chunk, md5-hashed."""
    docs = load_table(spark, "documents", sf_dir)
    d = docs.select("doc_id", "source", _toks().alias("t")).filter(F.size("t") >= 1)
    # explode_outer, not explode: avoids the InferFiltersFromGenerate
    # double-evaluation of the chunking expression (size>=1 above
    # guarantees at least one chunk, so outer semantics are identical).
    return d.select(
        "doc_id", "source", F.explode_outer(_chunks(F.col("t"))).alias("h")
    )


# --------------------------------------------------------------------------
# Passage-level exact dedup
# --------------------------------------------------------------------------
def passage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document passage-duplication report: of the doc's
    ``CHUNK_W``-word chunks, how many also occur elsewhere in the
    corpus (counting a chunk duplicated *within* one doc too — any
    hash with corpus-wide multiplicity > 1). High ``dup_ratio`` docs
    are boilerplate candidates for removal or passage-stripping."""
    chunks = _chunk_table(spark, sf_dir)
    cnt = F.count(F.lit(1)).over(Window.partitionBy("h"))
    flagged = chunks.select("doc_id", (cnt > 1).cast("int").alias("is_dup"))
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("is_dup").alias("n_dup_chunks"),
        )
        .select(
            "doc_id",
            "n_chunks",
            "n_dup_chunks",
            F.round(F.col("n_dup_chunks") / F.col("n_chunks"), 5).alias("dup_ratio"),
        )
    )


ORACLE_PASSAGE_DEDUP = rf"""
WITH d AS (
  SELECT doc_id, {_ORACLE_TOKS} AS toks FROM documents
  WHERE len({_ORACLE_TOKS}) >= 1
), c AS (
  SELECT doc_id, unnest({_oracle_chunks()}) AS h FROM d
), w AS (
  SELECT doc_id, count(*) OVER (PARTITION BY h) AS cnt FROM c
)
SELECT doc_id,
       count(*) AS n_chunks,
       CAST(count(*) FILTER (WHERE cnt > 1) AS BIGINT) AS n_dup_chunks,
       ROUND(count(*) FILTER (WHERE cnt > 1) * 1.0 / count(*), 5) AS dup_ratio
FROM w GROUP BY doc_id
"""


# --------------------------------------------------------------------------
# Boilerplate stripping (round-9 addition)
# --------------------------------------------------------------------------
#: A passage chunk is BOILERPLATE when it appears in at least this many
#: DISTINCT documents of the SAME source — navigation chrome, license
#: headers and templates repeat per-site, which is why C4/CCNet count
#: document frequency within a source rather than global multiplicity.
BOILER_MIN_DOCS = 2


def boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet/C4-style boilerplate REMOVAL — the action
    :func:`passage_dedup` only diagnoses: chunks whose within-source
    document frequency reaches :data:`BOILER_MIN_DOCS` are stripped
    from each document, and the cleaned document is reconstructed —
    (doc_id, n_chunks, n_boiler_chunks, boiler_ratio, clean_n_toks,
    clean_md5). Distinct from ``passage_dedup`` on both axes: the
    signal is per-(source, chunk) DISTINCT-doc frequency (a chunk
    repeated 10× inside ONE doc is repetition, not boilerplate), and
    the output is the retained text (as token count + md5 of the
    reconstruction, so the oracle can verify the rebuild exactly).

    Scale shape: chunks are md5-hashed row-locally BEFORE any
    exchange, so the two hash-keyed shuffles (the doc-frequency count
    and the flag join-back, co-partitioned on (source, h)) carry
    32-byte keys + integer positions, never text. The per-doc rollup
    reduces to (doc_id, counts, kept-position array) — positions are
    ints, boilerplate is re-derived per partition from the join, and
    the boilerplate set itself is NEVER collected or broadcast (it
    grows with the corpus). Reconstruction is one doc_id-keyed join
    of the slim position arrays back onto the token arrays, sliced
    row-locally; ``sort_array`` fixes ``collect_list``'s
    nondeterministic order so the rebuild is bit-stable."""
    return boilerplate_strip_for(load_table(spark, "documents", sf_dir))


def _doc_chunks(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """The shared tokenize-and-chunk preamble of every boilerplate
    face: (d, pos_chunks) where ``d`` keeps the token arrays for
    reconstruction and ``pos_chunks`` is one slim (doc_id, source,
    pos, h) row per chunk. One definition so the batch, index, and
    incremental faces can never fork the chunking semantics."""
    d = docs.select("doc_id", "source", _toks().alias("t")).filter(
        F.size("t") >= 1
    )
    pos_chunks = d.select(
        "doc_id",
        "source",
        F.posexplode_outer(_chunks(F.col("t"))).alias("pos", "h"),
    )
    return d, pos_chunks


def boilerplate_strip_for(docs: DataFrame) -> DataFrame:
    """Core of :func:`boilerplate_strip` over any (doc_id, source,
    text) frame — split out so tests can drive synthetic corpora
    through the exact production path. Derives the boilerplate index
    from the corpus itself, then strips against it.

    ``pos_chunks`` is localCheckpoint'ed before use: the boiler
    aggregate is joined back onto the same frame, and the
    lambda-bearing chunk expression defeats ReuseExchange, so the
    un-materialized plan re-tokenizes and re-hashes the corpus once
    per consumer (~3 scans). The checkpointed rows are slim (ids,
    int position, 32-byte hash) — far cheaper to persist than the
    text is to re-chunk — leaving exactly one scan of ``docs`` (the
    reconstruction join in :func:`_strip_against`);
    ``tests/test_plan_properties.py`` pins that count."""
    d, pos_chunks = _doc_chunks(docs)
    pos_chunks = pos_chunks.localCheckpoint(eager=True)
    boiler = (
        pos_chunks.groupBy("source", "h")
        .agg(F.countDistinct("doc_id").alias("__df"))
        .filter(F.col("__df") >= BOILER_MIN_DOCS)
        .select("source", "h")
    )
    return _strip_against(d, pos_chunks, boiler)


def boilerplate_index_for(docs: DataFrame) -> DataFrame:
    """The publishable (source, h) boilerplate index of a corpus — what
    :func:`strip_against_index` (and its streaming composition)
    filters new documents against. At scale this is the table a
    curation run materializes (bucketed on (source, h)) so crawl
    batches prune against it without re-deriving chunk frequencies."""
    _, pos_chunks = _doc_chunks(docs)
    return (
        pos_chunks.groupBy("source", "h")
        .agg(F.countDistinct("doc_id").alias("__df"))
        .filter(F.col("__df") >= BOILER_MIN_DOCS)
        .select("source", "h")
    )


def strip_against_index(docs: DataFrame, boiler_index: DataFrame) -> DataFrame:
    """Strip NEW documents against a PUBLISHED (source, h) boilerplate
    index — the incremental face of :func:`boilerplate_strip` (same
    split as exact dedup's ``incremental_dedup``: the corpus-derived
    index is static; each crawl batch probes it). Composes with
    Structured Streaming via ``foreachBatch`` — each arriving document
    is whole within its micro-batch, so the per-doc rollup here is
    exact per batch with no streaming-aggregation state:

        stream.writeStream.foreachBatch(
            lambda b, _: sink(strip_against_index(b, index))).start()

    The index is ``distinct``-ed before the flag join: a PUBLISHED
    table can legitimately carry duplicate (source, h) rows (appended
    curation runs, a union of index versions), and a plain left join
    against duplicates would multiply matching chunk rows — silently
    inflating n_chunks / n_boiler_chunks / boiler_ratio while
    clean_md5 stayed right. (:func:`boilerplate_strip_for` skips the
    dedup: its index is a groupBy output, distinct by construction.)

    No checkpoint here: with the index supplied there is no
    self-join back onto ``pos_chunks``-derived aggregates, and each
    micro-batch is small — the two scans of a batch cost less than
    an eager materialization per trigger.

    Output columns are identical to :func:`boilerplate_strip`."""
    d, pos_chunks = _doc_chunks(docs)
    return _strip_against(
        d, pos_chunks, boiler_index.select("source", "h").distinct()
    )


def _strip_against(
    d: DataFrame, pos_chunks: DataFrame, boiler: DataFrame
) -> DataFrame:
    """Shared strip-and-rebuild: flag ``pos_chunks`` rows against the
    (source, h) ``boiler`` set, roll up kept positions per doc, and
    reconstruct the cleaned text row-locally from the token arrays in
    ``d``. Only hashes/ids/positions cross the exchanges."""
    kept = (
        pos_chunks.join(boiler.withColumn("__b", F.lit(1)), ["source", "h"], "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.coalesce("__b", F.lit(0))).alias("n_boiler_chunks"),
            F.sort_array(
                F.collect_list(F.when(F.col("__b").isNull(), F.col("pos")))
            ).alias("__keep"),
        )
    )
    clean = F.flatten(
        F.transform(
            F.col("__keep"), lambda p: F.slice(F.col("t"), p * CHUNK_W + 1, CHUNK_W)
        )
    )
    return d.join(kept, "doc_id").select(
        "doc_id",
        "n_chunks",
        "n_boiler_chunks",
        F.round(F.col("n_boiler_chunks") / F.col("n_chunks"), 5).alias(
            "boiler_ratio"
        ),
        F.size(clean).alias("clean_n_toks"),
        F.md5(F.concat_ws(" ", clean)).alias("clean_md5"),
    )


ORACLE_BOILERPLATE_STRIP = rf"""
WITH d AS (
  SELECT doc_id, source, {_ORACLE_TOKS} AS toks FROM documents
  WHERE len({_ORACLE_TOKS}) >= 1
), c AS (
  SELECT doc_id, source, pos,
         md5(array_to_string(list_slice(toks, pos*{CHUNK_W}+1,
                                        (pos+1)*{CHUNK_W}), ' ')) AS h
  FROM d, UNNEST(range(0, CAST(ceil(len(toks) / {CHUNK_W}.0) AS BIGINT)))
       AS u(pos)
), boiler AS (
  SELECT source, h FROM c GROUP BY source, h
  HAVING COUNT(DISTINCT doc_id) >= {BOILER_MIN_DOCS}
), kept AS (
  SELECT c.doc_id,
         COUNT(*) AS n_chunks,
         CAST(COUNT(*) FILTER (WHERE b.h IS NOT NULL) AS BIGINT)
           AS n_boiler_chunks,
         list_sort(list(c.pos) FILTER (WHERE b.h IS NULL)) AS keep_pos
  FROM c LEFT JOIN boiler b ON c.source = b.source AND c.h = b.h
  GROUP BY c.doc_id
)
SELECT d.doc_id, n_chunks, n_boiler_chunks,
       ROUND(n_boiler_chunks * 1.0 / n_chunks, 5) AS boiler_ratio,
       len(flatten(list_transform(keep_pos,
           p -> list_slice(toks, p*{CHUNK_W}+1, (p+1)*{CHUNK_W}))))
         AS clean_n_toks,
       md5(array_to_string(flatten(list_transform(keep_pos,
           p -> list_slice(toks, p*{CHUNK_W}+1, (p+1)*{CHUNK_W}))), ' '))
         AS clean_md5
FROM d JOIN kept ON d.doc_id = kept.doc_id
"""


# --------------------------------------------------------------------------
# Source-overlap matrix
# --------------------------------------------------------------------------
def passage_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-pair boilerplate overlap: for every unordered pair of
    sources, the number of distinct passage chunks both contain.
    GroupBy-bucket pair generation: each chunk hash aggregates its
    distinct source set (bounded by #sources, not corpus size), pairs
    expand inside the row, then one count rollup — no self-join, so
    the chunking subtree runs once."""
    chunks = _chunk_table(spark, sf_dir)
    buckets = (
        chunks.groupBy("h")
        .agg(F.array_sort(F.collect_set("source")).alias("ss"))
        .filter(F.size("ss") > 1)
    )
    pairs = buckets.select(
        F.explode_outer(
            F.flatten(
                F.transform(
                    F.col("ss"),
                    lambda x, i: F.transform(
                        F.slice(F.col("ss"), i + 2, F.size(F.col("ss"))),
                        lambda y: F.struct(
                            x.alias("src_a"), y.alias("src_b")
                        ),
                    ),
                )
            )
        ).alias("p")
    )
    return (
        pairs.groupBy(F.col("p.src_a").alias("src_a"), F.col("p.src_b").alias("src_b"))
        .agg(F.count(F.lit(1)).alias("n_shared_chunks"))
    )


ORACLE_PASSAGE_SOURCE_MATRIX = rf"""
WITH d AS (
  SELECT doc_id, source, {_ORACLE_TOKS} AS toks FROM documents
  WHERE len({_ORACLE_TOKS}) >= 1
), c AS (
  SELECT DISTINCT source, unnest({_oracle_chunks()}) AS h FROM d
)
SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_shared_chunks
FROM c a JOIN c b ON a.h = b.h AND a.source < b.source
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# Unigram entropy
# --------------------------------------------------------------------------
def word_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram Shannon entropy (nats), with token and
    vocabulary counts. Uses the sum rewrite H = ln n − (Σ c·ln c)/n so
    both aggregation levels are plain SUM/COUNT with map-side combine
    (no per-doc histogram materialization)."""
    docs = load_table(spark, "documents", sf_dir)
    d = docs.select("doc_id", _toks().alias("t")).filter(F.size("t") >= 1)
    words = d.select("doc_id", F.explode_outer("t").alias("w"))
    counts = words.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("c"))
    return (
        counts.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tok"),
            F.count(F.lit(1)).alias("n_unique"),
            F.sum(F.col("c") * F.log("c")).alias("clogc"),
        )
        .select(
            "doc_id",
            "n_tok",
            "n_unique",
            F.round(
                F.log("n_tok") - F.col("clogc") / F.col("n_tok"), 5
            ).alias("entropy"),
        )
    )


ORACLE_WORD_ENTROPY = rf"""
WITH d AS (
  SELECT doc_id, {_ORACLE_TOKS} AS toks FROM documents
  WHERE len({_ORACLE_TOKS}) >= 1
), w AS (
  SELECT doc_id, unnest(toks) AS w FROM d
), counts AS (
  SELECT doc_id, w, count(*) AS c FROM w GROUP BY doc_id, w
)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_tok,
       count(*) AS n_unique,
       ROUND(ln(SUM(c)) - SUM(c * ln(c)) / SUM(c), 5) AS entropy
FROM counts GROUP BY doc_id
"""


# --------------------------------------------------------------------------
# Label centroids
# --------------------------------------------------------------------------
def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean embedding in long form (label, dim, c). The
    aggregation runs as ``EMB_DIM`` avg aggregates over array slots —
    map-side combine reduces each partition to ≤K label rows before
    the single exchange; the corpus rows are never exploded. Long form
    (rather than an array column) keeps the result oracle-hashable."""
    emb = load_table(spark, "embeddings", sf_dir)
    cent = emb.groupBy("label").agg(
        *[
            F.round(F.avg(F.col("embedding")[i].cast("double")), 5).alias(f"c{i}")
            for i in range(EMB_DIM)
        ]
    )
    return cent.select(
        "label",
        F.posexplode(F.array(*[F.col(f"c{i}") for i in range(EMB_DIM)])).alias(
            "dim", "c"
        ),
    ).select("label", F.col("dim").cast("long").alias("dim"), "c")


ORACLE_EMBEDDING_CENTROIDS = f"""
SELECT label, i AS dim,
       ROUND(avg(CAST(embedding[i + 1] AS DOUBLE)), 5) AS c
FROM embeddings CROSS JOIN range(0, {EMB_DIM}) t(i)
GROUP BY label, i
"""


# --------------------------------------------------------------------------
# Sliding-substring exact dedup (round-4 addition)
# --------------------------------------------------------------------------
#: Substring window width in tokens. passage_dedup tiles the doc with
#: non-overlapping CHUNK_W-word chunks — cheap, but a duplicated span
#: that straddles a chunk boundary is invisible to it. The stride-1
#: sliding window is the exact-substring shape (Lee et al., "Deduplicating
#: Training Data Makes Language Models Better" — their suffix-array
#: ExactSubstr at token granularity): EVERY W-token span is keyed, so a
#: repeat anywhere in the corpus is caught at any alignment.
SUBSTR_W = 10


def substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-substring report over stride-1 sliding
    ``SUBSTR_W``-token windows: a window is duplicated when its hash
    occurs more than once corpus-wide (any doc, any alignment).

    Scale shape: windows are md5-hashed BEFORE the shuffle (32-byte
    keys, never text), the multiplicity count is a window over the
    high-cardinality hash key (parallel — contrast the few-key windows
    banned in ranks.py), and the per-doc rollup is an ordinary
    map-side-combined groupBy. The blowup factor vs passage_dedup is
    exactly W (every token starts a window) — the price of
    alignment-free detection; production systems pay it (or build
    distributed suffix arrays, which shuffle the corpus O(1) times but
    with far heavier constants)."""
    docs = load_table(spark, "documents", sf_dir)
    d = (
        docs.select("doc_id", _toks().alias("t"))
        .filter(F.size("t") >= SUBSTR_W)
        .withColumn("n_win", (F.size("t") - SUBSTR_W + 1).cast("long"))
    )
    wins = d.select(
        "doc_id",
        "n_win",
        F.explode_outer(
            F.transform(
                F.sequence(F.lit(1), F.col("n_win").cast("int")),
                lambda i: F.md5(F.concat_ws(" ", F.slice(F.col("t"), i, SUBSTR_W))),
            )
        ).alias("h"),
    )
    cnt = F.count(F.lit(1)).over(Window.partitionBy("h"))
    flagged = wins.select("doc_id", "n_win", (cnt > 1).cast("long").alias("is_dup"))
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.first("n_win").alias("n_windows"),
            F.sum("is_dup").alias("n_dup_windows"),
        )
        .select(
            "doc_id",
            "n_windows",
            "n_dup_windows",
            F.round(F.col("n_dup_windows") / F.col("n_windows"), 5).alias("dup_frac"),
        )
    )


ORACLE_SUBSTRING_DEDUP = rf"""
WITH d AS (
  SELECT doc_id, {_ORACLE_TOKS} AS toks FROM documents
  WHERE len({_ORACLE_TOKS}) >= {SUBSTR_W}
), dn AS (
  SELECT doc_id, toks, len(toks) - {SUBSTR_W} + 1 AS n_win FROM d
), wins AS (
  SELECT doc_id, n_win,
         md5(array_to_string(toks[u.i : u.i + {SUBSTR_W} - 1], ' ')) AS h
  FROM dn, unnest(range(1, n_win + 1)) AS u(i)
), w AS (
  SELECT doc_id, n_win, count(*) OVER (PARTITION BY h) AS cnt FROM wins
)
SELECT doc_id,
       CAST(ANY_VALUE(n_win) AS BIGINT) AS n_windows,
       CAST(count(*) FILTER (WHERE cnt > 1) AS BIGINT) AS n_dup_windows,
       ROUND(count(*) FILTER (WHERE cnt > 1) * 1.0 / ANY_VALUE(n_win), 5)
         AS dup_frac
FROM w GROUP BY doc_id
"""
