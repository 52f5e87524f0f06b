"""Corpus snapshot operations (round-5 additions): snapshot diff and
changelog merge — the recurring-pipeline bookkeeping next to
incremental dedup (``functions/dedup.py``): a crawl that re-runs needs
to know WHAT changed between snapshots (diff) and how to fold a stream
of upserts/deletes into the served table (merge — the batch analog of
the compacted-table sink, ``streaming/sinks.py:43``).

The corpus has no second snapshot, so both operators synthesize one
deterministically from ``documents`` (residue arithmetic, the
``incremental_dedup`` construction family): edits, additions, and
removals all derive from ``doc_id`` so the DuckDB oracle rebuilds the
identical inputs.

Scale notes: both operators shuffle only (id, hash/seq)-narrow rows —
content is hashed BEFORE the exchange, never moved; the merge argmax
is a map-side-combined ``max(struct(...))`` groupBy, not a window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_dsnd_projects_spark.sources.catalog import load_table

#: Residues driving the synthetic snapshot pair (see module docstring).
SNAP_ADDED_MOD = 11  # doc_id % 11 == 3 → missing from OLD (appears "added")
SNAP_CHANGED_MOD = 7  # doc_id % 7 == 2 → OLD text differs ("changed")
SNAP_REMOVED_MOD = 13  # doc_id % 13 == 5 → extra OLD-only row ("removed")
#: Id offset for OLD-only rows (past any real doc_id).
SNAP_ID_OFFSET = 30_000_000


def _snap_old(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The prior snapshot: drops the ``added`` residue class, carries a
    stale revision for the ``changed`` class, and holds extra rows the
    new snapshot no longer has."""
    docs = load_table(spark, "documents", sf_dir)
    did = F.col("doc_id")
    base = docs.filter(did % SNAP_ADDED_MOD != 3).select(
        "doc_id",
        F.when(
            did % SNAP_CHANGED_MOD == 2, F.concat(F.col("text"), F.lit(" v1"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    gone = docs.filter(did % SNAP_REMOVED_MOD == 5).select(
        (did + SNAP_ID_OFFSET).alias("doc_id"), "text"
    )
    return base.unionByName(gone)


def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot compare: one row per ADDED / REMOVED / CHANGED document
    between the prior snapshot and the current corpus —
    (doc_id, status, old_md5, new_md5). Unchanged rows (the vast
    majority at crawl scale) are filtered out, so the result is
    delta-sized.

    Scale shape: each side reduces to (doc_id, md5) BEFORE the
    full-outer equi-join — the only shuffle moves ~48-byte rows keyed
    on the (unique, skew-free) doc_id; the status CASE and the
    unchanged-filter are post-join projections inside codegen. At 100×
    the join is AQE's bread and butter; with both snapshots bucketed
    on doc_id it degenerates to a zero-shuffle sort-merge."""
    old = _snap_old(spark, sf_dir).select(
        "doc_id", F.md5(F.col("text").cast("binary")).alias("old_md5")
    )
    new = (
        load_table(spark, "documents", sf_dir)
        .select("doc_id", F.md5(F.col("text").cast("binary")).alias("new_md5"))
    )
    j = old.join(new, "doc_id", "full_outer")
    status = (
        F.when(F.col("old_md5").isNull(), "added")
        .when(F.col("new_md5").isNull(), "removed")
        .when(F.col("old_md5") != F.col("new_md5"), "changed")
        .otherwise("unchanged")
    )
    return (
        j.withColumn("status", status)
        .filter(F.col("status") != "unchanged")
        .select("doc_id", "status", "old_md5", "new_md5")
    )


_ORACLE_SNAP_OLD = f"""
  SELECT doc_id,
         CASE WHEN doc_id % {SNAP_CHANGED_MOD} = 2 THEN text || ' v1'
              ELSE text END AS text
  FROM documents WHERE doc_id % {SNAP_ADDED_MOD} <> 3
  UNION ALL
  SELECT doc_id + {SNAP_ID_OFFSET} AS doc_id, text
  FROM documents WHERE doc_id % {SNAP_REMOVED_MOD} = 5
"""

ORACLE_SNAPSHOT_DIFF = f"""
WITH old AS (
  SELECT doc_id, md5(text) AS old_md5 FROM ({_ORACLE_SNAP_OLD}) o
), new AS (
  SELECT doc_id, md5(text) AS new_md5 FROM documents
), j AS (
  SELECT COALESCE(old.doc_id, new.doc_id) AS doc_id, old_md5, new_md5
  FROM old FULL OUTER JOIN new ON old.doc_id = new.doc_id
)
SELECT doc_id,
       CASE WHEN old_md5 IS NULL THEN 'added'
            WHEN new_md5 IS NULL THEN 'removed'
            WHEN old_md5 <> new_md5 THEN 'changed'
            ELSE 'unchanged' END AS status,
       old_md5, new_md5
FROM j
WHERE (old_md5 IS NULL OR new_md5 IS NULL OR old_md5 <> new_md5)
"""


# --------------------------------------------------------------------------
# Changelog merge (MERGE INTO semantics)
# --------------------------------------------------------------------------
#: Changelog residues: seq-2 revisions, seq-2 late inserts, seq-3
#: deletes (a key can receive several ops; highest seq wins).
CDC_REVISE_MOD = 4  # doc_id % 4 == 1 → upsert with revised text @ seq 2
CDC_INSERT_MOD = 5  # doc_id % 3 == 0 and % 5 == 0 → new key insert @ seq 2
CDC_DELETE_MOD = 6  # doc_id % 6 == 2 → delete @ seq 3


def _cdc_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, seq, op, content_md5, n_chars) — the base snapshot as
    seq-1 upserts plus the synthesized changelog. MD5 is computed at
    log-build time so nothing downstream ever moves document text."""
    docs = load_table(spark, "documents", sf_dir)
    did = F.col("doc_id")

    def _row(df: DataFrame, seq: int, op: str, text: Column | None) -> DataFrame:
        md5 = (
            F.md5(text.cast("binary")) if text is not None else F.lit(None).cast("string")
        )
        n = F.length(text).cast("long") if text is not None else F.lit(None).cast("long")
        return df.select(
            "doc_id",
            F.lit(seq).alias("seq"),
            F.lit(op).alias("op"),
            md5.alias("content_md5"),
            n.alias("n_chars"),
        )

    base = _row(docs.filter(did % 3 != 0), 1, "upsert", F.col("text"))
    revised = _row(
        docs.filter((did % 3 != 0) & (did % CDC_REVISE_MOD == 1)),
        2,
        "upsert",
        F.concat(F.col("text"), F.lit(" rev2")),
    )
    inserted = _row(
        docs.filter((did % 3 == 0) & (did % CDC_INSERT_MOD == 0)),
        2,
        "upsert",
        F.col("text"),
    )
    deleted = _row(docs.filter(did % CDC_DELETE_MOD == 2), 3, "delete", None)
    return base.unionByName(revised).unionByName(inserted).unionByName(deleted)


def merge_changelog(log: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """MERGE INTO over an arbitrary changelog frame with columns
    (key, seq, op, content_md5, n_chars): latest-wins per key by
    sequence number; a key whose highest-seq op is ``delete`` drops
    (a later upsert REINSERTS it — seq order, not op order, decides).

    Scale shape: ONE map-side-combined groupBy on the key computes
    ``max(struct(seq, op, md5, n_chars))`` — an argmax without a
    window or secondary sort; deletes whose key never reappears are
    filtered AFTER the argmax, so tombstones cost nothing extra. A
    delete-for-absent-key is a no-op, exactly like MERGE."""
    latest = log.groupBy(key_col).agg(
        F.max(F.struct("seq", "op", "content_md5", "n_chars")).alias("b")
    )
    return (
        latest.filter(F.col("b.op") != "delete")
        .select(
            key_col,
            F.col("b.seq").alias("last_seq"),
            F.col("b.content_md5").alias("content_md5"),
            F.col("b.n_chars").alias("n_chars"),
        )
    )


def cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fold the synthesized changelog into the served table — the
    registered face of :func:`merge_changelog`: the batch analog of
    the compacted-table sink (``streaming/sinks.py:43``) and of the
    reference's Faust latest-per-key table. Output: (doc_id,
    last_seq, content_md5, n_chars) for every surviving key."""
    return merge_changelog(_cdc_log(spark, sf_dir))


_ORACLE_CDC_LOG = f"""
  SELECT doc_id, 1 AS seq, 'upsert' AS op, md5(text) AS content_md5,
         CAST(length(text) AS BIGINT) AS n_chars
  FROM documents WHERE doc_id % 3 <> 0
  UNION ALL
  SELECT doc_id, 2, 'upsert', md5(text || ' rev2'),
         CAST(length(text || ' rev2') AS BIGINT)
  FROM documents WHERE doc_id % 3 <> 0 AND doc_id % {CDC_REVISE_MOD} = 1
  UNION ALL
  SELECT doc_id, 2, 'upsert', md5(text), CAST(length(text) AS BIGINT)
  FROM documents WHERE doc_id % 3 = 0 AND doc_id % {CDC_INSERT_MOD} = 0
  UNION ALL
  SELECT doc_id, 3, 'delete', NULL, NULL
  FROM documents WHERE doc_id % {CDC_DELETE_MOD} = 2
"""

ORACLE_CDC_MERGE = f"""
WITH log AS ({_ORACLE_CDC_LOG}),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY seq DESC) AS rn
  FROM log
)
SELECT doc_id, seq AS last_seq, content_md5, n_chars
FROM ranked WHERE rn = 1 AND op <> 'delete'
"""
