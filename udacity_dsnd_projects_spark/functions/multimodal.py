"""Multimodal columns (SURVEY.md §7 phase 4): image/audio/video as
opaque ``binary`` columns with typed metadata.

The container has no image/audio codecs, so the decode step is STUBBED:
:func:`register_codec` installs real decoders when available
(import-try), and the default "codec" is a clearly-marked deterministic
fake that derives features from the bytes themselves. Everything
Spark-side is real and tested: the schema contract, the Arrow-batched
``mapInPandas`` signature, partition-size control for large blobs, and
the metadata projection.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from udacity_dsnd_projects_spark.sources.catalog import load_table

#: Media row contract: opaque payload + typed metadata.
MEDIA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

#: Feature-extraction output contract.
MEDIA_FEATURES = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)

_CODECS: dict[str, Callable[[bytes, dict], list[float]]] = {}


def register_codec(modality: str, fn: Callable[[bytes, dict], list[float]]) -> None:
    """Install a real decoder (e.g. Pillow/librosa-backed) for a
    modality. Absent a registration, :func:`_fake_decode` is used."""
    _CODECS[modality] = fn


def _fake_decode(content: bytes, meta: dict) -> list[float]:
    """DETERMINISTIC FAKE decode — stands in for image/audio decoding
    (libs not in this container). Derives an 8-dim 'feature' from byte
    statistics so pipelines have stable, assertable output."""
    if not content:
        return [0.0] * 8
    n = len(content)
    return [
        float(n),
        float(content[0]),
        float(content[-1]),
        float(sum(content) % 997),
        float(min(content)),
        float(max(content)),
        float(sum(1 for b in content if b > 127)) / n,
        float(meta.get("width") or meta.get("sample_rate") or 0),
    ]


def synthesize_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a media table from the documents corpus: text bytes play
    the opaque payload (deterministic; no external fixtures needed)."""
    docs = load_table(spark, "documents", sf_dir)
    modality = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        modality.alias("modality"),
        F.col("text").cast("binary").alias("content"),
        F.struct(
            F.lit("raw").alias("format"),
            (F.col("n_chars") % 640).cast("int").alias("width"),
            (F.col("n_chars") % 480).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
            (F.col("n_chars") * 10).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def extract_features(media: DataFrame, batch_target_rows: int = 1024) -> DataFrame:
    """Decode/feature-extract via Arrow-batched ``mapInPandas``.

    The UDF is the only Python in the pipeline, it sees whole Arrow
    batches (never row-at-a-time), and blobs never pass through a
    groupBy — partition-local streaming keeps memory bounded no matter
    the corpus size. For real media, register codecs per modality;
    decode failures yield null features rather than failing the job.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "modality": pdf["modality"],
                "n_bytes": pdf["content"].map(lambda b: len(b) if b is not None else 0),
            }
            feats = []
            for content, modality, meta in zip(
                pdf["content"], pdf["modality"], pdf["meta"]
            ):
                if content is None:
                    # NULL payload = an undecodable row, same contract
                    # as a codec failure: null features, never a
                    # crashed Arrow worker
                    feats.append(None)
                    continue
                codec = _CODECS.get(modality, _fake_decode)
                meta_dict = dict(meta) if meta is not None else {}
                try:
                    feats.append(codec(bytes(content), meta_dict))
                except NotImplementedError:
                    feats.append(None)
            out["feature"] = feats
            yield pd.DataFrame(out)

    return media.mapInPandas(run, MEDIA_FEATURES)


def media_feature_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end: synthesize → extract → full feature arrays. This
    array-returning face is for library users and pytest; the
    registry exposes :func:`media_feature_summary` (scalar columns
    only) because array cells crash the driver's row canonicalizer."""
    return extract_features(synthesize_media(spark, sf_dir))


def media_feature_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-safe projection of the full pipeline: scalar columns
    only, with the feature array folded to a checksum sum. The fake
    decode is deterministic byte math over an ASCII corpus (byte ==
    codepoint, asserted in pytest), so the checksum is exactly
    reproducible in the DuckDB oracle — a full value verdict for the
    whole synthesize → mapInPandas → fold chain, not just rows-only."""
    feats = media_feature_pipeline(spark, sf_dir)
    return feats.select(
        "media_id",
        "modality",
        "n_bytes",
        F.round(
            F.aggregate("feature", F.lit(0.0), lambda acc, x: acc + x), 5
        ).alias("feature_sum"),
    )


#: Reproduces _fake_decode's 8 features from the source text in SQL:
#: [n, first_byte, last_byte, sum(bytes) % 997, min, max,
#:  frac(bytes > 127), width-or-sample-rate] — byte values come from
#: per-char codepoints, valid because the corpus is pure ASCII (the
#: pipeline itself handles arbitrary bytes; only the oracle leans on
#: the fixture's ASCII-ness, and pytest asserts that assumption).
ORACLE_MEDIA_FEATURE_SUMMARY = """
WITH b AS (
  SELECT doc_id AS media_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS modality,
         octet_length(encode(text)) AS n,
         list_transform(range(1, length(text) + 1),
                        i -> ord(substr(text, i, 1))) AS bs,
         CAST(n_chars % 640 AS INTEGER) AS width
  FROM documents
)
SELECT media_id, modality, CAST(n AS BIGINT) AS n_bytes,
       ROUND(CASE WHEN n = 0 THEN 0.0 ELSE
         CAST(n AS DOUBLE) + bs[1] + bs[n] + (list_sum(bs) % 997)
         + list_min(bs) + list_max(bs)
         + CAST(len(list_filter(bs, x -> x > 127)) AS DOUBLE) / n
         + (CASE WHEN width = 0 THEN 16000 ELSE width END)
       END, 5) AS feature_sum
FROM b
"""


def media_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checkable slice of the media pipeline: payload byte
    lengths and per-modality rollup, all built-in (octet_length)."""
    media = synthesize_media(spark, sf_dir)
    return media.groupBy("modality").agg(
        F.count("*").alias("n_items"),
        F.sum(F.octet_length("content")).alias("total_bytes"),
        F.max(F.col("meta.width")).alias("max_width"),
    )


ORACLE_MEDIA_BYTE_STATS = """
SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio'
            ELSE 'video' END AS modality,
       COUNT(*) AS n_items,
       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       MAX(CAST(n_chars % 640 AS INTEGER)) AS max_width
FROM documents
GROUP BY 1
"""


#: Frame sampling defaults: one frame per second of media time, 64
#: payload bytes per frame.
FRAME_EVERY_MS = 1000
FRAME_BYTES = 64
#: Resize default: target payload size for the byte-downsample fake.
RESIZE_TARGET_BYTES = 256

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_ms", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)

RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("orig_bytes", T.LongType()),
        T.StructField("resized", T.BinaryType()),
    ]
)


def sample_frames(
    media: DataFrame,
    every_ms: int = FRAME_EVERY_MS,
    frame_bytes: int = FRAME_BYTES,
) -> DataFrame:
    """Frame sampling for video rows — the UDTF-shaped face (one input
    row → many frame rows) via ``mapInPandas``. A real deployment's
    codec seeks to ``ts_ms`` and decodes; the stand-in slices the
    payload into consecutive ``frame_bytes`` chunks (deterministic, so
    the row counts and byte lengths are exactly oracle-checkable).
    Frames stream out per Arrow batch — a 2-hour video never
    materializes all its frames in one row, unlike an explode over a
    collected frame array."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, frames = [], [], [], []
            for media_id, content, meta in zip(
                pdf["media_id"], pdf["content"], pdf["meta"]
            ):
                data = bytes(content) if content is not None else b""
                duration = int(meta["duration_ms"]) if meta is not None else 0
                n_frames = min(duration // every_ms, max(len(data) // frame_bytes, 0))
                for i in range(n_frames):
                    ids.append(media_id)
                    idxs.append(i)
                    tss.append(i * every_ms)
                    frames.append(data[i * frame_bytes : (i + 1) * frame_bytes])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "ts_ms": tss, "frame": frames}
            )

    return media.filter(F.col("modality") == "video").mapInPandas(run, FRAME_SCHEMA)


def resize_media(media: DataFrame, target_bytes: int = RESIZE_TARGET_BYTES) -> DataFrame:
    """Resize for image rows. The stand-in is a nearest-neighbor
    DOWNSAMPLE over the payload bytes (numpy fancy-indexing at evenly
    spaced positions) — the honest 1-D analog of image NN-resize, so
    the plumbing (binary in → smaller binary out, vectorized batch
    kernel, no shuffle) is real even though no pixel codec exists in
    this container; ``register_codec`` swaps in a real resampler.
    Payloads already at or under ``target_bytes`` pass through
    unchanged (no upsampling)."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_orig, out_res = [], [], []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                data = bytes(content) if content is not None else b""
                out_ids.append(media_id)
                out_orig.append(len(data))
                if len(data) <= target_bytes:
                    out_res.append(data)
                else:
                    arr = np.frombuffer(data, dtype=np.uint8)
                    pos = (np.arange(target_bytes) * len(data)) // target_bytes
                    out_res.append(arr[pos].tobytes())
            yield pd.DataFrame(
                {"media_id": out_ids, "orig_bytes": out_orig, "resized": out_res}
            )

    return media.filter(F.col("modality") == "image").mapInPandas(run, RESIZED_SCHEMA)


def frame_sample_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checkable rollup of :func:`sample_frames`: frames and
    frame bytes per video. The chunking arithmetic is deterministic,
    so DuckDB reproduces it from the source table exactly."""
    frames = sample_frames(synthesize_media(spark, sf_dir))
    return frames.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.sum(F.octet_length("frame")).alias("frame_bytes"),
        F.max("ts_ms").alias("last_ts_ms"),
    )


ORACLE_FRAME_SAMPLE_STATS = f"""
WITH video AS (
  SELECT doc_id AS media_id,
         octet_length(encode(text)) AS n_bytes,
         n_chars * 10 AS duration_ms
  FROM documents WHERE doc_id % 3 = 2
), sized AS (
  SELECT media_id,
         LEAST(duration_ms // {FRAME_EVERY_MS}, n_bytes // {FRAME_BYTES}) AS n_frames
  FROM video
)
SELECT media_id,
       n_frames,
       CAST(n_frames * {FRAME_BYTES} AS BIGINT) AS frame_bytes,
       CAST((n_frames - 1) * {FRAME_EVERY_MS} AS INTEGER) AS last_ts_ms
FROM sized WHERE n_frames >= 1
"""


def media_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checkable rollup of :func:`resize_media`: original vs
    resized byte sizes per image (the resized payload itself is
    asserted byte-for-byte against numpy in pytest)."""
    resized = resize_media(synthesize_media(spark, sf_dir))
    return resized.select(
        "media_id",
        "orig_bytes",
        F.octet_length("resized").alias("resized_bytes"),
    )


ORACLE_MEDIA_RESIZE_STATS = f"""
SELECT doc_id AS media_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS orig_bytes,
       LEAST(octet_length(encode(text)), {RESIZE_TARGET_BYTES}) AS resized_bytes
FROM documents WHERE doc_id % 3 = 0
"""


# --------------------------------------------------------------------------
# Content-hash dedup over binary media payloads
# --------------------------------------------------------------------------
#: Every MEDIA_DUP_MOD-th item re-appears as a synthetic "re-crawl"
#: copy (same payload, new id) so the dedup face has real work on the
#: fixture corpus — the synthesize_urls duplicate-injection pattern.
MEDIA_DUP_MOD = 7
#: Id offset for injected copies (far above any real doc_id).
MEDIA_DUP_OFFSET = 1_000_000


def _media_with_recrawls(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synthesize_media(spark, sf_dir).select(
        "media_id", "modality", "content"
    )
    copies = media.filter(F.col("media_id") % MEDIA_DUP_MOD == 0).select(
        (F.col("media_id") + MEDIA_DUP_OFFSET).alias("media_id"),
        "modality",
        "content",
    )
    return media.unionByName(copies)


def media_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup over OPAQUE binary payloads: hash the bytes
    (md5 over the binary column — never the decoded content), keep
    the lowest media_id per digest, flag the rest. This is the
    multimodal twin of the text ``exact_dedup``: the blob itself is
    only ever touched by the JVM-side hash — no Python, no decode.
    The corpus is the synthesized media table plus deterministic
    "re-crawl" copies (every :data:`MEDIA_DUP_MOD`-th payload under a
    fresh id) so the operator demonstrably collapses real duplicates.

    Scale shape: hash-before-shuffle (the 16-byte digest crosses the
    exchange, never the payload); keeper election is a
    map-side-combined ``min(media_id)`` per digest joined back on the
    digest — no window, no payload movement."""
    # the digest frame feeds keeper election AND the join back; the
    # checkpoint stops the synthesize+hash subtree running twice (and
    # drops the payload column before anything is stored)
    m = (
        _media_with_recrawls(spark, sf_dir)
        .select("media_id", "modality", F.md5("content").alias("digest"))
        .localCheckpoint(eager=True)
    )
    keep = m.groupBy("digest").agg(F.min("media_id").alias("keeper_id"))
    return m.join(keep, "digest").select(
        "media_id",
        "modality",
        "keeper_id",
        (F.col("media_id") != F.col("keeper_id")).cast("int").alias("is_dup"),
    )


#: DuckDB md5 over the VARCHAR hashes its UTF-8 bytes — exactly the
#: bytes Spark's cast(text AS BINARY) feeds its md5.
ORACLE_MEDIA_DEDUP = f"""
WITH m AS (
  SELECT doc_id AS media_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS modality,
         md5(text) AS digest
  FROM documents
  UNION ALL
  SELECT doc_id + {MEDIA_DUP_OFFSET} AS media_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS modality,
         md5(text) AS digest
  FROM documents WHERE doc_id % {MEDIA_DUP_MOD} = 0
), keep AS (
  SELECT digest, MIN(media_id) AS keeper_id FROM m GROUP BY digest
)
SELECT m.media_id, m.modality, keep.keeper_id,
       CAST(m.media_id <> keep.keeper_id AS INTEGER) AS is_dup
FROM m JOIN keep ON m.digest = keep.digest
"""


# --------------------------------------------------------------------------
# Media type-mismatch sniff (round-11 addition): the container-vs-
# content gate
# --------------------------------------------------------------------------

#: Synthetic magic headers per modality (the planted stand-in for real
#: container magic bytes — ffd8/ID3/ftyp — which the sandbox corpus
#: lacks). A declared modality whose payload leads with a DIFFERENT
#: header is a mislabeled asset.
MAGIC_HEADERS = {"image": "IMG0", "audio": "AUD0", "video": "VID0"}

#: One in MISMATCH_MOD media rows is planted with the WRONG header
#: (rotated one modality over), so the gate has real positives at
#: every SF — mirrored in the oracle.
MISMATCH_MOD = 11

#: The header rotation used for planted mismatches.
_ROTATE = {"image": "AUD0", "audio": "VID0", "video": "IMG0"}


def _media_with_headers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """synthesize_media with a magic header prepended to each payload
    — correct for most rows, rotated for the ``% MISMATCH_MOD``
    subset."""
    m = synthesize_media(spark, sf_dir)
    right = F.col("modality")
    hdr = F.when(
        F.col("media_id") % MISMATCH_MOD == 0,
        F.element_at(
            F.create_map(
                *[
                    x
                    for k, v in _ROTATE.items()
                    for x in (F.lit(k), F.lit(v))
                ]
            ),
            right,
        ),
    ).otherwise(
        F.element_at(
            F.create_map(
                *[
                    x
                    for k, v in MAGIC_HEADERS.items()
                    for x in (F.lit(k), F.lit(v))
                ]
            ),
            right,
        )
    )
    return m.select(
        "media_id",
        "modality",
        F.concat(hdr.cast("binary"), F.col("content")).alias("content"),
        "meta",
    )


def media_type_mismatch_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Container-vs-content gate — the multimodal sibling of
    ``markup_density_report``: sniff each payload's magic header and
    compare it with the DECLARED modality; a mismatch is a mislabeled
    asset (wrong extension, broken upload pipeline, adversarial
    content) that would route to the wrong decoder and poison its
    feature batch. One row per declared modality: (modality, n_media,
    n_mismatch, mismatch_rate, top_sniffed_other) where
    ``top_sniffed_other`` is the most common WRONG sniff (ties to the
    lexicographically smaller header), the triage hint for where the
    mislabeled assets actually belong.

    Scale shape: the sniff reads 4 bytes per row (substring on the
    binary column, JVM-side — the blob itself never crosses an
    exchange); the rollup is a modality-cardinality map-side-combined
    groupBy; the top-wrong-sniff argmax rides the same frame as a
    max_by over per-(modality, sniff) counts."""
    m = _media_with_headers(spark, sf_dir)
    sniffed = m.select(
        "modality",
        F.substring(F.col("content"), 1, 4).cast("string").alias("hdr"),
    )
    rev = F.create_map(
        *[x for k, v in MAGIC_HEADERS.items() for x in (F.lit(v), F.lit(k))]
    )
    s = sniffed.select(
        "modality",
        F.coalesce(F.element_at(rev, F.col("hdr")), F.lit("unknown")).alias(
            "sniffed"
        ),
    )
    return _mismatch_rollup(s)


def _mismatch_rollup(s: DataFrame) -> DataFrame:
    """Rollup for ``media_type_mismatch_report`` over a
    (modality, sniffed) frame. The top-wrong-sniff argmax tie-breaks on
    the FULL sniffed string (``min_by`` over a (-n, sniffed) struct:
    highest count first, then lexicographically smallest header),
    mirroring the oracle's ``ORDER BY n DESC, sniffed`` — a first-char
    surrogate like ``ascii()`` would diverge the moment two modalities
    share an initial letter."""
    per = s.groupBy("modality", "sniffed").agg(
        F.count(F.lit(1)).alias("n")
    )
    mm = F.col("sniffed") != F.col("modality")
    return (
        per.groupBy("modality")
        .agg(
            F.sum("n").alias("n_media"),
            F.sum(F.when(mm, F.col("n")).otherwise(0)).alias("n_mismatch"),
            F.min_by(
                F.when(mm, F.col("sniffed")),
                F.when(
                    mm,
                    F.struct(
                        (-F.col("n")).alias("neg_n"),
                        F.col("sniffed"),
                    ),
                ),
            ).alias("top_sniffed_other"),
        )
        .select(
            "modality",
            "n_media",
            "n_mismatch",
            F.round(F.col("n_mismatch") / F.col("n_media"), 6).alias(
                "mismatch_rate"
            ),
            "top_sniffed_other",
        )
    )


#: The oracle recomputes expected sniff outcomes from the planting
#: rule (declared modality by doc_id % 3; rotated header on the
#: % MISMATCH_MOD subset) while the Spark side actually sniffs the
#: payload bytes — so a header-prepend or substring bug on the Spark
#: side is a hash mismatch, not a shared blind spot.
ORACLE_MEDIA_TYPE_MISMATCH_REPORT = f"""
WITH base AS (
  SELECT doc_id,
         CASE doc_id % 3 WHEN 0 THEN 'image'
                         WHEN 1 THEN 'audio'
                         ELSE 'video' END AS modality
  FROM documents
), s AS (
  SELECT modality,
         CASE WHEN doc_id % {MISMATCH_MOD} = 0
              THEN CASE modality WHEN 'image' THEN 'audio'
                                 WHEN 'audio' THEN 'video'
                                 ELSE 'image' END
              ELSE modality END AS sniffed
  FROM base
), per AS (
  SELECT modality, sniffed, COUNT(*) AS n FROM s GROUP BY 1, 2
), tot AS (
  SELECT modality,
         CAST(SUM(n) AS BIGINT) AS n_media,
         CAST(SUM(CASE WHEN sniffed <> modality THEN n ELSE 0 END)
              AS BIGINT) AS n_mismatch
  FROM per GROUP BY 1
), top AS (
  SELECT modality, sniffed AS top_sniffed_other,
         ROW_NUMBER() OVER (PARTITION BY modality
                            ORDER BY n DESC, sniffed) AS rn
  FROM per WHERE sniffed <> modality
)
SELECT t.modality, t.n_media, t.n_mismatch,
       ROUND(t.n_mismatch * 1.0 / t.n_media, 6) AS mismatch_rate,
       top.top_sniffed_other
FROM tot t LEFT JOIN top ON t.modality = top.modality AND top.rn = 1
"""
