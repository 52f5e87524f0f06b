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
    """End-to-end: synthesize → extract → project features with byte
    stats. Registered rows-only (the mapInPandas stage is not SQL);
    the deterministic parts (n_bytes) are asserted against the oracle
    in :func:`media_byte_stats`."""
    return extract_features(synthesize_media(spark, sf_dir))


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
