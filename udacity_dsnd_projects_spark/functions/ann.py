"""Persistent ANN index: build-once / query-many (the amortized form of
similarity.cosine_topk_ivf).

At 100 TB the inverted file is not recomputed per query batch — it is
built once, stored bucketed on the coarse-quantizer cell, and every
query batch joins against it. Bucketed storage means the probe join
needs no shuffle of the corpus, ever: each query probe is routed to the
bucket's files. This module wires the IVF pieces to
``sources.layout.write_bucketed_table`` to make that concrete.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_dsnd_projects_spark.functions.similarity import (
    N_QUERIES,
    TOP_K,
    _as_double,
    _dot,
    _norm,
    _probe_masks,
    lsh_bucket,
)
from udacity_dsnd_projects_spark.sources.catalog import load_table
from udacity_dsnd_projects_spark.sources.layout import write_bucketed_table


def build_ann_index(
    spark: SparkSession,
    sf_dir: str,
    table_name: str,
    path: str,
    dim: int = 64,
    n_buckets: int = 16,
) -> None:
    """Build the inverted file: every vector with its coarse cell id,
    stored as a bucketed table ON the cell id — the probe join reads
    only matching storage buckets and plans without an exchange on the
    index side."""
    emb = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", _as_double(F.col("embedding")).alias("v")
    )
    indexed = emb.withColumn("bucket", lsh_bucket(F.col("v"), dim))
    write_bucketed_table(indexed, table_name, path, "bucket", n_buckets)


def ann_query(
    spark: SparkSession,
    table_name: str,
    queries: DataFrame,
    k: int = TOP_K,
) -> DataFrame:
    """Top-k cosine search against a built index. ``queries`` must have
    (query_id, q: array<double>, bucket). Multi-probe: each query is
    expanded to its hamming<=PROBE_HAMMING probe cells, joined to the
    index on the cell id, exact-scored, top-k kept."""
    from pyspark.sql import Window

    index = spark.table(table_name)
    probes = queries.select(
        "query_id",
        "q",
        F.explode(
            F.array(*[F.col("bucket").bitwiseXOR(F.lit(m)) for m in _probe_masks()])
        ).alias("bucket"),
    )
    scored = index.join(
        F.broadcast(probes), on="bucket"
    ).filter(F.col("vec_id") != F.col("query_id")).withColumn(
        "cosine",
        F.round(
            _dot(F.col("q"), F.col("v")) / (_norm(F.col("q")) * _norm(F.col("v"))), 5
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "vec_id", "cosine", "rn")
    )


def query_set(spark: SparkSession, sf_dir: str, dim: int = 64) -> DataFrame:
    """The test query batch: the first N_QUERIES corpus vectors, with
    their coarse cells computed at query time (a real deployment hashes
    incoming queries the same way)."""
    emb = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", _as_double(F.col("embedding")).alias("v")
    )
    return emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("q"),
        lsh_bucket(F.col("v"), dim).alias("bucket"),
    )
