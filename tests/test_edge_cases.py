"""Degenerate-input robustness: empty frames, all-short documents, and
keys with no matches must yield empty results — never errors. These are
the shapes a 100 TB run hits constantly (empty partitions after a
filter, short/garbage documents) and the easiest way to lose a job at
hour six."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


def test_shingles_on_short_and_empty_docs(spark):
    from udacity_dsnd_projects_spark.functions.dedup import _shingled_docs

    docs = spark.createDataFrame(
        [(1, "one two", "en"), (2, "", "en"), (3, None, "en"), (4, "a b c d", "en")],
        DOC_SCHEMA,
    )
    got = _shingled_docs(docs).collect()
    # only doc 4 has >= 3 tokens; null/empty/short are dropped, not errors
    assert [r.doc_id for r in got] == [4]
    assert len(got[0].sh) == 2


def test_lsh_pairs_on_empty_and_singleton_corpus(spark):
    from udacity_dsnd_projects_spark.functions.dedup import lsh_pairs_for

    empty = spark.createDataFrame([], DOC_SCHEMA)
    assert lsh_pairs_for(empty).count() == 0
    one = spark.createDataFrame([(1, "a b c d e f", "en")], DOC_SCHEMA)
    assert lsh_pairs_for(one).count() == 0  # no pair without a partner


def test_curate_on_empty_frame(spark):
    from udacity_dsnd_projects_spark.functions.curation import curate

    empty = spark.createDataFrame([], DOC_SCHEMA)
    assert curate(empty).count() == 0


def test_salted_join_empty_sides(spark):
    from udacity_dsnd_projects_spark.operators.skew import salted_join

    fact = spark.range(5).select(F.col("id").alias("k"))
    empty_dim = spark.createDataFrame([], "k LONG, v STRING")
    assert salted_join(fact, empty_dim, "k").count() == 0
    assert salted_join(fact, empty_dim, "k", how="left").count() == 5


def test_asof_with_no_left_side_rows(spark):
    """Events whose key has no orders at all (not just none earlier)
    disappear from the inner as-of result."""
    from pyspark.sql import Window

    base = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [(1, 99, base)],
        "event_id LONG, k LONG, ts TIMESTAMP",
    )
    orders = spark.createDataFrame([], "order_id LONG, k LONG, ot TIMESTAMP")
    ord_side = orders.select(
        "k", F.col("ot").alias("t"), F.lit(0).alias("is_event"),
        F.struct("ot", "order_id").alias("o"),
    )
    ev_side = ev.select("k", F.col("ts").alias("t"), F.lit(1).alias("is_event"), "event_id")
    tl = ord_side.unionByName(ev_side, allowMissingColumns=True)
    w = (
        Window.partitionBy("k")
        .orderBy("t", "is_event")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        tl.withColumn("asof", F.last("o", ignorenulls=True).over(w))
        .filter((F.col("is_event") == 1) & F.col("asof").isNotNull())
    )
    assert out.count() == 0
