"""Projections, filters and predicates (SURVEY.md §2.3, P1-P9).

Each builder mirrors one projection/filter pattern of the reference's
STEDI scripts (``spark-streaming-pipeline/sparkpy*.py``) or CTA
consumers, re-expressed on the driver corpus. All are pure built-in
column expressions — whole-stage-codegen'd, filter-pushdown-friendly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_dsnd_projects_spark.schemas import EVENT_PROPS
from udacity_dsnd_projects_spark.sources.catalog import load_table


def cast_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 — cast raw columns at the source, the reference's first step on
    every Kafka stream (``sparkpykafkajoin.py:70-72``:
    ``selectExpr("cast(key as string) key", ...)``)."""
    return load_table(spark, "events", sf_dir).selectExpr(
        "cast(event_id as string) AS key",
        "cast(user_id as string) AS user_key",
        "event_type AS etype",
    )


ORACLE_CAST_PROJECTION = """
SELECT CAST(event_id AS VARCHAR) AS key,
       CAST(user_id AS VARCHAR) AS user_key,
       event_type AS etype
FROM events
"""


def json_parse_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 + P3 — ``from_json`` into a struct then star-expand, the
    envelope-decode idiom of ``sparkpykafkajoin.py:75-77``
    (``withColumn("value", from_json(...)).select("value.*")``)."""
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.withColumn("p", F.from_json(F.col("props"), EVENT_PROPS))
        .select("event_id", "p.*")  # star-expand the struct (P3)
    )


ORACLE_JSON_PARSE_FLATTEN = """
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
FROM events
"""


def array_subscript(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 — array subscript + field access, the ``zSetEntries[0].element``
    quirk (``sparkpykafkajoin.py:80-82``): take only the first element of
    an array column."""
    emb = load_table(spark, "embeddings", sf_dir)
    return emb.select(
        "vec_id",
        F.round(F.col("embedding")[0].cast("double"), 5).alias("first_dim"),
        F.size("embedding").alias("dim"),
    )


ORACLE_ARRAY_SUBSCRIPT = """
SELECT vec_id,
       ROUND(CAST(embedding[1] AS DOUBLE), 5) AS first_dim,
       len(embedding) AS dim
FROM embeddings
"""


def array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 idiomatic variant — ``explode`` the array instead of taking
    ``[0]`` (SURVEY.md §7 phase 3 deviation 4). posexplode keeps the
    element index so the compat ``[0]`` row is recoverable."""
    emb = load_table(spark, "embeddings", sf_dir)
    return (
        emb.filter(F.col("vec_id") < 8)
        .select("vec_id", F.posexplode("embedding").alias("pos", "component"))
        .select("vec_id", "pos", F.round(F.col("component").cast("double"), 5).alias("component"))
    )


ORACLE_ARRAY_EXPLODE = """
SELECT vec_id,
       CAST(u.pos - 1 AS INTEGER) AS pos,
       ROUND(CAST(u.comp AS DOUBLE), 5) AS component
FROM (
  SELECT vec_id, unnest(embedding) AS comp,
         generate_subscripts(embedding, 1) AS pos
  FROM embeddings WHERE vec_id < 8
) u
"""


def base64_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 — base64 encode/decode, the payload-decode step of the redis
    envelope chain (``sparkpykafkajoin.py:85-87``:
    ``unbase64(col).cast("string")``)."""
    cust = load_table(spark, "customer", sf_dir)
    enc = F.base64(F.col("c_name").cast("binary"))
    return cust.select(
        "c_custkey",
        enc.alias("encoded"),
        F.unbase64(enc).cast("string").alias("decoded"),
    )


ORACLE_BASE64_ROUNDTRIP = """
SELECT c_custkey,
       to_base64(encode(c_name)) AS encoded,
       decode(from_base64(to_base64(encode(c_name)))) AS decoded
FROM customer
"""


def null_reject_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 — NULL-rejecting conjunctive filter
    (``sparkpykafkajoin.py:95-97``: ``WHERE email is not null AND
    birthDay is not null``), plus a derived-field predicate."""
    ev = load_table(spark, "events", sf_dir)
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.filter(
            F.col("event_type").isNotNull()
            & F.col("props").isNotNull()
            & (k >= 50)
        )
        .select("event_id", "event_type", k.alias("k"))
    )


ORACLE_NULL_REJECT_FILTER = """
SELECT event_id, event_type,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
FROM events
WHERE event_type IS NOT NULL AND props IS NOT NULL
  AND CAST(json_extract_string(props, '$.k') AS INTEGER) >= 50
"""


def column_equality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 — column-equality / boolean-column filters, the pandas-side
    selections of the producers (``turnstile_hardware.py:22-24``,
    ``line.py:30,36``)."""
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.filter((F.col("l_returnflag") == "R") & (F.col("l_quantity") > 25.0))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    )


ORACLE_COLUMN_EQUALITY_FILTER = """
SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
FROM lineitem
WHERE l_returnflag = 'R' AND l_quantity > 25.0
"""


def topic_dispatch_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 — dispatch by exact/prefix/lowercase topic-name match, the
    consumer routing logic (``consumers/models/lines.py:22-37``,
    ``line.py:60-78``)."""
    ev = load_table(spark, "events", sf_dir)
    return ev.select(
        "event_id",
        "event_type",
        (F.col("event_type") == "purchase").alias("is_purchase"),
        F.col("event_type").startswith("s").alias("is_s_prefix"),
        (F.lower(F.col("event_type")) == F.col("event_type")).alias("is_lower"),
    )


ORACLE_TOPIC_DISPATCH_FILTER = """
SELECT event_id, event_type,
       event_type = 'purchase' AS is_purchase,
       starts_with(event_type, 's') AS is_s_prefix,
       lower(event_type) = event_type AS is_lower
FROM events
"""


def value_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9 — partition-by-value routing (red/green/blue line dispatch,
    ``consumers/models/lines.py:26-33``): one pass, grouped by the
    routing value, instead of N filtered scans."""
    cust = load_table(spark, "customer", sf_dir)
    return (
        cust.groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


ORACLE_VALUE_ROUTING = """
SELECT c_mktsegment, COUNT(*) AS n_customers
FROM customer
GROUP BY c_mktsegment
"""
