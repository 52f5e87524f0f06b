"""Scalar functions F1-F12 (SURVEY.md §2.7), exposed as oracle-checkable
query faces over the corpus.

All built-in ``pyspark.sql.functions`` — JVM-side, codegen'd, no Python
in the data path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_dsnd_projects_spark.sources.catalog import load_table


def split_derive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 — ``split(str, sep).getItem(i)``, the birthYear derivation
    (``sparkpykafkajoin.py:99-105``: ``split(birthDay,"-")[0]``)."""
    cust = load_table(spark, "customer", sf_dir)
    return cust.select(
        "c_custkey",
        F.split(F.col("c_name"), "#").getItem(0).alias("prefix"),
        F.split(F.col("c_name"), "#").getItem(1).alias("cust_num"),
    )


ORACLE_SPLIT_DERIVE = """
SELECT c_custkey,
       split_part(c_name, '#', 1) AS prefix,
       split_part(c_name, '#', 2) AS cust_num
FROM customer
"""


def string_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 + F5 + F11 — the topic-name normalization chain
    (``producers/models/station.py:22-28``: lower + replace '/'->'_and_',
    ' '->'_', '-'->'_', drop apostrophes) and the zero-padded train id
    (``line.py:54-56``: ``str(id).zfill(3)`` -> 'BL007')."""
    part = load_table(spark, "part", sf_dir)
    normalized = F.regexp_replace(
        F.regexp_replace(F.lower(F.col("p_name")), "/", "_and_"), "[ '-]", "_"
    )
    return part.select(
        "p_partkey",
        normalized.alias("topic_name"),
        F.concat(F.lit("PT"), F.lpad(F.col("p_partkey").cast("string"), 5, "0")).alias(
            "padded_id"
        ),
        F.initcap(F.regexp_replace(F.lower(F.col("p_type")), "_", " ")).alias(
            "display_type"
        ),
    )


# DuckDB has no initcap; emulate per space-delimited word.
ORACLE_STRING_NORMALIZE = """
SELECT p_partkey,
       regexp_replace(replace(lower(p_name), '/', '_and_'), '[ ''-]', '_', 'g')
         AS topic_name,
       'PT' || lpad(CAST(p_partkey AS VARCHAR), 5, '0') AS padded_id,
       array_to_string(
         list_transform(string_split(replace(lower(p_type), '_', ' '), ' '),
                        w -> upper(w[1]) || w[2:]),
         ' ') AS display_type
FROM part
"""


def case_when_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 — CASE/if-elif mapping, the Faust line-color derivation
    (``consumers/faust_stream.py:55-63``: red→'red' elif blue→'blue'
    elif green→'green' else '')."""
    part = load_table(spark, "part", sf_dir)
    return part.select(
        "p_partkey",
        "p_size",
        F.when(F.col("p_size") < 10, "small")
        .when(F.col("p_size") < 30, "medium")
        .otherwise("large")
        .alias("size_class"),
    )


ORACLE_CASE_WHEN_MAPPING = """
SELECT p_partkey, p_size,
       CASE WHEN p_size < 10 THEN 'small'
            WHEN p_size < 30 THEN 'medium'
            ELSE 'large' END AS size_class
FROM part
"""


def date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 — date-part extraction (``timestamp.hour`` /
    ``weekday()`` / ``month`` gates in ``turnstile_hardware.py:48-56``
    and ``simulation.py:67-73``). Spark's dayofweek is 1=Sunday..7;
    DuckDB's is 0=Sunday..6 — the oracle adds 1."""
    ev = load_table(spark, "events", sf_dir)
    return ev.select(
        "event_id",
        F.year("ts").alias("y"),
        F.month("ts").alias("mon"),
        F.dayofmonth("ts").alias("dom"),
        F.hour("ts").alias("h"),
        F.minute("ts").alias("mi"),
        F.dayofweek("ts").alias("dow"),
        (F.minute("ts") == 0).alias("on_the_hour"),
    )


ORACLE_DATE_PARTS = """
SELECT event_id,
       CAST(year(ts) AS INTEGER) AS y,
       CAST(month(ts) AS INTEGER) AS mon,
       CAST(day(ts) AS INTEGER) AS dom,
       CAST(hour(ts) AS INTEGER) AS h,
       CAST(minute(ts) AS INTEGER) AS mi,
       CAST(dayofweek(ts) + 1 AS INTEGER) AS dow,
       minute(ts) = 0 AS on_the_hour
FROM events
"""


def arithmetic_rounding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 — floor / round / greatest clamp, the turnstile entry
    computation (``turnstile_hardware.py:52-66``:
    ``max(floor(riders*ratio/steps) + rand, 0)``)."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.floor(F.col("l_quantity") * F.col("l_discount")).cast("long").alias("floored"),
        # half-up rounding via floor(x*100+0.5)/100: bit-identical across
        # engines (plain IEEE ops), unlike round(x, 2) whose tie-breaking
        # differs between decimal-string (Spark) and binary (DuckDB) paths
        (F.floor(F.col("l_extendedprice") * (1 + F.col("l_tax")) * 100 + 0.5) / 100).alias(
            "charged"
        ),
        F.greatest(F.col("l_quantity") - 25.0, F.lit(0.0)).alias("clamped"),
        F.least(F.col("l_discount"), F.lit(0.05)).alias("capped_disc"),
    )


ORACLE_ARITHMETIC_ROUNDING = """
SELECT l_orderkey, l_linenumber,
       CAST(FLOOR(l_quantity * l_discount) AS BIGINT) AS floored,
       FLOOR(l_extendedprice * (1 + l_tax) * 100 + 0.5) / 100 AS charged,
       GREATEST(l_quantity - 25.0, 0.0) AS clamped,
       LEAST(l_discount, 0.05) AS capped_disc
FROM lineitem
"""


def json_get(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10 — point JSON access (``json.loads`` on consumer side,
    ``consumers/models/line.py:62``): ``get_json_object`` avoids a full
    ``from_json`` when only one path is read."""
    ev = load_table(spark, "events", sf_dir)
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.missing").alias("absent"),
    )


ORACLE_JSON_GET = """
SELECT event_id,
       json_extract_string(props, '$.k') AS k_str,
       json_extract_string(props, '$.missing') AS absent
FROM events
"""


def json_map_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10 (map face, SURVEY.md §1.3) — parse the whole JSON props
    object into ``map<string,string>`` and explode to key/value rows,
    the generic form when paths are not known ahead of time (vs
    :func:`json_get`'s point access). Rolled up per key to keep the
    result small at any scale."""
    ev = load_table(spark, "events", sf_dir)
    kv = ev.select(
        "event_id",
        F.explode(F.from_json(F.col("props"), "map<string,string>")).alias("k", "v"),
    )
    return kv.groupBy("k").agg(
        F.count("*").alias("n"),
        F.round(F.avg(F.col("v").cast("double")), 5).alias("avg_val"),
    )


ORACLE_JSON_MAP_EXPLODE = """
WITH kv AS (
  SELECT event_id, unnest(json_keys(props)) AS k, props FROM events
)
SELECT k, COUNT(*) AS n,
       ROUND(AVG(CAST(json_extract_string(props, '$.' || k) AS DOUBLE)), 5)
         AS avg_val
FROM kv GROUP BY k
"""


def timestamp_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 (epoch-millis keys) — ``time_millis()`` producer keys
    (``producers/models/producer.py:68-69``) and the idiomatic
    string→timestamp upgrades for the reference's string dates
    (SURVEY.md §1.3)."""
    ev = load_table(spark, "events", sf_dir)
    return ev.select(
        "event_id",
        F.unix_millis("ts").alias("epoch_ms"),
        F.date_format("ts", "yyyy-MM-dd").alias("day_str"),
        F.to_date("ts").cast("timestamp").alias("day_ts"),
    )


ORACLE_TIMESTAMP_CONVERT = """
SELECT event_id,
       CAST(epoch_ms(ts) AS BIGINT) AS epoch_ms,
       strftime(ts, '%Y-%m-%d') AS day_str,
       CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day_ts
FROM events
"""
