"""Window functions, sorts, limits (SURVEY.md §2.6).

The reference's only window-shaped need is A2's latest-per-key (the
Faust table); ranking/analytic/frame windows are engine additions that
come free with Spark and are oracle-covered here. Every window uses a
unique ordering (tiebreak on the primary key) so results are
deterministic across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_dsnd_projects_spark.sources.catalog import load_table


def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank/row_number over orders per customer by price."""
    orders = load_table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


ORACLE_WINDOW_RANK = """
SELECT o_orderkey, o_custkey, o_totalprice,
       ROW_NUMBER() OVER w AS rn,
       RANK() OVER w AS rnk,
       DENSE_RANK() OVER w AS drnk
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
"""


def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over each user's event timeline — the building block
    for sessionization and delta features."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        "value",
        F.round(F.lag("value", 1).over(w), 2).alias("prev_value"),
        F.round(F.lead("value", 1).over(w), 2).alias("next_value"),
    )


ORACLE_WINDOW_LAG_LEAD = """
SELECT user_id, event_id, value,
       ROUND(LAG(value, 1) OVER w, 2) AS prev_value,
       ROUND(LEAD(value, 1) OVER w, 2) AS next_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) frame aggregate per key."""
    ev = load_table(spark, "events", sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w), 2).alias("running_value"),
        F.count("*").over(w).alias("running_n"),
    )


ORACLE_WINDOW_RUNNING_SUM = """
SELECT user_id, event_id,
       ROUND(SUM(value) OVER w, 2) AS running_value,
       COUNT(*) OVER w AS running_n
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


def top_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group — the scalable 'latest/N-best' pattern (window +
    filter; Catalyst pushes the rank filter into the window's sort as a
    top-K-per-partition at scale)."""
    orders = load_table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


ORACLE_TOP_K_PER_GROUP = """
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) t WHERE rn <= 3
"""


def sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sort + limit (the reference's only sort is by station
    ``order``, ``simulation.py:35-37``). Deterministic: total order via
    the unique key tiebreak. Spark plans this as TakeOrderedAndProject
    — a per-partition top-K then a K-merge, no global sort shuffle."""
    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


ORACLE_SORT_LIMIT = """
SELECT o_orderkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: a new session starts after a >30-minute gap in a
    user's events (lag + cumulative sum of gap flags). The batch
    analog of streaming ``session_window``."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts", 1).over(w))
    with_flag = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1800), F.lit(1)).otherwise(F.lit(0)),
    )
    wcum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        with_flag.withColumn("session_id", F.sum("new_session").over(wcum))
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


ORACLE_SESSIONIZE = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR date_diff('second', LAG(ts) OVER w, ts) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT user_id, ts,
         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id, COUNT(*) AS n_events,
       MIN(ts) AS session_start, MAX(ts) AS session_end
FROM sessions GROUP BY user_id, session_id
"""


def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) reconstruction: turn each
    user's event log into validity intervals — one row per state
    change, carrying valid_from/valid_to and a current-row flag. The
    warehouse primitive behind dimension history tables and
    point-in-time joins. One shuffle (the per-key window); lead()
    closes each interval with the next change's timestamp, the last
    interval stays open (valid_to NULL). Only rows where the tracked
    value actually changes survive — consecutive duplicates collapse
    via a lag() compare in the same window pass."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        changes.withColumn("valid_to", F.lead("ts").over(w2))
        .select(
            "user_id",
            F.col("event_type").alias("state"),
            F.col("ts").alias("valid_from"),
            "valid_to",
            F.col("valid_to").isNull().alias("is_current"),
        )
    )


ORACLE_SCD2_HISTORY = """
WITH ordered AS (
  SELECT user_id, ts, event_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
), changes AS (
  SELECT user_id, ts, event_id, event_type FROM ordered
  WHERE prev_type IS NULL OR prev_type <> event_type
)
SELECT user_id,
       event_type AS state,
       ts AS valid_from,
       LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
       LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         AS is_current
FROM changes
"""
