"""Set operations (SURVEY.md §2.6 — engine additions; the reference's
nearest analog is the regex fan-in of per-station arrival topics,
``consumers/server.py:76-80``, which is a union of homogeneous
sources)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_dsnd_projects_spark.sources.catalog import load_table


def union_fan_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of homogeneous per-topic streams (the arrival-topic
    fan-in) — ``unionByName`` so column order can't silently skew."""
    ev = load_table(spark, "events", sf_dir)
    a = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "event_type")
    b = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "event_type")
    return a.unionByName(b)


ORACLE_UNION_FAN_IN = """
SELECT event_id, user_id, event_type FROM events WHERE event_type = 'purchase'
UNION ALL
SELECT event_id, user_id, event_type FROM events WHERE event_type = 'error'
"""


def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): users who both purchased and hit errors."""
    ev = load_table(spark, "events", sf_dir)
    a = ev.filter(F.col("event_type") == "purchase").select("user_id")
    b = ev.filter(F.col("event_type") == "error").select("user_id")
    return a.intersect(b)


ORACLE_SET_INTERSECT = """
SELECT user_id FROM events WHERE event_type = 'purchase'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'error'
"""


def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): finished orders with no returned line items."""
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    a = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_orderkey").alias("orderkey")
    )
    b = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("orderkey")
    )
    return a.subtract(b)


ORACLE_SET_EXCEPT = """
SELECT o_orderkey AS orderkey FROM orders WHERE o_orderstatus = 'F'
EXCEPT
SELECT l_orderkey AS orderkey FROM lineitem WHERE l_returnflag = 'R'
"""
