"""Scale-technique tests: salted join correctness on skewed data, and a
hypothesis property check that the union-scan as-of join equals the
naive join+window formulation on arbitrary timelines."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from udacity_dsnd_projects_spark.operators.skew import salted_join


def test_salted_join_equals_plain_join_on_skewed_data(spark):
    # 90% of fact rows share one hot key
    fact = spark.range(2000).select(
        F.when(F.col("id") < 1800, F.lit(7)).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.range(50).select(F.col("id").alias("k"), (F.col("id") * 10).alias("v"))
    plain = fact.join(dim, "k").select("k", "payload", "v")
    salted = salted_join(fact, dim, "k", n_salt=8).select("k", "payload", "v")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))
    # the physical join key must include the salt
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan


def test_salted_left_join_keeps_unmatched(spark):
    fact = spark.range(10).select((F.col("id") % 3).alias("k"), F.col("id").alias("p"))
    dim = spark.createDataFrame([(0, "zero")], ["k", "name"])
    plain = fact.join(dim, "k", "left").select("k", "p", "name")
    salted = salted_join(fact, dim, "k", n_salt=4, how="left").select("k", "p", "name")
    assert sorted(map(str, salted.collect())) == sorted(map(str, plain.collect()))


_EVENT_TS = st.integers(min_value=0, max_value=50)
_ORDER_TS = st.integers(min_value=0, max_value=50)
_KEY = st.integers(min_value=0, max_value=3)


@st.composite
def _timelines(draw):
    events = draw(
        st.lists(st.tuples(_KEY, _EVENT_TS), min_size=1, max_size=12, unique=True)
    )
    orders = draw(
        st.lists(st.tuples(_KEY, _ORDER_TS), min_size=1, max_size=12, unique=True)
    )
    return events, orders


@given(_timelines())
@settings(max_examples=8, deadline=None)
def test_asof_union_scan_equals_naive(spark, data):
    """Property: the union-scan as-of join (operators.joins.join_asof
    formulation) produces exactly the naive join+window answer for any
    event/order timeline, including ties at the same timestamp (the
    order is visible to the event, <= semantics)."""
    events, orders = data
    base = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [(i, k, base + dt.timedelta(hours=t)) for i, (k, t) in enumerate(events)],
        T.StructType(
            [
                T.StructField("event_id", T.LongType()),
                T.StructField("k", T.LongType()),
                T.StructField("ts", T.TimestampType()),
            ]
        ),
    )
    orr = spark.createDataFrame(
        [(i, k, base + dt.timedelta(hours=t)) for i, (k, t) in enumerate(orders)],
        T.StructType(
            [
                T.StructField("order_id", T.LongType()),
                T.StructField("k", T.LongType()),
                T.StructField("ot", T.TimestampType()),
            ]
        ),
    )

    # naive: join + keep latest (ot, order_id) per event
    j = ev.join(orr, (ev["k"] == orr["k"]) & (orr["ot"] <= ev["ts"])).select(
        "event_id", ev["k"].alias("k"), "order_id", "ot"
    )
    w = Window.partitionBy("event_id").orderBy(F.col("ot").desc(), F.col("order_id").desc())
    naive = (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "order_id")
    )

    # union-scan (same shape as operators.joins.join_asof)
    ord_side = orr.select(
        "k", F.col("ot").alias("t"), F.lit(0).alias("is_event"),
        F.struct(F.col("ot"), F.col("order_id")).alias("o"),
    )
    ev_side = ev.select("k", F.col("ts").alias("t"), F.lit(1).alias("is_event"), "event_id")
    tl = ord_side.unionByName(ev_side, allowMissingColumns=True)
    wu = (
        Window.partitionBy("k")
        .orderBy("t", "is_event", F.col("o.order_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    scan = (
        tl.withColumn("asof", F.last("o", ignorenulls=True).over(wu))
        .filter((F.col("is_event") == 1) & F.col("asof").isNotNull())
        .select("event_id", F.col("asof.order_id").alias("order_id"))
    )
    assert sorted(map(tuple, scan.collect())) == sorted(map(tuple, naive.collect()))
