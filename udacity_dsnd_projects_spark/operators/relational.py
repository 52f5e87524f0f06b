"""Classic warehouse query shapes the other headline queries don't
exercise: outer-join distributions, scalar-subquery gates, aggregate
self-joins, global-argmax with ties, and per-group existential
counting (TPC-H Q13/Q22/Q17/Q15/Q21 shapes re-expressed Spark-first).

Reference parity: the reference's batch face is Spark SQL over
warehouse tables (spark-data-lakes/etl.py, spark-streaming-pipeline
KSQL CTAS aggregates); these are the canonical relational forms that a
user of such a warehouse runs daily. Each query here is the
decorrelated DataFrame plan Catalyst would produce from the SQL —
scalar subqueries become 1-row broadcast cross joins, EXISTS becomes
left-semi, NOT EXISTS becomes left-anti, correlated per-group
averages become aggregate-then-join.

Engine-stability note: every money-sum accumulates in DECIMAL and is
rounded in DECIMAL before the final double cast (the
``nation_trade_volume`` rule — rounding the double diverges across
engines on .xx5 totals).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_dsnd_projects_spark.sources.catalog import load_table

#: A line is "late" when it ships this many days after the order date
#: (same rule as operators/analytics.py::late_order_priorities).
LATE_SHIP_DAYS = 90

#: Q15-shape revenue window (half a year keeps the supplier set dense
#: at small SF while still pruning the scan).
TOP_SUPP_FROM = "1996-01-01"
TOP_SUPP_TO = "1996-07-01"

#: Q17-shape quantity threshold fraction of the per-part mean.
SMALL_QTY_FRACTION = 0.5

#: Q22-shape idleness cutoff: a customer is idle when they placed no
#: order on/after this date (the corpus spans 1995..2001).
IDLE_CUTOFF = "2000-01-01"


def _money_sum(col: F.Column) -> F.Column:
    """Order-independent, engine-identical money aggregation: cast the
    per-row double to DECIMAL(30,6) (exact same rounding in Spark and
    DuckDB for the same input double), sum in decimal (associative —
    no float-ordering divergence), round HALF_UP at 2 dp in decimal,
    only then cast to double."""
    return F.round(F.sum(col.cast("decimal(30,6)")), 2).cast("double")


def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: how many customers placed exactly N qualifying
    orders — including N = 0, which is why the join must be LEFT OUTER
    (an inner join silently drops the zero-order customers that the
    distribution exists to surface).

    Scale shape: the outer join shuffles on custkey (high
    cardinality); the first rollup is per-customer (again custkey —
    fully parallel); the second rollup reduces to at most a few dozen
    distinct order counts, metadata-sized. Counting ``o_orderkey``
    (not ``*``) after an outer join is the standard trick: unmatched
    rows contribute NULL and therefore count 0."""
    cust = load_table(spark, "customer", sf_dir).select("c_custkey")
    orders = load_table(spark, "orders", sf_dir).filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


ORACLE_CUSTOMER_ORDER_DISTRIBUTION = """
WITH per_cust AS (
  SELECT c_custkey, COUNT(o_orderkey) AS n_orders
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey
                  AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
SELECT n_orders, COUNT(*) AS n_customers
FROM per_cust GROUP BY n_orders
"""


def idle_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: per market segment, the count and total
    balance of customers who hold an above-average positive balance
    yet placed no RECENT orders (none since :data:`IDLE_CUTOFF` — on
    this corpus every customer has SOME order, so the literal
    no-orders-ever form is vacuously empty; the recency-scoped NOT
    EXISTS is also what a real churn query asks) — the
    scalar-subquery + NOT EXISTS pair.

    Scale shape: the global average is a 1-row aggregate broadcast
    back as a cross join (never a partition-less window); the NOT
    EXISTS is a LEFT ANTI join on custkey against the date-pruned
    orders scan, which Spark executes without materializing the
    non-matches; the final rollup is map-side combined over the
    handful of segments."""
    cust = load_table(spark, "customer", sf_dir)
    orders = (
        load_table(spark, "orders", sf_dir)
        .filter(F.col("o_orderdate") >= F.lit(IDLE_CUTOFF).cast("timestamp"))
        .select("o_custkey")
    )
    # The above-average gate compares EXACTLY, per the module's
    # engine-identical rule: acctbal > sum/cnt is evaluated as
    # acctbal·cnt > sum with both sides in DECIMAL (float AVG is
    # summation-order-dependent — a boundary customer could flip
    # between engines; cross-multiplying never divides at all).
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.sum(F.col("c_acctbal").cast("decimal(30,6)")).alias("__bal_sum"),
        F.count(F.lit(1)).alias("__bal_cnt"),
    )
    rich = cust.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal").cast("decimal(30,6)") * F.col("__bal_cnt")
        > F.col("__bal_sum")
    )
    idle = rich.join(orders, rich["c_custkey"] == orders["o_custkey"], "left_anti")
    return idle.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        _money_sum(F.col("c_acctbal")).alias("total_balance"),
    )


ORACLE_IDLE_CUSTOMER_BALANCE = f"""
SELECT c_mktsegment, COUNT(*) AS n_customers,
       CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(30,6))), 2) AS DOUBLE)
         AS total_balance
FROM customer c
WHERE CAST(c_acctbal AS DECIMAL(30,6))
      * (SELECT COUNT(*) FROM customer WHERE c_acctbal > 0)
      > (SELECT SUM(CAST(c_acctbal AS DECIMAL(30,6)))
         FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '{IDLE_CUTOFF} 00:00:00')
GROUP BY c_mktsegment
"""


def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: yearly revenue lost to small one-off orders —
    lines whose quantity is below half the part's average quantity,
    for one brand. The correlated per-part AVG decorrelates into an
    aggregate-then-join.

    Scale shape: the brand filter prunes the part dim FIRST and that
    small key list broadcasts into both lineitem passes, so the fact
    table is scanned but never shuffled on partkey for the avg (the
    rollup keys are the pruned part set); the per-part averages are
    exact (quantities are small integers in double — integer sums are
    exact in IEEE double, so avg is engine-identical)."""
    part = load_table(spark, "part", sf_dir).filter(
        F.col("p_brand") == "Brand#4"
    ).select("p_partkey")
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    brand_lines = li.join(
        F.broadcast(part), li["l_partkey"] == part["p_partkey"]
    )
    per_part = brand_lines.groupBy("l_partkey").agg(
        F.avg("l_quantity").alias("__avg_qty")
    )
    small = brand_lines.join(F.broadcast(per_part), "l_partkey").filter(
        F.col("l_quantity") < F.lit(SMALL_QTY_FRACTION) * F.col("__avg_qty")
    )
    return small.agg(
        F.count(F.lit(1)).alias("n_lines"),
        (_money_sum(F.col("l_extendedprice")) / F.lit(7.0)).alias("avg_yearly"),
    )


ORACLE_SMALL_QUANTITY_REVENUE = f"""
WITH brand_lines AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#4'
), per_part AS (
  SELECT l_partkey, AVG(l_quantity) AS avg_qty
  FROM brand_lines GROUP BY l_partkey
)
SELECT COUNT(*) AS n_lines,
       CAST(ROUND(SUM(CAST(b.l_extendedprice AS DECIMAL(30,6))), 2) AS DOUBLE)
         / 7.0 AS avg_yearly
FROM brand_lines b JOIN per_part p ON b.l_partkey = p.l_partkey
WHERE b.l_quantity < {SMALL_QTY_FRACTION} * p.avg_qty
"""


def top_revenue_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) achieving the MAXIMUM revenue
    in a shipping window — global argmax with ties preserved (the
    original's view + WHERE total = (SELECT MAX...) form).

    Scale shape: per-supplier revenue is one map-side-combined rollup
    over the date-pruned scan; the max is a 1-row broadcast cross
    join; the tie-preserving equality compares the DECIMAL(30,2)
    totals (exact — comparing re-cast doubles would make tie
    detection depend on float formatting). Supplier names attach via
    a broadcast dim join at the very end, on the (tiny) winner set."""
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit(TOP_SUPP_FROM).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(TOP_SUPP_TO).cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.round(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(30,6)"
                )
            ),
            2,
        ).alias("__rev_dec")
    )
    top = rev.crossJoin(
        F.broadcast(rev.agg(F.max("__rev_dec").alias("__max_rev")))
    ).filter(F.col("__rev_dec") == F.col("__max_rev"))
    supp = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_name")
    return top.join(
        F.broadcast(supp), top["l_suppkey"] == supp["s_suppkey"]
    ).select(
        "s_suppkey",
        "s_name",
        F.col("__rev_dec").cast("double").alias("total_revenue"),
    )


ORACLE_TOP_REVENUE_SUPPLIERS = f"""
WITH rev AS (
  SELECT l_suppkey,
         ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                        AS DECIMAL(30,6))), 2) AS rev_dec
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{TOP_SUPP_FROM} 00:00:00'
    AND l_shipdate <  TIMESTAMP '{TOP_SUPP_TO} 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(rev_dec AS DOUBLE) AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE rev_dec = (SELECT MAX(rev_dec) FROM rev)
"""


def lone_late_supplier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who single-handedly held up
    multi-supplier orders — for each order with at least two distinct
    suppliers where EXACTLY ONE supplier shipped late, charge that
    supplier. The original expresses this as EXISTS + NOT EXISTS over
    correlated lineitem scans; per-order aggregation computes the
    same predicate in ONE pass over the fact table.

    Scale shape: one join of lineitem to orders on orderkey (both
    sides shuffle on the high-cardinality key; AQE broadcasts orders
    when pruned small), then a single per-order groupBy computing
    distinct-supplier and late-supplier counts together —
    ``max(when(late, suppkey))`` recovers the culprit key without a
    second scan precisely because the filter pins n_late = 1. The
    final per-supplier rollup is map-side combined over the supplier
    dim's cardinality."""
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderdate"
    )
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    joined = li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        f"INTERVAL {LATE_SHIP_DAYS} DAYS"
    )
    per_order = joined.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("__n_sups"),
        F.countDistinct(F.when(late, F.col("l_suppkey"))).alias("__n_late"),
        F.max(F.when(late, F.col("l_suppkey"))).alias("__late_sup"),
    )
    blamed = per_order.filter(
        (F.col("__n_sups") >= 2) & (F.col("__n_late") == 1)
    )
    supp = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_name")
    return (
        blamed.groupBy("__late_sup")
        .agg(F.count(F.lit(1)).alias("n_held_orders"))
        .join(F.broadcast(supp), F.col("__late_sup") == supp["s_suppkey"])
        .select("s_suppkey", "s_name", "n_held_orders")
    )


ORACLE_LONE_LATE_SUPPLIER_ORDERS = f"""
WITH per_order AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS n_sups,
         COUNT(DISTINCT CASE WHEN l_shipdate >
                 o_orderdate + INTERVAL {LATE_SHIP_DAYS} DAY
               THEN l_suppkey END) AS n_late,
         MAX(CASE WHEN l_shipdate >
                 o_orderdate + INTERVAL {LATE_SHIP_DAYS} DAY
             THEN l_suppkey END) AS late_sup
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY l_orderkey
)
SELECT s_suppkey, s_name, COUNT(*) AS n_held_orders
FROM per_order JOIN supplier ON late_sup = s_suppkey
WHERE n_sups >= 2 AND n_late = 1
GROUP BY s_suppkey, s_name
"""
