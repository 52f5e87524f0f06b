"""Second relational batch: the remaining classic warehouse shapes
(TPC-H Q2/Q5/Q6/Q8/Q9/Q10/Q11/Q14/Q16/Q18/Q19/Q20 re-expressed
Spark-first, adapted where the corpus has no partsupp table — supply
cost/availability derive from lineitem).

Reference parity: the reference's batch face is Spark SQL over
warehouse tables (spark-data-lakes/etl.py); together with
operators/relational.py and operators/analytics.py this completes ALL
22 TPC-H query shapes: multi-dim join trees (Q5/Q8/Q9), correlated-min
supplier selection (Q2), concentration gates (Q11/Q20, relative-to-
mean so every SF is non-vacuous), disjunctive bracket predicates
(Q19), HAVING-gated per-order rollups (Q18), share-of-total ratios
(Q8/Q14), and single-pass filter aggregates (Q6). Q12's ship-mode
bucket count is adapted to order priorities (the corpus has no
shipmode column); Q2/Q11/Q16/Q20's partsupp is proxied from lineitem.

Engine-stability rules (same as operators/relational.py):
- money sums accumulate in DECIMAL(30,6), round at 2 dp in decimal,
  cast to double last (`_money_sum`);
- ratios divide two decimal-rounded doubles with identical
  association order on both engines (IEEE division of bit-identical
  operands is deterministic — no post-division rounding);
- unit prices are raw IEEE double divisions (bit-identical in both
  engines), compared exactly — never re-rounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_dsnd_projects_spark.sources.catalog import load_table
from udacity_dsnd_projects_spark.operators.relational import _money_sum

#: Q5/Q6/Q8/Q10/Q14 all window on this order/ship year (the corpus
#: spans 1995..2001; 1996 is a fully-populated year).
TRADE_YEAR_FROM = "1996-01-01"
TRADE_YEAR_TO = "1997-01-01"

#: Q16 shape: suppliers below this balance are "blocked" (the
#: complaints-subquery proxy; the corpus min balance is ~537 at the
#: smallest SF, so the blocklist is never vacuous).
BLOCKED_SUPPLIER_BAL = 1000.0

#: Q18 shape: an order is "large volume" above this total quantity
#: (99th-percentile-ish on this corpus — non-empty at every SF).
LARGE_ORDER_QTY = 200.0

#: Q19 shape: (brand, quantity bracket, size bracket) disjunction.
BRACKETS = (
    ("Brand#1", 1.0, 11.0, 1, 5),
    ("Brand#2", 10.0, 20.0, 1, 10),
    ("Brand#3", 20.0, 30.0, 1, 15),
)


def _revenue_dec(price: F.Column, discount: F.Column) -> F.Column:
    """The per-line revenue double cast to DECIMAL(30,6) — the module's
    order-independent summand."""
    return (price * (1 - discount)).cast("decimal(30,6)")


# --------------------------------------------------------------------------
# Q5 — local supplier volume
# --------------------------------------------------------------------------


def regional_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue per nation from orders where the
    customer and the line's supplier sit in the SAME nation of one
    region — the join tree that exercises a non-key equi-condition
    (c_nationkey = s_nationkey) on top of the key chain.

    Scale shape: region→nation prunes to a handful of nationkeys that
    broadcast into both the customer and supplier dims (both then
    broadcast into the fact joins — supplier is dim-sized, customer's
    pruned projection is 2 ints/row); orders is date-pruned at the
    scan (pushed filter); the only big shuffles are
    orders⋈lineitem on orderkey — unavoidable and AQE-coalesced. The
    final rollup is map-side combined over ~5 nations."""
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir).filter(
        F.col("r_name") == "ASIA"
    )
    asia_nations = nation.join(
        F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"]
    ).select("n_nationkey", "n_name")
    cust = (
        load_table(spark, "customer", sf_dir)
        .select("c_custkey", "c_nationkey")
        .join(
            F.broadcast(asia_nations),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", "c_nationkey")
    )
    orders = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit(TRADE_YEAR_FROM).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(TRADE_YEAR_TO).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    # nation name folds into the supplier dim up front (one broadcast,
    # same shape as national_market_share / min_cost_supplier)
    supp = (
        load_table(spark, "supplier", sf_dir)
        .select("s_suppkey", "s_nationkey")
        .join(
            F.broadcast(asia_nations),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    joined = (
        orders.join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(li, F.col("o_orderkey") == li["l_orderkey"])
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == supp["s_suppkey"])
            & (F.col("c_nationkey") == supp["s_nationkey"]),
        )
    )
    return joined.groupBy("n_name").agg(
        _money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "revenue"
        )
    )


ORACLE_REGIONAL_SUPPLIER_VOLUME = f"""
SELECT n_name,
       CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(30,6))), 2) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '{TRADE_YEAR_FROM} 00:00:00'
  AND o_orderdate <  TIMESTAMP '{TRADE_YEAR_TO} 00:00:00'
GROUP BY n_name
"""


# --------------------------------------------------------------------------
# Q6 — forecast revenue change
# --------------------------------------------------------------------------


def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the revenue increase from eliminating a
    discount band — a pure scan-filter-aggregate with no join at all.

    Scale shape: this is the query predicate pushdown exists for —
    the date/discount/quantity conjunction reaches the parquet scan
    (plan-asserted in tests/test_round5d_ops.py), only 4 columns are
    read, and the single global sum is one map-side partial per
    partition plus a 1-row reduce. Discount literals compare exactly:
    0.05/0.07 parse to the same IEEE doubles in both engines."""
    li = load_table(spark, "lineitem", sf_dir)
    filtered = li.filter(
        (F.col("l_shipdate") >= F.lit(TRADE_YEAR_FROM).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(TRADE_YEAR_TO).cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return filtered.agg(
        F.count(F.lit(1)).alias("n_lines"),
        _money_sum(F.col("l_extendedprice") * F.col("l_discount")).alias(
            "revenue_delta"
        ),
    )


ORACLE_FORECAST_REVENUE = f"""
SELECT COUNT(*) AS n_lines,
       CAST(ROUND(SUM(CAST(l_extendedprice * l_discount
                           AS DECIMAL(30,6))), 2) AS DOUBLE) AS revenue_delta
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{TRADE_YEAR_FROM} 00:00:00'
  AND l_shipdate <  TIMESTAMP '{TRADE_YEAR_TO} 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


# --------------------------------------------------------------------------
# Q8 — national market share
# --------------------------------------------------------------------------


def national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's revenue in one
    part segment, per order year — the share-of-total ratio computed
    inside a single grouped aggregate (sum-of-case over sum), never as
    a self-join.

    Scale shape: part (type-pruned) and supplier⋈nation both
    broadcast; customer's pruned (custkey, nationkey in AMERICA)
    projection broadcasts into orders; the fact shuffles once on
    orderkey. The ratio divides the two decimal-rounded sums AS
    DOUBLES in identical association order — IEEE division of
    bit-identical operands, deterministic on both engines."""
    part = load_table(spark, "part", sf_dir).filter(
        F.col("p_type") == "STANDARD"
    ).select("p_partkey")
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir).filter(
        F.col("r_name") == "AMERICA"
    )
    america = nation.join(
        F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"]
    ).select(F.col("n_nationkey").alias("__am_nk"))
    cust = (
        load_table(spark, "customer", sf_dir)
        .select("c_custkey", "c_nationkey")
        .join(F.broadcast(america), F.col("c_nationkey") == F.col("__am_nk"))
        .select("c_custkey")
    )
    supp = (
        load_table(spark, "supplier", sf_dir)
        .select("s_suppkey", "s_nationkey")
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == nation["n_nationkey"],
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    joined = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
    )
    rev = _revenue_dec(F.col("l_extendedprice"), F.col("l_discount"))
    shares = joined.groupBy(
        F.year("o_orderdate").alias("order_year")
    ).agg(
        F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_1", rev)), 2
        ).alias("__num"),
        F.round(F.sum(rev), 2).alias("__den"),
    )
    return shares.select(
        "order_year",
        (
            F.coalesce(F.col("__num"), F.lit(0)).cast("double")
            / F.col("__den").cast("double")
        ).alias("mkt_share"),
    )


ORACLE_NATIONAL_MARKET_SHARE = """
WITH joined AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
         CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6)) AS rev,
         sn.n_name AS supp_nation
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN region   ON cn.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  WHERE p_type = 'STANDARD' AND r_name = 'AMERICA'
)
SELECT order_year,
       CAST(COALESCE(ROUND(SUM(CASE WHEN supp_nation = 'NATION_1'
                                    THEN rev END), 2), 0) AS DOUBLE)
       / CAST(ROUND(SUM(rev), 2) AS DOUBLE) AS mkt_share
FROM joined GROUP BY order_year
"""


# --------------------------------------------------------------------------
# Q9 — product-type profit (supply cost proxied from retail price)
# --------------------------------------------------------------------------


def product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per supplier nation per year over one
    part family. The corpus has no partsupp, so unit cost is proxied
    as 10% of the part's retail price — same join tree, same rollup.

    Scale shape: the p_name LIKE prune happens on the part dim and
    broadcasts (key + retailprice); supplier⋈nation broadcasts; the
    fact shuffles once on orderkey for the date source. The profit
    double is computed with IDENTICAL association order in both
    engines before the decimal cast."""
    part = load_table(spark, "part", sf_dir).filter(
        F.col("p_name").like("%widget%")
    ).select("p_partkey", "p_retailprice")
    nation = load_table(spark, "nation", sf_dir)
    supp = (
        load_table(spark, "supplier", sf_dir)
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == nation["n_nationkey"],
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderdate"
    )
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
    )
    joined = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
    )
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.1) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return joined.groupBy(
        "supp_nation", F.year("o_orderdate").alias("order_year")
    ).agg(_money_sum(profit).alias("profit"))


ORACLE_PRODUCT_PROFIT = """
SELECT n_name AS supp_nation,
       CAST(year(o_orderdate) AS INTEGER) AS order_year,
       CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                           - 0.1 * p_retailprice * l_quantity
                           AS DECIMAL(30,6))), 2) AS DOUBLE) AS profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, year(o_orderdate)
"""


# --------------------------------------------------------------------------
# Q10 — returned-item reporting (top-20 by lost revenue)
# --------------------------------------------------------------------------


def returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: the 20 customers who returned the most revenue
    in a two-quarter window — join tree + rollup + deterministic
    top-k (ordered on the DECIMAL total with custkey as tie-break, so
    the boundary row is engine-stable even under revenue ties).

    Scale shape: orders is date-pruned at the scan; the
    returnflag filter prunes lineitem at the scan; the per-customer
    rollup shuffles on custkey (high cardinality); customer and
    nation names attach by broadcast AFTER the rollup, on the
    already-aggregated frame; the top-20 is a TakeOrdered (no global
    sort materialization)."""
    orders = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit(TRADE_YEAR_FROM).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(TRADE_YEAR_TO).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = load_table(spark, "lineitem", sf_dir).filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    per_cust = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_custkey")
        .agg(
            F.round(
                F.sum(_revenue_dec(F.col("l_extendedprice"), F.col("l_discount"))),
                2,
            ).alias("__rev_dec")
        )
    )
    cust = load_table(spark, "customer", sf_dir).select(
        "c_custkey", "c_name", "c_nationkey"
    )
    nation = load_table(spark, "nation", sf_dir).select(
        "n_nationkey", "n_name"
    )
    return (
        per_cust.orderBy(F.col("__rev_dec").desc(), F.col("o_custkey"))
        .limit(20)
        .join(F.broadcast(cust), F.col("o_custkey") == cust["c_custkey"])
        .join(
            F.broadcast(nation),
            cust["c_nationkey"] == nation["n_nationkey"],
        )
        .select(
            "c_custkey",
            "c_name",
            F.col("n_name").alias("nation"),
            F.col("__rev_dec").cast("double").alias("lost_revenue"),
        )
    )


ORACLE_RETURNED_ITEM_CUSTOMERS = f"""
WITH per_cust AS (
  SELECT o_custkey,
         ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                        AS DECIMAL(30,6))), 2) AS rev_dec
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '{TRADE_YEAR_FROM} 00:00:00'
    AND o_orderdate <  TIMESTAMP '{TRADE_YEAR_TO} 00:00:00'
  GROUP BY o_custkey
), top20 AS (
  SELECT * FROM per_cust ORDER BY rev_dec DESC, o_custkey LIMIT 20
)
SELECT c_custkey, c_name, n_name AS nation,
       CAST(rev_dec AS DOUBLE) AS lost_revenue
FROM top20
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
"""


# --------------------------------------------------------------------------
# Q14 — promotion revenue share per month
# --------------------------------------------------------------------------


def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: the percentage of each month's revenue coming
    from promotional parts — sum-of-case over sum, grouped by ship
    month within one year.

    Scale shape: part broadcasts (key + one flag column precomputed
    so the CASE compares a boolean, not a string, in the hot
    aggregate); lineitem is date-pruned at the scan and never
    shuffles except for the 12-group rollup (map-side combined). The
    percentage divides decimal-rounded doubles in identical
    association order on both engines."""
    part = load_table(spark, "part", sf_dir).select(
        "p_partkey", (F.col("p_type") == "PROMO").alias("__is_promo")
    )
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit(TRADE_YEAR_FROM).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(TRADE_YEAR_TO).cast("timestamp"))
    ).select("l_partkey", "l_shipdate", "l_extendedprice", "l_discount")
    rev = _revenue_dec(F.col("l_extendedprice"), F.col("l_discount"))
    monthly = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy(F.month("l_shipdate").alias("ship_month"))
        .agg(
            F.round(F.sum(F.when(F.col("__is_promo"), rev)), 2).alias("__promo"),
            F.round(F.sum(rev), 2).alias("__total"),
        )
    )
    return monthly.select(
        "ship_month",
        (
            F.lit(100.0) * F.coalesce(F.col("__promo"), F.lit(0)).cast("double")
            / F.col("__total").cast("double")
        ).alias("promo_pct"),
    )


ORACLE_PROMO_REVENUE_SHARE = f"""
WITH joined AS (
  SELECT CAST(month(l_shipdate) AS INTEGER) AS ship_month,
         CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6)) AS rev,
         p_type = 'PROMO' AS is_promo
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '{TRADE_YEAR_FROM} 00:00:00'
    AND l_shipdate <  TIMESTAMP '{TRADE_YEAR_TO} 00:00:00'
)
SELECT ship_month,
       100.0 * CAST(COALESCE(ROUND(SUM(CASE WHEN is_promo THEN rev END), 2),
                             0) AS DOUBLE)
             / CAST(ROUND(SUM(rev), 2) AS DOUBLE) AS promo_pct
FROM joined GROUP BY ship_month
"""


# --------------------------------------------------------------------------
# Q16 — supplier diversity per part segment
# --------------------------------------------------------------------------


def part_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers serve each
    (brand, type, size) segment, excluding one brand/type and a
    supplier blocklist (account balance below
    :data:`BLOCKED_SUPPLIER_BAL` proxies the original's complaints
    subquery — non-vacuous at every SF of this corpus). The
    part-supplier relation derives from lineitem since the corpus has
    no partsupp.

    Scale shape: the (partkey, suppkey) distinct is the one real
    shuffle (high-cardinality composite key, map-side partial
    distinct); the blocklist is a broadcast LEFT ANTI; part
    attributes broadcast; the final countDistinct per segment
    shuffles segment-count rows only."""
    part = load_table(spark, "part", sf_dir).filter(
        (F.col("p_brand") != "Brand#9") & (F.col("p_type") != "PROMO")
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    blocked = load_table(spark, "supplier", sf_dir).filter(
        F.col("s_acctbal") < BLOCKED_SUPPLIER_BAL
    ).select("s_suppkey")
    rel = (
        load_table(spark, "lineitem", sf_dir)
        .select("l_partkey", "l_suppkey")
        .distinct()
        .join(
            F.broadcast(blocked),
            F.col("l_suppkey") == blocked["s_suppkey"],
            "left_anti",
        )
    )
    return (
        rel.join(F.broadcast(part), rel["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


ORACLE_PART_SUPPLIER_DIVERSITY = f"""
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) rel
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#9' AND p_type <> 'PROMO'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                        WHERE s_acctbal < {BLOCKED_SUPPLIER_BAL})
GROUP BY p_brand, p_type, p_size
"""


# --------------------------------------------------------------------------
# Q18 — large-volume orders
# --------------------------------------------------------------------------


def large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity clears a HAVING
    threshold, reported with their customer — the per-order rollup
    that gates a join (the original's IN (GROUP BY ... HAVING)
    becomes aggregate-then-join).

    Scale shape: the per-order sum shuffles lineitem once on
    orderkey; the HAVING filter prunes to a tiny survivor set BEFORE
    any join, so orders and customer both attach to the survivors
    (AQE turns those into broadcasts at runtime). Quantities are
    small integers in double — their sums are exact in IEEE double,
    no decimal detour needed."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_quantity"
    )
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > LARGE_ORDER_QTY)
    )
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = load_table(spark, "customer", sf_dir).select(
        "c_custkey", "c_name"
    )
    return (
        big.join(orders, big["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "total_qty",
        )
    )


ORACLE_LARGE_VOLUME_ORDERS = f"""
WITH big AS (
  SELECT l_orderkey, SUM(l_quantity) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(l_quantity) > {LARGE_ORDER_QTY}
)
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
FROM big
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


# --------------------------------------------------------------------------
# Q19 — disjunctive bracket revenue
# --------------------------------------------------------------------------


def bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue from three (brand, quantity-range,
    size-range) brackets OR-ed together — the disjunctive multi-table
    predicate that defeats naive single-range pushdown but still
    broadcasts cleanly.

    Scale shape: part broadcasts with only the 3 predicate columns;
    the OR-of-ANDs evaluates post-join inside whole-stage codegen;
    lineitem never shuffles (single global aggregate, map-side
    partials)."""
    part = load_table(spark, "part", sf_dir).select(
        "p_partkey", "p_brand", "p_size"
    )
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    joined = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    cond = None
    for brand, qlo, qhi, slo, shi in BRACKETS:
        c = (
            (F.col("p_brand") == brand)
            & (F.col("l_quantity") >= qlo)
            & (F.col("l_quantity") <= qhi)
            & (F.col("p_size") >= slo)
            & (F.col("p_size") <= shi)
        )
        cond = c if cond is None else (cond | c)
    return joined.filter(cond).agg(
        F.count(F.lit(1)).alias("n_lines"),
        _money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "revenue"
        ),
    )


def _bracket_sql() -> str:
    clauses = [
        f"(p_brand = '{b}' AND l_quantity BETWEEN {qlo} AND {qhi}"
        f" AND p_size BETWEEN {slo} AND {shi})"
        for b, qlo, qhi, slo, shi in BRACKETS
    ]
    return " OR ".join(clauses)


ORACLE_BRACKET_REVENUE = f"""
SELECT COUNT(*) AS n_lines,
       CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(30,6))), 2) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE {_bracket_sql()}
"""


# --------------------------------------------------------------------------
# Q2 — minimum-cost supplier per part
# --------------------------------------------------------------------------


def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each part in one segment, the European
    supplier(s) offering it at the minimum unit cost — the correlated
    MIN subquery decorrelated into a window-min + exact-equality
    filter. Unit cost derives from lineitem (min observed
    extendedprice/quantity per part-supplier pair) since the corpus
    has no partsupp.

    Scale shape: the part prune broadcasts; the (part, supplier)
    cost table aggregates on a high-cardinality composite key; the
    per-part window-min partitions on partkey (high cardinality — no
    funnel); European suppliers broadcast. Unit prices are raw IEEE
    double divisions, bit-identical in both engines, so the min and
    the equality filter are exact."""
    part = load_table(spark, "part", sf_dir).filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") <= 10)
    ).select("p_partkey")
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir).filter(
        F.col("r_name") == "EUROPE"
    )
    euro_nations = nation.join(
        F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"]
    ).select("n_nationkey", "n_name")
    supp = (
        load_table(spark, "supplier", sf_dir)
        .join(
            F.broadcast(euro_nations),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", F.col("n_name").alias("supp_nation"))
    )
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_partkey",
        "l_suppkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("__unit"),
    )
    costs = (
        li.join(F.broadcast(part), F.col("l_partkey") == part["p_partkey"])
        .join(F.broadcast(supp), F.col("l_suppkey") == supp["s_suppkey"])
        .groupBy("l_partkey", "l_suppkey", "s_name", "supp_nation")
        .agg(F.min("__unit").alias("supply_cost"))
    )
    w = Window.partitionBy("l_partkey")
    return (
        costs.withColumn("__min_cost", F.min("supply_cost").over(w))
        .filter(F.col("supply_cost") == F.col("__min_cost"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("l_suppkey").alias("s_suppkey"),
            "s_name",
            "supp_nation",
            "supply_cost",
        )
    )


ORACLE_MIN_COST_SUPPLIER = """
WITH costs AS (
  SELECT l_partkey, l_suppkey, s_name, n_name AS supp_nation,
         MIN(l_extendedprice / l_quantity) AS supply_cost
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE p_type = 'LARGE' AND p_size <= 10 AND r_name = 'EUROPE'
  GROUP BY l_partkey, l_suppkey, s_name, n_name
)
SELECT l_partkey AS p_partkey, l_suppkey AS s_suppkey, s_name,
       supp_nation, supply_cost
FROM costs
QUALIFY supply_cost = MIN(supply_cost) OVER (PARTITION BY l_partkey)
"""


# --------------------------------------------------------------------------
# Q11 — important inventory value (partsupp proxied from lineitem)
# --------------------------------------------------------------------------

#: Q11/Q20 shape: concentration gate — a part (Q11) or a supplier's
#: share of a part (Q20) is "outsized" above this multiple of the
#: uniform expectation. Relative-to-mean, so the gate survives scale
#: dilution (a fixed absolute fraction empties as row counts grow).
CONCENTRATION_MULT = 2

#: The nation both concentration queries focus on (has suppliers at
#: every SF of this corpus; the smallest SF populates only a subset
#: of the 25 nations).
CONCENTRATION_NATION = "NATION_3"


def important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: the parts representing an outsized share of
    one nation's traded value — per-part value rollup gated by a
    scalar subquery over the SAME rollup (HAVING value > mult ×
    mean value). Traded value proxies the original's partsupp stock
    value as sum(extendedprice) over the nation's lineitems; the
    gate is relative to the mean so it stays non-vacuous at every SF.

    Scale shape: the nation's supplier list broadcasts into the fact
    scan; the per-part rollup shuffles once on partkey; the grand
    total AND part count come from a 1-row aggregate OVER THE ROLLUP
    (part-cardinality input) broadcast back as a cross join — the
    fact table is scanned exactly once. The gate cross-multiplies in
    DECIMAL (value·count > mult·total — no float division, no
    boundary)."""
    nation = load_table(spark, "nation", sf_dir).filter(
        F.col("n_name") == CONCENTRATION_NATION
    )
    supp = (
        load_table(spark, "supplier", sf_dir)
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == nation["n_nationkey"],
        )
        .select("s_suppkey")
    )
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    per_part = (
        li.join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .groupBy("l_partkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(30,6)")), 2
            ).alias("__val_dec")
        )
    )
    total = per_part.agg(
        F.sum("__val_dec").alias("__total_dec"),
        F.count(F.lit(1)).alias("__n_parts"),
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(
            F.col("__val_dec") * F.col("__n_parts")
            > F.lit(CONCENTRATION_MULT) * F.col("__total_dec")
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("__val_dec").cast("double").alias("traded_value"),
        )
    )


ORACLE_IMPORTANT_PART_VALUE = f"""
WITH per_part AS (
  SELECT l_partkey,
         ROUND(SUM(CAST(l_extendedprice AS DECIMAL(30,6))), 2) AS val_dec
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = '{CONCENTRATION_NATION}'
  GROUP BY l_partkey
)
SELECT l_partkey AS p_partkey, CAST(val_dec AS DOUBLE) AS traded_value
FROM per_part, (SELECT SUM(val_dec) AS total_dec, COUNT(*) AS n_parts
                FROM per_part) t
WHERE val_dec * n_parts > {CONCENTRATION_MULT} * total_dec
"""


# --------------------------------------------------------------------------
# Q20 — dominant-volume suppliers (partsupp availability proxied)
# --------------------------------------------------------------------------

def dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers in one nation who shipped an
    outsized share of some red part's volume (more than
    :data:`CONCENTRATION_MULT` × the uniform per-supplier share) —
    the nested IN (... IN (...)) chain decorrelated into two rollups
    and a semi-join, reported as distinct suppliers.

    Scale shape: part prunes on the name prefix and broadcasts; the
    per-part totals roll up from the already-aggregated per-(part,
    supplier) frame (sum-of-sums is exact for integer-valued
    quantities, and the supplier count is a plain row count since
    that frame holds one row per pair), so both join branches share
    ONE per-pair shuffle subtree — AQE's ReusedExchange executes the
    fact scan and its wide exchange once at runtime (plan-asserted);
    quantities and supplier counts are small integers in double, so
    sums and the cross-multiplied share gate (sup_qty·n_suppliers >
    mult·total_qty) are exact — no division; the nation filter
    broadcasts and the final semi-join runs over the tiny dominant
    set."""
    part = load_table(spark, "part", sf_dir).filter(
        F.col("p_name").like("red%")
    ).select("p_partkey")
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_partkey", "l_suppkey", "l_quantity"
    ).join(F.broadcast(part), F.col("l_partkey") == part["p_partkey"])
    per_ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("__sup_qty")
    )
    per_part = per_ps.groupBy(per_ps["l_partkey"].alias("__pk")).agg(
        F.sum("__sup_qty").alias("__tot_qty"),
        F.count(F.lit(1)).alias("__n_sup"),
    )
    dominant = per_ps.join(
        per_part, per_ps["l_partkey"] == F.col("__pk")
    ).filter(
        F.col("__sup_qty") * F.col("__n_sup")
        > F.lit(CONCENTRATION_MULT) * F.col("__tot_qty")
    )
    nation = load_table(spark, "nation", sf_dir).filter(
        F.col("n_name") == CONCENTRATION_NATION
    )
    supp = (
        load_table(spark, "supplier", sf_dir)
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == nation["n_nationkey"],
        )
        .select("s_suppkey", "s_name")
    )
    return (
        supp.join(
            dominant,
            supp["s_suppkey"] == dominant["l_suppkey"],
            "left_semi",
        )
        .select("s_suppkey", "s_name")
    )


ORACLE_DOMINANT_PART_SUPPLIERS = f"""
WITH red AS (
  SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
), per_ps AS (
  SELECT l_partkey, l_suppkey, SUM(l_quantity) AS sup_qty
  FROM lineitem JOIN red ON l_partkey = p_partkey
  GROUP BY l_partkey, l_suppkey
), per_part AS (
  SELECT l_partkey, SUM(l_quantity) AS tot_qty,
         COUNT(DISTINCT l_suppkey) AS n_sup
  FROM lineitem JOIN red ON l_partkey = p_partkey
  GROUP BY l_partkey
), dominant AS (
  SELECT DISTINCT l_suppkey
  FROM per_ps JOIN per_part USING (l_partkey)
  WHERE sup_qty * n_sup > {CONCENTRATION_MULT} * tot_qty
)
SELECT s_suppkey, s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = '{CONCENTRATION_NATION}'
  AND s_suppkey IN (SELECT l_suppkey FROM dominant)
"""
