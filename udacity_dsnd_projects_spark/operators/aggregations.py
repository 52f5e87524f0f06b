"""Aggregations (SURVEY.md §2.5, A1-A4 + engine additions).

A1 is the KSQL turnstile count (``consumers/ksql.py:27-31``), A2 the
Faust latest-per-key table (``consumers/faust_stream.py:41-71``), A3
distinct station names (``producers/models/line.py:28``), A4 the
seed-CSV per-group means (``turnstile_hardware.py:25-33``). Catalyst
plans all of these as partial (map-side) + final hash aggregations, so
the shuffle carries pre-aggregated rows — exactly what you want at
100 TB. Double-valued aggregates are rounded in both faces so the
oracle hash is summation-order independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_dsnd_projects_spark.sources.catalog import load_table


def grouped_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 — the KSQL turnstile summary: ``SELECT station_id, COUNT(*)
    AS count FROM turnstile GROUP BY station_id``
    (``consumers/ksql.py:27-31``); events ≅ turnstile rows."""
    ev = load_table(spark, "events", sf_dir)
    return ev.groupBy("user_id").agg(F.count("*").alias("count"))


ORACLE_GROUPED_COUNT = """
SELECT user_id, COUNT(*) AS count FROM events GROUP BY user_id
"""


def latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 — last-write-wins table (Faust ``table[station_id] = ...``,
    ``faust_stream.py:71``; dashboard latest-train state,
    ``consumers/models/station.py:26-43``). Batch face: window
    ``row_number`` over (key, desc event-time) with a unique tiebreaker
    so the result is deterministic under any partitioning."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type", "value")
    )


ORACLE_LATEST_PER_KEY = """
SELECT user_id, event_id, ts, event_type, value
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) t WHERE rn = 1
"""


def distinct_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 — distinct value enumeration
    (``station_df["station_name"].unique()``, ``line.py:28``)."""
    ev = load_table(spark, "events", sf_dir)
    return ev.select("event_type").distinct()


ORACLE_DISTINCT_VALUES = """
SELECT DISTINCT event_type FROM events
"""


def avg_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 — mean per group (the precomputed ridership averages,
    ``turnstile_hardware.py:25-33``), plus min/max/sum for coverage."""
    orders = load_table(spark, "orders", sf_dir)
    return orders.groupBy("o_orderstatus").agg(
        F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        F.count("*").alias("n_orders"),
    )


ORACLE_AVG_PER_GROUP = """
SELECT o_orderstatus,
       ROUND(AVG(o_totalprice), 2) AS avg_price,
       ROUND(MIN(o_totalprice), 2) AS min_price,
       ROUND(MAX(o_totalprice), 2) AS max_price,
       ROUND(SUM(o_totalprice), 2) AS sum_price,
       COUNT(*) AS n_orders
FROM orders GROUP BY o_orderstatus
"""


def count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (engine addition): distinct parts and
    suppliers per return flag. Catalyst plans this as expand + two-phase
    agg; at scale prefer approx_count_distinct (below)."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
    )


ORACLE_COUNT_DISTINCT = """
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_suppkey) AS n_suppliers
FROM lineitem GROUP BY l_returnflag
"""


def approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct estimate — the 100 TB path for distinct
    counts. No oracle (estimator internals differ between engines);
    the test asserts the estimate is within rsd of the exact count."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts")
    )


def stats_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (sample stddev/variance, exact
    median/percentile) per group."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.groupBy("l_linestatus").agg(
        F.round(F.stddev("l_quantity"), 4).alias("std_qty"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("median_qty"),
        F.round(F.expr("percentile(l_quantity, 0.9)"), 4).alias("p90_qty"),
    )


ORACLE_STATS_PER_GROUP = """
SELECT l_linestatus,
       ROUND(stddev_samp(l_quantity), 4) AS std_qty,
       ROUND(var_samp(l_quantity), 4) AS var_qty,
       ROUND(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
       ROUND(quantile_cont(l_quantity, 0.9), 4) AS p90_qty
FROM lineitem GROUP BY l_linestatus
"""


def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass table profile — the observability query every
    pipeline run emits (row count, null counts, cardinalities, ranges)
    computed as ONE aggregate over ONE scan. The naive per-column loop
    runs C jobs over C scans; this is the declarative form Catalyst
    folds into a single partial+final hash aggregate."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("l_returnflag").isNull().cast("long")).alias("nulls_returnflag"),
        F.countDistinct("l_returnflag").alias("distinct_returnflag"),
        F.countDistinct("l_orderkey").alias("distinct_orderkey"),
        F.min("l_shipdate").alias("min_shipdate"),
        F.max("l_shipdate").alias("max_shipdate"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
    )


ORACLE_TABLE_PROFILE = """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS nulls_returnflag,
       COUNT(DISTINCT l_returnflag) AS distinct_returnflag,
       COUNT(DISTINCT l_orderkey) AS distinct_orderkey,
       MIN(l_shipdate) AS min_shipdate,
       MAX(l_shipdate) AS max_shipdate,
       ROUND(MIN(l_extendedprice), 2) AS min_price,
       ROUND(MAX(l_extendedprice), 2) AS max_price
FROM lineitem
"""


def quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantiles per group via ``approx_percentile``
    (Greenwald-Khanna sketch): the scale path for percentiles — exact
    ``percentile`` buffers every value per group; the sketch holds
    O(1/accuracy) per group regardless of row count, and sketches
    merge across partitions (map-side combine works). Registered
    rows-only: the sketch's answer is deterministic but engine-specific,
    so the test asserts closeness to the exact answer instead of the
    oracle asserting equality."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.groupBy("l_linestatus").agg(
        F.expr("approx_percentile(l_extendedprice, 0.5, 1000)").alias("p50"),
        F.expr("approx_percentile(l_extendedprice, 0.9, 1000)").alias("p90"),
        F.expr("approx_percentile(l_extendedprice, 0.99, 1000)").alias("p99"),
    )


def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP — hierarchical subtotals (engine addition; KSQL/Faust have
    nothing like it, but any OLAP surface needs it)."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_rows"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


ORACLE_ROLLUP_AGG = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
       ROUND(SUM(l_quantity), 2) AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE — all grouping-set combinations."""
    orders = load_table(spark, "orders", sf_dir)
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders")
    )


ORACLE_CUBE_AGG = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def pivot_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT — wide-format aggregation. Explicit pivot values so the
    plan is a single pass (no value-discovery job) — required practice
    at scale."""
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )


ORACLE_PIVOT_AGG = """
SELECT l_returnflag,
       ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS O,
       ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS F
FROM lineitem GROUP BY l_returnflag
"""


# --------------------------------------------------------------------------
# Profiling additions: fixed-width histogram + correlation panel
# --------------------------------------------------------------------------
#: Histogram bin width for order totals (dollars).
HIST_WIDTH = 50_000


def price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order totals — the profiling primitive
    behind distribution dashboards and drift checks. Binning is a pure
    projection (floor-divide), so the whole thing is one map-side-
    combined aggregation; bins, not rows, cross the shuffle."""
    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.select(
            F.floor(F.col("o_totalprice") / HIST_WIDTH).cast("long").alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bin",
            (F.col("bin") * HIST_WIDTH).cast("double").alias("bin_lo"),
            "n",
        )
    )


ORACLE_PRICE_HISTOGRAM = f"""
SELECT CAST(floor(o_totalprice / {HIST_WIDTH}) AS BIGINT) AS bin,
       CAST(floor(o_totalprice / {HIST_WIDTH}) * {HIST_WIDTH} AS DOUBLE) AS bin_lo,
       COUNT(*) AS n
FROM orders
GROUP BY 1, 2
"""


def corr_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group Pearson correlations and covariance between the
    lineitem measures — the feature-relationship profile a pipeline
    computes before modeling. All four moments aggregate in ONE pass
    over the fact (Spark and DuckDB both use the textbook sample
    estimators); only 3 group rows cross the shuffle."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 5).alias("corr_qty_price"),
        F.round(F.corr("l_extendedprice", "l_discount"), 5).alias("corr_price_disc"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 5).alias("cov_qty_disc"),
        F.count(F.lit(1)).alias("n"),
    )


ORACLE_CORR_PANEL = """
SELECT l_returnflag,
       ROUND(corr(l_quantity, l_extendedprice), 5) AS corr_qty_price,
       ROUND(corr(l_extendedprice, l_discount), 5) AS corr_price_disc,
       ROUND(covar_samp(l_quantity, l_discount), 5) AS cov_qty_disc,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
"""


def unpivot_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT — the wide→long inverse of :func:`pivot_agg`: per-
    nation customer aggregates melt into (nation, metric, value)
    rows. Uses the native ``unpivot`` operator (Spark's ``stack``
    expansion), which is a row-local projection — the melt itself
    adds NO shuffle on top of the source rollup.

    Scale shape: the rollup is one map-side-combined groupBy over
    ~nations; the unpivot multiplies that metadata-sized frame by the
    metric count inside the same stage. Metric values are cast to a
    common double type up front (unpivot requires a shared value
    type; the count is integer-exact in double)."""
    cust = load_table(spark, "customer", sf_dir)
    wide = cust.groupBy("c_nationkey").agg(
        F.round(F.sum(F.col("c_acctbal").cast("decimal(30,6)")), 2)
        .cast("double")
        .alias("total_balance"),
        F.count(F.lit(1)).cast("double").alias("n_customers"),
        F.round(F.max("c_acctbal").cast("decimal(30,6)"), 2)
        .cast("double")
        .alias("max_balance"),
    )
    return wide.unpivot(
        ["c_nationkey"],
        ["total_balance", "n_customers", "max_balance"],
        "metric",
        "value",
    )


ORACLE_UNPIVOT_AGG = """
WITH wide AS (
  SELECT c_nationkey,
         CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(30,6))), 2) AS DOUBLE)
           AS total_balance,
         CAST(COUNT(*) AS DOUBLE) AS n_customers,
         CAST(ROUND(CAST(MAX(c_acctbal) AS DECIMAL(30,6)), 2) AS DOUBLE)
           AS max_balance
  FROM customer GROUP BY c_nationkey
)
SELECT c_nationkey, 'total_balance' AS metric, total_balance AS value FROM wide
UNION ALL
SELECT c_nationkey, 'n_customers', n_customers FROM wide
UNION ALL
SELECT c_nationkey, 'max_balance', max_balance FROM wide
"""


def grouping_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS — arbitrary multi-granularity aggregation in one
    pass: (returnflag, linestatus), (returnflag), and the grand total
    together, which ROLLUP/CUBE (the fixed-lattice faces above) can't
    express when the set list is irregular. Runs through the SQL face
    deliberately: grouping sets are where the SQL surface earns its
    keep over the DataFrame builders.

    Scale shape: Spark executes all sets in a single Expand + one
    hash aggregate over the expanded rows (map-side combined; rows
    multiply by the NUMBER OF SETS, a small constant, inside the
    scan's stage — no per-set re-scan). NULL set-fillers label as
    'ALL' via COALESCE (the corpus has no NULL flags), keeping the
    output engine-comparable without relying on engine-specific
    grouping_id bit orders. Money sums follow the module's decimal
    rule.

    The DataFrame is passed as a parameterized ``spark.sql`` argument
    (no named temp view) so concurrent invocations on one
    SparkSession — e.g. two sf_dirs side by side — cannot
    cross-contaminate and nothing leaks into the session catalog."""
    li = load_table(spark, "lineitem", sf_dir)
    return spark.sql(
        """
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(30,6))), 2)
                    AS DOUBLE) AS revenue,
               COUNT(*) AS n_lines
        FROM {li}
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), ())
        """,
        li=li,
    )


ORACLE_GROUPING_SETS_AGG = """
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(30,6))), 2)
            AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


def unpivot_agg_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL twin of :func:`unpivot_agg` via the ``UNPIVOT`` clause —
    same wide rollup, melt expressed in SQL instead of the DataFrame
    ``unpivot`` builder. ``INCLUDE NULLS`` is required for exactness:
    ANSI UNPIVOT filters NULL values by default, while the DataFrame
    builder keeps them. With it, both lower to the same Expand node
    and Catalyst plans them identically (tests assert plan equality
    after normalizing expression ids); the oracle is shared. The wide
    frame is passed as a parameterized ``spark.sql`` argument — no
    session temp view."""
    cust = load_table(spark, "customer", sf_dir)
    wide = cust.groupBy("c_nationkey").agg(
        F.round(F.sum(F.col("c_acctbal").cast("decimal(30,6)")), 2)
        .cast("double")
        .alias("total_balance"),
        F.count(F.lit(1)).cast("double").alias("n_customers"),
        F.round(F.max("c_acctbal").cast("decimal(30,6)"), 2)
        .cast("double")
        .alias("max_balance"),
    )
    return spark.sql(
        """
        SELECT c_nationkey, metric, value
        FROM {w}
        UNPIVOT INCLUDE NULLS (value FOR metric IN (total_balance,
                                                    n_customers,
                                                    max_balance))
        """,
        w=wide,
    )


def grouping_sets_agg_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame twin of :func:`grouping_sets_agg` via the native
    ``DataFrame.groupingSets`` builder (Spark 4) — proves the irregular
    set list no longer NEEDS the SQL surface. Lowers to the same
    Expand + single hash aggregate as the SQL face (tests assert plan
    equality after normalizing expression ids); the oracle is shared."""
    li = load_table(spark, "lineitem", sf_dir)
    g = li.groupingSets(
        [
            [F.col("l_returnflag"), F.col("l_linestatus")],
            [F.col("l_returnflag")],
            [],
        ],
        F.col("l_returnflag"),
        F.col("l_linestatus"),
    ).agg(
        F.round(
            F.sum(F.col("l_extendedprice").cast("decimal(30,6)")), 2
        )
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    return g.select(
        F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("returnflag"),
        F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("linestatus"),
        "revenue",
        "n_lines",
    )
