"""Joins (SURVEY.md §2.4, J1-J3 + engine additions).

The reference has three join shapes: the stream-stream inner equi-join
(``sparkpykafkajoin.py:128-130``), key-lookup joins to tiny dimensions
(``turnstile_hardware.py:22-33``) and stream-to-table enrichment
(``consumers/models/line.py:48-55``). The engine exposes the full join
algebra on top (left/semi/anti/full/cross + an as-of join composition)
since Spark gives them for free and SURVEY.md §2.4 flags them for
oracle coverage.

Scale notes: dimensions (customer/part/nation/region/supplier) are
broadcast — no shuffle of the fact side; the fact-fact joins rely on
AQE for skew handling. The as-of join is the one operator Spark lacks
natively: implemented as a union-scan (sort each key's timeline once,
carry the latest left-side row forward with last(ignorenulls)) — one
shuffle, no pair materialization; see join_asof.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_dsnd_projects_spark.sources.catalog import load_table


def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 — key-lookup join to a small dimension, batch face of the
    ridership-seed lookup (``turnstile_hardware.py:22-33``). Broadcast
    hash join: the fact side never shuffles."""
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


ORACLE_JOIN_BROADCAST_DIM = """
SELECT p_brand,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


def join_enrichment_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 — stream-to-table enrichment (dashboard joining events to the
    station dimension, ``line.py:48-55``), extended to a snowflake
    chain: events → customer → nation → region. All three dims
    broadcast; one scan of the fact."""
    ev = load_table(spark, "events", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir)
    return (
        ev.join(F.broadcast(cust), ev["user_id"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


ORACLE_JOIN_ENRICHMENT_CHAIN = """
SELECT r_name, COUNT(*) AS n_events, ROUND(SUM(value), 2) AS total_value
FROM events
JOIN customer ON user_id = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join — dim side pre-filtered so unmatched fact rows
    survive with nulls (engine addition per SURVEY.md §2.4)."""
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir).filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    return (
        orders.join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"], "left")
        .select("o_orderkey", "o_custkey", "c_name", "c_mktsegment")
    )


ORACLE_JOIN_LEFT = """
SELECT o_orderkey, o_custkey, c_name, c_mktsegment
FROM orders
LEFT JOIN (SELECT * FROM customer WHERE c_mktsegment = 'BUILDING') c
  ON o_custkey = c_custkey
"""


def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers having at least one
    high-value order."""
    cust = load_table(spark, "customer", sf_dir)
    big = load_table(spark, "orders", sf_dir).filter(F.col("o_totalprice") > 200000.0)
    return cust.join(big, cust["c_custkey"] == big["o_custkey"], "left_semi").select(
        "c_custkey", "c_name"
    )


ORACLE_JOIN_SEMI = """
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000.0)
"""


def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no high-value order."""
    cust = load_table(spark, "customer", sf_dir)
    big = load_table(spark, "orders", sf_dir).filter(F.col("o_totalprice") > 200000.0)
    return cust.join(big, cust["c_custkey"] == big["o_custkey"], "left_anti").select(
        "c_custkey", "c_name"
    )


ORACLE_JOIN_ANTI = """
SELECT c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000.0)
"""


def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join: nations vs the nations suppliers live in —
    unmatched rows survive on both sides."""
    nation = load_table(spark, "nation", sf_dir)
    sup = (
        load_table(spark, "supplier", sf_dir)
        .groupBy("s_nationkey")
        .agg(F.count("*").alias("n_suppliers"))
    )
    return (
        nation.join(sup, nation["n_nationkey"] == sup["s_nationkey"], "full_outer")
        .select("n_nationkey", "n_name", "s_nationkey", "n_suppliers")
    )


ORACLE_JOIN_FULL_OUTER = """
SELECT n_nationkey, n_name, s_nationkey, n_suppliers
FROM nation
FULL OUTER JOIN (SELECT s_nationkey, COUNT(*) AS n_suppliers
                 FROM supplier GROUP BY s_nationkey) s
  ON n_nationkey = s_nationkey
"""


def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join (small × small only — a cross of two facts would be
    quadratic; the planner refuses it without an explicit crossJoin)."""
    region = load_table(spark, "region", sf_dir)
    sup = load_table(spark, "supplier", sf_dir)
    return region.crossJoin(sup).select("r_name", "s_name")


ORACLE_JOIN_CROSS = """
SELECT r_name, s_name FROM region CROSS JOIN supplier
"""


def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (engine addition — Spark lacks a native one): for each
    event, the customer's most recent order at-or-before the event time.

    Union-scan formulation: tag order rows and event rows, sort each
    key's timeline, and carry the latest order forward with
    ``last(…, ignorenulls=True)`` over a running row frame. ONE shuffle
    on the join key and zero pair blow-up — the naive
    equi-join + range predicate materializes every (event, earlier
    order) pair (orders-per-key × events-per-key rows) and then needs a
    second shuffle on event_id to pick one; this streams each key's
    timeline once. At same (key, time), orders sort before events
    (is_event tiebreak) to honor the <= bound; among same-date orders
    the highest o_orderkey sorts last and therefore wins.
    """
    ev = load_table(spark, "events", sf_dir).select("event_id", "user_id", "ts")
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    ord_side = orders.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").cast("timestamp").alias("t"),
        F.lit(0).alias("is_event"),
        F.struct("o_orderkey", "o_orderdate", "o_totalprice").alias("o"),
    )
    ev_side = ev.select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        F.lit(1).alias("is_event"),
        "event_id",
    )
    timeline = ord_side.unionByName(ev_side, allowMissingColumns=True)
    w = (
        Window.partitionBy("k")
        .orderBy("t", "is_event", F.col("o.o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        timeline.withColumn("asof", F.last("o", ignorenulls=True).over(w))
        .filter((F.col("is_event") == 1) & F.col("asof").isNotNull())
        .select(
            "event_id",
            F.col("k").alias("user_id"),
            F.col("asof.o_orderkey").alias("o_orderkey"),
            F.col("asof.o_orderdate").alias("o_orderdate"),
            F.col("asof.o_totalprice").alias("o_totalprice"),
        )
    )


ORACLE_JOIN_ASOF = """
SELECT event_id, user_id, o_orderkey, o_orderdate, o_totalprice
FROM (
  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate, o.o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY e.event_id
                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
  FROM events e
  JOIN orders o ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
) t
WHERE rn = 1
"""


# --------------------------------------------------------------------------
# Interval (range) join — engine addition
# --------------------------------------------------------------------------
#: Incident window length and the bucketing granularity of the range
#: join. BUCKET == window length, so every interval spans at most two
#: buckets and replication is O(2) per interval regardless of data.
INTERVAL_WINDOW_SEC = 900


def interval_count_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure range join (no equi key), bucketed: every ``error`` event
    opens a 15-minute incident window; count the events (and distinct
    users) landing inside each window.

    Spark plans a naive ``a.ts BETWEEN b.start AND b.end`` join as a
    broadcast-nested-loop — O(n·m) compares. The scalable form turns
    the range predicate into an equi key: bucket time into
    window-length cells, replicate each interval to the (≤2) cells it
    overlaps, hash-join points to intervals on the cell id, then apply
    the exact range filter. Each point lives in exactly one cell, so no
    post-join dedup is needed. One shuffle on the cell id; interval
    replication is bounded by ceil(len/bucket)+1, independent of rows.
    Skewed cells (event bursts) are AQE's skew-join case."""
    ev = load_table(spark, "events", sf_dir)
    w = INTERVAL_WINDOW_SEC
    pts = ev.select(
        "event_id", "user_id", F.col("ts").alias("pts"),
        F.floor(F.unix_timestamp("ts") / w).alias("cell"),
    )
    iv = (
        ev.filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("window_id"),
            F.col("ts").alias("start"),
            # exact micros-preserving end: unix_timestamp() truncates to
            # seconds, which would shave the window edge vs the oracle
            F.timestamp_add("SECOND", F.lit(w), F.col("ts")).alias("end"),
        )
        .select(
            "window_id", "start", "end",
            F.explode(
                F.sequence(
                    F.floor(F.unix_timestamp("start") / w),
                    F.floor(F.unix_timestamp("end") / w),
                )
            ).alias("cell"),
        )
    )
    hits = pts.join(iv, "cell").filter(
        (F.col("pts") > F.col("start"))
        & (F.col("pts") <= F.col("end"))
        & (F.col("event_id") != F.col("window_id"))
    )
    return hits.groupBy("window_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("user_id").alias("n_users"),
    )


ORACLE_INTERVAL_COUNT_JOIN = f"""
WITH iv AS (
  SELECT event_id AS window_id, ts AS t0,
         ts + INTERVAL {INTERVAL_WINDOW_SEC} SECOND AS t1
  FROM events WHERE event_type = 'error'
)
SELECT iv.window_id,
       COUNT(*) AS n_events,
       COUNT(DISTINCT e.user_id) AS n_users
FROM events e JOIN iv
  ON e.ts > iv.t0 AND e.ts <= iv.t1 AND e.event_id <> iv.window_id
GROUP BY iv.window_id
"""


# --------------------------------------------------------------------------
# Blocked fuzzy join (entity resolution) — engine addition
# --------------------------------------------------------------------------
#: Max edit distance for two part names to count as variants.
FUZZY_MAX_DIST = 4

#: Max distinct names per block before the block is excluded from pair
#: expansion. A hot blocking key (thousands of names sharing one last
#: token) would collect one m-element array and expand m²/2 pair structs
#: inside a single row — the same single-task blowup the LSH path caps
#: with ``MAX_BUCKET_SIZE`` (functions/dedup.py:_bucket_pairs). Dropped
#: blocks are observable via :func:`oversize_name_blocks`.
FUZZY_MAX_BLOCK = 256


def _distinct_blocked_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(name, block) over DISTINCT part names — the shared input of
    :func:`fuzzy_name_pairs` and :func:`oversize_name_blocks`."""
    part = load_table(spark, "part", sf_dir)
    return part.select(F.col("p_name").alias("name")).distinct().withColumn(
        "block", F.element_at(F.split("name", " "), -1)
    )


def oversize_name_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accounting face of the :data:`FUZZY_MAX_BLOCK` guard: the
    (block, n_names) rows :func:`fuzzy_name_pairs` refuses to expand.
    At corpus scale this is the monitoring signal that a degenerate
    blocking key (a stop-token shared by half the vocabulary) needs a
    better blocking function, not a bigger executor."""
    return (
        _distinct_blocked_names(spark, sf_dir)
        .groupBy("block")
        .agg(F.count(F.lit(1)).alias("n_names"))
        .filter(F.col("n_names") > FUZZY_MAX_BLOCK)
    )


def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution primitive: near-identical name pairs by
    Levenshtein distance, with blocking. All-pairs edit distance is
    O(n²) and never runs at scale; the standard shape is (1) reduce to
    DISTINCT names — cardinality of the vocabulary, not the table —
    then (2) compare only within a blocking key (here the name's last
    token, e.g. 'widget' for 'red widget') so each block is vocabulary-
    sized. GroupBy-bucket pair generation keeps it one shuffle with no
    self-join (the distinct subtree evaluates once); the in-row pair
    expansion is bounded by block size, not corpus size.

    Scale guard: blocks above :data:`FUZZY_MAX_BLOCK` distinct names
    are excluded BEFORE ``collect_set`` — per-block sizes come from a
    groupBy over the distinct-names frame (block-cardinality rows,
    metadata-sized) broadcast-joined back, so no low-cardinality window
    partition and no oversized array is ever materialized. The oracle
    mirrors the cap. Dropped blocks: :func:`oversize_name_blocks`."""
    names = _distinct_blocked_names(spark, sf_dir)
    sizes = names.groupBy("block").agg(F.count(F.lit(1)).alias("__block_n"))
    blocked = (
        names.join(
            F.broadcast(sizes.filter(F.col("__block_n") <= FUZZY_MAX_BLOCK)),
            "block",
        )
        .groupBy("block")
        .agg(F.array_sort(F.collect_set("name")).alias("ns"))
    )
    pairs = blocked.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ns"),
                    lambda x, i: F.transform(
                        F.slice(F.col("ns"), i + 2, F.size(F.col("ns"))),
                        lambda y: F.struct(x.alias("name_a"), y.alias("name_b")),
                    ),
                )
            )
        ).alias("p")
    ).select("p.name_a", "p.name_b")
    return pairs.select(
        "name_a", "name_b", F.levenshtein("name_a", "name_b").alias("dist")
    ).filter(F.col("dist") <= FUZZY_MAX_DIST)


ORACLE_FUZZY_NAME_PAIRS = f"""
WITH n AS (
  SELECT DISTINCT p_name AS name,
         split_part(p_name, ' ', -1) AS block
  FROM part
), b AS (
  SELECT *, COUNT(*) OVER (PARTITION BY block) AS block_n FROM n
)
SELECT a.name AS name_a, b2.name AS name_b,
       CAST(levenshtein(a.name, b2.name) AS INTEGER) AS dist
FROM b a JOIN b b2 ON a.block = b2.block AND a.name < b2.name
WHERE a.block_n <= {FUZZY_MAX_BLOCK}
  AND levenshtein(a.name, b2.name) <= {FUZZY_MAX_DIST}
"""
