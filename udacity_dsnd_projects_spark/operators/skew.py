"""Skew mitigation (SURVEY.md §4: "salting/AQE for skewed
station_id/user_id groupings").

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
the engine session) is the first line of defense and needs no code. The
explicit salted join here is for the cases AQE cannot fix: a broadcast
that is too big to broadcast joined on a key where one value dominates,
or an engine running with AQE off. Salting trades a bounded replication
of the small side (×n_salt) for an even spread of the hot key across
n_salt tasks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big`` is skewed on ``on``: each big-side row
    gets a uniform salt in [0, n_salt); the small side is replicated
    once per salt value; the join key becomes (key, salt), so the hot
    key's rows land in n_salt different shuffle partitions instead of
    one straggler task.

    The salt is `rand`-derived — nondeterministic BY DESIGN and
    result-invariant: it only chooses which task processes a row,
    never which rows match. Output is exactly `big.join(small, on,
    how)` for inner/left joins (asserted by tests).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (small side is replicated)")
    salted_big = big.withColumn(
        SALT_COL, (F.rand(seed=0) * n_salt).cast("int")
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))).alias(SALT_COL)
    replicated_small = small.select("*", salts)
    return (
        salted_big.join(replicated_small, on=[on, SALT_COL], how=how)
        .drop(SALT_COL)
    )


def salted_supplier_rollup(spark, sf_dir: str) -> DataFrame:
    """Registered face of :func:`salted_join`: lineitem (big side)
    salted-joined to supplier (small side, replicated x n_salt) on
    suppkey, rolled up per nation. The salt only spreads rows across
    tasks — the result is exactly the plain join's, which is what the
    DuckDB oracle asserts."""
    from udacity_dsnd_projects_spark.sources.catalog import load_table

    li = load_table(spark, "lineitem", sf_dir).select("l_suppkey", "l_quantity")
    sup = (
        load_table(spark, "supplier", sf_dir)
        .select(F.col("s_suppkey").alias("l_suppkey"), "s_nationkey")
    )
    joined = salted_join(li, sup, "l_suppkey")
    return joined.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum("l_quantity"), 2).alias("total_qty"),
    )


ORACLE_SALTED_SUPPLIER_ROLLUP = """
SELECT s_nationkey,
       COUNT(*) AS n_items,
       ROUND(SUM(l_quantity), 2) AS total_qty
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_nationkey
"""


#: skew_profile reports this many heaviest keys.
PROFILE_TOP_K = 10


def skew_profile(spark, sf_dir: str) -> DataFrame:
    """Key-distribution diagnostics: the heaviest
    :data:`PROFILE_TOP_K` values of lineitem's supplier key, each with
    its row share and its skew ratio (observed count over the
    uniform-distribution expectation). This is the readout an operator
    consults BEFORE choosing mitigation — a ratio near 1 says hash
    partitioning is fine; a hot key (ratio ≫ 1) argues for
    :func:`salted_join` or AQE skew splitting.

    Scale shape: one map-side-combined groupBy over the key (the scan
    reads one column); the global (total, distinct) pair is a 1-row
    aggregate OVER THE GROUPED FRAME (key-cardinality input, not
    corpus rows) broadcast back as a cross join; the top-k is a
    TakeOrdered with key tiebreak, never a global sort. Shares divide
    exact integer counts as doubles — engine-identical."""
    from udacity_dsnd_projects_spark.sources.catalog import load_table

    per_key = (
        load_table(spark, "lineitem", sf_dir)
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    totals = per_key.agg(
        F.sum("n_rows").alias("__total"),
        F.count(F.lit(1)).alias("__distinct"),
    )
    return (
        per_key.crossJoin(F.broadcast(totals))
        .orderBy(F.col("n_rows").desc(), F.col("l_suppkey"))
        .limit(PROFILE_TOP_K)
        .select(
            "l_suppkey",
            "n_rows",
            (F.col("n_rows").cast("double") / F.col("__total").cast("double"))
            .alias("row_share"),
            (
                F.col("n_rows").cast("double")
                / (
                    F.col("__total").cast("double")
                    / F.col("__distinct").cast("double")
                )
            ).alias("skew_ratio"),
        )
    )


ORACLE_SKEW_PROFILE = f"""
WITH per_key AS (
  SELECT l_suppkey, COUNT(*) AS n_rows FROM lineitem GROUP BY l_suppkey
), totals AS (
  SELECT SUM(n_rows) AS total, COUNT(*) AS n_distinct FROM per_key
)
SELECT l_suppkey, n_rows,
       CAST(n_rows AS DOUBLE) / CAST(total AS DOUBLE) AS row_share,
       CAST(n_rows AS DOUBLE)
         / (CAST(total AS DOUBLE) / CAST(n_distinct AS DOUBLE)) AS skew_ratio
FROM per_key, totals
ORDER BY n_rows DESC, l_suppkey
LIMIT {PROFILE_TOP_K}
"""
