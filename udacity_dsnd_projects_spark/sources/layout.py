"""Physical data layout (SURVEY.md §4: "partitioned parquet layout for
the batch corpus"; engine scale stance: bucketing for co-located joins).

Two layout tools a 100 TB corpus needs:

- **Hive-style partitioning** (`write_partitioned`): directory-level
  pruning — a filter on the partition column skips whole directories
  at file-listing time (shows as `PartitionFilters` in the scan).
  Partition by low-cardinality query-sliced columns (date, region);
  never by high-cardinality keys (file explosion).
- **Bucketing** (`write_bucketed_table`): pre-shuffle the table ONCE at
  write time into N hash buckets on the join/agg key. Two tables
  bucketed the same way join with ZERO exchanges — the shuffle that
  dominates a big fact-fact join is paid once at ingest instead of per
  query. This is the batch analog of co-partitioned Kafka topics
  (the reference keys its per-station topics the same way —
  ``producers/models/station.py:31-37``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Partitioned parquet layout: one directory per partition value."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    path: str,
    bucket_col: str,
    n_buckets: int = 8,
    mode: str = "overwrite",
) -> None:
    """Bucketed external table (bucketBy requires the table catalog):
    hash-distributed AND sorted by ``bucket_col``, so equi-joins and
    aggregations on that column need neither exchange nor sort."""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .option("path", path)
        .format("parquet")
        .saveAsTable(table_name)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on the bucket column — Catalyst
    recognizes the matching distribution and plans a shuffle-free
    sort-merge join (asserted by tests)."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)


def zorder_value(col_a, col_b, bits: int = 16):
    """Z-order (Morton) interleave of two numeric columns' rank spaces:
    bit i of each input lands at bit 2i / 2i+1 of the output, so
    sorting by the result clusters rows that are close in BOTH
    dimensions. Inputs must already be scaled to [0, 2^bits) ints —
    compose with ntile/percent_rank for arbitrary distributions.

    Pure integer column expression (shift/mask/or, fully codegen'd):
    interleaving doubles the bit positions by iterated masked shifts
    (the classic 'spread bits' sequence), no UDF."""
    from pyspark.sql import functions as F

    def spread(c):
        # 16-bit -> even bit positions of a 32-bit lane (Column `|` is
        # boolean OR in PySpark, so bitwiseOR explicitly)
        x = c.cast("long")
        x = x.bitwiseOR(F.shiftleft(x, 8)).bitwiseAND(F.lit(0x00FF00FF))
        x = x.bitwiseOR(F.shiftleft(x, 4)).bitwiseAND(F.lit(0x0F0F0F0F))
        x = x.bitwiseOR(F.shiftleft(x, 2)).bitwiseAND(F.lit(0x33333333))
        x = x.bitwiseOR(F.shiftleft(x, 1)).bitwiseAND(F.lit(0x55555555))
        return x

    return spread(col_a).bitwiseOR(F.shiftleft(spread(col_b), 1))


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 16,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Z-order-clustered parquet: rank-scale the two cluster columns,
    Morton-interleave, range-partition + sort by the z-value, write.
    Each output file then covers a small rectangle of the (a, b) space
    instead of a full-width stripe, so parquet row-group min/max stats
    prune reads for predicates on EITHER column — the lakehouse
    multi-dimensional clustering trick (Delta/Iceberg OPTIMIZE ZORDER)
    expressed as a plain Spark write.

    The rank scaling uses percent_rank windows over each column — one
    sort-shuffle per dimension at write time; at 100 TB you'd swap in
    approx quantile boundaries to avoid the global sorts, which
    changes nothing downstream."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    lim = (1 << bits) - 1
    scaled = df.select(
        "*",
        F.floor(
            F.percent_rank().over(Window.orderBy(col_a)) * lim
        ).alias("__ra"),
        F.floor(
            F.percent_rank().over(Window.orderBy(col_b)) * lim
        ).alias("__rb"),
    )
    z = scaled.select(
        "*", zorder_value(F.col("__ra"), F.col("__rb"), bits).alias("__z")
    )
    (
        z.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__ra", "__rb", "__z")
        .write.mode(mode)
        .parquet(path)
    )
