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
    compose with rank bucketing for arbitrary distributions.

    Pure integer column expression (shift/mask/or, fully codegen'd):
    interleaving doubles the bit positions by iterated masked shifts
    (the classic 'spread bits' sequence), no UDF. The mask sequence
    spreads a 16-bit lane, so wider inputs would silently corrupt the
    interleave — rejected up front."""
    if not 1 <= bits <= 16:
        raise ValueError(f"zorder_value interleaves at most 16-bit inputs, got bits={bits}")
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


def zorder_frame(
    df: DataFrame, col_a: str, col_b: str, bits: int = 10
) -> DataFrame:
    """``df`` plus a ``__z`` Morton-code column over the rank spaces of
    the two cluster columns. Rank scaling is approxQuantile boundaries
    (one-pass Greenwald-Khanna sketch over both columns; the driver
    receives 2^bits-1 floats per column — metadata, not data) followed
    by ``ml.feature.Bucketizer`` (binary-search bucket lookup, JVM
    side). No window function anywhere: the naive
    ``percent_rank().over(Window.orderBy(col))`` formulation funnels
    the whole dataset through ONE task per dimension, which is exactly
    the shape that cannot survive 100 TB."""
    from pyspark.ml.feature import Bucketizer
    from pyspark.sql import functions as F

    n_ranks = 1 << bits
    probs = [i / n_ranks for i in range(1, n_ranks)]
    bounds_a, bounds_b = df.stat.approxQuantile(
        [col_a, col_b], probs, 1.0 / (4 * n_ranks)
    )

    def splits(bounds: list[float]) -> list[float]:
        # Bucketizer needs strictly increasing splits; heavy hitters
        # produce duplicate quantiles — dedupe (bucket ids stay
        # rank-ordered, resolution degrades only where mass piles up)
        return [float("-inf"), *sorted(set(bounds)), float("inf")]

    scaled = Bucketizer(
        splitsArray=[splits(bounds_a), splits(bounds_b)],
        inputCols=[col_a, col_b],
        outputCols=["__ra", "__rb"],
        handleInvalid="keep",
    ).transform(df)
    return scaled.select(
        "*",
        zorder_value(
            F.col("__ra").cast("long"), F.col("__rb").cast("long"), bits
        ).alias("__z"),
    ).drop("__ra", "__rb")


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 16,
    bits: int = 10,
    mode: str = "overwrite",
) -> None:
    """Z-order-clustered parquet: rank-scale the two cluster columns
    (see :func:`zorder_frame` — approx-quantile bucketing, no global
    sort), Morton-interleave, range-partition + sort by the z-value,
    write. Each output file then covers a small rectangle of the
    (a, b) space instead of a full-width stripe, so parquet row-group
    min/max stats prune reads for predicates on EITHER column — the
    lakehouse multi-dimensional clustering trick (Delta/Iceberg
    OPTIMIZE ZORDER) expressed as a plain Spark write."""
    (
        zorder_frame(df, col_a, col_b, bits)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
