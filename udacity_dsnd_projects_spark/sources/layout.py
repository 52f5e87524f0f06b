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
