"""Materialized table sinks (SURVEY.md §2.2 K5/K6, §2.8 T6/T7).

The reference materializes continuously-updated tables two ways: the
Faust table's changelog topic (``consumers/faust_stream.py:38-46,71``,
compacted on ``station_id``) and the KSQL CTAS table
(``consumers/ksql.py:27-31``). Both are key→latest-value views of a
stream. The engine's equivalent is a foreachBatch upsert into a
parquet-backed table: per micro-batch, reduce the batch to its latest
row per key, merge with the stored table, keep the winner per key,
atomically replace.

The merge is idempotent (T7: at-least-once delivery composes with
last-write-wins by sequence into exactly-once table contents), which is
precisely why the reference keys its changelog by station_id. On a real
deployment this function is replaced by `MERGE INTO` on a lakehouse
table (Delta/Iceberg) — same logic, transactional commit. Plain
parquet has no transaction log, so the upsert stages the merged table
at a temp path and swaps it in with filesystem renames: the new table
is fully written before the live path is touched, and a crash at any
point leaves either the old table or the old table's `.bak` plus the
complete staged table — never a half-written live path. (The staging
write also means the merge reads the live files while writing
elsewhere, so no localCheckpoint materialization is needed.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException


def latest_per_key(df: DataFrame, key_cols: list[str], seq_col: str) -> DataFrame:
    """max_by reduction to one row per key (highest seq wins)."""
    others = [c for c in df.columns if c not in key_cols]
    payload = F.struct(*others)
    return (
        df.groupBy(*key_cols)
        .agg(F.max_by(payload, F.col(seq_col)).alias("__v"))
        .select(*key_cols, "__v.*")
    )


def compacted_table_upsert(table_path: str, key_cols: list[str], seq_col: str):
    """K5 — returns a foreachBatch function maintaining a compacted
    table at ``table_path``. Use:

        stream.writeStream.foreachBatch(
            compacted_table_upsert(path, ["station_id"], "stop_id")
        ).outputMode("update").start()
    """

    def upsert(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        fresh = latest_per_key(batch_df, key_cols, seq_col)
        try:
            current = spark.read.parquet(table_path)
            merged = latest_per_key(
                current.unionByName(fresh.select(current.columns)), key_cols, seq_col
            )
        except AnalysisException:  # first epoch: table does not exist yet
            merged = fresh
        # stage the complete new table, then swap: live -> .bak, staged
        # -> live, drop .bak. Any crash leaves a recoverable state.
        staged = f"{table_path}.__staged-{epoch_id}"
        merged.write.mode("overwrite").parquet(staged)
        jvm = spark._jvm
        fs_path = jvm.org.apache.hadoop.fs.Path(table_path)
        fs = fs_path.getFileSystem(spark._jsc.hadoopConfiguration())
        backup = jvm.org.apache.hadoop.fs.Path(f"{table_path}.bak")
        fs.delete(backup, True)
        if fs.exists(fs_path):
            fs.rename(fs_path, backup)
        fs.rename(jvm.org.apache.hadoop.fs.Path(staged), fs_path)
        fs.delete(backup, True)

    return upsert
