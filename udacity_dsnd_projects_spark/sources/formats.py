"""Non-parquet batch sources (SURVEY.md §2.1 S2/S3/S4) and the Avro
value codec (§2.2 K3).

The reference loads CSVs with pandas (``kafka-streaming-pipeline/
producers/simulation.py:35-37``, ``producers/models/
turnstile_hardware.py:36-44``), bulk-loads Postgres from CSV
(``load_stations.sql:1-25``), polls that table incrementally through
the Kafka Connect JDBC source (``producers/connector.py:23-45``:
``mode=incrementing``, ``incrementing.column.name=stop_id``,
``batch.max.rows=500``), and Avro-serializes every produced message
(``producers/models/producer.py:40-52``).

Engine mapping: declarative `spark.read` scans with EXPLICIT schemas —
the reference never infers (§1.2) and neither do we: schema inference
costs an extra pass over the data and can silently drift between runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def csv_scan(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
) -> DataFrame:
    """S3/S4 — CSV scan with a declared schema (never inferred). The
    CSV reader supports filter pushdown at the parser level
    (`spark.sql.csv.filterPushdown.enabled`, on by default), so
    row-level predicates skip parsing non-matching lines."""
    return spark.read.csv(path, schema=schema, header=header)


def json_scan(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """JSON-lines scan with a declared schema — the file-shaped analog
    of the `from_json` envelope decode (P2)."""
    return spark.read.json(path, schema=schema)


def jdbc_scan(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    predicate: str | None = None,
    properties: dict[str, str] | None = None,
):
    """S2 (batch face) — JDBC table scan. With a numeric
    ``partition_column`` + bounds the read is split into
    ``num_partitions`` parallel range queries (the only way a JDBC
    source scales); ``predicate`` is pushed into the remote query.

    Returns the configured ``DataFrameReader`` options dict alongside
    the lazy reader so tests can validate the plan without a live
    database (none exists in this environment).
    """
    opts: dict[str, str] = {"url": url, "dbtable": table}
    if predicate is not None:
        opts["dbtable"] = f"(SELECT * FROM {table} WHERE {predicate}) AS t"
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partition_column requires lower_bound/upper_bound")
        opts.update(
            partitionColumn=partition_column,
            numPartitions=str(num_partitions),
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
        )
    for k, v in (properties or {}).items():
        opts[k] = v
    reader = spark.read.format("jdbc")
    for k, v in opts.items():
        reader = reader.option(k, v)
    return reader, opts


def incremental_predicate(incrementing_column: str, last_max) -> str:
    """S2 (incremental face) — the Kafka Connect JDBC source's
    ``mode=incrementing`` contract (``producers/connector.py:39-43``):
    each poll reads only rows with a strictly greater value of the
    incrementing column. Compose with :func:`jdbc_scan`'s
    ``predicate`` inside a ``foreachBatch`` loop that persists
    ``last_max`` (checkpoint-style) between polls."""
    return f"{incrementing_column} > {last_max}"


def have_avro(spark: SparkSession) -> bool:
    """True when the spark-avro package is on the classpath. It ships
    separately from Spark core, so the engine gates on it at runtime
    instead of failing at import."""
    try:
        from pyspark.sql.avro.functions import to_avro

        df = spark.range(0, 1, 1, 1).select(to_avro(F.col("id")).alias("a"))
        df.collect()
        return True
    except Exception:
        return False


def avro_encode(col: Column) -> Column:
    """K3 — Avro-serialize a column (requires spark-avro)."""
    from pyspark.sql.avro.functions import to_avro

    return to_avro(col)


def avro_decode(col: Column, json_schema: str) -> Column:
    """K3 — Avro-deserialize a binary column given a writer schema
    (the engine's stand-in for the Schema Registry lookup the
    reference does in ``producers/models/producer.py:40-44``)."""
    from pyspark.sql.avro.functions import from_avro

    return from_avro(col, json_schema)
