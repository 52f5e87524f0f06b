"""Source-format faces (SURVEY.md §2.1): CSV/JSON scans with explicit
schemas round-trip the corpus; JDBC reader is configured (no live DB in
this environment); Avro codec is gated on the optional package."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from udacity_dsnd_projects_spark.sources.catalog import load_table
from udacity_dsnd_projects_spark.sources.formats import (
    csv_scan,
    have_avro,
    incremental_predicate,
    jdbc_scan,
    json_scan,
)


@pytest.fixture(scope="module")
def nation_df(spark, sf_dir):
    return load_table(spark, "nation", sf_dir)


def test_csv_scan_round_trip(spark, nation_df, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("csv") / "nation")
    nation_df.write.csv(path, header=True, mode="overwrite")
    back = csv_scan(spark, path, nation_df.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation_df.collect()))
    assert back.schema == nation_df.schema  # declared, not inferred


def test_csv_filter_pushdown_in_plan(spark, nation_df, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("csvf") / "nation")
    nation_df.write.csv(path, header=True, mode="overwrite")
    plan = (
        csv_scan(spark, path, nation_df.schema)
        .filter(F.col("n_regionkey") == 2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(n_regionkey), EqualTo(n_regionkey,2)]" in plan


def test_json_scan_round_trip(spark, nation_df, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("json") / "nation")
    nation_df.write.json(path, mode="overwrite")
    back = json_scan(spark, path, nation_df.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation_df.collect()))


def test_jdbc_scan_options_and_incremental_contract(spark):
    reader, opts = jdbc_scan(
        spark,
        url="jdbc:postgresql://localhost:5432/cta",
        table="stations",
        partition_column="stop_id",
        num_partitions=4,
        lower_bound=0,
        upper_bound=50000,
        predicate=incremental_predicate("stop_id", 41000),
    )
    # the Connect-JDBC incrementing contract: strictly-greater predicate
    # pushed into the remote query, range-partitioned parallel read
    assert opts["dbtable"] == "(SELECT * FROM stations WHERE stop_id > 41000) AS t"
    assert opts["partitionColumn"] == "stop_id"
    assert opts["numPartitions"] == "4"


def test_partitioned_write_prunes(spark, nation_df, tmp_path_factory):
    from udacity_dsnd_projects_spark.sources.layout import write_partitioned

    path = str(tmp_path_factory.mktemp("part") / "nation")
    write_partitioned(nation_df, path, ["n_regionkey"])
    scan = spark.read.parquet(path).filter(F.col("n_regionkey") == 2)
    plan = scan._jdf.queryExecution().executedPlan().toString()
    # the filter must prune at directory level, not row level
    assert "PartitionFilters: [isnotnull(n_regionkey" in plan
    assert scan.count() == nation_df.filter("n_regionkey = 2").count()


def test_bucketed_join_is_shuffle_free(spark, sf_dir, tmp_path_factory):
    from udacity_dsnd_projects_spark.sources.layout import (
        bucketed_join,
        write_bucketed_table,
    )

    root = tmp_path_factory.mktemp("buckets")
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    lineitem = load_table(spark, "lineitem", sf_dir).select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    write_bucketed_table(orders, "b_orders", str(root / "o"), "o_orderkey", 4)
    write_bucketed_table(lineitem, "b_lineitem", str(root / "l"), "o_orderkey", 4)
    # at this test corpus size Catalyst would broadcast; disable so the
    # plan shows what bucketing buys on two BIG tables: SMJ, no exchange
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan  # the whole point
        want = orders.join(lineitem, "o_orderkey").count()
        assert joined.count() == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_avro_round_trip_if_available(spark):
    if not have_avro(spark):
        pytest.skip("spark-avro package not on the classpath")
    from udacity_dsnd_projects_spark.sources.formats import avro_decode, avro_encode

    schema_json = '{"type": "long"}'
    df = spark.range(10).select(avro_encode(F.col("id")).alias("a"))
    back = df.select(avro_decode(F.col("a"), schema_json).alias("id"))
    assert [r.id for r in back.collect()] == list(range(10))


def _have_embedded_derby(spark) -> bool:
    """Derby ships in Spark's jars (for the Hive metastore), giving an
    embedded JDBC database with zero external services."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
        return True
    except Exception:
        return False


def test_jdbc_incremental_poll_round_trip(spark, tmp_path):
    """S2 — a REAL JDBC round-trip against embedded Derby: bulk-load a
    stations-shaped table, then poll it with incremental_predicate and
    assert the Kafka Connect ``mode=incrementing`` contract (reference
    producers/connector.py:39-43): each poll returns only rows with a
    STRICTLY greater incrementing column, polls never overlap, and the
    union of polls is exactly the table."""
    if not _have_embedded_derby(spark):
        pytest.skip("no embedded Derby driver on the classpath (skip reason: "
                    "JDBC round-trip needs org.apache.derby.jdbc.EmbeddedDriver)")
    url = f"jdbc:derby:{tmp_path}/stationsdb;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    rows = [(i, f"station_{i}", i % 3 == 0) for i in range(40)]
    df = spark.createDataFrame(rows, "stop_id INT, station_name STRING, red BOOLEAN")
    df.write.format("jdbc").option("url", url).option("dbtable", "stations").options(
        **props
    ).save()

    # full scan
    full_reader, _ = jdbc_scan(spark, url, "stations", properties=props)
    assert full_reader.load().count() == 40

    # incremental polls: batch 1 from -1, batch 2 from batch-1 max.
    # Spark's JDBC writer creates quoted (case-sensitive) identifiers
    # in Derby, so the pushed-down predicate must quote them too.
    col = '"stop_id"'
    last_max = -1
    seen: list[int] = []
    for _ in range(3):
        reader, opts = jdbc_scan(
            spark,
            url,
            "stations",
            predicate=incremental_predicate(col, last_max)
            + f" AND {col} <= " + str(last_max + 15),  # batch.max.rows analog
            properties=props,
        )
        assert f"{col} > {last_max}" in opts["dbtable"]  # pushed into the query
        batch = [r.stop_id for r in reader.load().collect()]
        assert all(s > last_max for s in batch)  # strictly increasing
        assert not set(batch) & set(seen)  # no overlap between polls
        seen += batch
        if batch:
            last_max = max(batch)
    assert sorted(seen) == list(range(40))  # polls tile the table exactly


def test_jdbc_partitioned_read_parallelism(spark, tmp_path):
    """S2 — partitionColumn/bounds split the scan into parallel range
    queries: the only way a JDBC read scales past one connection."""
    if not _have_embedded_derby(spark):
        pytest.skip("no embedded Derby driver on the classpath")
    url = f"jdbc:derby:{tmp_path}/pardb;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    spark.range(100).selectExpr("CAST(id AS INT) AS stop_id").write.format(
        "jdbc"
    ).option("url", url).option("dbtable", "seq").options(**props).save()
    reader, _ = jdbc_scan(
        spark, url, "seq",
        partition_column="stop_id", num_partitions=4,
        lower_bound=0, upper_bound=100,
        properties=props,
    )
    loaded = reader.load()
    assert loaded.rdd.getNumPartitions() == 4
    assert loaded.count() == 100


def test_load_table_ts_type_matches_driver_session(spark, sf_dir):
    """The corpus writes `ts` as parquet timestamp[us] with
    isAdjustedToUTC=false, which Spark 4 (inferTimestampNTZ on, pinned
    in session.get_spark) surfaces as TIMESTAMP_NTZ on a raw scan —
    the exact type the driver's CORRECTNESS session sees. The
    catalog.load_table choke point must normalize it to session-zoned
    TimestampType so epoch arithmetic (unix_millis, cast long, range
    frames) stays legal everywhere downstream."""
    from pyspark.sql.types import TimestampNTZType, TimestampType

    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert isinstance(raw.schema["ts"].dataType, TimestampNTZType), (
        "raw scan type drifted from the driver session's TIMESTAMP_NTZ — "
        f"got {raw.schema['ts'].dataType}"
    )
    df = load_table(spark, "events", sf_dir)
    assert isinstance(df.schema["ts"].dataType, TimestampType)
    # and epoch arithmetic is legal post-normalization (would raise
    # CAST_WITHOUT_SUGGESTION on NTZ)
    df.select(F.unix_millis("ts"), F.col("ts").cast("long")).limit(1).collect()

