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


def test_avro_round_trip_if_available(spark):
    if not have_avro(spark):
        pytest.skip("spark-avro package not on the classpath")
    from udacity_dsnd_projects_spark.sources.formats import avro_decode, avro_encode

    schema_json = '{"type": "long"}'
    df = spark.range(10).select(avro_encode(F.col("id")).alias("a"))
    back = df.select(avro_decode(F.col("a"), schema_json).alias("id"))
    assert [r.id for r in back.collect()] == list(range(10))
