"""Query registry — the single source of truth wired into
``__spark_entry__.py``.

Each entry: name -> (spark_query_fn, duckdb_oracle_sql | None).
``spark_query_fn(spark, sf_dir) -> DataFrame``. Oracle SQL runs on the
same parquet tables in DuckDB (views pre-registered by the driver).
Column names are aliased identically on both sides — the driver's
compare sorts columns by name before hashing.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from udacity_dsnd_projects_spark.operators import risk_join as _risk

QueryFn = Callable[[SparkSession, str], DataFrame]

#: name -> (query_fn, oracle_sql or None for non-SQL-expressible ops)
_REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def register(name: str, fn: QueryFn, oracle: str | None) -> None:
    _REGISTRY[name] = (fn, oracle)


def queries() -> dict[str, QueryFn]:
    return {name: fn for name, (fn, _) in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in _REGISTRY.items() if sql is not None}


# --------------------------------------------------------------------------
# Flagship (SURVEY.md §3.1 / §7 phase 0)
# --------------------------------------------------------------------------
register("risk_join", _risk.risk_join, _risk.ORACLE_RISK_JOIN)
