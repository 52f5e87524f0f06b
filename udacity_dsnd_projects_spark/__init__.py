"""udacity_dsnd_projects_spark — a PySpark-native analytics engine.

A brand-new, idiomatic PySpark (DataFrame / Spark SQL / Structured
Streaming) engine re-expressing the query and data-processing surface of
the reference project *kudeh/udacity-dsnd-projects* (two Udacity Data
Streaming Nanodegree projects: a Kafka CTA transit pipeline and the STEDI
Spark Structured Streaming pipeline).

Design stance (SURVEY.md §7):

- DataFrame/SQL first — declare logical plans, let Catalyst/Tungsten pick
  the physical strategy. No RDDs, no hand scheduling.
- Every operator has a *batch face* (oracle-checkable against DuckDB on
  static parquet) and, where the reference semantics are streaming, a
  *streaming face* over the same expression logic.
- Python UDFs only where built-ins genuinely can't express the semantics,
  and then always Arrow-vectorized (pandas_udf / applyInPandas /
  mapInPandas).
- Built for scale: broadcast small dimensions, pre-aggregate before
  shuffles, AQE on, explicit schemas everywhere (the reference never
  infers — SURVEY.md §1.2).
"""

__version__ = "0.1.0"

from udacity_dsnd_projects_spark.session import get_spark  # noqa: F401
