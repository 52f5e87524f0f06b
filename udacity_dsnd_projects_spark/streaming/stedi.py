"""The STEDI pipeline (SURVEY.md §3.1) — transform layer.

Every function takes and returns a DataFrame and is execution-mode
agnostic: feed it a batch frame for the oracle tests, a file-stream
frame for replay tests, or a Kafka frame in production. This is the
engine's re-expression of ``spark-streaming-pipeline/sparkpykafkajoin.py``
(and its two console-variant prefixes,
``sparkpyrediskafkastreamtoconsole.py`` / ``sparkpyeventskafkastreamtoconsole.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from udacity_dsnd_projects_spark.schemas import CUSTOMER_RECORD, REDIS_SERVER, STEDI_EVENT


def parse_redis_envelope(kv: DataFrame, compat_first_entry_only: bool = True) -> DataFrame:
    """Steps 3-6 of §3.1: cast → ``from_json`` envelope → star-expand →
    ``zSetEntries[0].element`` → ``unbase64`` → parse customer JSON.

    ``kv`` must have a string ``value`` column holding envelope JSON
    (i.e. already cast via ``kafka_bytes_as_strings``).

    ``compat_first_entry_only=True`` preserves the reference's quirk of
    reading only the first zset entry (``sparkpykafkajoin.py:80-82``);
    False is the idiomatic mode: explode every entry.
    """
    envelope = kv.withColumn("v", F.from_json(F.col("value"), REDIS_SERVER)).select("v.*")
    if compat_first_entry_only:
        encoded = envelope.select(
            F.col("zSetEntries")[0]["element"].alias("encodedCustomer")
        )
    else:
        encoded = envelope.select(
            F.explode("zSetEntries").alias("entry")
        ).select(F.col("entry.element").alias("encodedCustomer"))
    return (
        encoded.withColumn(
            "customer",
            F.from_json(F.unbase64("encodedCustomer").cast("string"), CUSTOMER_RECORD),
        )
        .select("customer.*")
    )


def derive_birth_year(customers: DataFrame) -> DataFrame:
    """Step 7 of §3.1: null-reject filter (P6) + birthYear derivation
    (F1): ``split(birthDay, "-")[0]`` (``sparkpykafkajoin.py:95-105``)."""
    return (
        customers.filter(F.col("email").isNotNull() & F.col("birthDay").isNotNull())
        .select(
            "email",
            F.split(F.col("birthDay"), "-").getItem(0).alias("birthYear"),
        )
    )


def parse_stedi_events(kv: DataFrame) -> DataFrame:
    """Step 8 of §3.1: parse ``stedi-events`` JSON and project the join
    columns (``sparkpykafkajoin.py:120-125``: ``SELECT customer,
    score``)."""
    return (
        kv.withColumn("v", F.from_json(F.col("value"), STEDI_EVENT))
        .select("v.*")
        .select("customer", "score")
    )


def join_risk(
    risks: DataFrame,
    customers: DataFrame,
    watermarks: tuple[str, str] | None = None,
) -> DataFrame:
    """Step 9 of §3.1 — the stream-stream inner equi-join
    (``sparkpykafkajoin.py:128-130``: ``join(..., expr("customer =
    email"))``).

    Compat mode (``watermarks=None``) reproduces the reference exactly:
    no watermark, so streaming state is unbounded on both sides (T3 —
    documented deviation source). Idiomatic mode passes
    ``(risk_ts_col, customer_ts_col)`` event-time columns and applies
    ``withWatermark`` on both sides so state is GC-able — required at
    production scale.
    """
    if watermarks is not None:
        risk_ts, cust_ts = watermarks
        risks = risks.withWatermark(risk_ts, "1 hour")
        customers = customers.withWatermark(cust_ts, "1 hour")
    return risks.join(customers, F.expr("customer = email"), "inner")
