"""Streaming time-interval join (SURVEY.md §2.8 T3/T6 extension).

The streaming face of ``operators.joins.interval_count_join``: match
point events into the 15-minute windows that incident events open,
with BOTH sides unbounded streams. The reference's stream-stream join
(``sparkpykafkajoin.py:128-130``) is a pure equi-join; the interval
form is what Structured Streaming's event-time-bounded join exists
for — the range predicate doubles as the state-retention bound, so
each side's join state is garbage-collected once the watermark passes
``start + window`` (without the time bound, stream-stream inner join
state grows forever).

Scale notes: state is hash-partitioned like any stream-stream join;
the watermark delay plus the window length caps per-key state at
(rate × (delay + window)) rows regardless of stream age. Spark
rejects a stream-stream join with no equality predicate at all
("Stream-stream join without equality predicate is not supported"),
so the SAME cell-bucketing that saves the batch face from a nested
loop is what makes the streaming join legal: intervals replicate to
the ≤2 window-length cells they overlap, the join runs on cell
equality, and the exact range condition both filters and bounds the
state store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Must match the batch face so stream-equals-batch holds.
from udacity_dsnd_projects_spark.operators.joins import INTERVAL_WINDOW_SEC


def interval_join_stream(
    events: DataFrame,
    watermark: str = "30 minutes",
    window_sec: int = INTERVAL_WINDOW_SEC,
) -> DataFrame:
    """Stream-stream interval join: every ``error`` event opens a
    ``window_sec`` window; emit (window_id, event_id, user_id) for
    each event landing inside one. ``events`` is a streaming frame
    with (event_id, ts, event_type, user_id).

    Both sides carry a watermark, the join has the cell-id equality
    Spark demands, and the range condition bounds event time on both
    sides so state older than ``watermark + window_sec`` is discarded
    — the requirements for an unbounded stream-stream inner join (SS
    programming guide, inner joins with time constraints)."""
    pts = (
        events.withWatermark("ts", watermark)
        .select(
            "event_id",
            "user_id",
            F.col("ts").alias("pts"),
            F.floor(F.unix_timestamp("ts") / window_sec).alias("cell"),
        )
        .alias("p")
    )
    wins = (
        events.withWatermark("ts", watermark)
        .filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("window_id"),
            F.col("ts").alias("start"),
            F.explode(
                F.sequence(
                    F.floor(F.unix_timestamp("ts") / window_sec),
                    F.floor((F.unix_timestamp("ts") + window_sec) / window_sec),
                )
            ).alias("cell"),
        )
        .alias("w")
    )
    return pts.join(
        wins,
        F.expr(
            f"p.cell = w.cell AND pts > start "
            f"AND pts <= start + interval {window_sec} seconds "
            "AND event_id != window_id"
        ),
        "inner",
    ).select("window_id", "event_id", "user_id")


def interval_join_batch_reference(events: DataFrame, window_sec: int = INTERVAL_WINDOW_SEC) -> DataFrame:
    """Same semantics on a batch frame — the stream-equals-batch
    reference for tests."""
    pts = events.select("event_id", "user_id", F.col("ts").alias("pts"))
    wins = (
        events.filter(F.col("event_type") == "error")
        .select(F.col("event_id").alias("window_id"), F.col("ts").alias("start"))
    )
    return pts.join(
        wins,
        (F.col("pts") > F.col("start"))
        & (
            F.col("pts")
            <= F.col("start") + F.expr(f"interval {window_sec} seconds")
        )
        & (F.col("event_id") != F.col("window_id")),
    ).select("window_id", "event_id", "user_id")
