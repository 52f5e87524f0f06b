"""Time-series primitives over the events stream table: regular-grid
resampling with gap fill (LOCF) and Spark's native session-window
operator given a driver-verified batch face.

Reference parity: the reference's stream processors aggregate
per-entity event streams over time (faust windowed tables,
`consumers/faust_stream.py`; KSQL HOPPING/TUMBLING aggregates) — the
resample/gap-fill step is what any downstream dashboard or feature
pipeline runs on top of such a table, and ``session_window`` is the
engine-native form of the sessionize operator
(operators/windows.py:138) that the streaming face uses verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_dsnd_projects_spark.sources.catalog import load_table

#: Session gap for the native session_window face — same 30-minute
#: rule as operators/windows.py::sessionize.
SESSION_GAP = "30 minutes"
_GAP_US = 30 * 60 * 1_000_000


def timeseries_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample each user's event stream onto an hourly grid and fill
    gaps by last-observation-carried-forward — the feature-store /
    dashboard primitive that turns an irregular event log into a
    regular time series. The spine spans each user's first..last
    OBSERVED hour, so the first grid row is always observed and
    ``value_filled`` is never NULL (asserted in tests).

    Scale shape: the hourly downsample is one groupBy on (user_id,
    hour) — high-cardinality, map-side combined; the per-user spine is
    built by ``sequence`` + ``explode`` from that user's own min/max
    hour (bounded by the retention window, never a global calendar
    cross join); the LOCF window partitions on user_id —
    high-cardinality, fully parallel. The latest-in-hour value is an
    argmax via ``max(struct(ts, event_id, value))`` (event_id breaks
    ts ties deterministically), not a separate ranking pass."""
    ev = load_table(spark, "events", sf_dir)
    # hourly feeds BOTH the spine bounds and the grid join; checkpoint
    # so the events scan + downsample shuffle run once, not per
    # consumer (hourly is users × active-hours — far smaller than the
    # event log it replaces).
    hourly = (
        ev.withColumn("hr", F.date_trunc("hour", F.col("ts")))
        .groupBy("user_id", "hr")
        .agg(
            F.max(F.struct("ts", "event_id", "value"))["value"].alias("obs_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .localCheckpoint(eager=True)
    )
    spine = (
        hourly.groupBy("user_id")
        .agg(F.min("hr").alias("__lo"), F.max("hr").alias("__hi"))
        .select(
            "user_id",
            F.explode(
                F.sequence("__lo", "__hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("hr"),
        )
    )
    grid = spine.join(hourly, ["user_id", "hr"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return grid.select(
        "user_id",
        "hr",
        F.last("obs_value", ignorenulls=True).over(w).alias("value_filled"),
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        F.col("obs_value").isNotNull().cast("int").alias("is_observed"),
    )


ORACLE_TIMESERIES_GAP_FILL = """
WITH hourly AS (
  SELECT user_id, hr, obs_value, n_events FROM (
    SELECT user_id, date_trunc('hour', ts) AS hr, value AS obs_value,
           COUNT(*) OVER (PARTITION BY user_id, date_trunc('hour', ts))
             AS n_events,
           ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
  ) t WHERE rn = 1
), spine AS (
  SELECT user_id,
         unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr
  FROM (SELECT user_id, MIN(hr) AS lo, MAX(hr) AS hi
        FROM hourly GROUP BY user_id) b
)
SELECT s.user_id, s.hr,
       last_value(h.obs_value IGNORE NULLS)
         OVER (PARTITION BY s.user_id ORDER BY s.hr
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS value_filled,
       COALESCE(h.n_events, 0) AS n_events,
       CAST(h.obs_value IS NOT NULL AS INTEGER) AS is_observed
FROM spine s LEFT JOIN hourly h ON s.user_id = h.user_id AND s.hr = h.hr
"""


def session_window_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session aggregation via Spark's NATIVE
    ``session_window`` operator — the engine-fused form of the
    gaps-and-islands sessionize (operators/windows.py:138): sessions
    merge while consecutive events are under :data:`SESSION_GAP`
    apart, and the emitted window end is last-event-time + gap.
    This face is what the streaming pipeline runs verbatim
    (``readStream`` + the identical groupBy — one logical plan, two
    execution modes), so giving it a driver-verified batch oracle
    pins the semantics the stream inherits.

    Scale shape: one shuffle on user_id; session merging happens
    inside the aggregation operator (no self-join, no window
    function); money-style value sums accumulate in DECIMAL for
    engine-identical totals."""
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy("user_id", F.session_window("ts", SESSION_GAP))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(30,6)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


ORACLE_SESSION_WINDOW_ROLLUP = f"""
WITH flagged AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR date_diff('microsecond', LAG(ts) OVER w, ts)
                      >= {_GAP_US}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT user_id, ts, event_id, value,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS sid
  FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(30,6))), 2) AS DOUBLE)
         AS total_value
FROM sessions GROUP BY user_id, sid
"""


#: Trailing window length for the rolling distinct-user count.
ROLLING_WINDOW_DAYS = 7


def rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day distinct active users per calendar day — the
    DAU/WAU-style metric SQL windows cannot express (COUNT(DISTINCT)
    OVER a range frame is unsupported in both engines), decorrelated
    by CONTRIBUTION EXPLODE: each (user, active day) pair contributes
    to the 7 target days whose trailing window contains it, then one
    distinct count per target day.

    Scale shape: the per-(user, day) dedup is the only corpus-sized
    shuffle; the explode multiplies that already-deduped frame by a
    CONSTANT 7 inside the same stage (never a nested-loop range
    join — a day-spine × activity BNLJ is the naive formulation this
    replaces); the final countDistinct per day runs two-phase over
    day-keyed partitions. The calendar spine (1-row min/max →
    sequence) left-joins so silent days report 0."""
    ev = (
        load_table(spark, "events", sf_dir)
        .select(F.to_date("ts").alias("day"), "user_id")
        .distinct()
    )
    contrib = ev.select(
        F.explode(
            F.sequence(
                F.col("day"),
                F.date_add(F.col("day"), ROLLING_WINDOW_DAYS - 1),
            )
        ).alias("target_day"),
        "user_id",
    )
    bounds = ev.agg(
        F.min("day").alias("__lo"), F.max("day").alias("__hi")
    )
    spine = bounds.select(
        F.explode(F.sequence(F.col("__lo"), F.col("__hi"))).alias("day")
    )
    counts = contrib.groupBy("target_day").agg(
        F.countDistinct("user_id").alias("n")
    )
    return (
        spine.join(counts, spine["day"] == counts["target_day"], "left")
        .select(
            # both engines emit the spine as midnight timestamps (the
            # oracle's generate_series over dates yields timestamps)
            F.col("day").cast("timestamp").alias("day"),
            F.coalesce(F.col("n"), F.lit(0)).alias("active_users_7d"),
        )
    )


ORACLE_ROLLING_DISTINCT_USERS = f"""
WITH ev AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
), contrib AS (
  SELECT u.t AS target_day, user_id
  FROM ev, UNNEST(generate_series(day,
                                  day + INTERVAL {ROLLING_WINDOW_DAYS - 1} DAY,
                                  INTERVAL 1 DAY)) AS u(t)
), spine AS (
  SELECT s.t AS day
  FROM (SELECT MIN(day) AS lo, MAX(day) AS hi FROM ev) b,
       UNNEST(generate_series(b.lo, b.hi, INTERVAL 1 DAY)) AS s(t)
)
SELECT spine.day,
       COALESCE(COUNT(DISTINCT contrib.user_id), 0) AS active_users_7d
FROM spine LEFT JOIN contrib ON contrib.target_day = spine.day
GROUP BY spine.day
"""
