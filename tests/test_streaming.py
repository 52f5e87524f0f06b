"""Streaming-face tests (SURVEY.md §7 phase 2): replay the same rows
through file streams (multiple micro-batches via maxFilesPerTrigger=1)
and check the final materialized state equals the batch answer.
"""

from __future__ import annotations

import base64
import json

import pytest

pytestmark = pytest.mark.slow  # replay suites run many micro-batches

from udacity_dsnd_projects_spark.schemas import (
    STATION,
    TURNSTILE,
)
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

from udacity_dsnd_projects_spark.streaming.cta import (
    faust_station_transform,
    station_table_latest,
    turnstile_summary,
)
from udacity_dsnd_projects_spark.streaming.sources import (
    file_stream,
    run_foreach_batch,
    run_to_memory,
    to_kafka_shape,
)
from udacity_dsnd_projects_spark.streaming.stedi import (
    derive_birth_year,
    join_risk,
    parse_redis_envelope,
    parse_stedi_events,
)

KV_SCHEMA = T.StructType(
    [T.StructField("key", T.StringType()), T.StructField("value", T.StringType())]
)


def _b64(s: str) -> str:
    return base64.b64encode(s.encode()).decode()


def _envelope_rows(n: int = 20):
    """Reference-shaped redis envelopes (FIXTURES.md §3)."""
    rows = []
    for i in range(n):
        cust = {
            "customerName": f"Cust {i}",
            "email": f"cust.{i}@test.com",
            "phone": f"80155512{i:02d}",
            "birthDay": f"{1950 + i % 50}-01-03",
        }
        env = {
            "key": _b64("Customer"),
            "existType": "NONE",
            "Ch": False,
            "Incr": False,
            "zSetEntries": [{"element": _b64(json.dumps(cust)), "score": "0.0"}],
        }
        rows.append((str(i), json.dumps(env)))
    return rows


def _stedi_rows(n: int = 40):
    rows = []
    for i in range(n):
        ev = {
            "customer": f"cust.{i % 20}@test.com",
            "score": str(round(-5.0 + (i * 0.9) % 35, 1)),
            "riskDate": "2020-09-14T07:54:06.417Z",
        }
        rows.append((str(i), json.dumps(ev)))
    return rows


def _write_kv_batches(spark, rows, path, n_batches=4):
    """Write rows as several parquet files so maxFilesPerTrigger=1
    yields several micro-batches."""
    per = max(1, len(rows) // n_batches)
    for b in range(0, len(rows), per):
        spark.createDataFrame(rows[b : b + per], KV_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(path)


@pytest.fixture(scope="module")
def stedi_dirs(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("stedi")
    env_path = str(root / "envelopes")
    risk_path = str(root / "risks")
    _write_kv_batches(spark, _envelope_rows(), env_path)
    _write_kv_batches(spark, _stedi_rows(), risk_path)
    return env_path, risk_path


def test_envelope_decode_stream_equals_batch(spark, stedi_dirs):
    env_path, _ = stedi_dirs
    batch = derive_birth_year(
        parse_redis_envelope(spark.read.schema(KV_SCHEMA).parquet(env_path))
    )
    stream = derive_birth_year(
        parse_redis_envelope(file_stream(spark, env_path, KV_SCHEMA))
    )
    got = run_to_memory(stream, "env_decode").collect()
    want = batch.collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    assert len(got) == 20
    assert all(r.birthYear.isdigit() for r in got)


def test_stream_stream_join_compat(spark, stedi_dirs):
    """§3.1 steps 2-10 end-to-end: two file streams, no watermark
    (compat T3 — unbounded state is opt-in now), kafka-shaped sink
    rows."""
    env_path, risk_path = stedi_dirs
    customers = derive_birth_year(
        parse_redis_envelope(file_stream(spark, env_path, KV_SCHEMA))
    )
    risks = parse_stedi_events(file_stream(spark, risk_path, KV_SCHEMA))
    joined = join_risk(risks, customers, compat_unbounded_state=True)
    sink = to_kafka_shape(joined, "email")
    got = run_to_memory(sink, "risk_sink").collect()

    # batch face over the same files
    bcust = derive_birth_year(
        parse_redis_envelope(spark.read.schema(KV_SCHEMA).parquet(env_path))
    )
    brisk = parse_stedi_events(spark.read.schema(KV_SCHEMA).parquet(risk_path))
    want = join_risk(brisk, bcust).count()

    assert len(got) == want == 40  # every risk event matches one customer
    payload = json.loads(got[0].value)
    assert set(payload) == {"customer", "score", "email", "birthYear"}  # golden shape
    assert got[0].key == payload["email"]


def test_stream_stream_join_with_watermark_runs(spark, stedi_dirs):
    """Idiomatic T3 mode: watermarked join still yields all on-time rows."""
    env_path, risk_path = stedi_dirs
    customers = derive_birth_year(
        parse_redis_envelope(file_stream(spark, env_path, KV_SCHEMA))
    ).withColumn("cts", F.current_timestamp())
    risks = parse_stedi_events(
        file_stream(spark, risk_path, KV_SCHEMA)
    ).withColumn("rts", F.current_timestamp())
    joined = join_risk(risks, customers, watermarks=("rts", "cts"))
    got = run_to_memory(joined, "risk_wm")
    assert got.count() == 40


def test_streaming_join_without_watermark_is_refused(spark, stedi_dirs):
    """The watermarked join is the DEFAULT face: a streaming plan with
    neither watermarks nor the explicit compat opt-in must fail loudly
    instead of silently building unbounded state."""
    env_path, risk_path = stedi_dirs
    customers = derive_birth_year(
        parse_redis_envelope(file_stream(spark, env_path, KV_SCHEMA))
    )
    risks = parse_stedi_events(file_stream(spark, risk_path, KV_SCHEMA))
    with pytest.raises(ValueError, match="unbounded join state"):
        join_risk(risks, customers)


KV_TS_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("value", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def _run_collect_state(joined, name):
    """Drain a streaming join into memory; return (row_count, final
    join-state row total from the last progress event)."""
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        prog = q.lastProgress
        state_rows = sum(op["numRowsTotal"] for op in prog["stateOperators"])
    finally:
        q.stop()
    n = joined.sparkSession.sql(f"SELECT count(*) c FROM {name}").collect()[0]["c"]
    return n, state_rows


def test_watermarked_join_bounds_state_vs_compat(spark, tmp_path_factory):
    """State-size assertion for the default face: with event times
    advancing an hour per micro-batch and a 10-minute delay, the
    watermarked+range join must (a) still emit every on-time pair and
    (b) finish holding strictly fewer state rows than the compat
    unbounded join over the same data."""
    import datetime as dt

    root = tmp_path_factory.mktemp("stedi_wm_state")
    env_path, risk_path = str(root / "env"), str(root / "risk")
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    env_rows = _envelope_rows()  # 20 customers
    risk_rows = _stedi_rows()  # 40 events, 2 per customer
    # 4 micro-batches, one hour apart; matching customer/risk rows get
    # identical event times so every pair is on-time
    for b in range(4):
        ts = base + dt.timedelta(hours=b)
        env_b = [(k, v, ts) for k, v in env_rows[b * 5 : (b + 1) * 5]]
        risk_b = [
            (k, v, ts)
            for k, v in risk_rows
            if int(k) % 20 // 5 == b  # risks for this batch's customers
        ]
        spark.createDataFrame(env_b, KV_TS_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(env_path)
        spark.createDataFrame(risk_b, KV_TS_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(risk_path)

    def build(watermarked: bool):
        customers = derive_birth_year(
            parse_redis_envelope(
                file_stream(spark, env_path, KV_TS_SCHEMA), ts_col="ts"
            )
        )
        risks = parse_stedi_events(
            file_stream(spark, risk_path, KV_TS_SCHEMA), ts_col="ts"
        ).withColumnRenamed("event_ts", "risk_event_ts")
        if watermarked:
            return join_risk(
                risks,
                customers,
                watermarks=("risk_event_ts", "event_ts"),
                delay="10 minutes",
            )
        return join_risk(risks, customers, compat_unbounded_state=True)

    n_wm, state_wm = _run_collect_state(build(True), "wm_state_sink")
    n_compat, state_compat = _run_collect_state(build(False), "compat_state_sink")
    assert n_wm == n_compat == 40  # every pair on-time in both modes
    assert state_wm < state_compat  # watermark + range predicate GC'd state


@pytest.fixture(scope="module")
def turnstile_dir(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("cta")
    path = str(root / "turnstiles")
    rows = [
        (1000 + i, i % 7, f"station_{i % 7}", ["red", "blue", "green"][i % 3])
        for i in range(210)
    ]
    df = spark.createDataFrame(rows, TURNSTILE)
    for b in range(3):
        df.filter(F.col("timestamp") % 3 == b).coalesce(1).write.mode("append").parquet(
            path
        )
    return path


def test_turnstile_summary_stream_equals_batch(spark, turnstile_dir):
    """§3.2 — the KSQL count as an update-mode ('continuously updated
    table') streaming agg, materialized via foreachBatch upsert (K5/T6)
    exactly like a compacted changelog topic."""
    state: dict[int, int] = {}

    def upsert(batch_df, _epoch):
        for r in batch_df.collect():
            state[r["STATION_ID"]] = r["COUNT"]

    stream = turnstile_summary(
        file_stream(spark, turnstile_dir, TURNSTILE), ksql_compat_names=True
    )
    run_foreach_batch(stream, upsert, output_mode="update")

    batch = turnstile_summary(spark.read.schema(TURNSTILE).parquet(turnstile_dir))
    want = {r["station_id"]: r["count"] for r in batch.collect()}
    assert state == want
    assert sum(state.values()) == 210


def test_windowed_agg_with_watermark_stream_equals_batch(spark, tmp_path_factory):
    """T4 — tumbling-window agg with a watermark: replaying the corpus
    through micro-batches converges to the batch date_trunc rollup
    (append mode emits each window once its watermark passes; the final
    state must equal the batch answer for all closed windows)."""
    root = tmp_path_factory.mktemp("t4")
    path = str(root / "events")
    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (base + dt.timedelta(minutes=7 * i), ["click", "view"][i % 2])
        for i in range(60)
    ]
    # replay in (rough) time order — a chunk that revisits times more
    # than the 10-minute watermark behind the stream's max would have
    # its rows legitimately dropped as late
    for b in range(3):
        spark.createDataFrame(rows[b * 20 : (b + 1) * 20], schema).coalesce(
            1
        ).write.mode("append").parquet(path)

    stream = (
        file_stream(spark, path, schema)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("hour_start"), "event_type", "n")
    )
    # update mode: keep the latest emission per (window, type)
    got_rows = run_to_memory(stream, "t4_win", output_mode="update").collect()
    got: dict[tuple, int] = {}
    for r in got_rows:
        got[(r["hour_start"], r["event_type"])] = r["n"]

    batch = (
        spark.read.schema(schema)
        .parquet(path)
        .groupBy(F.date_trunc("hour", "ts").alias("hour_start"), "event_type")
        .agg(F.count("*").alias("n"))
    )
    want = {(r["hour_start"], r["event_type"]): r["n"] for r in batch.collect()}
    assert got == want


def test_session_window_stream_equals_batch_sessionize(spark, tmp_path_factory):
    """Streaming ``session_window`` (30-min gap) equals the batch
    lag+cumsum sessionization on the same rows — the two faces of the
    sessionize operator agree on session boundaries and sizes."""
    root = tmp_path_factory.mktemp("sessw")
    path = str(root / "events")
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    import datetime as dt

    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    rows = []
    for u in range(4):
        # two sessions per user: a burst, a >30min gap, another burst
        for i in range(5):
            rows.append((u, base + dt.timedelta(minutes=u * 3 + i * 5)))
        for i in range(3):
            rows.append((u, base + dt.timedelta(minutes=120 + u * 3 + i * 5)))
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(path)
    # session windows only support append output, which emits a window
    # once the watermark passes its close — a far-future sentinel row in
    # a second micro-batch pushes the watermark beyond every real session
    spark.createDataFrame(
        [(999, base + dt.timedelta(days=2))], schema
    ).coalesce(1).write.mode("append").parquet(path)

    stream = (
        file_stream(spark, path, schema)
        .withWatermark("ts", "1 minute")
        .groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select("user_id", F.col("sw.start").alias("session_start"), "n_events")
    )
    got = {
        (r["user_id"], r["session_start"]): r["n_events"]
        for r in run_to_memory(stream, "sessw", output_mode="append").collect()
        if r["user_id"] != 999
    }
    assert len(got) == 8  # 4 users x 2 sessions
    assert all(n in {3, 5} for n in got.values())


def test_stateful_latest_per_key(spark, tmp_path_factory):
    """T6 — applyInPandasWithState last-write-wins: per-key state
    persists across micro-batches, and a row with a LOWER sequence
    arriving in a LATER micro-batch cannot overwrite the stored winner
    (the case plain per-batch max_by upserts get wrong)."""
    from udacity_dsnd_projects_spark.streaming.stateful import latest_per_key_stateful

    root = tmp_path_factory.mktemp("stateful")
    path = str(root / "updates")
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("seq", T.LongType()),
            T.StructField("val", T.StringType()),
        ]
    )
    # batch 1 carries the HIGH sequences; batch 2 replays stale rows
    b1 = [(k, 100 + k, f"new_{k}") for k in range(6)]
    b2 = [(k, k, f"stale_{k}") for k in range(6)]
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(path)
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(path)

    out = latest_per_key_stateful(
        file_stream(spark, path, schema), "k", "seq", ("val",)
    )
    rows = run_to_memory(out, "lww_state", output_mode="update").collect()
    # last emitted row per key is the final table state
    final: dict[int, tuple] = {}
    for r in rows:
        final[r["k"]] = (r["seq"], r["val"])
    assert final == {k: (100 + k, f"new_{k}") for k in range(6)}


def test_checkpoint_restart_processes_only_new_data(spark, tmp_path_factory):
    """T2 — checkpointed restart: a query restarted with the same
    checkpointLocation resumes from committed offsets, so rows from the
    first run are NOT reprocessed (the reference relies on exactly this
    via /tmp/kafkacheckpoint, sparkpykafkajoin.py:150)."""
    root = tmp_path_factory.mktemp("ckpt")
    src, ckpt = str(root / "src"), str(root / "checkpoint")
    schema = T.StructType([T.StructField("id", T.LongType())])

    seen: list[int] = []

    def collect(batch_df, _epoch):
        seen.extend(r["id"] for r in batch_df.collect())

    def run_once():
        q = (
            file_stream(spark, src, schema)
            .writeStream.foreachBatch(collect)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    spark.createDataFrame([(i,) for i in range(5)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run_once()
    assert sorted(seen) == [0, 1, 2, 3, 4]

    spark.createDataFrame([(i,) for i in (10, 11)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run_once()
    assert sorted(seen) == [0, 1, 2, 3, 4, 10, 11]  # first five not replayed


def test_envelope_decode_tolerates_corrupt_payloads(spark):
    """Robustness of the decode chain (P2/P5): malformed envelope JSON,
    non-base64 elements, and truncated customer JSON must yield null
    fields — never a task failure — so one poison message can't kill
    the stream (from_json PERMISSIVE + unbase64 null-on-error)."""
    good_cust = json.dumps(
        {"customerName": "G", "email": "g@test.com", "phone": "1", "birthDay": "1990-01-01"}
    )
    good_env = json.dumps(
        {
            "key": _b64("Customer"),
            "existType": "NONE",
            "Ch": False,
            "Incr": False,
            "zSetEntries": [{"element": _b64(good_cust), "score": "0.0"}],
        }
    )
    rows = [
        ("0", good_env),
        ("1", "{not json at all"),
        ("2", json.dumps({"key": "x", "zSetEntries": [{"element": "!!!not-b64!!!", "score": "0"}]})),
        ("3", json.dumps({"key": "x", "zSetEntries": [{"element": _b64("{trunc"), "score": "0"}]})),
        ("4", None),
    ]
    kv = spark.createDataFrame(rows, KV_SCHEMA)
    out = derive_birth_year(parse_redis_envelope(kv))
    got = out.collect()  # must not raise
    assert [(r.email, r.birthYear) for r in got] == [("g@test.com", "1990")]


def test_dedup_stream_drops_cross_batch_duplicates(spark, tmp_path_factory):
    """Streaming exact dedup: a duplicate key replayed in a LATER
    micro-batch is dropped (state store remembers keys across
    batches); both the unbounded and watermarked forms agree here."""
    from udacity_dsnd_projects_spark.streaming.stateful import dedup_stream

    root = tmp_path_factory.mktemp("sdedup")
    path = str(root / "rows")
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("val", T.StringType()),
        ]
    )
    import datetime as dt

    base = dt.datetime(2024, 6, 1)
    b1 = [(i, base + dt.timedelta(minutes=i), f"first_{i}") for i in range(8)]
    # batch 2 re-sends ids 0-3 (producer retry) plus new ids 8-9
    b2 = [(i, base + dt.timedelta(minutes=30 + i), f"retry_{i}") for i in range(4)]
    b2 += [(i, base + dt.timedelta(minutes=30 + i), f"first_{i}") for i in (8, 9)]
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(path)
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(path)

    got = run_to_memory(
        dedup_stream(file_stream(spark, path, schema), ["id"]), "sdedup_unbounded"
    ).collect()
    vals = {r["id"]: r["val"] for r in got}
    assert len(vals) == 10
    assert all(v.startswith("first_") for v in vals.values())  # retries dropped

    got_wm = run_to_memory(
        dedup_stream(file_stream(spark, path, schema), ["id"], "ts", "2 hours"),
        "sdedup_wm",
    ).collect()
    assert {r["id"]: r["val"] for r in got_wm} == vals


def test_compacted_table_sink(spark, tmp_path_factory):
    """K5 — the foreachBatch compacted-table sink converges to the
    batch latest-per-key answer, including stale rows replayed in a
    later micro-batch (idempotent last-write-wins merge, T7)."""
    from udacity_dsnd_projects_spark.streaming.sinks import (
        compacted_table_upsert,
        latest_per_key,
    )

    root = tmp_path_factory.mktemp("compact")
    src = str(root / "updates")
    table = str(root / "table")
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("seq", T.LongType()),
            T.StructField("val", T.StringType()),
        ]
    )
    b1 = [(k, 100 + k, f"new_{k}") for k in range(5)]
    b2 = [(k, k, f"stale_{k}") for k in range(5)] + [(9, 1, "only_9")]
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(src)

    q = (
        file_stream(spark, src, schema)
        .writeStream.foreachBatch(compacted_table_upsert(table, ["k"], "seq"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {r["k"]: (r["seq"], r["val"]) for r in spark.read.parquet(table).collect()}
    want_df = latest_per_key(spark.read.schema(schema).parquet(src), ["k"], "seq")
    want = {r["k"]: (r["seq"], r["val"]) for r in want_df.collect()}
    assert got == want
    assert got[9] == (1, "only_9")
    assert got[0] == (100, "new_0")


def test_compacted_table_sink_crash_recovery(spark, tmp_path):
    """T7 — a crash between rename(live -> .bak) and rename(staged ->
    live) leaves .bak as the only copy. The next epoch must restore it
    and merge, NOT treat the missing live path as a first epoch (which
    would drop all prior keys and then delete the backup)."""
    import os

    from udacity_dsnd_projects_spark.streaming.sinks import compacted_table_upsert

    table = str(tmp_path / "table")
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("seq", T.LongType()),
            T.StructField("val", T.StringType()),
        ]
    )
    up = compacted_table_upsert(table, ["k"], "seq")
    up(spark.createDataFrame([(k, 1, f"old_{k}") for k in range(5)], schema), 0)

    # simulate the mid-swap crash: live renamed away, backup is the
    # only copy (exactly the state after the first rename of epoch 1)
    os.rename(table, f"{table}.bak")
    up(spark.createDataFrame([(9, 1, "only_9")], schema), 1)

    got = {r["k"]: r["val"] for r in spark.read.parquet(table).collect()}
    assert got == {0: "old_0", 1: "old_1", 2: "old_2", 3: "old_3", 4: "old_4", 9: "only_9"}
    assert not os.path.exists(f"{table}.bak")


def test_faust_station_table_stream_equals_batch(spark, tmp_path_factory):
    """§3.3 — Faust transform + last-write-wins table: streamed upserts
    converge to the batch latest-per-key answer."""
    root = tmp_path_factory.mktemp("stations")
    path = str(root / "updates")
    # two updates per station across separate micro-batches: line flips
    rows = []
    for seq in range(2):
        for sid in range(8):
            rows.append(
                (
                    seq * 100 + sid,  # stop_id = monotone sequence
                    "E",
                    f"stop_{sid}",
                    f"station_{sid}",
                    f"Station {sid}",
                    sid,
                    sid,
                    (sid + seq) % 3 == 0,
                    (sid + seq) % 3 == 1,
                    (sid + seq) % 3 == 2,
                )
            )
    df = spark.createDataFrame(rows, STATION)
    df.filter(F.col("stop_id") < 100).coalesce(1).write.mode("append").parquet(path)
    df.filter(F.col("stop_id") >= 100).coalesce(1).write.mode("append").parquet(path)

    state: dict[int, tuple] = {}

    def upsert(batch_df, _epoch):
        # per-batch last-write-wins by the monotone sequence, then upsert
        latest = station_table_latest(
            faust_station_transform(batch_df, keep_cols=("stop_id",))
        )
        for r in latest.collect():
            state[r["station_id"]] = (r["station_name"], r["order"], r["line"])

    run_foreach_batch(file_stream(spark, path, STATION), upsert)

    batch_latest = station_table_latest(
        faust_station_transform(
            spark.read.schema(STATION).parquet(path), keep_cols=("stop_id",)
        )
    )
    want = {
        r["station_id"]: (r["station_name"], r["order"], r["line"])
        for r in batch_latest.collect()
    }
    assert state == want
    assert len(state) == 8
    # the seq=1 write wins for every station
    assert all(line in {"red", "blue", "green", ""} for (_, _, line) in state.values())


def test_kafka_round_trip_gated(spark, tmp_path_factory):
    """S1/K1 end-to-end against a real broker — skips VISIBLY when the
    spark-sql-kafka connector or a localhost broker is absent (the
    sandbox has neither; mirrors the have_avro gate in test_sources).
    Semantics under test match sparkpykafkajoin.py:61-67,145-152:
    earliest-offset subscribe, string-cast projection, kafka sink with
    checkpoint."""
    from udacity_dsnd_projects_spark.streaming.sources import (
        have_kafka,
        kafka_bytes_as_strings,
        kafka_stream,
    )

    if not have_kafka(spark):
        pytest.skip("spark-sql-kafka connector or localhost:9092 broker absent")

    ckpt = str(tmp_path_factory.mktemp("kafka_ckpt"))
    raw = kafka_stream(spark, topic="engine-test-in")
    parsed = kafka_bytes_as_strings(raw)
    q = (
        parsed.select(F.col("key"), F.col("value"))
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", "localhost:9092")
        .option("topic", "engine-test-out")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_corpus_quality_rollup_stream_equals_batch(spark, tmp_path_factory):
    """Phase-4 ops are mode-agnostic like the §2 core: the curation
    quality gate + per-language token rollup, replayed through file
    micro-batches in complete mode, converges to the batch answer on
    the same data."""
    from udacity_dsnd_projects_spark.functions.curation import _quality_filter

    root = tmp_path_factory.mktemp("corpus_stream")
    path = str(root / "docs")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
        ]
    )
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text", "lang")
    )
    # three chunks -> three micro-batches (maxFilesPerTrigger=1)
    for b in range(3):
        docs.filter(F.col("doc_id") % 3 == b).coalesce(1).write.mode(
            "append"
        ).parquet(path)

    def rollup(df):
        toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
        return _quality_filter(df).groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(toks)).alias("total_tokens"),
        )

    got_rows = run_to_memory(
        rollup(file_stream(spark, path, schema)),
        "corpus_rollup",
        output_mode="complete",
    ).collect()
    got = {r["lang"]: (r["n_docs"], r["total_tokens"]) for r in got_rows}
    want = {
        r["lang"]: (r["n_docs"], r["total_tokens"])
        for r in rollup(spark.read.schema(schema).parquet(path)).collect()
    }
    assert got == want and len(got) > 0


def test_interval_join_stream_equals_batch(spark, tmp_path_factory):
    """Stream-stream time-interval join (points into 15-min incident
    windows) emits exactly the batch join's match set when the corpus
    is replayed through micro-batches."""
    from udacity_dsnd_projects_spark.streaming.interval import (
        interval_join_batch_reference,
        interval_join_stream,
    )

    root = tmp_path_factory.mktemp("ivj")
    path = str(root / "events")
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("user_id", T.LongType()),
        ]
    )
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (
            i,
            base + dt.timedelta(minutes=5 * i, seconds=i % 3),
            "error" if i % 7 == 0 else "click",
            i % 4,
        )
        for i in range(60)
    ]
    for b in range(3):
        spark.createDataFrame(rows[b * 20 : (b + 1) * 20], schema).coalesce(
            1
        ).write.mode("append").parquet(path)

    got_rows = run_to_memory(
        interval_join_stream(file_stream(spark, path, schema)),
        "ivj_join",
        output_mode="append",
    ).collect()
    got = {(r["window_id"], r["event_id"], r["user_id"]) for r in got_rows}

    batch = interval_join_batch_reference(spark.read.schema(schema).parquet(path))
    want = {(r["window_id"], r["event_id"], r["user_id"]) for r in batch.collect()}
    assert got == want and len(want) > 0


def test_incremental_dedup_stream_equals_batch(spark, tmp_path_factory):
    """Recurring-crawl shape: micro-batches of new docs are content-
    hashed, deduped within the stream, and anti-joined against the
    static prior-snapshot hash table (stream-static left anti). The
    surviving set equals the batch answer computed on the same rows."""
    from udacity_dsnd_projects_spark.streaming.stateful import (
        incremental_dedup_stream,
    )

    root = tmp_path_factory.mktemp("incdedup")
    path = str(root / "rows")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    hist_rows = [(100 + i, f"snapshot doc {i}") for i in range(6)]
    b1 = [
        (0, "brand new zero"),
        (1, "snapshot doc 2"),  # already in the snapshot -> dropped
        (2, "brand new two"),
    ]
    b2 = [
        (3, "brand new two"),  # within-stream dup of doc 2 -> dropped
        (4, "snapshot doc 5"),  # snapshot dup -> dropped
        (5, "brand new five"),
    ]
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(path)
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(path)

    hist_hashes = (
        spark.createDataFrame(hist_rows, schema)
        .select(F.md5(F.col("text").cast("binary")).alias("content_md5"))
        .distinct()
    )
    got_rows = run_to_memory(
        incremental_dedup_stream(file_stream(spark, path, schema), hist_hashes),
        "inc_dedup_stream",
    ).collect()
    got = {r["doc_id"] for r in got_rows}
    assert got == {0, 2, 5}
    # batch reference over the same rows
    batch = (
        spark.read.schema(schema)
        .parquet(path)
        .withColumn("content_md5", F.md5(F.col("text").cast("binary")))
        .groupBy("content_md5")
        .agg(F.min("doc_id").alias("doc_id"))
        .join(hist_hashes, "content_md5", "left_anti")
    )
    assert {r["doc_id"] for r in batch.collect()} == got


def test_near_dup_stream_equals_batch(spark, tmp_path_factory):
    """Streaming fuzzy dedup: new docs stream against a static LSH
    band index; an exact re-crawl and a lightly mutated copy are
    flagged with the same candidates + scores the batch face finds,
    and unrelated text passes clean."""
    from udacity_dsnd_projects_spark.functions.dedup import minhash_bands_for
    from udacity_dsnd_projects_spark.sources.catalog import load_table
    from udacity_dsnd_projects_spark.streaming.stateful import near_dup_stream

    sf_dir = "/root/testdata/sf0.001"
    hist = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    index = minhash_bands_for(hist).localCheckpoint(eager=True)

    base = {r["doc_id"]: r["text"] for r in hist.filter(F.col("doc_id") < 6).collect()}
    mutated = base[5].rsplit(" ", 1)[0] + " zzzmutation"
    root = tmp_path_factory.mktemp("neardup_stream")
    path = str(root / "rows")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    b1 = [(9000001, base[3]), (9000002, "zzz qqq vvv kkk jjj www uuu ppp")]
    b2 = [(9000003, mutated)]
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(path)
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(path)

    got_rows = run_to_memory(
        near_dup_stream(file_stream(spark, path, schema), index), "near_dup_stream"
    ).collect()
    got = {(r["doc_id"], r["hist_doc_id"], r["est_jaccard"]) for r in got_rows}
    # batch reference: identical pipeline over the same static rows
    want_rows = near_dup_stream(
        spark.read.schema(schema).parquet(path), index
    ).collect()
    want = {(r["doc_id"], r["hist_doc_id"], r["est_jaccard"]) for r in want_rows}
    assert got == want
    # the exact re-crawl hits its source at est_jaccard 1.0
    assert (9000001, 3, 1.0) in got
    # the mutated copy still collides with its source over threshold
    assert any(d == 9000003 and h == 5 for d, h, _ in got)
    # gibberish stays clean
    assert not any(d == 9000002 for d, _, _ in got)


def test_url_dedup_stream_equals_batch(spark, tmp_path_factory):
    """Crawl-frontier shape: a stream of raw URLs is normalized with
    the SAME expression chain as the batch face and deduped on the
    canonical form across micro-batches; the surviving set equals the
    batch distinct-canonical answer (one logical plan, two modes)."""
    from udacity_dsnd_projects_spark.functions.web import normalize_url
    from udacity_dsnd_projects_spark.streaming.stateful import dedup_stream

    root = tmp_path_factory.mktemp("urldedup")
    path = str(root / "rows")
    schema = T.StructType(
        [
            T.StructField("crawl_id", T.LongType()),
            T.StructField("url", T.StringType()),
        ]
    )
    b1 = [
        (0, "HTTP://WWW.Example.COM:80/a?id=1&utm_source=x#frag"),
        (1, "http://example.com/a?id=1"),  # same canonical as crawl 0
        (2, "https://Example.com:443/b/"),
        (3, "https://example.com/b?utm_campaign=y"),  # same canonical as 2
    ]
    b2 = [
        (4, "http://www.example.com/a/?id=1&ref=rss"),  # dup of 0/1 again
        (5, "https://example.com/c"),  # genuinely new
    ]
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(path)
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(path)

    stream = file_stream(spark, path, schema).withColumn(
        "canon_url", normalize_url(F.col("url"))
    )
    got = run_to_memory(
        dedup_stream(stream, ["canon_url"]), "url_dedup_stream"
    ).collect()
    batch = (
        spark.read.schema(schema)
        .parquet(path)
        .select(normalize_url(F.col("url")).alias("canon_url"))
        .distinct()
        .collect()
    )
    assert {r["canon_url"] for r in got} == {r["canon_url"] for r in batch}
    assert len(got) == 3  # a, b, c — one survivor per canonical URL


def test_cdc_changelog_stream_equals_batch_merge(spark, sf_dir, tmp_path_factory):
    """The batch cdc_merge (MERGE semantics) and the K5 compacted-table
    sink converge to the same served table when the SAME changelog
    flows through each: stream the synthesized upsert/delete log into
    the foreachBatch sink (keyed on doc_id, latest seq wins), compact
    tombstones at read time, and compare row-for-row with the batch
    argmax — the batch/streaming duality for MERGE."""
    from udacity_dsnd_projects_spark.functions.snapshot import _cdc_log, cdc_merge
    from udacity_dsnd_projects_spark.streaming.sinks import compacted_table_upsert
    from udacity_dsnd_projects_spark.streaming.sources import file_stream

    root = tmp_path_factory.mktemp("cdc_stream")
    src = str(root / "log")
    table = str(root / "table")

    log = _cdc_log(spark, sf_dir)
    schema = log.schema
    # two micro-batch files: base snapshot first, then the changelog —
    # the arrival order a real CDC consumer sees
    log.filter(F.col("seq") == 1).coalesce(1).write.mode("append").parquet(src)
    log.filter(F.col("seq") > 1).coalesce(1).write.mode("append").parquet(src)

    q = (
        file_stream(spark, src, schema)
        .writeStream.foreachBatch(compacted_table_upsert(table, ["doc_id"], "seq"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    served = (
        spark.read.parquet(table)
        .filter(F.col("op") != "delete")  # tombstone compaction at read
        .select(
            "doc_id",
            F.col("seq").alias("last_seq"),
            "content_md5",
            "n_chars",
        )
    )
    got = sorted(map(tuple, served.collect()))
    want = sorted(map(tuple, cdc_merge(spark, sf_dir).collect()))
    assert got == want and got


def test_gap_fill_stateful_fills_silent_hours_across_batches(spark, tmp_path_factory):
    """T6 — streaming LOCF: the stateful gap-fill face must (a) emit
    filler rows for hours with no events, carrying the last value,
    (b) merge same-hour events arriving in DIFFERENT micro-batches
    into one (re-emitted) observation, matching the batch face's
    hourly argmax."""
    from datetime import datetime

    from udacity_dsnd_projects_spark.streaming.stateful import gap_fill_stateful

    root = tmp_path_factory.mktemp("gapfill")
    path = str(root / "events")
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )

    def t(h, m):
        return datetime(2024, 1, 1, h, m)

    # batch 1: user 1 twice in hour 10; user 2 once in hour 9
    b1 = [(1, t(10, 5), 1, 1.0), (1, t(10, 40), 2, 2.0), (2, t(9, 15), 3, 5.0)]
    # batch 2: user 1 jumps to hour 13 (hours 11, 12 silent);
    # user 2 gets a LATER event in the SAME hour 9 (cross-batch merge)
    b2 = [(1, t(13, 10), 4, 3.0), (2, t(9, 45), 5, 6.0)]
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(path)
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(path)

    out = gap_fill_stateful(file_stream(spark, path, schema))
    rows = run_to_memory(out, "gapfill_state", output_mode="update").collect()

    # last emission per (user, hr) is the current row (update mode)
    final: dict[tuple, tuple] = {}
    for r in rows:
        final[(r["user_id"], r["hr"])] = (
            r["value_filled"],
            r["n_events"],
            r["is_observed"],
        )
    assert final == {
        (1, t(10, 0)): (2.0, 2, 1),
        (1, t(11, 0)): (2.0, 0, 0),
        (1, t(12, 0)): (2.0, 0, 0),
        (1, t(13, 0)): (3.0, 1, 1),
        (2, t(9, 0)): (6.0, 2, 1),
    }


def test_window_chunks_stream_equals_batch(spark, tmp_path_factory):
    """The context-window chunker is stateless, so the SAME transform
    (functions/training.py::window_chunks) runs unchanged under a
    file stream in append mode; chunks accumulated across two
    micro-batch files equal the batch answer row-for-row."""
    from udacity_dsnd_projects_spark.functions.training import window_chunks

    root = tmp_path_factory.mktemp("winchunks")
    path = str(root / "docs")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    long_text = " ".join(f"tok{i % 7}" for i in range(150))  # 5 windows
    b1 = [(1, "short doc"), (2, long_text)]
    b2 = [(3, " ".join(["x"] * 48)), (4, " ".join(["y"] * 49))]  # 1 and 2
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(path)
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(path)

    got = run_to_memory(
        window_chunks(file_stream(spark, path, schema)), "win_chunks_stream"
    ).collect()
    batch = window_chunks(spark.read.schema(schema).parquet(path)).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, batch))
    # the stride math: 150 toks -> ceil((150-48)/32)+1 = 5 windows
    assert sum(1 for r in got if r.doc_id == 2) == 5
    assert sum(1 for r in got if r.doc_id == 3) == 1
    assert sum(1 for r in got if r.doc_id == 4) == 2


def test_transition_stream_equals_batch(spark, tmp_path_factory):
    """Stateful per-user transition extraction: replaying time-ordered
    micro-batches emits exactly the consecutive (prev -> next) pairs
    the batch lag() computes on the same rows — including the pairs
    that straddle micro-batch boundaries (held in per-user state)."""
    from udacity_dsnd_projects_spark.streaming.stateful import transition_stateful

    root = tmp_path_factory.mktemp("trans")
    path = str(root / "events")
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    types = ["view", "click", "purchase"]
    rows = [
        (uid, base + dt.timedelta(minutes=5 * i + uid), 100 * uid + i, types[(i + uid) % 3])
        for uid in range(4)
        for i in range(9)
    ]
    rows.sort(key=lambda r: r[1])  # time-ordered replay across batches
    for b in range(3):
        spark.createDataFrame(rows[b * 12 : (b + 1) * 12], schema).coalesce(
            1
        ).write.mode("append").parquet(path)

    got_rows = run_to_memory(
        transition_stateful(file_stream(spark, path, schema)),
        "transition_stream",
    ).collect()
    got: dict[tuple, int] = {}
    for r in got_rows:
        k = (r["prev_type"], r["next_type"])
        got[k] = got.get(k, 0) + 1

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    batch = (
        spark.read.schema(schema)
        .parquet(path)
        .select("event_type", F.lag("event_type").over(w).alias("prev_type"))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .count()
    )
    want = {(r["prev_type"], r["next_type"]): r["count"] for r in batch.collect()}
    assert got == want
    # each user contributes exactly n-1 transitions
    assert sum(got.values()) == 4 * 8


def test_substring_match_stream_equals_batch(spark, tmp_path_factory):
    """Streaming winnowing probe: new docs stream against a static
    winnowing index; a document that WRAPS a history document (the
    quote/template case exact and MinHash probes miss at low overall
    similarity) is flagged with the same pairs + scores the identical
    pipeline computes statically, and unrelated text passes clean."""
    from udacity_dsnd_projects_spark.functions.dedup import (
        winnowing_index_for,
    )
    from udacity_dsnd_projects_spark.sources.catalog import load_table
    from udacity_dsnd_projects_spark.streaming.stateful import (
        substring_match_stream,
    )

    sf_dir = "/root/testdata/sf0.001"
    hist = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    index = winnowing_index_for(hist).localCheckpoint(eager=True)

    base = {
        r["doc_id"]: r["text"]
        for r in hist.filter(F.col("doc_id") < 6).collect()
    }
    root = tmp_path_factory.mktemp("substr_stream")
    path = str(root / "rows")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    # b1: an exact re-crawl (overlap 1.0 vs its source) + gibberish;
    # b2: a new doc QUOTING doc 5 between fresh prose — the substring
    # case
    quoted = "breaking report today " + base[5] + " officials did not comment"
    b1 = [(9000001, base[3]), (9000002, "zz qq vv kk jj ww uu pp yy tt")]
    b2 = [(9000003, quoted)]
    for b in (b1, b2):
        spark.createDataFrame(b, schema).coalesce(1).write.mode(
            "append"
        ).parquet(path)

    got_rows = run_to_memory(
        substring_match_stream(file_stream(spark, path, schema), index),
        "substring_match_stream",
    ).collect()
    got = {
        (r["doc_id"], r["hist_doc_id"], r["shared"], r["overlap"])
        for r in got_rows
    }
    # batch reference: identical pipeline over the same static rows
    want = {
        (r["doc_id"], r["hist_doc_id"], r["shared"], r["overlap"])
        for r in substring_match_stream(
            spark.read.schema(schema).parquet(path), index
        ).collect()
    }
    assert got == want
    assert (9000001, 3) in {(d, h) for d, h, _, _ in got}
    by_pair = {(d, h): ov for d, h, _, ov in got}
    assert by_pair[(9000001, 3)] == 1.0  # exact re-crawl: full containment
    # the quoting doc is flagged against its quoted source
    assert any(d == 9000003 and h == 5 for d, h in by_pair)
    # gibberish stays clean
    assert not any(d == 9000002 for d, h in by_pair)
