#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the total wall-clock of all headline queries (each executed
to completion via a count-style action that forces the full plan).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Round-5 recorded total (BENCH_r05.json, sf 0.1, local[32] on the
#: driver's 32-core/128GiB box) — the regression floor, ratcheted each
#: round to the newest driver-recorded total over the SAME 17-query
#: best-of-2 methodology (r2: 20.1912s → r3: 17.6925s → r4: 13.7779s →
#: r5: 13.64s). `tests/test_bench_floor.py` fails the suite if a fresh
#: run exceeds 2× this; BASELINE.md "Engine bench targets".
#: Machine-specific: on slower hardware set SPARK_GRAFT_BENCH_FLOOR to
#: that box's recorded total instead.
BENCH_FLOOR_SEC = float(os.environ.get("SPARK_GRAFT_BENCH_FLOOR", "13.64"))

#: Queries timed by the bench. Grows as the registry grows; keep this the
#: set of headline operators (one per §2 category) rather than every
#: micro-query, so the number stays interpretable.
HEADLINE: tuple[str, ...] = (
    "risk_join",
    "pricing_summary",
    "revenue_by_nation",
    "top_unshipped_orders",
    "hourly_event_rollup",
    "join_asof",
    "latest_per_key",
    "sessionize",
    "minhash_lsh_pairs",
    "exact_dedup",
    "simhash_near_dup_pairs",
    "cosine_topk_bruteforce",
    "cosine_topk_ivf",
    "quality_score",
    # round-2 scale additions: bucketed range join, iterative graph,
    # sub-document dedup
    "interval_count_join",
    "trade_pagerank",
    "passage_dedup",
)


def _sf_from_dir(d: str) -> float:
    name = Path(d).name  # e.g. sf0.1
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return -1.0


#: Stream micro-bench replay shape: events split into this many
#: chronological micro-batches (one file per trigger), so the watermark
#: advances ~3 days of event time per batch and join state is evicted
#: between batches. Peak state is the regression metric: a change that
#: breaks eviction (losing the range predicate, or a watermark on only
#: one side) shows up as peak_state_rows jumping toward the full
#: stream size, the way a slow plan shows up in runtime.
STREAM_CHUNKS = 10
STREAM_DELAY = "1 hour"


def stream_state_bench(spark) -> dict:
    """Replay the corpus events through the DEFAULT (watermarked)
    stream-stream join and record peak join-state rows + wall-clock.

    view events (customer/score side) join purchase events
    (email side) on user id within ±STREAM_DELAY event time, exactly
    the `join_risk` default face. Both replays are file streams over
    chronologically-chunked parquet (maxFilesPerTrigger=1, oldest
    first), so state grows and drains across STREAM_CHUNKS
    micro-batches the way it would against a live source."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from udacity_dsnd_projects_spark.sources.catalog import load_table
    from udacity_dsnd_projects_spark.streaming.stedi import join_risk

    ev = load_table(spark, "events", SF_DIR)
    root = tempfile.mkdtemp(prefix="bench_stream_")
    try:
        # chronological chunks on fixed quantile boundaries of ts
        bounds = ev.selectExpr(
            f"percentile(unix_micros(ts), array({', '.join(str((i + 1) / STREAM_CHUNKS) for i in range(STREAM_CHUNKS - 1))})) AS b"
        ).collect()[0]["b"]
        edges = [float("-inf")] + list(bounds) + [float("inf")]
        for side, etype in (("risk", "view"), ("cust", "purchase")):
            part = ev.filter(F.col("event_type") == etype)
            for i in range(STREAM_CHUNKS):
                part.filter(
                    (F.unix_micros("ts") > edges[i])
                    & (F.unix_micros("ts") <= edges[i + 1])
                ).coalesce(1).write.mode("append").parquet(f"{root}/{side}")

        schema = ev.schema
        risks = (
            spark.readStream.format("parquet")
            .schema(schema)
            .option("maxFilesPerTrigger", 1)
            .load(f"{root}/risk")
            .select(
                F.col("user_id").alias("customer"),
                F.col("value").alias("score"),
                F.col("ts").alias("risk_event_ts"),
            )
        )
        custs = (
            spark.readStream.format("parquet")
            .schema(schema)
            .option("maxFilesPerTrigger", 1)
            .load(f"{root}/cust")
            .select(
                F.col("user_id").alias("email"),
                F.col("ts").alias("event_ts"),
            )
        )
        joined = join_risk(
            risks,
            custs,
            watermarks=("risk_event_ts", "event_ts"),
            delay=STREAM_DELAY,
        )
        t0 = time.perf_counter()
        q = joined.writeStream.format("noop").outputMode("append").start()
        try:
            q.processAllAvailable()
            progresses = list(q.recentProgress)
        finally:
            q.stop()
        elapsed = round(time.perf_counter() - t0, 4)
        peak = max(
            (
                sum(op["numRowsTotal"] for op in p["stateOperators"])
                for p in progresses
                if p["stateOperators"]
            ),
            default=0,
        )
        rows_out = sum(p["sink"]["numOutputRows"] for p in progresses)
        return {
            "join_risk_peak_state_rows": int(peak),
            "join_risk_output_rows": int(rows_out),
            "micro_batches": len(progresses),
            "sec": elapsed,
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    from udacity_dsnd_projects_spark import registry
    from udacity_dsnd_projects_spark.session import get_spark

    spark = get_spark("engine-bench")
    qs = registry.queries()
    names = [n for n in HEADLINE if n in qs] or sorted(qs)

    # Warm the JVM/session on the smallest corpus so JIT/codegen startup
    # isn't attributed to the first query of each family (relational,
    # text-hashing, embedding math exercise disjoint codepaths).
    # simhash_near_dup_pairs is in the list because it runs the
    # vectorized Pandas fingerprint face: the first Python stage of a
    # session forks every Python worker and imports numpy/pandas in
    # each — startup cost, not query cost.
    for w in (
        "risk_join",
        "minhash_lsh_pairs",
        "simhash_near_dup_pairs",
        "cosine_topk_bruteforce",
    ):
        if w in qs:
            qs[w](spark, "/root/testdata/sf0.001").count()

    # Best-of-2 per query: a single local[32] run is exposed to
    # scheduler/OS noise (observed ±50% on identical plans); the min of
    # two runs measures the plan, not the machine's mood. The action
    # still forces full execution of every operator (count() alone can
    # skip projections; summing a hash of all columns cannot).
    timings: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            df = qs[name](spark, SF_DIR)
            df.selectExpr("sum(hash(*)) AS h").collect()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": _sf_from_dir(SF_DIR),
                # bounded-state regression metric for the default
                # (watermarked) stream-stream join face — not part of
                # `value`, which stays the comparable headline total
                "stream": stream_state_bench(spark),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
