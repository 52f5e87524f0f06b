#!/usr/bin/env python
"""Round-15 optimization measurement harness (guide §1).

Isolates each headline query: times it against the noop sink
(``df.write.format("noop")`` — forces every column of every row without
the bench's collect-side hash fold), best-of-N, labels the jobs, and
dumps ``explain("formatted")`` for every query to ``plans/r16/``.

This harness NEVER feeds the driver bench (bench.py is untouched); it
exists so before/after plan+timing evidence for OPTIMIZATION_r16.md is
reproducible:

    python tools/measure_r16.py                # all headline queries
    python tools/measure_r16.py trade_pagerank winnowing_strip
    SUFFIX=after python tools/measure_r16.py   # plans/r16/<q>_after.txt
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SUFFIX = os.environ.get("SUFFIX", "before")
RUNS = int(os.environ.get("RUNS", "2"))
PLAN_DIR = Path(_REPO) / "plans" / "r16"


def _stage_metrics(port: int) -> dict:
    """Cumulative completed-stage work counters from the status REST
    API — deterministic for a given plan (wall-clock is not, under
    this box's external-load regime): stage/task counts, input bytes,
    shuffle read/write bytes, executor run time."""
    import json as _json
    import urllib.request

    base = f"http://localhost:{port}/api/v1"
    apps = _json.load(urllib.request.urlopen(f"{base}/applications"))
    app_id = apps[0]["id"]
    stages = _json.load(
        urllib.request.urlopen(f"{base}/applications/{app_id}/stages?status=complete")
    )
    out = {
        "stages": len(stages),
        "tasks": sum(s["numCompleteTasks"] for s in stages),
        "input_mb": round(sum(s["inputBytes"] for s in stages) / 1e6, 2),
        "shuffle_write_mb": round(
            sum(s["shuffleWriteBytes"] for s in stages) / 1e6, 2
        ),
        "shuffle_read_mb": round(
            sum(s["shuffleReadBytes"] for s in stages) / 1e6, 2
        ),
        "run_sec": round(sum(s["executorRunTime"] for s in stages) / 1e3, 2),
        # actual CPU ns — robust to host steal, the fair metric for
        # expression-evaluation-count changes
        "cpu_sec": round(sum(s["executorCpuTime"] for s in stages) / 1e9, 2),
    }
    return out


def _diff(a: dict, b: dict) -> dict:
    return {k: round(b[k] - a[k], 2) for k in a}


UI_PORT = int(os.environ.get("UI_PORT", "4067"))


def main() -> None:
    from bench import HEADLINE
    from udacity_dsnd_projects_spark import registry
    from udacity_dsnd_projects_spark.session import get_spark

    spark = get_spark(
        "measure-r16",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": str(UI_PORT),
            "spark.ui.retainedStages": "5000",
        },
    )
    qs = registry.queries()
    names = sys.argv[1:] or [n for n in HEADLINE if n in qs]

    # same warmup as bench.py so first-query JIT/worker-fork noise
    # doesn't land on the first measured query
    for w in (
        "risk_join",
        "minhash_lsh_pairs",
        "simhash_near_dup_pairs",
        "cosine_topk_bruteforce",
    ):
        if w in qs:
            qs[w](spark, "/root/testdata/sf0.001").count()

    PLAN_DIR.mkdir(parents=True, exist_ok=True)
    out: dict[str, float] = {}
    work: dict[str, dict] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"r16-measure: {name}")
        best = float("inf")
        m0 = _stage_metrics(UI_PORT)
        for i in range(RUNS):  # RUNS=0 -> plans only
            t0 = time.perf_counter()
            df = qs[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            if i == 0:  # work counters for ONE cold run of the query
                time.sleep(1.5)  # let the status store settle
                work[name] = _diff(m0, _stage_metrics(UI_PORT))
        out[name] = round(best, 4)
        plan = qs[name](spark, SF_DIR)._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        (PLAN_DIR / f"{name}_{SUFFIX}.txt").write_text(plan)
        print(json.dumps({name: out[name]}), flush=True)
        spark.sparkContext.setJobDescription(None)

    print(
        json.dumps(
            {
                "metric": "noop_isolated_best_of_%d" % RUNS,
                "total": round(sum(out.values()), 4),
                "queries": out,
                "work": work,
                "sf_dir": SF_DIR,
                "suffix": SUFFIX,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
