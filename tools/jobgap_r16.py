#!/usr/bin/env python
"""Driver-residual profiler (round 16): runs one query isolated on the
noop sink and prints the JOB TIMELINE from the status REST API —
per-job duration plus the GAP to the previous job's completion. The
gaps are driver-side work (plan analysis, approxQuantile round-trip
overhead, py4j latency); the job durations are executor work. This is
the measurement VERDICT r15 asked for before touching the rank
primitive's sequential metadata actions.

    python tools/jobgap_r16.py curriculum_pack_order [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from datetime import datetime
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
UI_PORT = int(os.environ.get("UI_PORT", "4069"))


def _jobs(port: int) -> list:
    base = f"http://localhost:{port}/api/v1"
    apps = json.load(urllib.request.urlopen(f"{base}/applications"))
    app_id = apps[0]["id"]
    return json.load(
        urllib.request.urlopen(f"{base}/applications/{app_id}/jobs")
    )


def _ts(s: str) -> float:
    return datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()


def main() -> None:
    from udacity_dsnd_projects_spark import registry
    from udacity_dsnd_projects_spark.session import get_spark

    name = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark(
        "jobgap-r16",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": str(UI_PORT),
            "spark.ui.retainedJobs": "5000",
            "spark.ui.retainedStages": "20000",
        },
    )
    qs = registry.queries()
    for w in ("risk_join", "minhash_lsh_pairs", "simhash_near_dup_pairs"):
        qs[w](spark, "/root/testdata/sf0.001").count()

    for r in range(runs):
        n0 = max((j["jobId"] for j in _jobs(UI_PORT)), default=-1)
        spark.sparkContext.setJobDescription(f"jobgap: {name} run{r}")
        t0 = time.perf_counter()
        df = qs[name](spark, SF_DIR)
        t_build = time.perf_counter() - t0
        df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        time.sleep(1.0)
        jobs = sorted(
            (j for j in _jobs(UI_PORT) if j["jobId"] > n0),
            key=lambda j: j["jobId"],
        )
        print(f"\n== {name} run{r}: wall {wall:.3f}s (construction {t_build:.3f}s), {len(jobs)} jobs ==")
        prev_end = None
        tot_job, tot_gap = 0.0, 0.0
        for j in jobs:
            sub, end = _ts(j["submissionTime"]), _ts(j["completionTime"])
            gap = sub - prev_end if prev_end is not None else 0.0
            prev_end = end
            tot_job += end - sub
            tot_gap += max(gap, 0)
            desc = (j.get("description") or j["name"])[:90]
            print(
                f"  job {j['jobId']:4d} dur {end-sub:6.3f}s gap {gap:6.3f}s "
                f"tasks {j['numTasks']:4d}  {desc}"
            )
        print(
            f"  SUM job {tot_job:.3f}s gap {tot_gap:.3f}s "
            f"(wall - jobs - gaps = head/tail {wall - tot_job - tot_gap:.3f}s)"
        )
    spark.stop()


if __name__ == "__main__":
    main()
