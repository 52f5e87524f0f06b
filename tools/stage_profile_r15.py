#!/usr/bin/env python
"""Per-stage profile of one registry query (round-15 follow-up
diagnostics): run the query to the noop sink once, then print each
completed stage's wall/run/cpu/GC/fetch-wait so the run-vs-cpu gap
seen in tools/measure_r15.py's totals can be attributed to a stage.

    python tools/stage_profile_r15.py curriculum_pack_order
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    qname = sys.argv[1]
    from pyspark.sql import SparkSession

    from udacity_dsnd_projects_spark import registry

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"stage-profile-{qname}")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4049")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    q = registry.queries()[qname]
    t0 = time.time()
    spark.sparkContext.setJobDescription(f"profile:{qname}")
    q(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    base = "http://localhost:4049/api/v1"
    apps = json.load(urllib.request.urlopen(f"{base}/applications"))
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(
            f"{base}/applications/{app_id}/stages?status=complete&details=false"
        )
    )
    stages.sort(key=lambda s: -s["executorRunTime"])
    if os.environ.get("JOBS"):
        jobs = json.load(
            urllib.request.urlopen(f"{base}/applications/{app_id}/jobs")
        )
        for j in sorted(jobs, key=lambda j: j["jobId"]):
            print(
                f"job {j['jobId']:>3} stages={j['stageIds']} "
                f"tasks={j['numCompletedTasks']} {j['name'][:80]}"
            )
    if os.environ.get("STAGE_DETAILS"):
        for s in stages[: int(os.environ["STAGE_DETAILS"])]:
            d = json.load(
                urllib.request.urlopen(
                    f"{base}/applications/{app_id}/stages/{s['stageId']}"
                )
            )[0]
            print(f"--- stage {s['stageId']} ({s['executorRunTime']/1e3:.1f}s run) ---")
            print(d.get("details", "")[:1500])
    print(f"wall={wall:.2f}s  stages={len(stages)}")
    hdr = (
        "stage tasks   run_s   cpu_s    gc_s fetchw_s  wrt_s  in_mb name"
    )
    print(hdr)
    for s in stages[:25]:
        print(
            f"{s['stageId']:>5} {s['numCompleteTasks']:>5} "
            f"{s['executorRunTime']/1e3:>7.2f} "
            f"{s['executorCpuTime']/1e9:>7.2f} "
            f"{s['jvmGcTime']/1e3:>7.2f} "
            f"{s['shuffleFetchWaitTime']/1e3:>8.2f} "
            f"{s['shuffleWriteTime']/1e9:>6.2f} "
            f"{s['inputBytes']/1e6:>6.1f} "
            f"{s['name'][:60]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
