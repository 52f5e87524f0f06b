#!/usr/bin/env python
"""Registry-wide work-counter sweep (round-15 optimization, guide §1).

Runs EVERY registry query once against the noop sink at a small scale
factor and records the status-API work counters (stages, tasks, input
bytes, shuffle bytes, executor cpu) per query. Wall-clock on this box
is load noise; the counters are deterministic per plan, so outliers
(task counts or input bytes far above the family norm) expose hidden
re-execution — the pattern the round-15 batch-1 fixes removed from six
rank-primitive call sites.

    python tools/sweep_work_r16.py                 # all queries
    python tools/sweep_work_r16.py name1 name2     # subset

Output: one JSON line per query, then a sorted-by-cpu summary.
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

sys.path.insert(0, str(Path(__file__).resolve().parent))
from measure_r16 import _stage_metrics, _diff  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
UI_PORT = int(os.environ.get("UI_PORT", "4068"))


def main() -> None:
    from udacity_dsnd_projects_spark import registry
    from udacity_dsnd_projects_spark.session import get_spark

    spark = get_spark(
        "sweep-work-r16",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": str(UI_PORT),
            "spark.ui.retainedStages": "20000",
        },
    )
    qs = registry.queries()
    names = sys.argv[1:] or sorted(qs)
    work: dict[str, dict] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"r16-sweep: {name}")
        m0 = _stage_metrics(UI_PORT)
        try:
            qs[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as e:  # keep sweeping; report at the end
            work[name] = {"error": str(e)[:200]}
            print(json.dumps({name: work[name]}), flush=True)
            continue
        import time as _t

        _t.sleep(0.8)
        work[name] = _diff(m0, _stage_metrics(UI_PORT))
        print(json.dumps({name: work[name]}), flush=True)
    spark.sparkContext.setJobDescription(None)

    ok = {n: w for n, w in work.items() if "error" not in w}
    print("\n== top by cpu_sec ==")
    for n in sorted(ok, key=lambda n: -ok[n]["cpu_sec"])[:30]:
        print(f"{ok[n]['cpu_sec']:8.2f}s cpu {ok[n]['tasks']:5d} tasks "
              f"{ok[n]['input_mb']:8.2f}MB in {ok[n]['shuffle_write_mb']:8.2f}MB shW  {n}")
    print("\n== top by tasks ==")
    for n in sorted(ok, key=lambda n: -ok[n]["tasks"])[:30]:
        print(f"{ok[n]['tasks']:5d} tasks {ok[n]['cpu_sec']:8.2f}s cpu "
              f"{ok[n]['input_mb']:8.2f}MB in  {n}")
    errs = {n: w for n, w in work.items() if "error" in w}
    if errs:
        print("\n== errors ==")
        for n, w in errs.items():
            print(n, w["error"])
    spark.stop()


if __name__ == "__main__":
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    main()
