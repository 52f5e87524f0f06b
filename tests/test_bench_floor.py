"""Bench regression guard (BASELINE.md "Engine bench targets"): a
fresh bench.py run at sf 0.1 must keep its LEGACY17 subtotal within 2×
the newest driver-recorded floor (best-of-2 methodology, the same 17
queries recorded every round since r2 — the round-9 headline widening
added 6 heavy queries to ``value`` but the ratchet lineage gates on the
unchanged subtotal, ``legacy17_sec``). Runs bench.py exactly as the
driver does — a subprocess with its own session — so the measurement
includes nothing from the test session."""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow  # full bench.py subprocess at sf 0.1

REPO = Path(__file__).resolve().parent.parent


def _run_bench_once() -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.1")
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        capture_output=True,
        text=True,
        timeout=560,
        cwd=REPO,
        env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["unit"] == "sec" and rec["sf"] == 0.1
    return rec


def test_bench_total_within_2x_floor():
    sys.path.insert(0, str(REPO))
    from bench import BENCH_FLOOR_SEC

    rec = _run_bench_once()
    if rec["legacy17_sec"] > 2 * BENCH_FLOOR_SEC:
        # One retry: shared-host CPU contention can inflate identical
        # plans 2-3x run-to-run (observed: the same commit measuring
        # 18.8s, 27.6s and 32.1s back-to-back). A genuine plan
        # regression is systematic and fails BOTH runs; a transient
        # spike fails only one.
        rec = _run_bench_once()
    assert rec["legacy17_sec"] <= 2 * BENCH_FLOOR_SEC, (
        f"bench regression: legacy17 {rec['legacy17_sec']:.2f}s > 2x floor "
        f"({BENCH_FLOOR_SEC}s); per-query: {rec['queries']}"
    )
    # the widened total must cover every headline query and decompose
    # into the legacy subtotal plus the round-9 additions
    from bench import HEADLINE, LEGACY17

    assert set(rec["queries"]) == set(HEADLINE)
    extra = sum(v for k, v in rec["queries"].items() if k not in LEGACY17)
    assert abs(rec["value"] - (rec["legacy17_sec"] + extra)) < 0.01
