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


def _wait_for_trough(max_wait_s: int = 300, threshold: float = 1.0) -> None:
    """Best-effort: delay a RETRY until the host's 1-min load drops
    under ``threshold`` (this box's external load spikes to 20-30 on a
    ~15-min period with 2-4 min troughs — BASELINE.md lineage). The
    retry exists to shed transient contention; launching it INTO the
    same spike defeats it. Gives up after ``max_wait_s`` and runs
    anyway — the gate must never hang on a busy host."""
    import time

    deadline = time.monotonic() + max_wait_s
    while time.monotonic() < deadline:
        try:
            load1 = float(Path("/proc/loadavg").read_text().split()[0])
        except (OSError, ValueError, IndexError):
            return
        if load1 < threshold:
            return
        time.sleep(15)


def _run_bench_once() -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.1")
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        capture_output=True,
        text=True,
        # full bench wall time: ~6-8 min loaded even after the r14
        # stream-section fix; a TimeoutExpired here reads as a test
        # ERROR, so keep real headroom over the worst observed run
        timeout=840,
        cwd=REPO,
        env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["unit"] == "sec" and rec["sf"] == 0.1
    return rec


@pytest.fixture(scope="module")
def bench_rec():
    """ONE shared bench run for every floor gate — a second full run
    only happens as a per-test retry on a hot reading."""
    sys.path.insert(0, str(REPO))
    return _run_bench_once()


def test_bench_total_within_2x_floor(bench_rec):
    from bench import BENCH_FLOOR_SEC

    rec = bench_rec
    if rec["legacy17_sec"] > 2 * BENCH_FLOOR_SEC:
        # One retry: shared-host CPU contention can inflate identical
        # plans 2-3x run-to-run (observed: the same commit measuring
        # 18.8s, 27.6s and 32.1s back-to-back). A genuine plan
        # regression is systematic and fails BOTH runs; a transient
        # spike fails only one — so wait out the spike before retrying.
        _wait_for_trough()
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


def test_stream_total_within_3x_floor(bench_rec):
    """Round-13 guard (VERDICT r12 task 4): the stream-section wall
    clock gets a ratchet like batch queries have — the r12 driver
    reading inflated ~4× (join_risk replay 29.4→126 s) with
    bit-identical state counters and nothing gated it. Gate is 3×
    (not the batch 2×): each stream replay is SINGLE-SHOT — a
    micro-batch sequence can't take a best-of-2 min the way the batch
    queries do — so environmental swings hit it at full amplitude
    (observed 66.5 s quiet vs 126 s under shared-host load on
    identical code, same day)."""
    from bench import STREAM_FLOOR_SEC

    rec = bench_rec
    if rec["stream"]["stream_total_sec"] > 3 * STREAM_FLOOR_SEC:
        # same hot-box retry as the batch gate, trough-waited: under
        # the re-based 54.87 floor a full external spike can read
        # ~4x (228 s observed, counters exact), so the retry must not
        # launch into the same spike
        _wait_for_trough()
        rec = _run_bench_once()
    got = rec["stream"]["stream_total_sec"]
    assert got <= 3 * STREAM_FLOOR_SEC, (
        f"stream bench regression: {got:.2f}s > 3x floor "
        f"({STREAM_FLOOR_SEC}s); section: "
        f"{ {k: v for k, v in rec['stream'].items() if k.endswith('_sec') or k == 'sec'} }"
    )
    # the recorded subtotal must decompose into the per-face readings
    parts = sum(
        v
        for k, v in rec["stream"].items()
        if (k == "sec" or k.endswith("_sec")) and k != "stream_total_sec"
    )
    assert abs(got - parts) < 0.01
    # bit-stable state counters are the stream section's correctness
    # half: identical plans must hold them exactly (BASELINE.md)
    assert rec["stream"]["join_risk_peak_state_rows"] > 0
    assert rec["stream"]["join_risk_output_rows"] > 0
