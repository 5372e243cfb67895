"""bench.py helpers and the benchmarks CLI (cheap CPU configs)."""
import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def _run(args, timeout=600, env=None):
    return subprocess.run([sys.executable, *args], cwd=str(REPO),
                          capture_output=True, text=True, timeout=timeout,
                          env=env)


def test_bench_watchdog_emits_last_good_on_hang():
    """Round 3's driver bench was rc=124/parsed=null: the main thread
    blocked inside a remote-compile C call starves a main-thread SIGALRM
    handler until the external SIGKILL. The daemon watchdog thread must
    emit the last-good JSON line and exit 0 regardless of what the main
    thread is wedged in (simulated here with an uninterruptible wait
    before any output)."""
    env = {**os.environ, "BENCH_HANG_FOR_TEST": "1", "BENCH_WATCHDOG_S": "3"}
    out = _run(["bench.py"], timeout=60, env=env)
    assert out.returncode == 0, out.stderr[-1500:]
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.strip()]
    assert lines, "watchdog printed nothing"
    data = json.loads(lines[-1])
    assert data["unit"] == "body-steps/s"
    # repo snapshot exists, so the cached headline must be carried over
    assert data["value"] > 0
    assert "note" in data["extras"] or "error" in data["extras"]


def test_benchmarks_cli_lagrange3():
    out = _run(["-m", "benchmarks.run", "--config", "lagrange3",
                "--steps", "50", "--iters", "5", "--precision", "f32",
                "--platform", "cpu"])
    assert out.returncode == 0, out.stderr[-1500:]
    data = json.loads(out.stdout.strip().splitlines()[-1])
    assert data["config"] == "lagrange3" and data["n"] == 3
    assert data["body_steps_per_s"] > 0


def test_benchmarks_cli_rk4_integrator():
    out = _run(["-m", "benchmarks.run", "--config", "lagrange3",
                "--steps", "20", "--iters", "4", "--integrator", "rk4",
                "--precision", "f32", "--platform", "cpu"])
    assert out.returncode == 0, out.stderr[-1500:]
    data = json.loads(out.stdout.strip().splitlines()[-1])
    assert data["integrator"] == "rk4"


def test_bench_merge_failure_keeps_last_good_values():
    """A rung that errors this run (transient remote-compile hang) must
    NOT evict the last-good measured values of its group — round 4's
    driver-sim run lost the 512k staged-tree datapoint to exactly that.
    Only the group's stale error keys are replaced."""
    sys.path.insert(0, str(REPO))
    try:
        from bench import _merge_snapshot_extras

        prev = {
            "tree_body_steps_per_s_524288_plummer": 702353.9,
            "tree_s_per_eval_524288": 0.746,
            "tree_overflow_524288": 0,
            "hermite_body_steps_per_s_65536": 1232202.4,
        }
        fresh = {"bench_tree_524288_error": "rung deadline exceeded"}
        merged = _merge_snapshot_extras(prev, fresh)
        assert merged["tree_body_steps_per_s_524288_plummer"] == 702353.9
        assert merged["tree_overflow_524288"] == 0
        assert merged["bench_tree_524288_error"] == "rung deadline exceeded"
        # untouched group persists
        assert merged["hermite_body_steps_per_s_65536"] == 1232202.4
    finally:
        sys.path.remove(str(REPO))


def test_bench_merge_success_evicts_stale_group():
    """A fresh success replaces the group's stale values AND clears any
    stale error key, but never touches other groups."""
    sys.path.insert(0, str(REPO))
    try:
        from bench import _merge_snapshot_extras

        prev = {
            "tree_body_steps_per_s_524288_plummer": 1.0,
            "tree_s_per_eval_524288": 9.9,
            "bench_tree_524288_error": "old failure",
            "respa_k4_body_steps_per_s_65536": 2067087.3,
            "respa_k4_drift_65536_10000steps": 3.1e-07,
        }
        fresh = {
            "tree_body_steps_per_s_524288_plummer": 702353.9,
            # k5 measured this run; k4 skipped for time — its last-good
            # values must survive (per-K groups, not one respa blob)
            "respa_k5_body_steps_per_s_65536": 2328646.6,
            "respa_k5_drift_65536_10000steps": 1.45e-06,
        }
        merged = _merge_snapshot_extras(prev, fresh)
        assert merged["tree_body_steps_per_s_524288_plummer"] == 702353.9
        assert "tree_s_per_eval_524288" not in merged  # stale pair evicted
        assert "bench_tree_524288_error" not in merged
        assert merged["respa_k4_body_steps_per_s_65536"] == 2067087.3
        assert merged["respa_k5_body_steps_per_s_65536"] == 2328646.6
    finally:
        sys.path.remove(str(REPO))


def test_bench_cluster_is_virialized():
    sys.path.insert(0, str(REPO))
    try:
        from bench import make_cluster
        from orbital_tpu.utils import native

        pos, vel, mass, eps2 = make_cluster(256)
        U = abs(native.potential_f64(pos, mass, eps2))
        K = 0.5 * float(np.sum(mass * np.sum(vel**2, -1)))
        assert 2 * K == pytest.approx(U, rel=1e-5)
    finally:
        sys.path.remove(str(REPO))


def test_bench_ensemble_drift_small():
    """The ensemble-drift certification rung (VERDICT r4 #2): a tiny
    ensemble over a short horizon must return finite, small per-member
    drift, with the member-0 control no worse than the max."""
    sys.path.insert(0, str(REPO))
    try:
        from bench import bench_ensemble_drift

        d_max, d_m0 = bench_ensemble_drift(4, steps=40, chunk=20)
        assert np.isfinite(d_max) and np.isfinite(d_m0)
        assert 0.0 <= d_m0 <= d_max < 1e-4  # short horizon: well under budget
    finally:
        sys.path.remove(str(REPO))
