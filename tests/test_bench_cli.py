"""bench.py helpers and the benchmarks CLI (cheap CPU configs)."""
import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def _run(args, timeout=600):
    return subprocess.run([sys.executable, *args], cwd=str(REPO),
                          capture_output=True, text=True, timeout=timeout)


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
