"""Fused whole-rollout Pallas kernel vs the scan stepper (interpret mode)."""
import numpy as np
import pytest

import orbital_tpu as ot
from orbital_tpu.engine.state import make_state
from orbital_tpu.ops.fused_rollout import fused_rollout


@pytest.fixture
def cluster(rng):
    n = 256
    pos = rng.normal(size=(n, 3))
    vel = rng.normal(size=(n, 3)) * 0.1
    mass = rng.uniform(0.5, 1.5, n) / n
    return pos, vel, mass


@pytest.mark.parametrize("precision", ["f32", "ds32"])
def test_matches_scan_rollout(cluster, precision):
    pos, vel, mass = cluster
    st = make_state(pos, vel, mass, precision=precision)
    cfg = ot.SimConfig(dt=1e-3, G=1.0, eps2=1e-4, force_impl="dense")
    st = ot.init_forces(st, cfg)
    ref, _ = ot.rollout_jit(st, cfg, 10)
    out = fused_rollout(st, cfg, 10, tile_i=64, tile_j=128)

    def full(s, f):
        a = np.asarray(getattr(s, f), np.float64)
        lo = getattr(s, f + "_lo")
        return a + np.asarray(lo, np.float64) if lo is not None else a

    np.testing.assert_allclose(full(out, "pos"), full(ref, "pos"), atol=1e-6)
    np.testing.assert_allclose(full(out, "vel"), full(ref, "vel"), atol=1e-6)
    assert float(out.time) == pytest.approx(float(ref.time))
    assert int(out.step) == 10


def test_dynamic_step_count_no_recompile(cluster):
    pos, vel, mass = cluster
    st = make_state(pos, vel, mass, precision="f32")
    cfg = ot.SimConfig(dt=1e-3, G=1.0, eps2=1e-4, force_impl="dense")
    st = ot.init_forces(st, cfg)
    o5 = fused_rollout(st, cfg, 5, tile_i=64, tile_j=128)
    o9 = fused_rollout(st, cfg, 9, tile_i=64, tile_j=128)
    assert int(o5.step) == 5 and int(o9.step) == 9
    ref, _ = ot.rollout_jit(st, cfg, 9)
    np.testing.assert_allclose(np.asarray(o9.pos), np.asarray(ref.pos), atol=1e-6)


def test_dead_bodies_inert(cluster):
    pos, vel, mass = cluster
    st = make_state(pos, vel, mass, precision="f32", pad_to=128)
    cfg = ot.SimConfig(dt=1e-3, G=1.0, eps2=1e-4, force_impl="dense")
    st = ot.init_forces(st, cfg)
    out = fused_rollout(st, cfg, 5, tile_i=64, tile_j=128)
    ref, _ = ot.rollout_jit(st, cfg, 5)
    alive = np.asarray(st.alive)
    np.testing.assert_allclose(np.asarray(out.pos)[alive],
                               np.asarray(ref.pos)[alive], atol=1e-6)


def test_guards():
    st = make_state(np.zeros((8, 3)), np.zeros((8, 3)), np.ones(8), precision="f32")
    with pytest.raises(ValueError):
        fused_rollout(st, ot.SimConfig(dt=1.0, eps2=0.0), 1)
    with pytest.raises(ValueError):
        fused_rollout(st, ot.SimConfig(dt=1.0, eps2=1.0, collisions="bounce"), 1)
    with pytest.raises(ValueError):
        fused_rollout(st, ot.SimConfig(dt=1.0, eps2=1.0, integrator="rk4"), 1)


def test_rollout_auto_routes_to_fused(cluster, monkeypatch):
    """rollout() routes unrecorded eligible rollouts to the fused kernel
    (eligibility forced here since tests run on CPU) and refreshes the
    acc/potential caches to match the scan path (VERDICT r1 #9)."""
    from orbital_tpu.engine import rollout as R

    pos, vel, mass = cluster
    st = make_state(pos, vel, mass, precision="ds32")
    cfg = ot.SimConfig(dt=1e-3, G=1.0, eps2=1e-4, force_impl="dense")
    st = ot.init_forces(st, cfg)
    ref, _ = R.rollout(st, cfg, 12, fused="never")

    routed = {}
    real = R._fused_eligible
    def spy(s, c):
        routed["checked"] = True
        return True
    monkeypatch.setattr(R, "_fused_eligible", spy)
    out, traj = R.rollout(st, cfg, 12)
    assert routed.get("checked") and traj is None
    np.testing.assert_allclose(np.asarray(out.pos), np.asarray(ref.pos), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.vel), np.asarray(ref.vel), atol=1e-6)
    # caches refreshed: acc/potential match the scan path's final values
    np.testing.assert_allclose(np.asarray(out.acc), np.asarray(ref.acc), atol=1e-5)
    assert float(out.potential) == pytest.approx(float(ref.potential), rel=1e-5)
    assert int(out.step) == 12

    # real eligibility gate: CPU backend and recording both disqualify
    assert not real(st, cfg) or __import__("jax").default_backend() == "tpu"
    out2, traj2 = R.rollout(st, cfg, 12, record_every=6)
    assert traj2 is not None and traj2.pos.shape[0] == 2
