"""P3M (mesh + short-range correction) vs the exact dense oracle."""
import numpy as np
import pytest

import orbital_tpu as ot
from orbital_tpu.ops.forces import pairwise_acc_dense
from orbital_tpu.ops.p3m import p3m_acc_potential


@pytest.fixture
def uniform_box(rng):
    n = 2048
    pos = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    mass = (rng.uniform(0.5, 1.5, n) / n).astype(np.float32)
    return pos, mass


def _rms(a, ar):
    a, ar = np.asarray(a), np.asarray(ar)
    return (np.sqrt(np.mean(np.sum((a - ar) ** 2, -1)))
            / np.sqrt(np.mean(np.sum(ar ** 2, -1))))


@pytest.mark.parametrize("eps2", [1e-4, 1e-6])
def test_p3m_matches_dense(uniform_box, eps2):
    """Near-exact forces at softenings FAR below the mesh scale (where PM
    alone is useless) — the point of the short-range correction."""
    pos, mass = uniform_box
    a_ref, U_ref = pairwise_acc_dense(pos, mass, G=1.0, eps2=eps2)
    a, U, ov = p3m_acc_potential(pos, mass, G_grav=1.0, eps2=eps2, grid=64)
    assert int(ov) == 0
    assert _rms(a, a_ref) < 6e-3
    assert float(U) == pytest.approx(float(U_ref), rel=1e-3)


def test_p3m_overflow_counter(uniform_box):
    """Bodies beyond per-cell capacity are counted, not silently exact."""
    pos, mass = uniform_box
    _, _, ov = p3m_acc_potential(pos, mass, G_grav=1.0, eps2=1e-4,
                                 grid=64, capacity=2)
    assert int(ov) > 0


@pytest.mark.slow
def test_p3m_dead_bodies_inert(uniform_box):
    from orbital_tpu.engine.state import far_positions

    pos, mass = uniform_box
    n = len(mass)
    alive = np.ones(n, bool)
    alive[1500:] = False
    pos2 = pos.copy()
    pos2[~alive] = far_positions(int((~alive).sum()), 1.0, np.float32)
    a_live, _, _ = p3m_acc_potential(pos[alive], mass[alive],
                                     G_grav=1.0, eps2=1e-4, grid=64)
    a_mask, _, ov = p3m_acc_potential(pos2, mass, alive,
                                      G_grav=1.0, eps2=1e-4, grid=64)
    assert int(ov) == 0
    a_mask = np.asarray(a_mask)
    np.testing.assert_array_equal(a_mask[~alive], 0.0)
    np.testing.assert_allclose(a_mask[alive], np.asarray(a_live),
                               rtol=1e-4, atol=1e-7)


@pytest.mark.slow
def test_p3m_in_rollout(uniform_box):
    """force_impl='p3m' drives the KDK stepper with good energy behavior
    at eps far below the mesh scale."""
    from orbital_tpu.engine.state import make_state

    pos, mass = uniform_box
    n = len(mass)
    vel = np.zeros((n, 3))
    st = make_state(pos, vel, mass, precision="f32")
    cfg = ot.SimConfig(dt=2e-3, G=1.0, eps2=1e-4, force_impl="p3m",
                       pm_grid=64, p3m_capacity=64)
    st = ot.init_forces(st, cfg)
    fin, traj = ot.rollout_jit(st, cfg, 40, record_every=10)
    assert np.isfinite(np.asarray(fin.pos)).all()
    E = np.asarray(traj.energy, np.float64)
    assert abs((E[-1] - E[0]) / E[0]) < 2e-3


@pytest.mark.slow
def test_p3m_sharded_matches_unsharded(uniform_box, rng):
    """Body-sharded P3M (psum'd mesh + ppermute ring for the short-range
    cell lists, global-id self-pair exclusion) agrees with the
    single-device solve across a full KDK step on the virtual 8-CPU mesh."""
    import orbital_tpu as ot
    from orbital_tpu.engine.integrators import make_step_fn
    from orbital_tpu.engine.rollout import resolve_force_fn
    from orbital_tpu.engine.state import make_state
    from orbital_tpu.parallel.mesh import make_mesh
    from orbital_tpu.parallel.sharded import make_sharded_step, shard_state

    pos, mass = uniform_box
    n = len(mass)
    vel = (0.1 * rng.normal(size=(n, 3))).astype(np.float32)
    st = make_state(pos, vel, mass, precision="f32")
    cfg = ot.SimConfig(dt=1e-3, G=1.0, eps2=1e-4, force_impl="p3m",
                       pm_grid=32, p3m_capacity=64, collisions="none")
    st = ot.init_forces(st, cfg)
    ref = make_step_fn(cfg, resolve_force_fn(cfg, n))(st)

    mesh = make_mesh()
    step = make_sharded_step(cfg, mesh, st)
    out = step(shard_state(mesh, st))
    np.testing.assert_allclose(np.asarray(out.pos), np.asarray(ref.pos),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.vel), np.asarray(ref.vel),
                               rtol=1e-4, atol=1e-6)
    assert float(out.potential) == pytest.approx(float(ref.potential),
                                                 rel=1e-4)


def test_p3m_requires_softening(uniform_box):
    pos, mass = uniform_box
    with pytest.raises(ValueError, match="eps2"):
        p3m_acc_potential(pos, mass, G_grav=1.0, eps2=0.0)


@pytest.mark.slow
def test_simulate_p3m_auto_capacity(uniform_box):
    """simulate(force_impl='p3m') sizes the per-cell capacity from the
    actual density and completes with finite results."""
    from orbital_tpu.models.scene import SceneArrays

    pos, mass = uniform_box
    n = len(mass)
    arrays = SceneArrays(
        pos=np.asarray(pos, np.float64),
        vel=np.zeros((n, 3)),
        mass=np.asarray(mass, np.float64),
        radius=np.zeros(n),
        names=[f"b{i}" for i in range(n)],
        uuids=[f"u{i}" for i in range(n)],
    )
    res = ot.simulate(arrays, steps=10, dt=1e-3, softening=1e-2,
                      force_impl="p3m", pm_grid=32, precision="f32",
                      rescale=None, record_every=5)
    assert np.isfinite(res.pos).all()
    assert res.config.p3m_capacity >= 32
