"""Golden trajectory comparisons: our f64 CPU engine vs the reference
implementation running side by side (the north-star parity requirement).

The reference constructor coerces velocities to float32
(core/physics.py:184); to compare integrator/force parity (not reproduce
that quirk) velocities are re-assigned as float64 after construction, as
the reference's own examples do (core/examples.py:104-105).
"""
import numpy as np
import pytest

import orbital_tpu as ot
from orbital_tpu.engine.state import make_state
from orbital_tpu.ops.diagnostics import total_energy

G = ot.STANDARD.G


def _run_reference(reference, pos, vel, mass, radius, dt, steps, softening):
    ref = reference["core.physics"]
    reng = reference["core.engine"]
    objs = []
    for i in range(len(mass)):
        o = ref.Object(float(mass[i]), float(radius[i]), velocity=np.zeros(3),
                       coordinates=ref.Coordinates(*pos[i]))
        o.velocity = vel[i].astype(np.float64).copy()
        objs.append(o)
    eng = reng.SimulationEngine(ref.ObjectCollection(objs), dt=dt,
                                softening=softening, restitution=1.0,
                                cache=False, max_hist=None)
    eng.run(steps)
    out_pos = np.stack([o.position() for o in eng.objects])
    out_vel = np.stack([o.velocity for o in eng.objects])
    return out_pos, out_vel, eng.total_energy()


def _run_ours(pos, vel, mass, radius, dt, steps, softening):
    st = make_state(pos, vel, mass, radius, precision="f64")
    cfg = ot.SimConfig(dt=dt, G=G, eps2=softening**2, collisions="bounce",
                       restitution=1.0)
    st = ot.init_forces(st, cfg)
    fin, _ = ot.rollout_jit(st, cfg, steps)
    E = float(total_energy(fin.vel, fin.mass, fin.potential))
    return np.asarray(fin.pos), np.asarray(fin.vel), E


def _sun_earth_moon_ic():
    from orbital_tpu.models.objects import Coordinates, Object, set_circular_orbit

    M_sun, R_sun = 1.98847e30, 6.9634e8
    M_earth, R_earth = 5.972e24, 6.371e6
    M_moon, R_moon = 7.348e22, 1.737e6
    AU, R_em = 1.495978707e11, 384400e3
    sun = Object(M_sun, R_sun, velocity=np.zeros(3), coordinates=Coordinates(0, 0, 0))
    earth = Object(M_earth, R_earth, velocity=np.zeros(3), coordinates=Coordinates(AU, 0, 0))
    moon = Object(M_moon, R_moon, velocity=np.zeros(3), coordinates=Coordinates(AU + R_em, 0, 0))
    set_circular_orbit(sun, earth)
    v_cm = earth.velocity.copy()
    v_rel = np.sqrt(G * (M_earth + M_moon) / R_em) * np.array([0.0, 1.0, 0.0])
    earth.velocity = v_cm - (M_moon / (M_earth + M_moon)) * v_rel
    moon.velocity = v_cm + (M_earth / (M_earth + M_moon)) * v_rel
    objs = (sun, earth, moon)
    return (np.stack([o.position() for o in objs]),
            np.stack([o.velocity for o in objs]),
            np.array([o.mass for o in objs]),
            np.array([o.radius for o in objs]))


def test_sun_earth_moon_golden(reference):
    pos, vel, mass, radius = _sun_earth_moon_ic()
    steps, dt, soft = 1000, 3600.0, 1e3
    rp, rv, rE = _run_reference(reference, pos, vel, mass, radius, dt, steps, soft)
    op, ov, oE = _run_ours(pos, vel, mass, radius, dt, steps, soft)
    # trajectories agree to sub-millimeter over 1000 steps
    np.testing.assert_allclose(op, rp, rtol=0, atol=1e-3)
    np.testing.assert_allclose(ov, rv, rtol=0, atol=1e-9)
    assert oE == pytest.approx(rE, rel=1e-12)


def test_solar_system_26body_golden(reference):
    ours = ot.solar_system_v2(moons=True)
    ours.standardize_units(mass_unit="kilograms", distance_unit="meters",
                           angle_unit="radians", time_unit="seconds")
    pos, vel, mass, radius = [], [], [], []
    for b in ours:
        r, v = b.get_state()
        r, v = np.array(r), np.array(v)
        if b.parent is not None and b.parent.parent is not None:
            # moons: compose with the (heliocentric) parent state, as the
            # reference app does (app/app.py:37-40)
            pr, pv = b.parent.get_state()
            r, v = r + np.array(pr), v + np.array(pv)
        pos.append(r); vel.append(v)
        mass.append(b.mass.value); radius.append(b.radius.value)
    pos, vel = np.stack(pos), np.stack(vel)
    mass, radius = np.array(mass), np.array(radius)

    steps, dt, soft = 200, 1800.0, 1e6
    rp, rv, rE = _run_reference(reference, pos, vel, mass, radius, dt, steps, soft)
    op, ov, oE = _run_ours(pos, vel, mass, radius, dt, steps, soft)
    np.testing.assert_allclose(op, rp, rtol=0, atol=1.0)
    np.testing.assert_allclose(ov, rv, rtol=0, atol=1e-6)
    assert oE == pytest.approx(rE, rel=1e-12)


def test_lagrange_three_body_golden(reference):
    # classic Lagrange equilateral configuration (reference:
    # core/examples.py:124-178)
    m, R, dt, soft = 1e22, 1e7, 50.0, 1e3
    pos = np.array([[R, 0.0, 0.0],
                    [-0.5 * R, np.sqrt(3) / 2 * R, 0.0],
                    [-0.5 * R, -np.sqrt(3) / 2 * R, 0.0]])
    z = np.array([0.0, 0.0, 1.0])
    v = np.sqrt(G * m / (np.sqrt(3.0) * R))
    vel = np.stack([v * np.cross(z, p / np.linalg.norm(p)) for p in pos])
    mass = np.full(3, m)
    radius = np.full(3, (m / 5000.0) ** (1 / 3))
    steps = 1000
    rp, rv, rE = _run_reference(reference, pos, vel, mass, radius, dt, steps, soft)
    op, ov, oE = _run_ours(pos, vel, mass, radius, dt, steps, soft)
    np.testing.assert_allclose(op, rp, rtol=0, atol=1e-4)
    assert oE == pytest.approx(rE, rel=1e-12)


def test_collision_bounce_golden(reference):
    """An isolated two-body contact inside a 4-body scene: the vectorized
    impulse accumulation must match the reference's sequential sweep
    exactly (simultaneous multi-contacts are the only documented
    divergence)."""
    # two heavy spheres on a collision course + two distant spectators
    pos = np.array([
        [0.0, 0.0, 0.0],
        [2.5e3, 0.0, 0.0],
        [1e9, 0.0, 0.0],
        [0.0, 1e9, 0.0],
    ])
    vel = np.array([
        [10.0, 0.0, 0.0],
        [-10.0, 0.0, 0.0],
        [0.0, 0.0, 0.0],
        [0.0, 0.0, 0.0],
    ])
    mass = np.array([1e10, 2e10, 5e9, 5e9])
    radius = np.array([1e3, 1e3, 1e2, 1e2])
    steps, dt, soft = 100, 1.0, 1.0

    rp, rv, _ = _run_reference(reference, pos, vel, mass, radius, dt, steps, soft)
    op, ov, _ = _run_ours(pos, vel, mass, radius, dt, steps, soft)
    # the pair collided and bounced
    assert rv[0, 0] < 0 < rv[1, 0] or rv[0, 0] < vel[0, 0]
    np.testing.assert_allclose(op, rp, rtol=0, atol=1e-6)
    np.testing.assert_allclose(ov, rv, rtol=0, atol=1e-9)
