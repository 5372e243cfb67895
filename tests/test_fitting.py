"""Gradient-based orbit determination (orbital_tpu/fitting.py)."""
import numpy as np
import pytest

import orbital_tpu as ot
from orbital_tpu.engine.rollout import init_forces, rollout
from orbital_tpu.engine.state import make_state

G_SI = 6.6743e-11


def _em_truth():
    """Earth-Moon circular two-body ICs (reference examples.py scale)."""
    R = 3.844e8
    m1, m2 = 5.972e24, 7.348e22
    mu = G_SI * (m1 + m2)
    v2 = np.sqrt(mu / R) * (m1 / (m1 + m2))
    v1 = -np.sqrt(mu / R) * (m2 / (m1 + m2))
    pos = np.array([[0.0, 0.0, 0.0], [R, 0.0, 0.0]])
    vel = np.array([[0.0, v1, 0.0], [0.0, v2, 0.0]])
    mass = np.array([m1, m2])
    return pos, vel, mass


def _observe(pos, vel, mass, cfg, steps, record_every):
    st = make_state(pos, vel, mass, precision="f64")
    st = init_forces(st, cfg)
    _, traj = rollout(st, cfg, steps, record_every=record_every)
    return np.asarray(traj.pos)


def test_fit_recovers_perturbed_velocity():
    """A 3% velocity error is recovered to <0.1% from position
    observations alone — the core orbit-determination loop."""
    pos, vel, mass = _em_truth()
    cfg = ot.SimConfig(dt=3600.0, G=G_SI, eps2=1e6)
    obs = _observe(pos, vel, mass, cfg, steps=240, record_every=24)

    rng = np.random.default_rng(0)
    vel_guess = vel * (1.0 + 0.03 * rng.standard_normal(vel.shape))
    res = ot.fit_initial_conditions(
        obs, 24, cfg, pos0=pos, vel0=vel_guess, mass=mass,
        free=("vel",), iterations=250, learning_rate=3e-2,
    )
    # optimizer works in SI units; scale-free convergence check
    verr0 = np.abs(vel_guess - vel).max() / np.abs(vel).max()
    verr1 = np.abs(res.vel - vel).max() / np.abs(vel).max()
    assert verr1 < 1e-3 < verr0
    assert res.loss_history[-1] < res.loss_history[0] * 1e-4


def test_fit_recovers_central_mass():
    """Mass estimation from a satellite's trajectory: fit the primary's
    mass (softplus-positive) with ICs known."""
    pos, vel, mass = _em_truth()
    cfg = ot.SimConfig(dt=3600.0, G=G_SI, eps2=1e6)
    obs = _observe(pos, vel, mass, cfg, steps=240, record_every=24)

    mass_guess = mass * np.array([1.10, 1.0])  # 10% heavy primary
    res = ot.fit_initial_conditions(
        obs, 24, cfg, pos0=pos, vel0=vel, mass=mass_guess,
        free=("mass",), iterations=300, learning_rate=5e-2,
    )
    assert abs(res.mass[0] - mass[0]) / mass[0] < 1e-3
    assert res.loss_history[-1] < res.loss_history[0] * 1e-3


def test_fit_obs_mask_and_validation():
    pos, vel, mass = _em_truth()
    cfg = ot.SimConfig(dt=3600.0, G=G_SI, eps2=1e6)
    obs = _observe(pos, vel, mass, cfg, steps=48, record_every=24)

    # observing only the secondary still reduces the loss
    rng = np.random.default_rng(1)
    vel_guess = vel * (1.0 + 0.02 * rng.standard_normal(vel.shape))
    res = ot.fit_initial_conditions(
        obs, 24, cfg, pos0=pos, vel0=vel_guess, mass=mass,
        free=("vel",), obs_mask=np.array([0.0, 1.0]), iterations=30,
        learning_rate=1e-2,
    )
    assert res.loss_history[-1] < res.loss_history[0]

    with pytest.raises(ValueError, match="collisions"):
        ot.fit_initial_conditions(
            obs, 24, cfg.replace(collisions="bounce"), pos0=pos,
            vel0=vel, mass=mass)
    with pytest.raises(ValueError, match="subset"):
        ot.fit_initial_conditions(obs, 24, cfg, pos0=pos, vel0=vel,
                                  mass=mass, free=("spin",))


def test_fit_orbital_elements_two_planets():
    """Element-space orbit determination: recover perturbed semi-major
    axes and phases of two interacting planets from central-relative
    observations, differentiating through the on-device Kepler solve AND
    the full N-body rollout."""
    from orbital_tpu.ops.kepler import elements_to_state

    G = 1.0
    M_c = 1.0
    m_sat = np.array([1e-4, 5e-5])
    el_true = dict(
        a=np.array([1.0, 1.8]), e=np.array([0.05, 0.12]),
        inc=np.array([0.02, 0.1]), long_node=np.array([0.3, 1.1]),
        arg_peri=np.array([0.7, 2.0]), mean_anom=np.array([0.1, 2.5]))
    cfg = ot.SimConfig(dt=2e-3, G=G, eps2=1e-12)

    mu = G * (M_c + m_sat)
    ps, vs = elements_to_state(el_true["a"], el_true["e"], el_true["inc"],
                               el_true["long_node"], el_true["arg_peri"],
                               el_true["mean_anom"], mu)
    v_c = -(m_sat[:, None] * np.asarray(vs)).sum(0) / M_c
    pos = np.concatenate([np.zeros((1, 3)), np.asarray(ps)])
    vel = np.concatenate([v_c[None], np.asarray(vs)])
    mass = np.concatenate([[M_c], m_sat])
    st = make_state(pos, vel, mass, precision="f64")
    st = ot.init_forces(st, cfg)
    _, traj = ot.rollout(st, cfg, 400, record_every=40)
    obs = np.asarray(traj.pos[:, 1:] - traj.pos[:, :1])

    el_guess = {k: v.copy() for k, v in el_true.items()}
    el_guess["a"] = el_true["a"] * np.array([1.02, 0.985])
    el_guess["mean_anom"] = el_true["mean_anom"] + np.array([0.03, -0.02])

    el_fit, res = ot.fit_orbital_elements(
        obs, 40, cfg, central_mass=M_c, sat_masses=m_sat,
        elements0=el_guess, free=("a", "mean_anom"), iterations=200,
        learning_rate=2e-2)
    assert np.abs(el_fit["a"] - el_true["a"]).max() < 2e-3
    assert np.abs(el_fit["mean_anom"] - el_true["mean_anom"]).max() < 5e-3
    assert res.loss_history[-1] < res.loss_history[0] * 1e-3


def test_fit_orbital_elements_validation():
    cfg = ot.SimConfig(dt=1e-3, G=1.0, eps2=1e-12)
    obs = np.zeros((2, 1, 3))
    el = dict(a=np.ones(1), e=np.zeros(1) + 0.1, inc=np.zeros(1),
              long_node=np.zeros(1), arg_peri=np.zeros(1),
              mean_anom=np.zeros(1))
    with pytest.raises(ValueError, match="element names"):
        ot.fit_orbital_elements(obs, 1, cfg, central_mass=1.0,
                                sat_masses=np.ones(1), elements0=el,
                                free=("velocity",))
    bad = {k: v for k, v in el.items() if k != "e"}
    with pytest.raises(ValueError, match="missing"):
        ot.fit_orbital_elements(obs, 1, cfg, central_mass=1.0,
                                sat_masses=np.ones(1), elements0=bad)
