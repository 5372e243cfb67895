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
