"""Block-timestep Hermite (cfg.hermite_fast_cap): close encounters no
longer stall the whole system's step."""
import numpy as np
import pytest

import orbital_tpu as ot
from orbital_tpu.engine.state import make_state


def _binary_in_ring(n_out=30, s_b=0.02, seed=0):
    """Tight equal-mass binary + ring of light distant bodies: the
    classic block-timestep stress case (binary period ~ 300x shorter
    than the outer orbits)."""
    G = 1.0
    m_b = 0.5
    v_b = np.sqrt(G * (2 * m_b) / s_b) / 2.0
    R_out = 4.0
    v_out = np.sqrt(G * 1.0 / R_out)
    rng = np.random.default_rng(seed)
    ang = np.linspace(0, 2 * np.pi, n_out, endpoint=False)
    pos = np.concatenate([
        [[-s_b / 2, 0, 0], [s_b / 2, 0, 0]],
        np.stack([R_out * np.cos(ang), R_out * np.sin(ang),
                  0.05 * rng.standard_normal(n_out)], 1)])
    vel = np.concatenate([
        [[0, -v_b, 0], [0, v_b, 0]],
        np.stack([-v_out * np.sin(ang), v_out * np.cos(ang),
                  np.zeros(n_out)], 1)])
    mass = np.concatenate([[m_b, m_b], np.full(n_out, 1e-5)])
    T_b = 2 * np.pi * np.sqrt(s_b ** 3 / (G * 2 * m_b))
    return pos, vel, mass, T_b


def test_block_hermite_binary_survives_macro_dt():
    """Macro dt = T_binary/4: a plain Hermite step at that dt disrupts
    the binary outright; the block scheme substeps only the pair and
    keeps both the binary (<1% separation error over 16 orbits) and the
    outer ring (~1e-7) on the fine-reference trajectory."""
    pos, vel, mass, T_b = _binary_in_ring()
    s_b = np.linalg.norm(pos[0] - pos[1])
    dt_macro = T_b / 4.0
    steps = 64  # 16 binary orbits

    def run(cfg):
        st = make_state(pos, vel, mass, precision="f64")
        st = ot.init_forces(st, cfg)
        fin, _ = ot.rollout_jit(st, cfg, steps)
        return np.asarray(fin.pos_full())

    p_coarse = run(ot.SimConfig(dt=dt_macro, G=1.0, eps2=1e-10,
                                integrator="hermite"))
    p_blk = run(ot.SimConfig(dt=dt_macro, G=1.0, eps2=1e-10,
                             integrator="hermite", adaptive_eta=0.02,
                             dt_min=dt_macro / 4096, hermite_fast_cap=4,
                             hermite_max_substeps=256))
    # fine global reference
    st = make_state(pos, vel, mass, precision="f64")
    cfg_ref = ot.SimConfig(dt=dt_macro / 64, G=1.0, eps2=1e-10,
                           integrator="hermite")
    fin, _ = ot.rollout_jit(ot.init_forces(st, cfg_ref), cfg_ref,
                            steps * 64)
    p_ref = np.asarray(fin.pos_full())

    def sep_err(p):
        return abs(np.linalg.norm(p[0] - p[1]) - s_b) / s_b

    assert sep_err(p_coarse) > 1.0          # disrupted
    assert sep_err(p_blk) < 1e-2            # tracked through 16 orbits
    assert np.abs(p_blk[2:] - p_ref[2:]).max() < 1e-6


def test_block_hermite_substep_convergence():
    """Halving the Aarseth eta (doubling substeps) shrinks the binary
    error superlinearly — the substep loop converges, it doesn't just
    dilute."""
    pos, vel, mass, T_b = _binary_in_ring()
    s_b = np.linalg.norm(pos[0] - pos[1])
    dt_macro = T_b / 4.0

    errs = {}
    for eta in (0.04, 0.01):
        cfg = ot.SimConfig(dt=dt_macro, G=1.0, eps2=1e-10,
                           integrator="hermite", adaptive_eta=eta,
                           dt_min=dt_macro / 8192, hermite_fast_cap=4,
                           hermite_max_substeps=1024)
        st = make_state(pos, vel, mass, precision="f64")
        fin, _ = ot.rollout_jit(ot.init_forces(st, cfg), cfg, 32)
        p = np.asarray(fin.pos_full())
        errs[eta] = abs(np.linalg.norm(p[0] - p[1]) - s_b) / s_b
    assert errs[0.01] < errs[0.04] / 8.0


def test_block_hermite_matches_plain_when_all_slow():
    """With no body under the macro dt, the block stepper IS the plain
    Hermite step (the substep loop is cond-skipped and the macro formulas
    are identical)."""
    rng = np.random.default_rng(2)
    n = 24
    pos = rng.normal(size=(n, 3)) * 5.0
    vel = rng.normal(size=(n, 3)) * 0.01
    mass = np.full(n, 1e-6)  # weak forces -> huge Aarseth dt_i
    base = dict(dt=1e-3, G=1.0, eps2=1e-4, integrator="hermite")
    outs = {}
    for cap in (0, 8):
        cfg = ot.SimConfig(adaptive_eta=0.1 if cap else None,
                           dt_min=1e-9 if cap else 0.0,
                           hermite_fast_cap=cap, **base)
        st = make_state(pos, vel, mass, precision="f64")
        fin, _ = ot.rollout_jit(ot.init_forces(st, cfg), cfg, 10)
        outs[cap] = np.asarray(fin.pos_full())
    np.testing.assert_allclose(outs[8], outs[0], rtol=1e-12, atol=1e-15)


def test_block_hermite_config_validation():
    with pytest.raises(ValueError, match="integrator='hermite'"):
        ot.SimConfig(dt=1.0, G=1.0, eps2=1.0, hermite_fast_cap=4)
    with pytest.raises(ValueError, match="adaptive_eta"):
        ot.SimConfig(dt=1.0, G=1.0, eps2=1.0, integrator="hermite",
                     hermite_fast_cap=4)
    with pytest.raises(ValueError, match="max_substeps"):
        ot.SimConfig(dt=1.0, G=1.0, eps2=1.0, hermite_max_substeps=0)


def test_simulate_block_hermite_passthrough():
    """simulate() exposes the adaptive/block knobs; a tight binary at
    macro dt = T_b/4 survives through the scene-level API."""
    import dataclasses
    import math

    from orbital_tpu.models.scene import SceneArrays

    prof = dataclasses.replace(ot.STANDARD, G=1.0)
    s_b, m_b = 0.02, 0.5
    v_b = math.sqrt(1.0 * (2 * m_b) / s_b) / 2
    arrays = SceneArrays(
        pos=np.array([[-s_b / 2, 0, 0], [s_b / 2, 0, 0], [4, 0, 0]]),
        vel=np.array([[0, -v_b, 0], [0, v_b, 0], [0, 0.5, 0]]),
        mass=np.array([m_b, m_b, 1e-5]), radius=np.zeros(3),
        names=["a", "b", "c"], uuids=["a", "b", "c"])
    T_b = 2 * math.pi * math.sqrt(s_b ** 3 / (1.0 * 2 * m_b))
    res = ot.simulate(arrays, steps=16, dt=T_b / 4, softening=1e-5,
                      integrator="hermite", adaptive_eta=0.02,
                      dt_min=T_b / 4096, hermite_fast_cap=2,
                      hermite_max_substeps=256, unit_profile=prof,
                      record_every=4)
    sep = np.linalg.norm(res.pos[-1, 0] - res.pos[-1, 1])
    assert abs(sep - s_b) / s_b < 0.05
    assert res.config.hermite_fast_cap == 2

def test_multirung_binary_survives_macro_dt():
    """hermite_rungs=3: the binary (finest rung) is tracked through 16
    orbits while the ring bodies stay on the fine reference — the
    multi-rung scheme keeps the single-rung scheme's accuracy class."""
    pos, vel, mass, T_b = _binary_in_ring()
    s_b = np.linalg.norm(pos[0] - pos[1])
    dt_macro = T_b / 4.0
    steps = 64

    cfg = ot.SimConfig(dt=dt_macro, G=1.0, eps2=1e-10,
                       integrator="hermite", adaptive_eta=0.02,
                       dt_min=dt_macro / 4096, hermite_fast_cap=8,
                       hermite_max_substeps=256, hermite_rungs=3)
    st = make_state(pos, vel, mass, precision="f64")
    fin, _ = ot.rollout_jit(ot.init_forces(st, cfg), cfg, steps)
    p_blk = np.asarray(fin.pos_full())

    st = make_state(pos, vel, mass, precision="f64")
    cfg_ref = ot.SimConfig(dt=dt_macro / 64, G=1.0, eps2=1e-10,
                           integrator="hermite")
    fin, _ = ot.rollout_jit(ot.init_forces(st, cfg_ref), cfg_ref,
                            steps * 64)
    p_ref = np.asarray(fin.pos_full())

    assert abs(np.linalg.norm(p_blk[0] - p_blk[1]) - s_b) / s_b < 1e-2
    assert np.abs(p_blk[2:] - p_ref[2:]).max() < 1e-6


def test_multirung_matches_plain_when_all_slow():
    """With nothing under the macro dt, the multi-rung stepper is the
    plain Hermite step, bit-comparable to fast_cap=0."""
    rng = np.random.default_rng(2)
    n = 24
    pos = rng.normal(size=(n, 3)) * 5.0
    vel = rng.normal(size=(n, 3)) * 0.01
    mass = np.full(n, 1e-6)
    base = dict(dt=1e-3, G=1.0, eps2=1e-4, integrator="hermite")
    outs = {}
    for rungs in (0, 3):
        cfg = ot.SimConfig(adaptive_eta=0.1 if rungs else None,
                           dt_min=1e-9 if rungs else 0.0,
                           hermite_fast_cap=8 if rungs else 0,
                           hermite_max_substeps=64,
                           hermite_rungs=max(1, rungs), **base)
        st = make_state(pos, vel, mass, precision="f64")
        fin, _ = ot.rollout_jit(ot.init_forces(st, cfg), cfg, 10)
        outs[rungs] = np.asarray(fin.pos_full())
    np.testing.assert_allclose(outs[3], outs[0], rtol=1e-12, atol=1e-15)


def test_multirung_config_validation():
    with pytest.raises(ValueError, match="power-of-two"):
        ot.SimConfig(dt=1.0, G=1.0, eps2=1.0, integrator="hermite",
                     adaptive_eta=0.1, dt_min=1e-6, hermite_fast_cap=4,
                     hermite_max_substeps=100, hermite_rungs=2)
    with pytest.raises(ValueError, match="hermite_fast_cap"):
        ot.SimConfig(dt=1.0, G=1.0, eps2=1.0, integrator="hermite",
                     adaptive_eta=0.1, hermite_rungs=2)
    with pytest.raises(ValueError, match="2\\^\\(rungs-1\\)"):
        ot.SimConfig(dt=1.0, G=1.0, eps2=1.0, integrator="hermite",
                     adaptive_eta=0.1, dt_min=1e-6, hermite_fast_cap=4,
                     hermite_max_substeps=4, hermite_rungs=4)


def _ecc_binary_plus_distractor():
    """Eccentric binary (e=0.9, a=1, mu=1) at apocenter + a tight light
    binary 40 away that owns the finest rung at window start; the
    eccentric pair needs it mid-window at pericenter."""
    e, a = 0.9, 1.0
    r_apo = a * (1 + e)
    v_apo = np.sqrt(2 / r_apo - 1 / a)
    pos = np.zeros((4, 3))
    vel = np.zeros((4, 3))
    mass = np.array([0.5, 0.5, 0.01, 0.01])
    pos[0], pos[1] = (-r_apo / 2, 0, 0), (r_apo / 2, 0, 0)
    vel[0], vel[1] = (0, -v_apo / 2, 0), (0, v_apo / 2, 0)
    sep, mu_d = 0.05, 0.02
    v_d = np.sqrt(mu_d / sep)
    pos[2], pos[3] = (40 - sep / 2, 0, 0), (40 + sep / 2, 0, 0)
    vel[2], vel[3] = (0, -v_d / 2, 0), (0, v_d / 2, 0)
    return pos, vel, mass


def _run_rungs(pos, vel, mass, *, reselect, dt, steps, rungs=2, cap=4):
    cfg = ot.SimConfig(dt=dt, G=1.0, eps2=1e-12, integrator="hermite",
                       adaptive_eta=0.02, dt_min=dt / 4096,
                       hermite_fast_cap=cap, hermite_max_substeps=512,
                       hermite_rungs=rungs, hermite_reselect=reselect)
    st = make_state(pos, vel, mass, precision="f64")
    fin, _ = ot.rollout_jit(ot.init_forces(st, cfg), cfg, steps)
    return np.asarray(fin.pos_full())


@pytest.mark.slow
def test_multirung_reselect_tracks_pericenter():
    """Mid-macro rung re-selection: the eccentric binary is promoted to
    the finest rung at the coarsest-boundary re-sorts as it falls to
    pericenter, instead of riding the coarse rung its apocenter dt was
    granted — measured ~18x better endpoint error (assert 3x margin)."""
    pos, vel, mass = _ecc_binary_plus_distractor()
    T = 2 * np.pi
    dt = T / 16
    steps = 16  # one full orbit through pericenter
    cfg_ref = ot.SimConfig(dt=dt / 2048, G=1.0, eps2=1e-12,
                           integrator="hermite")
    st = make_state(pos, vel, mass, precision="f64")
    fin, _ = ot.rollout_jit(ot.init_forces(st, cfg_ref), cfg_ref,
                            steps * 2048)
    p_ref = np.asarray(fin.pos_full())
    err = {rs: np.abs(_run_rungs(pos, vel, mass, reselect=rs, dt=dt,
                                 steps=steps)[:2] - p_ref[:2]).max()
           for rs in (False, True)}
    assert err[True] < err[False] / 3.0


@pytest.mark.slow
def test_multirung_reselect_noop_when_ordering_static():
    """Away from pericenter the rung ORDERING is static (each binary's
    two members share a rung, so re-sorts can only swap same-period
    rows — bit-neutral): re-selection on/off must agree exactly."""
    pos, vel, mass = _ecc_binary_plus_distractor()
    outs = [_run_rungs(pos, vel, mass, reselect=rs, dt=2 * np.pi / 16,
                       steps=4)  # quarter orbit, apocenter side
            for rs in (False, True)]
    np.testing.assert_array_equal(outs[0], outs[1])
