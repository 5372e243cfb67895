"""Multilevel tree gravity (ops/tree.py) vs the exact dense oracle."""
import numpy as np
import pytest

import orbital_tpu as ot
from orbital_tpu.ops.forces import pairwise_acc_dense
from orbital_tpu.ops.tree import (tree_acc_potential, tree_occupancy_probe,
                                  tree_stencil)


def _rms(a, ar):
    a, ar = np.asarray(a), np.asarray(ar)
    return (np.sqrt(np.mean(np.sum((a - ar) ** 2, -1)))
            / np.sqrt(np.mean(np.sum(ar ** 2, -1))))


@pytest.fixture
def gauss_blob(rng):
    """Centrally concentrated cluster (the tree's target regime)."""
    n = 2048
    pos = rng.normal(size=(n, 3)).astype(np.float32)
    mass = (rng.uniform(0.5, 1.5, n) / n).astype(np.float32)
    return pos, mass


def test_stencil_counts():
    """The claim stencils have the analytic sizes (2ws+1 cube minus the
    near-field cube)."""
    assert len(tree_stencil(1)) == 7 ** 3 - 3 ** 3
    assert len(tree_stencil(2)) == 11 ** 3 - 5 ** 3


def test_pair_partition_exact(rng):
    """Two isolated bodies: every claiming cell holds one body, so the
    monopole IS the body and the Taylor point IS its position — the tree
    must reproduce the exact force to f32 rounding at ANY separation.
    This is the partition-of-pairs correctness test: a double-counted or
    missed claim shows up as an O(1) force error."""
    for _ in range(60):
        pos = (rng.uniform(-1, 1, (2, 3)) * rng.uniform(0.1, 10)).astype(
            np.float32)
        mass = rng.uniform(0.5, 1.5, 2).astype(np.float32)
        a_ref, _ = pairwise_acc_dense(pos, mass, G=1.0, eps2=1e-6)
        a, _, ov = tree_acc_potential(pos, mass, G_grav=1.0, eps2=1e-6,
                                      levels=4, capacity=4, ws=1)
        assert int(ov) == 0
        assert _rms(a, a_ref) < 5e-6


def test_pair_partition_exact_sparse_levels(rng):
    """Same two-body exactness through the DEEP-level path (levels=7 >
    _DENSE_LEVELS): claims at sparse levels, the dense->sparse push-down
    boundary, and the sparse per-body gather must all preserve the
    partition."""
    for _ in range(12):
        pos = (rng.uniform(-1, 1, (2, 3)) * rng.uniform(0.1, 10)).astype(
            np.float32)
        mass = rng.uniform(0.5, 1.5, 2).astype(np.float32)
        a_ref, _ = pairwise_acc_dense(pos, mass, G=1.0, eps2=1e-6)
        a, _, ov = tree_acc_potential(pos, mass, G_grav=1.0, eps2=1e-6,
                                      levels=7, capacity=4, ws=1)
        assert int(ov) == 0
        assert _rms(a, a_ref) < 5e-6


def test_tree_deep_levels_match_shallow(gauss_blob):
    """levels=7 (sparse far-field regime) agrees with the dense oracle as
    well as levels=5 does — occupied-cell pruning changes cost, not
    physics."""
    pos, mass = gauss_blob
    a_ref, U_ref = pairwise_acc_dense(pos, mass, G=1.0, eps2=1e-6)
    occ, nc = tree_occupancy_probe(pos, levels=7)
    a, U, ov = tree_acc_potential(pos, mass, G_grav=1.0, eps2=1e-6,
                                  levels=7, capacity=int(occ) + 8, ws=1,
                                  max_cells=int(nc) + 32)
    assert int(ov) == 0
    assert _rms(a, a_ref) < 3e-2
    assert float(U) == pytest.approx(float(U_ref), rel=3e-2)


@pytest.mark.parametrize("ws,tol", [(1, 3e-2), (2, 8e-3)])
def test_tree_accuracy(gauss_blob, ws, tol):
    pos, mass = gauss_blob
    a_ref, U_ref = pairwise_acc_dense(pos, mass, G=1.0, eps2=1e-6)
    occ, nc = tree_occupancy_probe(pos, levels=5)
    a, U, ov = tree_acc_potential(pos, mass, G_grav=1.0, eps2=1e-6,
                                  levels=5, capacity=int(occ) + 8, ws=ws,
                                  max_cells=int(nc) + 32)
    assert int(ov) == 0
    assert _rms(a, a_ref) < tol
    assert float(U) == pytest.approx(float(U_ref), rel=tol)


def test_tree_momentum_conserved(gauss_blob):
    """COM-COM monopole pairs are antisymmetric and the Taylor corrections
    are mass-weighted about each COM, so total force is zero to rounding
    (the same Newton's-third-law property the reference asserts for its
    exact pairs, core/physics.py:302-305)."""
    pos, mass = gauss_blob
    occ, nc = tree_occupancy_probe(pos, levels=5)
    a, _, ov = tree_acc_potential(pos, mass, G_grav=1.0, eps2=1e-6,
                                  levels=5, capacity=int(occ) + 8, ws=1,
                                  max_cells=int(nc) + 32)
    assert int(ov) == 0
    f_tot = np.abs((np.asarray(mass)[:, None] * np.asarray(a)).sum(0)).max()
    f_rms = np.sqrt(np.mean(np.sum(np.asarray(mass)[:, None]
                                   * np.asarray(a) ** 2, -1)))
    assert f_tot < 1e-5 * max(f_rms, 1e-30)


def test_tree_capacity_overflow_counted(gauss_blob):
    pos, mass = gauss_blob
    _, _, ov = tree_acc_potential(pos, mass, G_grav=1.0, eps2=1e-6,
                                  levels=4, capacity=2, ws=1)
    assert int(ov) > 0


def test_tree_max_cells_overflow_counted(gauss_blob):
    pos, mass = gauss_blob
    occ, nc = tree_occupancy_probe(pos, levels=5)
    assert int(nc) > 8
    _, _, ov = tree_acc_potential(pos, mass, G_grav=1.0, eps2=1e-6,
                                  levels=5, capacity=int(occ) + 8, ws=1,
                                  max_cells=8)
    assert int(ov) > 0


def test_tree_dead_bodies_inert(gauss_blob):
    from orbital_tpu.engine.state import far_positions

    pos, mass = gauss_blob
    n = len(mass)
    alive = np.ones(n, bool)
    alive[1500:] = False
    pos2 = pos.copy()
    pos2[~alive] = far_positions(int((~alive).sum()), 3.0, np.float32)
    occ, nc = tree_occupancy_probe(pos[alive], levels=5)
    a_live, _, ov1 = tree_acc_potential(pos[alive], mass[alive],
                                        G_grav=1.0, eps2=1e-6, levels=5,
                                        capacity=int(occ) + 8, ws=1)
    a_mask, _, ov2 = tree_acc_potential(pos2, mass, alive, G_grav=1.0,
                                        eps2=1e-6, levels=5,
                                        capacity=int(occ) + 8, ws=1)
    assert int(ov1) == 0 and int(ov2) == 0
    a_mask = np.asarray(a_mask)
    np.testing.assert_array_equal(a_mask[~alive], 0.0)
    # the alive-subset run fits a tighter bounding cube (different grid),
    # so agreement is at the method's accuracy, not bitwise
    assert _rms(a_mask[alive], a_live) < 2e-2


def test_tree_in_rollout(gauss_blob):
    """force_impl='tree' drives the KDK stepper with bounded energy noise."""
    from orbital_tpu.engine.state import make_state

    pos, mass = gauss_blob
    n = len(mass)
    vel = np.zeros((n, 3))
    st = make_state(pos, vel, mass, precision="f32")
    occ, nc = tree_occupancy_probe(st.pos, st.alive, levels=4)
    cfg = ot.SimConfig(dt=2e-3, G=1.0, eps2=1e-4, force_impl="tree",
                       tree_levels=4, tree_capacity=int(occ) + 16,
                       tree_max_cells=int(nc) + 32)
    st = ot.init_forces(st, cfg)
    fin, traj = ot.rollout_jit(st, cfg, 40, record_every=10)
    assert np.isfinite(np.asarray(fin.pos)).all()
    E = np.asarray(traj.energy, np.float64)
    assert abs((E[-1] - E[0]) / E[0]) < 3e-2


def test_tree_requires_softening(gauss_blob):
    pos, mass = gauss_blob
    with pytest.raises(ValueError, match="eps2"):
        tree_acc_potential(pos, mass, G_grav=1.0, eps2=0.0)


def test_tree_rejects_hermite(gauss_blob):
    from orbital_tpu.engine.rollout import resolve_accel_jerk_fn

    cfg = ot.SimConfig(dt=1.0, integrator="hermite", force_impl="tree",
                       eps2=1e-6)
    with pytest.raises(ValueError, match="hermite"):
        resolve_accel_jerk_fn(cfg, 64)


def test_simulate_tree_auto_capacity(gauss_blob):
    """simulate(force_impl='tree') sizes capacity and the occupied-cell
    budget from the actual distribution and completes with finite output."""
    from orbital_tpu.models.scene import SceneArrays

    pos, mass = gauss_blob
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
                      force_impl="tree", tree_levels=4, precision="f32",
                      rescale=None, record_every=5)
    assert np.isfinite(res.pos).all()
    assert res.config.tree_capacity >= 16
    assert res.config.tree_max_cells > 0


def test_tree_pinned_box_matches(gauss_blob):
    """A pinned box covering the live extent agrees with the refit path."""
    pos, mass = gauss_blob
    occ, nc = tree_occupancy_probe(pos, levels=5)
    a_fit, _, _ = tree_acc_potential(pos, mass, G_grav=1.0, eps2=1e-6,
                                     levels=5, capacity=int(occ) + 8, ws=1)
    half = float(np.abs(pos).max()) * 1.1
    occ2, _ = tree_occupancy_probe(pos, levels=5,
                                   box=(np.zeros(3, np.float32), half))
    a_pin, _, ov = tree_acc_potential(
        pos, mass, G_grav=1.0, eps2=1e-6, levels=5,
        capacity=int(occ2) + 8, ws=1,
        box=(np.zeros(3, np.float32), half))
    assert int(ov) == 0
    assert _rms(a_pin, a_fit) < 2e-2
