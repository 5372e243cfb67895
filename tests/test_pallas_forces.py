"""Pallas force kernel vs the dense jnp oracle (interpret mode on CPU)."""
import numpy as np
import pytest

from orbital_tpu.ops.forces import pairwise_acc_dense
from orbital_tpu.ops.pallas_forces import _pick_tiles, pairwise_acc_pallas


@pytest.fixture
def cluster(rng):
    n = 256
    pos = rng.normal(size=(n, 3)).astype(np.float32)
    mass = rng.uniform(0.1, 2.0, n).astype(np.float32)
    return pos, mass


def _relerr(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return np.abs(a - b).max() / np.abs(b).max()


def test_matches_dense_softened(cluster):
    pos, mass = cluster
    a_ref, U_ref = pairwise_acc_dense(pos, mass, G=1.0, eps2=1e-4)
    a, U = pairwise_acc_pallas(pos, mass, G=1.0, eps2=1e-4, tile_i=64, tile_j=128)
    assert _relerr(a, a_ref) < 1e-5
    assert float(U) == pytest.approx(float(U_ref), rel=1e-5)


def test_matches_dense_unsoftened(cluster):
    # eps2 == 0 exercises the masked branch
    pos, mass = cluster
    a_ref, U_ref = pairwise_acc_dense(pos, mass, G=1.0, eps2=0.0)
    a, U = pairwise_acc_pallas(pos, mass, G=1.0, eps2=0.0, tile_i=64, tile_j=128)
    assert np.all(np.isfinite(np.asarray(a)))
    assert _relerr(a, a_ref) < 1e-5
    assert float(U) == pytest.approx(float(U_ref), rel=1e-5)


def test_alive_mask_and_padding(cluster):
    pos, mass = cluster
    alive = np.ones(len(mass), bool)
    alive[200:] = False
    pos[200:] = 0.0  # padding parked at the origin (coincident)
    a_ref, U_ref = pairwise_acc_dense(pos, mass, alive, G=1.0, eps2=1e-4)
    a, U = pairwise_acc_pallas(pos, mass, alive, G=1.0, eps2=1e-4,
                               tile_i=64, tile_j=128)
    assert np.all(np.isfinite(np.asarray(a)))
    np.testing.assert_array_equal(np.asarray(a)[~alive], 0.0)
    assert _relerr(np.asarray(a)[alive], np.asarray(a_ref)[alive]) < 1e-5
    assert float(U) == pytest.approx(float(U_ref), rel=1e-5)


def test_no_potential_variant(cluster):
    pos, mass = cluster
    a_pe, _ = pairwise_acc_pallas(pos, mass, G=1.0, eps2=1e-4, tile_i=64, tile_j=128)
    a, U = pairwise_acc_pallas(pos, mass, G=1.0, eps2=1e-4, tile_i=64,
                               tile_j=128, with_potential=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(a_pe))
    assert float(U) == 0.0


def test_tile_shrinking():
    assert _pick_tiles(512, 256, 1024) == (256, 512)
    assert _pick_tiles(384, 256, 1024) == (128, 128)
    with pytest.raises(ValueError):
        _pick_tiles(100, 256, 1024)


def test_in_rollout(rng):
    # pallas force path drives the KDK stepper identically to dense
    import orbital_tpu as ot
    from orbital_tpu.engine.state import make_state

    n = 128
    pos = rng.normal(size=(n, 3))
    vel = rng.normal(size=(n, 3)) * 0.1
    mass = rng.uniform(0.5, 1.5, n) / n
    outs = {}
    for impl in ("dense", "pallas"):
        st = make_state(pos, vel, mass, precision="f32")
        cfg = ot.SimConfig(dt=1e-3, G=1.0, eps2=1e-4, force_impl=impl, chunk=64)
        st = ot.init_forces(st, cfg)
        fin, _ = ot.rollout_jit(st, cfg, 20)
        outs[impl] = np.asarray(fin.pos)
    np.testing.assert_allclose(outs["pallas"], outs["dense"], rtol=0, atol=1e-5)


def test_pallas_bounce_matches_dense(rng):
    from orbital_tpu.ops.collisions import bounce_deltas
    from orbital_tpu.ops.pallas_collisions import bounce_deltas_pallas

    n = 256
    pos = (rng.normal(size=(n, 3)) * 0.6).astype(np.float32)
    vel = (rng.normal(size=(n, 3)) * 0.4).astype(np.float32)
    mass = rng.uniform(0.5, 1.5, n).astype(np.float32)
    radius = np.full(n, 0.12, np.float32)
    alive = np.ones(n, bool)
    alive[250:] = False
    dp1, dv1 = bounce_deltas(pos, vel, mass, radius, alive, restitution=0.8)
    dp2, dv2 = bounce_deltas_pallas(pos, vel, mass, radius, alive,
                                    restitution=0.8, tile_i=64, tile_j=128)
    assert float(np.abs(np.asarray(dv1)).max()) > 0  # collisions occurred
    # f32 paths with different op orderings (reciprocal vs division)
    np.testing.assert_allclose(np.asarray(dv2), np.asarray(dv1), atol=5e-5)
    np.testing.assert_allclose(np.asarray(dp2), np.asarray(dp1), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(dv2)[~alive], 0.0)


@pytest.mark.slow
def test_large_n_bounce_path_in_stepper(rng):
    # > _DENSE_BOUNCE_MAX_N routes through the pallas sweep inside the step
    import orbital_tpu as ot
    from orbital_tpu.engine.integrators import make_step_fn
    from orbital_tpu.engine.rollout import resolve_force_fn
    from orbital_tpu.engine.state import make_state

    n = 8192
    pos = rng.normal(size=(n, 3)) * 2.0
    vel = rng.normal(size=(n, 3)) * 0.1
    mass = rng.uniform(0.5, 1.5, n) / n
    radius = np.full(n, 0.02)
    st = make_state(pos, vel, mass, radius, precision="f32")
    cfg = ot.SimConfig(dt=1e-3, G=1.0, eps2=1e-4, collisions="bounce",
                       force_impl="chunked", chunk=1024)
    st = ot.init_forces(st, cfg)
    step = make_step_fn(cfg, resolve_force_fn(cfg, n))
    out = step(st)
    assert np.all(np.isfinite(np.asarray(out.pos)))


def test_symmetric_kernel_matches_dense(rng):
    from orbital_tpu.ops.pallas_forces_sym import pairwise_acc_pallas_sym

    n = 512
    pos = rng.normal(size=(n, 3)).astype(np.float32)
    mass = rng.uniform(0.1, 2.0, n).astype(np.float32)
    alive = np.ones(n, bool)
    alive[500:] = False
    a_ref, _ = pairwise_acc_dense(pos, mass, alive, G=1.5, eps2=1e-3)
    a, _ = pairwise_acc_pallas_sym(pos, mass, alive, G=1.5, eps2=1e-3, tile=128)
    assert _relerr(np.asarray(a)[alive], np.asarray(a_ref)[alive]) < 1e-5
    np.testing.assert_array_equal(np.asarray(a)[~alive], 0.0)
    with pytest.raises(ValueError):
        pairwise_acc_pallas_sym(pos, mass, G=1.0, eps2=0.0)


def test_symmetric_kernel_in_rollout(rng):
    import orbital_tpu as ot
    from orbital_tpu.engine.state import make_state

    n = 256
    pos = rng.normal(size=(n, 3))
    vel = rng.normal(size=(n, 3)) * 0.1
    mass = rng.uniform(0.5, 1.5, n) / n
    outs = {}
    for impl in ("dense", "pallas_sym"):
        st = make_state(pos, vel, mass, precision="f32")
        cfg = ot.SimConfig(dt=1e-3, G=1.0, eps2=1e-4, force_impl=impl,
                           track_potential=False)
        st = ot.init_forces(st, cfg)
        fin, _ = ot.rollout_jit(st, cfg, 10)
        outs[impl] = np.asarray(fin.pos)
    np.testing.assert_allclose(outs["pallas_sym"], outs["dense"], atol=1e-5)


# ---- Hermite acc+jerk at scale (chunked + Pallas vs dense oracle) ----

def test_accel_jerk_chunked_matches_dense(rng):
    from orbital_tpu.ops.forces import accel_jerk_chunked, accel_jerk_dense

    n = 256
    pos = rng.normal(size=(n, 3)).astype(np.float32)
    vel = rng.normal(size=(n, 3)).astype(np.float32)
    mass = rng.uniform(0.1, 2.0, n).astype(np.float32)
    alive = rng.uniform(size=n) > 0.1
    a_ref, j_ref, U_ref = accel_jerk_dense(pos, vel, mass, alive,
                                           G=1.0, eps2=1e-4)
    a, j, U = accel_jerk_chunked(pos, vel, mass, alive, G=1.0, eps2=1e-4,
                                 chunk=64)
    assert _relerr(a, a_ref) < 1e-6
    assert _relerr(j, j_ref) < 1e-6
    assert float(U) == pytest.approx(float(U_ref), rel=1e-6)


@pytest.mark.parametrize("eps2", [1e-4, 0.0])
def test_accel_jerk_pallas_matches_dense(rng, eps2):
    from orbital_tpu.ops.forces import accel_jerk_dense
    from orbital_tpu.ops.pallas_jerk import accel_jerk_pallas

    n = 256
    pos = rng.normal(size=(n, 3)).astype(np.float32)
    vel = rng.normal(size=(n, 3)).astype(np.float32)
    mass = rng.uniform(0.1, 2.0, n).astype(np.float32)
    alive = rng.uniform(size=n) > 0.1
    a_ref, j_ref, U_ref = accel_jerk_dense(pos, vel, mass, alive,
                                           G=1.0, eps2=eps2)
    a, j, U = accel_jerk_pallas(pos, vel, mass, alive, G=1.0, eps2=eps2,
                                tile_i=64, tile_j=128)
    assert _relerr(a, a_ref) < 1e-5
    assert _relerr(j, j_ref) < 1e-5
    assert float(U) == pytest.approx(float(U_ref), rel=1e-5)


def test_hermite_routes_to_scalable_jerk(rng):
    """rollout() must resolve a non-dense acc+jerk path above the dense
    ceiling; equivalence checked against the dense stepper at a routable N."""
    import orbital_tpu as ot
    from orbital_tpu.engine.rollout import resolve_accel_jerk_fn

    n = 512
    cfg = ot.SimConfig(dt=1e-3, G=1.0, eps2=1e-4, integrator="hermite",
                       chunk=128)
    # force the non-dense route by lowering the dense ceiling via chunked
    fn = resolve_accel_jerk_fn(cfg.replace(force_impl="chunked"), n)
    pos = rng.normal(size=(n, 3)).astype(np.float32)
    vel = rng.normal(size=(n, 3)).astype(np.float32)
    mass = rng.uniform(0.1, 2.0, n).astype(np.float32)
    alive = np.ones(n, bool)
    from orbital_tpu.ops.forces import accel_jerk_dense
    a_ref, j_ref, _ = accel_jerk_dense(pos, vel, mass, alive, G=1.0, eps2=1e-4)
    a, j, _ = fn(pos, vel, mass, alive)
    assert _relerr(a, a_ref) < 1e-6
    assert _relerr(j, j_ref) < 1e-6


@pytest.mark.slow
def test_hermite_rollout_large_n_smoke(rng):
    """Hermite end-to-end above the dense-memory regime (chunked on CPU)."""
    import orbital_tpu as ot

    n = 8192
    pos = rng.normal(size=(n, 3))
    vel = 0.3 * rng.normal(size=(n, 3))
    mass = np.full(n, 1.0 / n)
    from orbital_tpu.engine.state import make_state
    state = make_state(pos, vel, mass, precision="f32")
    cfg = ot.SimConfig(dt=1e-3, G=1.0, eps2=1e-2, integrator="hermite",
                       chunk=1024)
    state = ot.init_forces(state, cfg)
    final, _ = ot.rollout_jit(state, cfg, 3)
    assert np.isfinite(np.asarray(final.pos)).all()
    assert int(final.step) == 3


def test_adaptive_eta_requires_dt_min():
    import orbital_tpu as ot

    with pytest.raises(ValueError, match="dt_min"):
        ot.SimConfig(dt=1e-3, integrator="hermite", adaptive_eta=0.02)


# ---- fused contact detection (force sweep + r^2-shared detection) ----

def test_fused_detect_counts_match_dense(rng):
    from orbital_tpu.engine.state import far_positions
    from orbital_tpu.ops.collisions import count_contacts_dense
    from orbital_tpu.ops.pallas_forces import pairwise_acc_detect_pallas

    n = 256
    pos = rng.normal(size=(n, 3)).astype(np.float32)
    mass = rng.uniform(0.1, 2.0, n).astype(np.float32)
    radius = rng.uniform(0.0, 0.15, n).astype(np.float32)
    alive = rng.uniform(size=n) > 0.15
    # kernel contract: dead bodies sit at spread far positions (as padding
    # and merge parking guarantee in production)
    pos[~alive] = far_positions(int((~alive).sum()), 2.0,
                                np.float32)[:, :].astype(np.float32)
    a_ref, U_ref = pairwise_acc_dense(pos, mass, alive, G=1.0, eps2=1e-4)
    c_ref = int(count_contacts_dense(pos, radius * alive, alive))
    a, U, c = pairwise_acc_detect_pallas(pos, mass, radius, alive,
                                         G=1.0, eps2=1e-4,
                                         tile_i=64, tile_j=128)
    assert c_ref > 0  # the random cluster must actually have contacts
    assert int(c) == c_ref
    assert _relerr(np.asarray(a)[alive], np.asarray(a_ref)[alive]) < 1e-5
    assert float(U) == pytest.approx(float(U_ref), rel=1e-5)


def test_jerk_fused_detect_matches_dense(rng):
    """The Hermite variant: acc+jerk+U match the plain jerk kernel and the
    contact count matches the dense oracle at the same positions."""
    from orbital_tpu.engine.state import far_positions
    from orbital_tpu.ops.collisions import count_contacts_dense
    from orbital_tpu.ops.forces import accel_jerk_dense
    from orbital_tpu.ops.pallas_jerk import accel_jerk_detect_pallas

    n = 256
    pos = rng.normal(size=(n, 3)).astype(np.float32)
    vel = rng.normal(size=(n, 3)).astype(np.float32)
    mass = rng.uniform(0.1, 2.0, n).astype(np.float32)
    radius = rng.uniform(0.0, 0.15, n).astype(np.float32)
    alive = rng.uniform(size=n) > 0.15
    pos[~alive] = far_positions(int((~alive).sum()), 2.0,
                                np.float32).astype(np.float32)
    a_ref, j_ref, U_ref = accel_jerk_dense(pos, vel, mass, alive,
                                           G=1.0, eps2=1e-4)
    c_ref = int(count_contacts_dense(pos, radius * alive, alive))
    a, j, U, c = accel_jerk_detect_pallas(pos, vel, mass, radius, alive,
                                          G=1.0, eps2=1e-4,
                                          tile_i=64, tile_j=128)
    assert c_ref > 0
    assert int(c) == c_ref
    assert _relerr(np.asarray(a)[alive], np.asarray(a_ref)[alive]) < 1e-5
    assert _relerr(np.asarray(j)[alive], np.asarray(j_ref)[alive]) < 1e-4
    assert float(U) == pytest.approx(float(U_ref), rel=1e-5)


def test_fused_detect_zero_when_separated(rng):
    from orbital_tpu.ops.pallas_forces import pairwise_acc_detect_pallas

    n = 128
    pos = (10.0 * np.arange(n, dtype=np.float32))[:, None] * np.ones(3, np.float32)
    mass = np.ones(n, np.float32)
    radius = np.full(n, 0.1, np.float32)
    alive = np.ones(n, bool)
    _, _, c = pairwise_acc_detect_pallas(pos, mass, radius, alive,
                                         G=1.0, eps2=1e-4,
                                         tile_i=64, tile_j=128)
    assert int(c) == 0


def test_fused_detect_ignores_far_parked_dead(rng):
    """Padding + merged-dead bodies park at spread far positions and must
    never register contacts, even with huge live radii."""
    from orbital_tpu.engine.state import make_state
    from orbital_tpu.ops.pallas_forces import pairwise_acc_detect_pallas

    n = 100
    pos = 100.0 * rng.normal(size=(n, 3))
    vel = np.zeros((n, 3))
    mass = np.ones(n)
    radius = np.full(n, 1e-3)
    st = make_state(pos, vel, mass, radius, precision="f32", pad_to=128)
    assert st.n_bodies == 128
    _, _, c = pairwise_acc_detect_pallas(st.pos, st.mass, st.radius, st.alive,
                                         G=1.0, eps2=1e-4,
                                         tile_i=64, tile_j=128)
    assert int(c) == 0


@pytest.mark.parametrize("integrator", ["kdk", "euler", "rk4"])
@pytest.mark.slow
def test_cond_gated_bounce_matches_unconditional(rng, integrator):
    """Stepping with the fused-detect cond gate must be bit-identical to the
    always-sweep stepper, through both contact-free and colliding steps,
    for every integrator whose closing force eval sees collision-time
    positions."""
    import orbital_tpu as ot
    from orbital_tpu.engine.integrators import make_step_fn
    from orbital_tpu.engine.rollout import (resolve_force_detect_fn,
                                            resolve_force_fn)
    from orbital_tpu.engine.state import make_state

    # head-on pair that collides mid-rollout, plus bystanders
    pos = np.array([[-1.0, 0, 0], [1.0, 0, 0], [0, 5.0, 0], [0, -5.0, 0]])
    vel = np.array([[0.5, 0, 0], [-0.5, 0, 0], [0, 0, 0], [0, 0, 0]])
    mass = np.array([1.0, 1.0, 1e-3, 1e-3])
    radius = np.array([0.3, 0.3, 0.01, 0.01])
    cfg = ot.SimConfig(dt=0.05, G=1e-4, eps2=1e-6, collisions="bounce",
                       restitution=0.8, force_impl="dense",
                       integrator=integrator)
    s_a = ot.init_forces(make_state(pos, vel, mass, radius, precision="f32"), cfg)
    s_b = s_a
    step_plain = make_step_fn(cfg, resolve_force_fn(cfg, 4))
    step_fused = make_step_fn(cfg, resolve_force_fn(cfg, 4),
                              force_detect_fn=resolve_force_detect_fn(cfg, 4))
    collided = False
    for k in range(80):
        s_a = step_plain(s_a)
        s_b = step_fused(s_b)
        np.testing.assert_array_equal(np.asarray(s_a.pos), np.asarray(s_b.pos))
        np.testing.assert_array_equal(np.asarray(s_a.vel), np.asarray(s_b.vel))
    # the pair must actually have bounced (vx signs flipped)
    assert float(np.asarray(s_a.vel)[0, 0]) < 0


def test_cond_gated_merge_in_rollout(rng):
    """merge mode through the fused gate: merge fires, dead body parks far,
    and the sweep stays skipped afterwards (no re-trigger -> state stable)."""
    import orbital_tpu as ot
    from orbital_tpu.engine.state import make_state

    pos = np.array([[-0.5, 0, 0], [0.5, 0, 0], [0, 8.0, 0]])
    vel = np.array([[0.2, 0, 0], [-0.2, 0, 0], [0, 0, 0]])
    mass = np.array([2.0, 1.0, 1e-3])
    radius = np.array([0.2, 0.2, 0.01])
    cfg = ot.SimConfig(dt=0.1, G=1e-6, eps2=1e-8, collisions="merge",
                       force_impl="dense")
    st = ot.init_forces(make_state(pos, vel, mass, radius, precision="f32"), cfg)
    fin, _ = ot.rollout_jit(st, cfg, 60)
    alive = np.asarray(fin.alive)
    assert list(alive) == [True, False, True]
    m = np.asarray(fin.mass)
    assert m[0] == pytest.approx(3.0)
    # absorbed body parked far out of the live scene
    assert np.linalg.norm(np.asarray(fin.pos)[1]) > 1e6


def test_mxu_pallas_kernel_matches_dense(rng):
    """The MXU-tiled kernel (matmul r^2 + matmul accumulation) at its
    documented Gram accuracy; PE self-term stripped exactly."""
    from orbital_tpu.ops.pallas_forces_mxu import pairwise_acc_pallas_mxu

    n = 512
    pos = rng.normal(size=(n, 3)).astype(np.float32)
    mass = rng.uniform(0.1, 2.0, n).astype(np.float32)
    alive = rng.uniform(size=n) > 0.1
    a_ref, U_ref = pairwise_acc_dense(pos, mass, alive, G=1.0, eps2=1e-4)
    a, U = pairwise_acc_pallas_mxu(pos, mass, alive, G=1.0, eps2=1e-4,
                                   tile_i=64, tile_j=128)
    err = np.abs(np.asarray(a) - np.asarray(a_ref)).max() / np.abs(a_ref).max()
    assert err < 5e-4
    assert float(U) == pytest.approx(float(U_ref), rel=1e-4)
    # no-PE variant
    a2, U2 = pairwise_acc_pallas_mxu(pos, mass, alive, G=1.0, eps2=1e-4,
                                     tile_i=64, tile_j=128,
                                     with_potential=False)
    np.testing.assert_array_equal(np.asarray(a2), np.asarray(a))
    assert float(U2) == 0.0
    with pytest.raises(ValueError, match="eps2"):
        pairwise_acc_pallas_mxu(pos, mass, G=1.0, eps2=0.0)
