"""On-device Kepler solver and elements -> state conversion.

Jittable, vmappable versions of the host scene math
(``models.kepler.solve_kepler`` / ``models.body.Body.get_state``;
reference: core/physics.py:43-71, core/body.py:184-249): a fixed-iteration
Newton solve (compiler-friendly — no data-dependent trip count) and the
batched perifocal -> inertial rotation. Useful for generating Monte-Carlo
ensembles of perturbed orbital elements directly on device.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["solve_kepler", "elements_to_state", "state_to_elements"]

_NEWTON_ITERS = 30  # fixed unrolled count; converges quadratically


@jax.jit
def solve_kepler(M: jax.Array, e: jax.Array) -> jax.Array:
    """Solve M = E - e sin E for E, elementwise (elliptic, e in [0, 1)).

    Fixed 30 Newton iterations from the reference's initial guess (E = M
    for e < 0.8, else pi); quadratic convergence makes the tail iterations
    free of error, and the static trip count keeps XLA happy.
    """
    M = jnp.asarray(M)
    e = jnp.asarray(e)
    E0 = jnp.where(e < 0.8, M, jnp.pi)

    def body(_, E):
        f = E - e * jnp.sin(E) - M
        fp = 1.0 - e * jnp.cos(E)
        return E - f / fp

    return lax.fori_loop(0, _NEWTON_ITERS, body, E0)


@partial(jax.jit, static_argnames=())
def elements_to_state(
    a: jax.Array,
    e: jax.Array,
    inc: jax.Array,
    long_node: jax.Array,
    arg_peri: jax.Array,
    mean_anom: jax.Array,
    mu_parent: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Batched Keplerian elements -> (pos [N, 3], vel [N, 3]).

    All angles in radians, ``a`` in length units consistent with
    ``mu_parent`` (GM of the central body). Same construction as the
    reference (core/body.py:184-249): perifocal state from the eccentric
    anomaly, then R = Rz(Omega) Rx(i) Rz(omega).
    """
    E = solve_kepler(mean_anom, e)
    cE, sE = jnp.cos(E), jnp.sin(E)
    b = a * jnp.sqrt(1.0 - e * e)
    n = jnp.sqrt(mu_parent / (a * a * a))
    denom = 1.0 - e * cE

    x_op = a * (cE - e)
    y_op = b * sE
    vx_op = -a * n * sE / denom
    vy_op = a * n * jnp.sqrt(1.0 - e * e) * cE / denom

    cw, sw = jnp.cos(arg_peri), jnp.sin(arg_peri)
    ci, si = jnp.cos(inc), jnp.sin(inc)
    cO, sO = jnp.cos(long_node), jnp.sin(long_node)
    R11 = cO * cw - sO * sw * ci
    R12 = -cO * sw - sO * cw * ci
    R21 = sO * cw + cO * sw * ci
    R22 = -sO * sw + cO * cw * ci
    R31 = sw * si
    R32 = cw * si

    pos = jnp.stack([R11 * x_op + R12 * y_op,
                     R21 * x_op + R22 * y_op,
                     R31 * x_op + R32 * y_op], axis=-1)
    vel = jnp.stack([R11 * vx_op + R12 * vy_op,
                     R21 * vx_op + R22 * vy_op,
                     R31 * vx_op + R32 * vy_op], axis=-1)
    return pos, vel


@jax.jit
def state_to_elements(
    pos: jax.Array,
    vel: jax.Array,
    mu_parent: jax.Array,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Batched (pos [..., 3], vel [..., 3]) -> osculating Keplerian elements.

    The exact inverse of :func:`elements_to_state` for elliptic orbits:
    returns ``(a, e, inc, long_node, arg_peri, mean_anom)`` in the same
    conventions the forward conversion consumes (angles in radians; the
    reference only ships the forward direction, core/body.py:184-249).
    State vectors are relative to the parent (its GM is ``mu_parent``).

    Degenerate-orbit conventions (standard, and chosen so the round trip
    ``elements_to_state(*state_to_elements(r, v, mu))`` reproduces the
    state even in the degenerate cases):
      * equatorial (no node): ``long_node = 0`` — node axis taken as +x;
      * circular (no periapsis): ``arg_peri = 0`` — anomalies measured
        from the node axis, so ``mean_anom`` is the mean argument of
        latitude.

    Elliptic contract: bound orbits only (specific energy < 0). Hyperbolic
    states return a < 0 / e > 1 with the anomaly columns meaningless, the
    same domain restriction as ``solve_kepler``. NaN-free under jit.
    """
    pos = jnp.asarray(pos)
    vel = jnp.asarray(vel)
    mu = jnp.asarray(mu_parent)
    tiny = jnp.asarray(1e-12, pos.dtype)

    r = jnp.linalg.norm(pos, axis=-1)
    v2 = jnp.sum(vel * vel, axis=-1)

    # vis-viva 1/a = 2/r - v^2/mu, guarded RELATIVE to the 2/r scale
    # (inv_a carries 1/length units; near-parabolic pins to finite |a|)
    inv_a = 2.0 / r - v2 / mu
    floor = tiny * 2.0 / r
    a = 1.0 / jnp.where(jnp.abs(inv_a) > floor, inv_a, floor)

    # specific angular momentum and eccentricity vector
    h_vec = jnp.cross(pos, vel)
    h = jnp.linalg.norm(h_vec, axis=-1)
    h_safe = jnp.where(h > 0, h, 1.0)
    mu_col = mu[..., None] if mu.ndim else mu
    e_vec = jnp.cross(vel, h_vec) / mu_col - pos / r[..., None]
    e = jnp.linalg.norm(e_vec, axis=-1)

    inc = jnp.arccos(jnp.clip(h_vec[..., 2] / h_safe, -1.0, 1.0))

    # node vector n = z_hat x h = (-h_y, h_x, 0); equatorial -> +x axis
    n_xy = jnp.stack([-h_vec[..., 1], h_vec[..., 0]], axis=-1)
    n_mag = jnp.linalg.norm(n_xy, axis=-1)
    node_ok = n_mag > tiny * h_safe
    long_node = jnp.where(
        node_ok, jnp.arctan2(h_vec[..., 0], -h_vec[..., 1]), 0.0)
    nx = jnp.where(node_ok, n_xy[..., 0] / jnp.where(node_ok, n_mag, 1.0), 1.0)
    ny = jnp.where(node_ok, n_xy[..., 1] / jnp.where(node_ok, n_mag, 1.0), 0.0)
    n_hat = jnp.stack([nx, ny, jnp.zeros_like(nx)], axis=-1)

    # in-plane basis (x̂ = node axis, ŷ = ĥ x x̂); periapsis direction
    z_hat = h_vec / h_safe[..., None]
    y_hat = jnp.cross(z_hat, n_hat)
    circ = e <= tiny
    e_safe = jnp.where(circ, 1.0, e)
    p_hat = jnp.where(circ[..., None], n_hat, e_vec / e_safe[..., None])
    arg_peri = jnp.where(
        circ, 0.0,
        jnp.arctan2(jnp.sum(e_vec * y_hat, axis=-1),
                    jnp.sum(e_vec * n_hat, axis=-1)))

    # true anomaly from the periapsis axis, then E, then M
    q_hat = jnp.cross(z_hat, p_hat)
    nu = jnp.arctan2(jnp.sum(pos * q_hat, axis=-1),
                     jnp.sum(pos * p_hat, axis=-1))
    # E from nu: tan(E/2) = sqrt((1-e)/(1+e)) tan(nu/2), via atan2 form
    ecc_clip = jnp.clip(e, 0.0, 1.0 - 1e-15)
    root = jnp.sqrt(jnp.maximum(1.0 - ecc_clip * ecc_clip, 0.0))
    E = jnp.arctan2(root * jnp.sin(nu), ecc_clip + jnp.cos(nu))
    mean_anom = jnp.mod(E - ecc_clip * jnp.sin(E), 2.0 * jnp.pi)
    two_pi = 2.0 * jnp.pi
    return (a, e, inc, jnp.mod(long_node, two_pi),
            jnp.mod(arg_peri, two_pi), mean_anom)
