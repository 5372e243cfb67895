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

__all__ = ["solve_kepler", "elements_to_state"]

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
