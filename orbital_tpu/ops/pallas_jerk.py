"""Tiled Pallas TPU kernel for combined acceleration + jerk (Hermite).

The 4th-order Hermite integrator needs both a and da/dt from one pair
sweep (Makino & Aarseth 1992); the dense jnp path (`forces.accel_jerk_dense`)
is O(N^2) memory and dies at N ~ 8k. This kernel tiles the same math like
the gravity kernel (`pallas_forces`), keeping only (TI x TJ) pair tiles
live:

    s^2    = |r_ij|^2 + eps^2
    acc_i  += G m_j r_ij / s^3
    jerk_i += G m_j [ v_ij / s^3 - 3 (r_ij . v_ij) r_ij / s^5 ]
    pe_i   += m_j / s

Masking follows the force kernel: with eps2 > 0 the self-pair contributes
exactly zero to acc AND jerk (r_ii = v_ii = 0), so the hot path is
mask-free; the self PE term m_i/eps is subtracted analytically outside.
Dead/padding bodies carry mass 0. eps2 == 0 keeps one select.

Packing: i-side [N, 8] rows (x, y, z, m, vx, vy, vz, R); j-side is its
[8, N] transpose. Output [N, 8]: cols 0-2 acc, 3-5 jerk, 6 pe_row,
7 contact count (detect variant). ~36 VPU ops + 1 rsqrt per pair.

``accel_jerk_detect_pallas`` additionally counts touching pairs in the
same r^2 tiles (4 extra ops/pair), letting the Hermite stepper
lax.cond-skip its collision resolution sweep exactly like the KDK path
(ops.pallas_forces.pairwise_acc_detect_pallas). Hermite evaluates forces
at *predicted* positions, so the gate tests predicted separations — a
contact that only forms in the predictor->corrector gap (O(dt^2/12
(a1-a0))) is caught on the next step once penetration deepens; the
resolution sweep itself always uses true post-correction positions.

Reference contract: the hot loop this accelerates is the per-pair force
model of core/physics.py:125-159 extended with its analytic time
derivative (the reference has no jerk; Hermite is a TPU-build extension).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["accel_jerk_pallas", "accel_jerk_detect_pallas"]

_PACK = 8


def _jerk_kernel(i_ref, jT_ref, out_ref, *, G: float, eps2: float,
                 detect: bool = False):
    @pl.when(pl.program_id(1) == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    xi, yi, zi = i_ref[:, 0:1], i_ref[:, 1:2], i_ref[:, 2:3]      # [TI, 1]
    vxi, vyi, vzi = i_ref[:, 4:5], i_ref[:, 5:6], i_ref[:, 6:7]
    xj, yj, zj = jT_ref[0:1, :], jT_ref[1:2, :], jT_ref[2:3, :]   # [1, TJ]
    mj = jT_ref[3:4, :]
    vxj, vyj, vzj = jT_ref[4:5, :], jT_ref[5:6, :], jT_ref[6:7, :]

    dx = xj - xi  # [TI, TJ]
    dy = yj - yi
    dz = zj - zi
    dvx = vxj - vxi
    dvy = vyj - vyi
    dvz = vzj - vzi
    r2 = dx * dx + dy * dy + dz * dz
    if eps2 > 0.0:
        inv = lax.rsqrt(r2 + eps2)
    else:
        safe = r2 > 0.0
        inv = jnp.where(safe, lax.rsqrt(jnp.where(safe, r2, 1.0)), 0.0)
    inv2 = inv * inv
    w = mj * (inv2 * inv)                  # m_j / s^3
    rv = dx * dvx + dy * dvy + dz * dvz    # r_ij . v_ij
    c = 3.0 * rv * inv2                    # 3 (r.v) / s^2

    out_ref[:, 0] += G * jnp.sum(w * dx, axis=1)
    out_ref[:, 1] += G * jnp.sum(w * dy, axis=1)
    out_ref[:, 2] += G * jnp.sum(w * dz, axis=1)
    out_ref[:, 3] += G * jnp.sum(w * (dvx - c * dx), axis=1)
    out_ref[:, 4] += G * jnp.sum(w * (dvy - c * dy), axis=1)
    out_ref[:, 5] += G * jnp.sum(w * (dvz - c * dz), axis=1)
    out_ref[:, 6] += jnp.sum(mj * inv, axis=1)
    if detect:
        # contact gate fused into the jerk sweep (same convention as
        # pallas_forces: radii in slot 7, dead bodies carry radius 0 and
        # park far, unsoftened r2, 1e-5 conservative inflation, exact +N
        # self-pair excess removed by the caller)
        ri = i_ref[:, 7:8]
        rj = jT_ref[7:8, :]
        rsum = (ri + rj) * 1.00001
        touch = r2 <= rsum * rsum
        out_ref[:, 7] += jnp.sum(touch.astype(jnp.float32), axis=1)


@functools.lru_cache(maxsize=None)
def _build(n: int, tile_i: int, tile_j: int, G: float, eps2: float,
           interpret: bool, detect: bool = False):
    kernel = functools.partial(_jerk_kernel, G=G, eps2=eps2, detect=detect)
    return pl.pallas_call(
        kernel,
        grid=(n // tile_i, n // tile_j),
        in_specs=[
            pl.BlockSpec((tile_i, _PACK), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_PACK, tile_j), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_i, _PACK), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, _PACK), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=36 * n * n,
            bytes_accessed=3 * n * _PACK * 4,
            transcendentals=n * n,
        ),
        interpret=interpret,
    )


@functools.partial(
    jax.jit, static_argnames=("G", "eps2", "tile_i", "tile_j"))
def accel_jerk_pallas(
    pos: jax.Array,
    vel: jax.Array,
    mass: jax.Array,
    alive: Optional[jax.Array] = None,
    *,
    G: float,
    eps2: float,
    tile_i: int = 256,
    tile_j: int = 1024,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Tiled acc + jerk + potential; same contract as
    ``forces.accel_jerk_dense`` at arbitrary N (tile-divisible)."""
    from .pallas_forces import _pick_tiles

    n = pos.shape[0]
    ti, tj = _pick_tiles(n, tile_i, tile_j)

    pos32 = pos.astype(jnp.float32)
    vel32 = vel.astype(jnp.float32)
    mass_eff = mass if alive is None else mass * alive.astype(mass.dtype)
    mass32 = mass_eff.astype(jnp.float32)

    pts = jnp.concatenate(
        [pos32, mass32[:, None], vel32, jnp.zeros((n, 1), jnp.float32)],
        axis=1)  # [N, 8]: x y z m vx vy vz 0
    interpret = jax.default_backend() != "tpu"
    out = _build(n, ti, tj, float(G), float(eps2), interpret)(pts, pts.T)

    acc = out[:, 0:3]
    jerk = out[:, 3:6]
    pe_row = out[:, 6]
    if eps2 > 0.0:
        # strip the analytic self-term m_i/eps of the mask-free sweep
        pe_row = pe_row - mass32 * (1.0 / float(eps2) ** 0.5)
    U = -0.5 * G * jnp.sum(mass32 * pe_row)
    if alive is not None:
        keep = alive[:, None].astype(acc.dtype)
        acc = acc * keep
        jerk = jerk * keep
    return (acc.astype(pos.dtype), jerk.astype(pos.dtype),
            U.astype(pos.dtype))


@functools.partial(
    jax.jit, static_argnames=("G", "eps2", "tile_i", "tile_j"))
def accel_jerk_detect_pallas(
    pos: jax.Array,
    vel: jax.Array,
    mass: jax.Array,
    radius: jax.Array,
    alive: jax.Array,
    *,
    G: float,
    eps2: float,
    tile_i: int = 256,
    tile_j: int = 1024,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Acc + jerk + potential + fused contact count (see module docstring).

    Returns (acc, jerk, U, contacts) with ``contacts`` an int32 count of
    directed touching live pairs at the evaluated (predicted) positions —
    0 exactly when nothing overlaps, so the Hermite stepper can skip its
    resolution sweep. Requires dead/padding bodies parked at spread far
    positions (``make_state`` / ``merge_groups`` invariant)."""
    from .pallas_forces import _pick_tiles

    n = pos.shape[0]
    ti, tj = _pick_tiles(n, tile_i, tile_j)

    pos32 = pos.astype(jnp.float32)
    vel32 = vel.astype(jnp.float32)
    alive_f = alive.astype(jnp.float32)
    mass32 = (mass * alive.astype(mass.dtype)).astype(jnp.float32)
    radius32 = radius.astype(jnp.float32) * alive_f

    pts = jnp.concatenate(
        [pos32, mass32[:, None], vel32, radius32[:, None]],
        axis=1)  # [N, 8]: x y z m vx vy vz R
    interpret = jax.default_backend() != "tpu"
    out = _build(n, ti, tj, float(G), float(eps2), interpret,
                 detect=True)(pts, pts.T)

    keep = alive_f[:, None]
    acc = out[:, 0:3] * keep
    jerk = out[:, 3:6] * keep
    pe_row = out[:, 6]
    if eps2 > 0.0:
        pe_row = pe_row - mass32 * (1.0 / float(eps2) ** 0.5)
    U = -0.5 * G * jnp.sum(mass32 * pe_row)
    contacts = jnp.round(jnp.sum(out[:, 7]) - n).astype(jnp.int32)
    return (acc.astype(pos.dtype), jerk.astype(pos.dtype),
            U.astype(pos.dtype), contacts)
