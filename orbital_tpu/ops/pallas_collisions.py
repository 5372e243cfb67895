"""Tiled Pallas kernel for restitution collision sweeps at large N.

The dense ``ops.collisions.bounce_deltas`` materializes [N, N] pair
matrices (impossible beyond ~16k bodies); this kernel tiles the same pair
sweep like the gravity kernel, accumulating per-body velocity impulses and
positional de-overlap corrections:

    for each approaching overlapping pair (i, j):
        f      = (1+e) * (d_r . d_v) / (|d_r|^2 (1/m_i + 1/m_j))   (< 0)
        dv_i  += f / m_i * (r_j - r_i)
        dr_i  -= (R_i + R_j - |d_r|) / (|d_r| (1/m_i+1/m_j) m_i) * (r_j - r_i)

which is algebraically identical to the reference's impulse + mass-weighted
de-overlap (core/physics.py:391-422) accumulated per body. Collision
distances are *unsoftened* (exact |d_r|), as in the reference.

Packing: 8 columns per body — (x, y, z, vx, vy, vz, m, R) — as an [N, 8]
i-side array and its [8, N] transpose for the j-side. Dead/padding bodies
carry m = 0 and never touch. Output [N, 8]: cols 0-2 dvel, 3-5 dpos.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["bounce_deltas_pallas"]

_PACK = 8


def _collision_kernel(i_ref, jT_ref, out_ref, *, restitution: float):
    @pl.when(pl.program_id(1) == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    xi, yi, zi = i_ref[:, 0:1], i_ref[:, 1:2], i_ref[:, 2:3]   # [TI, 1]
    vxi, vyi, vzi = i_ref[:, 3:4], i_ref[:, 4:5], i_ref[:, 5:6]
    mi, ri = i_ref[:, 6:7], i_ref[:, 7:8]
    xj, yj, zj = jT_ref[0:1, :], jT_ref[1:2, :], jT_ref[2:3, :]  # [1, TJ]
    vxj, vyj, vzj = jT_ref[3:4, :], jT_ref[4:5, :], jT_ref[5:6, :]
    mj, rj = jT_ref[6:7, :], jT_ref[7:8, :]

    ddx = xj - xi  # r_j - r_i, [TI, TJ]
    ddy = yj - yi
    ddz = zj - zi
    r2 = ddx * ddx + ddy * ddy + ddz * ddz
    dvx = vxj - vxi
    dvy = vyj - vyi
    dvz = vzj - vzi
    s = ddx * dvx + ddy * dvy + ddz * dvz  # (d_r . d_v); approaching iff < 0

    rsum = ri + rj
    touching = (r2 <= rsum * rsum) & (r2 > 0.0) & (s < 0.0) \
        & (mj > 0.0) & (mi > 0.0)

    inv_mi = jnp.where(mi > 0.0, 1.0 / jnp.where(mi > 0.0, mi, 1.0), 0.0)
    inv_mj = jnp.where(mj > 0.0, 1.0 / jnp.where(mj > 0.0, mj, 1.0), 0.0)
    inv_sum = inv_mi + inv_mj

    r2_safe = jnp.where(touching, r2, 1.0)
    e = restitution
    inv_d = lax.rsqrt(r2_safe)
    # one reciprocal serves both the impulse and the de-overlap terms:
    # base = 1/(inv_sum * m_i); inv_sum is 0 only for dead-dead pairs
    # (masked by `touching`), so guard before the reciprocal
    inv_sum_safe = jnp.where(inv_sum > 0.0, inv_sum, 1.0)
    base = pl.reciprocal(inv_sum_safe, approx=False) * inv_mi
    fv = jnp.where(touching, (1.0 + e) * s * (inv_d * inv_d), 0.0) * base

    out_ref[:, 0] += jnp.sum(fv * ddx, axis=1)
    out_ref[:, 1] += jnp.sum(fv * ddy, axis=1)
    out_ref[:, 2] += jnp.sum(fv * ddz, axis=1)

    # positional de-overlap: dr_i = -((rsum - d)/d) / inv_sum / m_i * dd
    h = jnp.where(touching, rsum * inv_d - 1.0, 0.0) * base
    out_ref[:, 3] += -jnp.sum(h * ddx, axis=1)
    out_ref[:, 4] += -jnp.sum(h * ddy, axis=1)
    out_ref[:, 5] += -jnp.sum(h * ddz, axis=1)


@functools.lru_cache(maxsize=None)
def _build(n: int, tile_i: int, tile_j: int, restitution: float,
           interpret: bool):
    kernel = functools.partial(_collision_kernel, restitution=restitution)
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
            # default scoped limit (16 MB) is marginal at N >= 131072
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )


@functools.partial(jax.jit, static_argnames=("restitution", "tile_i", "tile_j"))
def bounce_deltas_pallas(
    pos: jax.Array,
    vel: jax.Array,
    mass: jax.Array,
    radius: jax.Array,
    alive: Optional[jax.Array] = None,
    *,
    restitution: float = 1.0,
    tile_i: int = 256,
    tile_j: int = 1024,
) -> tuple[jax.Array, jax.Array]:
    """Tiled bounce impulse sweep; same contract as
    ``collisions.bounce_deltas``: returns (dpos [N,3], dvel [N,3])."""
    from .pallas_forces import _pick_tiles

    n = pos.shape[0]
    ti, tj = _pick_tiles(n, tile_i, tile_j)
    e = min(max(float(restitution), 0.0), 1.0)

    mass_eff = mass if alive is None else mass * alive.astype(mass.dtype)
    pts = jnp.concatenate(
        [pos.astype(jnp.float32), vel.astype(jnp.float32),
         mass_eff.astype(jnp.float32)[:, None],
         radius.astype(jnp.float32)[:, None]],
        axis=1,
    )
    interpret = jax.default_backend() != "tpu"
    out = _build(n, ti, tj, e, interpret)(pts, pts.T)
    dvel = out[:, 0:3].astype(vel.dtype)
    dpos = out[:, 3:6].astype(pos.dtype)
    if alive is not None:
        keep = alive[:, None].astype(dvel.dtype)
        dvel = dvel * keep
        dpos = dpos * keep
    return dpos, dvel
