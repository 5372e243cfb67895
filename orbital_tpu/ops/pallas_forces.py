"""Tiled Pallas TPU kernel for softened O(N^2) pairwise gravity.

The reference's per-pair Python loop (core/physics.py:125-159) becomes a
blocked interaction sweep on the VPU: the grid tiles the [N, N] interaction
matrix into (TI x TJ) blocks; for each block the kernel forms per-coordinate
difference matrices from an i-side [TI, 8] row tile and a j-side transposed
[8, TJ] column tile, evaluates the softened inverse-cube weights, and
accumulates

    acc_i  += G * sum_j m_j (r_j - r_i) / (|r_j - r_i|^2 + eps^2)^(3/2)
    pe_i   += sum_j m_j / sqrt(|r_j - r_i|^2 + eps^2)      (optional)

into a [TI, 8]-packed output block that stays resident in VMEM across the
inner j sweep (output revisiting).

Masking strategy:
  * eps2 > 0 (every practical config): self-pairs have dx=dy=dz=0 so their
    acceleration contribution w*dx is *exactly zero* with no mask at all,
    and the softened inverse radius stays finite — the hot path runs
    mask-free. The self-term does pollute the potential (m_j/eps per body),
    so the PE variant subtracts it analytically outside the kernel.
  * eps2 == 0: a single `r2 > 0` select removes self-pairs and exact
    coincidences (which the reference would divide by zero on).
  * dead/padding bodies carry mass 0: no force, no potential.

Layout (see TPU tiling constraints): bodies are packed as
  pts  [N, 8]  rows   (x, y, z, m, 0...)  — i-side, sublane-major
  ptsT [8, N]  rows x/y/z/m               — j-side, lane-major
so both reads are contiguous tile-aligned loads and the [TI,1] x [1,TJ]
broadcasts map directly onto 8x128 VPU tiles. N must divide by the tile
sizes (pad via ``engine.state.make_state(pad_to=...)``).

Interpret mode (CPU) is selected automatically off-TPU so the kernel is
unit-testable everywhere against the dense jnp path.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pairwise_acc_pallas", "DEFAULT_TILE_I", "DEFAULT_TILE_J"]

DEFAULT_TILE_I = 512
DEFAULT_TILE_J = 2048
_PACK = 8  # packed feature width (x, y, z, m, padded to an f32 sublane tile)


def _nbody_kernel(i_ref, jT_ref, out_ref, *, G: float, eps2: float,
                  compute_pe: bool):
    """One (i-tile, j-tile) block of the interaction sweep."""

    @pl.when(pl.program_id(1) == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    xi = i_ref[:, 0:1]  # [TI, 1]
    yi = i_ref[:, 1:2]
    zi = i_ref[:, 2:3]
    xj = jT_ref[0:1, :]  # [1, TJ]
    yj = jT_ref[1:2, :]
    zj = jT_ref[2:3, :]
    mj = jT_ref[3:4, :]

    dx = xj - xi  # [TI, TJ]
    dy = yj - yi
    dz = zj - zi
    r2 = dx * dx + dy * dy + dz * dz
    if eps2 > 0.0:
        # softening keeps everything finite; self-pairs cancel via dx == 0
        inv_r = lax.rsqrt(r2 + eps2)
    else:
        safe = r2 > 0.0
        inv_r = jnp.where(safe, lax.rsqrt(jnp.where(safe, r2, 1.0)), 0.0)
    inv_r3 = inv_r * inv_r * inv_r
    w = mj * inv_r3  # [TI, TJ]

    out_ref[:, 0] += G * jnp.sum(w * dx, axis=1)
    out_ref[:, 1] += G * jnp.sum(w * dy, axis=1)
    out_ref[:, 2] += G * jnp.sum(w * dz, axis=1)
    if compute_pe:
        out_ref[:, 3] += jnp.sum(mj * inv_r, axis=1)


@functools.lru_cache(maxsize=None)
def _build_call(n: int, tile_i: int, tile_j: int, G: float, eps2: float,
                compute_pe: bool, interpret: bool):
    kernel = functools.partial(_nbody_kernel, G=G, eps2=eps2,
                               compute_pe=compute_pe)
    flops_per_pair = 17 if compute_pe else 15
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
        cost_estimate=pl.CostEstimate(
            flops=flops_per_pair * n * n,
            bytes_accessed=2 * n * _PACK * 4 + n * _PACK * 4,
            transcendentals=n * n,
        ),
        interpret=interpret,
    )


def _pick_tiles(n: int, tile_i: int, tile_j: int) -> tuple[int, int]:
    ti = tile_i
    while ti > 8 and n % ti != 0:
        ti //= 2
    tj = tile_j
    while tj > 128 and n % tj != 0:
        tj //= 2
    if n % ti != 0 or n % tj != 0:
        raise ValueError(
            f"N={n} must be a multiple of the tile sizes (pad the state via "
            f"make_state(pad_to={DEFAULT_TILE_J}))"
        )
    return ti, tj


@functools.partial(
    jax.jit,
    static_argnames=("G", "eps2", "tile_i", "tile_j", "with_potential"),
)
def pairwise_acc_pallas(
    pos: jax.Array,
    mass: jax.Array,
    alive: Optional[jax.Array] = None,
    *,
    G: float,
    eps2: float,
    tile_i: int = DEFAULT_TILE_I,
    tile_j: int = DEFAULT_TILE_J,
    with_potential: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Pallas-tiled softened pairwise accelerations + total potential.

    Same contract as ``forces.pairwise_acc_dense``: f32 in, (acc [N, 3],
    scalar U) out, dead bodies inert. With ``with_potential=False`` the PE
    sum is skipped in-kernel (the hot stepper path) and U returns as 0.
    """
    n = pos.shape[0]
    ti, tj = _pick_tiles(n, tile_i, tile_j)

    pos32 = pos.astype(jnp.float32)
    mass_eff = mass if alive is None else mass * alive.astype(mass.dtype)
    mass32 = mass_eff.astype(jnp.float32)

    pts = jnp.concatenate(
        [pos32, mass32[:, None], jnp.zeros((n, _PACK - 4), jnp.float32)], axis=1
    )  # [N, 8]
    ptsT = pts.T  # [8, N] — one O(N) transpose per force eval

    interpret = jax.default_backend() != "tpu"
    out = _build_call(n, ti, tj, float(G), float(eps2), with_potential,
                      interpret)(pts, ptsT)

    acc = out[:, 0:3]
    if alive is not None:
        acc = acc * alive[:, None].astype(acc.dtype)

    if with_potential:
        pe_row = out[:, 3]
        if eps2 > 0.0:
            # remove the analytic self-term m_i/eps included by the
            # mask-free kernel
            pe_row = pe_row - mass32 * (1.0 / float(eps2) ** 0.5)
        U = -0.5 * G * jnp.sum(mass32 * pe_row)
    else:
        U = jnp.zeros((), jnp.float32)
    return acc.astype(pos.dtype), U.astype(pos.dtype)
