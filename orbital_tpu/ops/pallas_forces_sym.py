"""Symmetric (half-pair) Pallas gravity kernel.

Newton's third law makes the interaction matrix antisymmetric, so only the
upper-triangle tile pairs need evaluating: tile (i, j), i < j, contributes
both ``acc_i += sum_j m_j u dd`` (row reduction) and ``acc_j -= sum_i m_i
u dd`` (column reduction) from one set of difference/1/r^3 computations —
~24 VPU ops per unordered pair instead of 30 for the full-matrix sweep.

Mechanics:
  * 1D grid over the T(T+1)/2 upper-triangle tiles; the (i, j) tile
    coordinates stream in as scalar-prefetch arrays feeding the BlockSpec
    index maps.
  * the full [N, 8] accumulator lives in VMEM scratch across the whole
    grid (2 MB at N=65k) and is flushed to the output on the last tile,
    since j-side contributions revisit blocks non-consecutively.
  * diagonal tiles (i == j) would double-count through the mirrored
    reduction, so their weights are scaled by 1/2; self-pairs still cancel
    exactly through dd == 0 (requires eps2 > 0).

Same contract as ``pairwise_acc_pallas`` with ``with_potential=False``
(the PE-tracking path uses the full-matrix kernel).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pairwise_acc_pallas_sym"]

_PACK = 8


def _sym_kernel(ii_ref, jj_ref, iT_ref, jT_ref, out_ref, acc_ref,
                *, G: float, eps2: float, tile: int, n_tiles_total: int):
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    i = ii_ref[k]
    j = jj_ref[k]

    xi = iT_ref[0:1, :].reshape(tile, 1)  # [TB, 1] via lane->sublane relayout
    yi = iT_ref[1:2, :].reshape(tile, 1)
    zi = iT_ref[2:3, :].reshape(tile, 1)
    mi = iT_ref[3:4, :].reshape(tile, 1)
    xj = jT_ref[0:1, :]  # [1, TB]
    yj = jT_ref[1:2, :]
    zj = jT_ref[2:3, :]
    mj = jT_ref[3:4, :]

    ddx = xj - xi  # [TB, TB]
    ddy = yj - yi
    ddz = zj - zi
    inv = lax.rsqrt(ddx * ddx + ddy * ddy + ddz * ddz + eps2)
    u3 = inv * inv * inv
    # diagonal tiles see every unordered pair twice through the mirrored
    # accumulation below; halve their weight
    u3 = u3 * jnp.where(i == j, 0.5, 1.0).astype(jnp.float32)

    # accumulator is [8, N] lane-major (a [N, 8] layout would pad to
    # [N, 128] tiles = 33 MB of VMEM at 65k)
    wi = mj * u3  # weight for the i-side (attracted by j)
    base_i = i * tile
    acc_ref[0, pl.ds(base_i, tile)] += G * jnp.sum(wi * ddx, axis=1)
    acc_ref[1, pl.ds(base_i, tile)] += G * jnp.sum(wi * ddy, axis=1)
    acc_ref[2, pl.ds(base_i, tile)] += G * jnp.sum(wi * ddz, axis=1)

    wj = mi * u3  # weight for the j-side (attracted by i); opposite sign
    base_j = j * tile
    acc_ref[0, pl.ds(base_j, tile)] += -G * jnp.sum(wj * ddx, axis=0)
    acc_ref[1, pl.ds(base_j, tile)] += -G * jnp.sum(wj * ddy, axis=0)
    acc_ref[2, pl.ds(base_j, tile)] += -G * jnp.sum(wj * ddz, axis=0)

    @pl.when(k == n_tiles_total - 1)
    def _flush():
        out_ref[:] = acc_ref[:]


@functools.lru_cache(maxsize=None)
def _build(n: int, tile: int, G: float, eps2: float, interpret: bool):
    n_tiles = n // tile
    total = n_tiles * (n_tiles + 1) // 2
    kernel = functools.partial(_sym_kernel, G=G, eps2=eps2, tile=tile,
                               n_tiles_total=total)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # ii, jj tile-coordinate streams
        grid=(total,),
        in_specs=[
            pl.BlockSpec((_PACK, tile), lambda k, ii, jj: (0, ii[k]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_PACK, tile), lambda k, ii, jj: (0, jj[k]),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_PACK, n), lambda k, ii, jj: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((_PACK, n), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((_PACK, n), jnp.float32),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _triangle_indices(n_tiles: int):
    ii, jj = np.triu_indices(n_tiles)
    return (np.ascontiguousarray(ii.astype(np.int32)),
            np.ascontiguousarray(jj.astype(np.int32)))


@functools.partial(jax.jit, static_argnames=("G", "eps2", "tile"))
def pairwise_acc_pallas_sym(
    pos: jax.Array,
    mass: jax.Array,
    alive: Optional[jax.Array] = None,
    *,
    G: float,
    eps2: float,
    tile: int = 512,
) -> tuple[jax.Array, jax.Array]:
    """Half-pair softened accelerations (no potential). Requires eps2 > 0."""
    if eps2 <= 0.0:
        raise ValueError("symmetric kernel requires eps2 > 0")
    n = pos.shape[0]
    tb = tile
    while tb > 128 and n % tb != 0:
        tb //= 2
    if n % tb != 0:
        raise ValueError(f"N={n} must divide by the tile size")

    mass_eff = mass if alive is None else mass * alive.astype(mass.dtype)
    ptsT = jnp.concatenate(
        [pos.astype(jnp.float32).T, mass_eff.astype(jnp.float32)[None, :],
         jnp.zeros((_PACK - 4, n), jnp.float32)], axis=0,
    )  # [8, N]

    ii, jj = _triangle_indices(n // tb)
    interpret = jax.default_backend() != "tpu"
    out = _build(n, tb, float(G), float(eps2), interpret)(
        jnp.asarray(ii), jnp.asarray(jj), ptsT, ptsT
    )
    acc = out[0:3, :].T
    if alive is not None:
        acc = acc * alive[:, None].astype(acc.dtype)
    return acc.astype(pos.dtype), jnp.zeros((), pos.dtype)
