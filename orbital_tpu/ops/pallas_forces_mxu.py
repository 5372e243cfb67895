"""MXU-tiled Pallas gravity kernel: matmul distances + matmul accumulation.

The VPU kernel (``pallas_forces``) spends ~17 vector ops per pair; this
kernel moves the two O(N^2)-sized computations onto the systolic array
(VERDICT r1 #1, the Gram formulation) and leaves only the reciprocal
square-root chain on the VPU (~5 ops/pair):

  1. pair distances as ONE [TI,8]x[8,TJ] matmul using the padded identity
         r2_ij = (-2x_i)x_j + (-2y_i)y_j + (-2z_i)z_j + |r_i|^2*1 + 1*|r_j|^2
     (i-side rows (-2x,-2y,-2z,|r|^2,1,0,0,0), j-side cols
     (x,y,z,1,|r|^2,m,0,0) — the zero padding makes the full 8-deep dot
     equal r2 exactly);
  2. VPU: w = m_j * rsqrt(max(r2,0) + eps^2)^3;
  3. accumulation as a second matmul  S_tile += W @ [x, y, z, 1, 0...]
     ([TI,TJ]x[TJ,8]), giving the weighted position sums AND the row sum
     in one pass; outside the kernel  acc = G (S[:,0:3] - pos * S[:,3]).

Numerics (why this is OPT-IN, not the default): the Gram identity cancels
~log2(|r|^2 / r2) bits on close pairs, so per-pair force errors reach
~1e-3 relative at r^2 ~ eps^2 with O(1) positions — measured 10k-step
energy drift 3.0e-8 at N=4096 (vs 1.3e-8 for the exact kernel; leapfrog
tolerates the bounded Hamiltonian noise — DESIGN.md "MXU study"), but the
VPU kernel's 1e-7 pair accuracy is the safe default. Self-pairs are
zeroed in-kernel on the (few) diagonal-overlapping tiles — their analytic
weight m_i eps^-3 would otherwise swamp the f32 accumulation. Contact
detection deliberately does NOT ride this kernel: contact thresholds
(R_i+R_j)^2 can sit below the Gram noise floor, which could *miss* real
collisions — with collisions on, use the VPU detect kernel.

Reference hot loop this replaces: /root/reference/core/physics.py:125-159.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pairwise_acc_pallas_mxu"]

_PACK = 8
DEFAULT_TILE_I = 512
DEFAULT_TILE_J = 2048


def _mxu_kernel(iA_ref, jB_ref, jC_ref, out_ref, *, eps2: float,
                compute_pe: bool, tile_i: int, tile_j: int):
    @pl.when(pl.program_id(1) == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    # 1) pair distances on the MXU: full 8-deep dot == r2 (see module doc).
    #    HIGHEST precision is load-bearing: the TPU default rounds matmul
    #    inputs to bf16, whose 8-bit mantissa turns the Gram cancellation
    #    into garbage near r2 ~ eps2 (measured 60x force errors).
    r2 = jax.lax.dot_general(
        iA_ref[:], jB_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )  # [TI, TJ]

    # 2) VPU: softened inverse-cube weights
    inv = lax.rsqrt(jnp.maximum(r2, 0.0) + eps2)
    mj = jB_ref[5:6, :]  # [1, TJ]
    w = mj * (inv * inv * inv)

    # Self-pairs carry w_ii = m_i eps^-3 — a term orders of magnitude above
    # real pair weights that would poison the f32 accumulation sums (it
    # cancels algebraically but not in floating point). Zero the diagonal,
    # paying the iota/select only on the ~N/TJ tiles whose ranges overlap.
    i0 = pl.program_id(0) * tile_i
    j0 = pl.program_id(1) * tile_j
    overlaps = (i0 < j0 + tile_j) & (j0 < i0 + tile_i)

    def _mask_diag(wv):
        rows = i0 + jax.lax.broadcasted_iota(jnp.int32, (tile_i, tile_j), 0)
        cols = j0 + jax.lax.broadcasted_iota(jnp.int32, (tile_i, tile_j), 1)
        return jnp.where(rows == cols, 0.0, wv)

    w = lax.cond(overlaps, _mask_diag, lambda wv: wv, w)
    if compute_pe:
        minv = lax.cond(overlaps, _mask_diag, lambda v: v, mj * inv)
        out_ref[:, 4] += jnp.sum(minv, axis=1)

    # 3) accumulation on the MXU: W @ (x, y, z, 1, 0...) -> weighted sums
    #    in cols 0-2, row sum in col 3, zeros elsewhere. DEFAULT (bf16)
    #    precision here would give ~0.4% per-pair force error; HIGHEST
    #    keeps the accumulation at f32 pair accuracy.
    out_ref[:] += jax.lax.dot_general(
        w, jC_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )


@functools.lru_cache(maxsize=None)
def _build(n: int, tile_i: int, tile_j: int, eps2: float,
           compute_pe: bool, interpret: bool):
    kernel = functools.partial(_mxu_kernel, eps2=eps2, compute_pe=compute_pe,
                               tile_i=tile_i, tile_j=tile_j)
    return pl.pallas_call(
        kernel,
        grid=(n // tile_i, n // tile_j),
        in_specs=[
            pl.BlockSpec((tile_i, _PACK), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_PACK, tile_j), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_j, _PACK), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_i, _PACK), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, _PACK), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=(2 * 8 + 2 * 8 + 6) * n * n,
            bytes_accessed=3 * n * _PACK * 4,
            transcendentals=n * n,
        ),
        interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=("G", "eps2", "tile_i", "tile_j", "with_potential"),
)
def pairwise_acc_pallas_mxu(
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
    """MXU-tiled softened pairwise accelerations + total potential.

    Same contract as ``pairwise_acc_pallas``; requires eps2 > 0 (the
    mask-free self-pair treatment) and tile-divisible N. Gram-identity
    accuracy caveats in the module docstring.
    """
    if eps2 <= 0.0:
        raise ValueError("the MXU (Gram) kernel requires eps2 > 0")
    from .pallas_forces import _pick_tiles

    n = pos.shape[0]
    ti, tj = _pick_tiles(n, tile_i, tile_j)

    pos32 = pos.astype(jnp.float32)
    mass_eff = mass if alive is None else mass * alive.astype(mass.dtype)
    mass32 = mass_eff.astype(jnp.float32)
    sq = jnp.sum(pos32 * pos32, axis=-1)  # [N]
    ones = jnp.ones((n, 1), jnp.float32)
    zeros3 = jnp.zeros((n, 3), jnp.float32)

    iA = jnp.concatenate([-2.0 * pos32, sq[:, None], ones, zeros3], axis=1)
    jB = jnp.concatenate([pos32, ones, sq[:, None], mass32[:, None],
                          jnp.zeros((n, 2), jnp.float32)], axis=1).T
    jC = jnp.concatenate([pos32, ones, jnp.zeros((n, 4), jnp.float32)], axis=1)

    interpret = jax.default_backend() != "tpu"
    out = _build(n, ti, tj, float(eps2), with_potential, interpret)(iA, jB, jC)

    acc = G * (out[:, 0:3] - pos32 * out[:, 3:4])
    if alive is not None:
        acc = acc * alive[:, None].astype(acc.dtype)

    if with_potential:
        # self-pairs are masked in-kernel, so pe_row is already clean
        pe_row = out[:, 4]
        U = -0.5 * G * jnp.sum(mass32 * pe_row)
    else:
        U = jnp.zeros((), jnp.float32)
    return acc.astype(pos.dtype), U.astype(pos.dtype)
