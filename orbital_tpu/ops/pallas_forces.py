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

__all__ = ["pairwise_acc_pallas", "pairwise_acc_detect_pallas",
           "block_acc_pallas", "DEFAULT_TILE_I", "DEFAULT_TILE_J"]

DEFAULT_TILE_I = 512
DEFAULT_TILE_J = 2048
_PACK = 8  # packed feature width (x, y, z, m, padded to an f32 sublane tile)


def _nbody_kernel(i_ref, jT_ref, out_ref, *, G: float, eps2: float,
                  compute_pe: bool, detect: bool):
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
        # softening keeps everything finite; self-pairs cancel via dx == 0.
        # (Folding eps2 into the first square as an fma addend was tried
        # and measured identical — Mosaic already schedules it.)
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
    if detect:
        # contact sweep fused into the force tiles (the reference pays a
        # second O(N^2) scan for this, core/physics.py:513-518): body radii
        # ride col/row 4 (0 for dead bodies — the caller pre-multiplies by
        # alive and parks dead/padding bodies at spread-out far positions,
        # so dead pairs never touch). The r2 <= rsum^2 test with the
        # *unsoftened* r2 counts every self-pair once (r2 = 0), an exact
        # analytic excess of +N removed by the caller. 4 extra VPU
        # ops/pair.
        ri = i_ref[:, 4:5]
        rj = jT_ref[4:5, :]
        # the 1e-5 inflation makes the gate strictly conservative against
        # the resolution sweeps' formulations (sqrt(r2) <= rsum in state
        # dtype, or f32 r2 <= rsum^2): a boundary-grazing pair can only
        # cause a redundant sweep, never a skipped one
        rsum = (ri + rj) * 1.00001
        touch = r2 <= rsum * rsum
        out_ref[:, 5] += jnp.sum(touch.astype(jnp.float32), axis=1)


@functools.lru_cache(maxsize=None)
def _build_call(n: int, tile_i: int, tile_j: int, G: float, eps2: float,
                compute_pe: bool, interpret: bool, detect: bool = False):
    kernel = functools.partial(_nbody_kernel, G=G, eps2=eps2,
                               compute_pe=compute_pe, detect=detect)
    flops_per_pair = (17 if compute_pe else 15) + (4 if detect else 0)
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
            # default scoped limit (16 MB) is marginal at N >= 131072;
            # the measured-best (2048, 2048) geometry at 131k needs
            # 66.1 MB (compile error at 64 MB), so the cap sits at 96
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_pair * n * n,
            bytes_accessed=2 * n * _PACK * 4 + n * _PACK * 4,
            transcendentals=n * n,
        ),
        interpret=interpret,
    )


def _pick_tiles(n: int, tile_i: int, tile_j: int) -> tuple[int, int]:
    if (tile_i, tile_j) == (DEFAULT_TILE_I, DEFAULT_TILE_J) and n >= 131072:
        # N-dependent default: the round-12 sweep at N=131072 measures
        # (2048, 2048) fastest (90.1 ms vs 92.2 at (512, 2048); all nine
        # geometries cluster 91-117 — benchmarks/studies/
        # tile_sweep_r12.jsonl). At the 65k headline (512, 2048) stays
        # best (tile_sweep_r10.jsonl).
        tile_i = tile_j = 2048
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


@functools.lru_cache(maxsize=None)
def _build_block_call(n_i: int, n_j: int, tile_i: int, tile_j: int,
                      G: float, eps2: float, interpret: bool,
                      vma: frozenset = frozenset()):
    """Rectangular [n_i x n_j] interaction block (the ring-shard case).

    ``vma`` names the shard_map mesh axes the output varies over (required
    by check_vma=True when the kernel runs inside shard_map)."""
    kernel = functools.partial(_nbody_kernel, G=G, eps2=eps2,
                               compute_pe=True, detect=False)
    return pl.pallas_call(
        kernel,
        grid=(n_i // tile_i, n_j // tile_j),
        in_specs=[
            pl.BlockSpec((tile_i, _PACK), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_PACK, tile_j), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_i, _PACK), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_i, _PACK), jnp.float32, vma=vma),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=17 * n_i * n_j,
            bytes_accessed=(2 * n_i + n_j) * _PACK * 4,
            transcendentals=n_i * n_j,
        ),
        interpret=interpret,
    )


@functools.partial(jax.jit,
                   static_argnames=("G", "eps2", "tile_i", "tile_j", "vma"))
def block_acc_pallas(
    pos_i: jax.Array,
    pos_j: jax.Array,
    mass_j: jax.Array,
    *,
    G: float,
    eps2: float,
    tile_i: int = DEFAULT_TILE_I,
    tile_j: int = DEFAULT_TILE_J,
    vma: tuple = (),
) -> tuple[jax.Array, jax.Array]:
    """Partial forces of body block j on body block i — the per-round
    compute of the shard_map ppermute ring (parallel/sharded.py), tiled
    like the single-chip kernel instead of dense jnp so each shard runs at
    the tuned Pallas rate (VERDICT r1 #4 / missing #5).

    Mask-free: requires eps2 > 0 (self-pairs in the diagonal round cancel
    through dd == 0; the ring wrapper strips the analytic PE self-term
    once). Dead bodies carry mass 0. Returns (acc [Bi, 3], pe_row [Bi])
    with pe_row_i = sum_j m_j / sqrt(r^2 + eps^2) *including* the i == j
    term when the blocks coincide.
    """
    n_i = pos_i.shape[0]
    n_j = pos_j.shape[0]
    ti, _ = _pick_tiles(n_i, tile_i, 128)
    _, tj = _pick_tiles(n_j, 8, tile_j)

    pts_i = jnp.concatenate(
        [pos_i.astype(jnp.float32),
         jnp.zeros((n_i, _PACK - 3), jnp.float32)], axis=1)   # [Bi, 8]
    ptsT_j = jnp.concatenate(
        [pos_j.astype(jnp.float32).T,
         mass_j.astype(jnp.float32)[None, :],
         jnp.zeros((_PACK - 4, n_j), jnp.float32)], axis=0)   # [8, Bj]

    interpret = jax.default_backend() != "tpu"
    out = _build_block_call(n_i, n_j, ti, tj, float(G), float(eps2),
                            interpret, frozenset(vma))(pts_i, ptsT_j)
    return out[:, 0:3].astype(pos_i.dtype), out[:, 3].astype(pos_i.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("G", "eps2", "tile_i", "tile_j", "with_potential"),
)
def pairwise_acc_detect_pallas(
    pos: jax.Array,
    mass: jax.Array,
    radius: jax.Array,
    alive: jax.Array,
    *,
    G: float,
    eps2: float,
    tile_i: int = DEFAULT_TILE_I,
    tile_j: int = DEFAULT_TILE_J,
    with_potential: bool = True,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Force sweep with contact detection fused into the same r^2 tiles.

    Returns (acc [N,3], U, contacts) where ``contacts`` is an int32 scalar
    counting directed touching pairs (``|r_ij| <= R_i + R_j``, unsoftened,
    dead pairs excluded) — 0 exactly when no live bodies overlap, so the
    stepper can ``lax.cond``-skip the collision resolution sweep. The
    reference pays a second full O(N^2) scan for this every step
    (core/physics.py:510-518); here it costs ~4 extra VPU ops/pair.

    Requirement: dead/padding bodies must sit at spread-out far positions
    (``make_state`` padding and ``merge_groups`` do this), so the only
    detection excess is the exact +N of the self-pairs, removed here.
    Coincident live *point* bodies (r = 0, radius 0) still count — a
    cost-only false positive: the resolution sweep treats them as
    non-touching (dist > 0 requirement), matching the dense path.
    """
    n = pos.shape[0]
    ti, tj = _pick_tiles(n, tile_i, tile_j)

    pos32 = pos.astype(jnp.float32)
    alive_f = alive.astype(jnp.float32)
    mass32 = (mass * alive.astype(mass.dtype)).astype(jnp.float32)
    radius32 = radius.astype(jnp.float32) * alive_f

    pts = jnp.concatenate(
        [pos32, mass32[:, None], radius32[:, None],
         jnp.zeros((n, _PACK - 5), jnp.float32)], axis=1
    )  # [N, 8]: x y z m R 0 0 0

    interpret = jax.default_backend() != "tpu"
    out = _build_call(n, ti, tj, float(G), float(eps2), with_potential,
                      interpret, detect=True)(pts, pts.T)

    acc = out[:, 0:3] * alive_f[:, None]
    if with_potential:
        pe_row = out[:, 3]
        if eps2 > 0.0:
            pe_row = pe_row - mass32 * (1.0 / float(eps2) ** 0.5)
        U = -0.5 * G * jnp.sum(mass32 * pe_row)
    else:
        U = jnp.zeros((), jnp.float32)
    contacts = jnp.round(jnp.sum(out[:, 5]) - n).astype(jnp.int32)
    return acc.astype(pos.dtype), U.astype(pos.dtype), contacts
