"""Pallas TPU kernel for the multirate near-field sweep.

The XLA sweep (``ops.neighbor.near_acc_slots``) pays its j side as row
gathers (~50 ns/row on this platform, DESIGN.md access-cost table) — at a
65k-body headline window that is several ms per substep, larger than the
pair arithmetic itself. This kernel streams both sides contiguously
instead, the same pipeline trick as the tree's worklist kernel
(ops/tree_near_wl.py), but with a crucial structural simplification the
RESPA geometry allows: the grid is ``(i_chunk, j_block_slot)`` and the
OUTPUT block index depends only on ``i_chunk``, so partial sums accumulate
in VMEM across the inner grid dimension and the result comes out in SLOT
ORDER — no per-body segment-sum / scatter anywhere (the inner loop's
whole data path is elementwise + this kernel).

Layouts (C = chunk, all f32):

  Pbods [n_slots, 4]   slot-major   x y z m      (i side, (C, 4) blocks)
  PJt   [4, n_slots]   channel-major (Pbods.T)   (j side, (4, RJ*C) blocks)
  out   [max_chunks*C, 4]  ax ay az pe, slot order

``RJ * C`` must be a multiple of 128 (lane alignment). The j block for
grid step (i, q) comes from the frozen ``jbl`` table via scalar prefetch;
sentinel entries point at the all-sentinel block past the chunk table
(mass 0, position SENTINEL_POS -> S = 0 by value — no masking in-kernel,
and self-pairs vanish through dx = 0 exactly like the main force kernel,
ops/pallas_forces.py "mask-free hot path").

Semantic target: the near half of the reference's softened pair force
(core/physics.py:125-159) under the smooth split of ops/neighbor.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["near_acc_slots_pallas", "near_acc_slots_pallas_wl",
           "near_acc_slots_pallas_sb"]

f32 = jnp.float32


def _pair_terms(ib, jb, *, r1: float, rc: float, eps2: float):
    """Shared switched-pair arithmetic of every kernel in this module:
    ``ib (C, 4)`` x ``jb (4, W)`` -> per-channel partial sums
    ``(wx, wy, wz, pe)`` each ``(C, 1)`` (acc channels WITHOUT the G
    factor). One definition so the switch/softening physics cannot
    diverge between backends."""
    xi, yi, zi = ib[:, 0:1], ib[:, 1:2], ib[:, 2:3]
    xj, yj, zj, mj = jb[0:1, :], jb[1:2, :], jb[2:3, :], jb[3:4, :]
    dx = xj - xi                           # (C, W)
    dy = yj - yi
    dz = zj - zi
    r2t = dx * dx + dy * dy + dz * dz
    inv_d = 1.0 / (rc * rc - r1 * r1)
    s = jnp.clip((rc * rc - r2t) * inv_d, 0.0, 1.0)
    s2 = s * s
    S = s * s2 * (10.0 + s * (-15.0 + 6.0 * s))
    spd = (30.0 * inv_d) * s2 * (1.0 - s) * (1.0 - s)
    inv_r = lax.rsqrt(r2t + eps2)
    w = mj * (S * (inv_r * inv_r * inv_r) + (2.0 * spd) * inv_r)
    return (jnp.sum(w * dx, axis=1, keepdims=True),
            jnp.sum(w * dy, axis=1, keepdims=True),
            jnp.sum(w * dz, axis=1, keepdims=True),
            jnp.sum(mj * inv_r * S, axis=1, keepdims=True))


def _validate_block_geom(c: int, rjn: int) -> None:
    if (rjn * c) % 128:
        raise ValueError(
            f"near kernel needs rj*chunk % 128 == 0 (got {rjn}*{c})")
    if c % 8:
        raise ValueError(f"chunk must be a multiple of 8 (got {c})")


def _kernel_resident(cnt_ref, jbl_ref, ib_ref, jt_ref, out_ref, *,
                     w_blk: int, r1: float, rc: float, G: float,
                     eps2: float):
    """Resident-table variant: the whole packed j-table lives in VMEM
    (constant index map -> fetched once for the whole grid), the grid runs
    over i-chunks ONLY, and each chunk walks its OWN number of j-blocks
    (scalar-prefetched counts) with a dynamic-trip fori_loop. Two wins over
    the streaming kernel below: the per-grid-step overhead is paid k_ch
    times instead of k_ch * w_blk times (the streaming kernel's ~118k
    grid steps at 65k cost more than its arithmetic), and sentinel padding
    blocks cost ZERO compute instead of full tiles (w_blk is the probed
    MAX block count; the mean is typically ~half of it)."""
    i = pl.program_id(0)
    ib = ib_ref[...]                       # (C, 4)
    xi, yi, zi = ib[:, 0:1], ib[:, 1:2], ib[:, 2:3]
    c = ib.shape[0]
    w = jt_ref.shape[2]
    inv_d = 1.0 / (rc * rc - r1 * r1)

    def body(q, carry):
        axw, ayw, azw, pew = carry
        b = jbl_ref[i * w_blk + q]
        jb = jt_ref[b]                     # (4, W): dynamic leading index
        xj, yj, zj, mj = jb[0:1, :], jb[1:2, :], jb[2:3, :], jb[3:4, :]
        dx = xj - xi                       # (C, W)
        dy = yj - yi
        dz = zj - zi
        r2t = dx * dx + dy * dy + dz * dz
        s = jnp.clip((rc * rc - r2t) * inv_d, 0.0, 1.0)
        s2 = s * s
        S = s * s2 * (10.0 + s * (-15.0 + 6.0 * s))
        spd = (30.0 * inv_d) * s2 * (1.0 - s) * (1.0 - s)
        inv_r = lax.rsqrt(r2t + eps2)
        wgt = mj * (S * (inv_r * inv_r * inv_r) + (2.0 * spd) * inv_r)
        return (axw + wgt * dx, ayw + wgt * dy, azw + wgt * dz,
                pew + mj * inv_r * S)

    zero = jnp.zeros((c, w), f32)
    axw, ayw, azw, pew = lax.fori_loop(
        0, cnt_ref[i], body, (zero, zero, zero, zero))
    out_ref[...] = jnp.concatenate(
        [G * jnp.sum(axw, axis=1, keepdims=True),
         G * jnp.sum(ayw, axis=1, keepdims=True),
         G * jnp.sum(azw, axis=1, keepdims=True),
         jnp.sum(pew, axis=1, keepdims=True)], axis=1)


@functools.lru_cache(maxsize=None)
def _build_call_resident(k_ch: int, w_blk: int, n_blocks: int, chunk: int,
                         rj: int, r1: float, rc: float, G: float,
                         eps2: float, interpret: bool):
    c = int(chunk)
    w = int(rj) * c
    kernel = functools.partial(_kernel_resident, w_blk=w_blk, r1=r1, rc=rc,
                               G=G, eps2=eps2)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(k_ch,),
        in_specs=[
            pl.BlockSpec((c, 4), lambda i, cnt, jbl: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_blocks, 4, w), lambda i, cnt, jbl: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c, 4), lambda i, cnt, jbl: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    pairs = k_ch * w_blk * c * w
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k_ch * c, 4), f32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=40 * pairs,
            bytes_accessed=n_blocks * 4 * w * 4 + 2 * k_ch * c * 4 * 4,
            transcendentals=pairs,
        ),
        interpret=interpret,
    )


def _kernel(jbl_ref, ib_ref, jb_ref, out_ref, *, r1: float, rc: float,
            G: float, eps2: float):
    q = pl.program_id(1)

    @pl.when(q == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    wx, wy, wz, pe = _pair_terms(ib_ref[...], jb_ref[...], r1=r1, rc=rc,
                                 eps2=eps2)
    out_ref[...] += jnp.concatenate([G * wx, G * wy, G * wz, pe], axis=1)


@functools.lru_cache(maxsize=None)
def _build_call(k_ch: int, w_blk: int, n_slots: int, chunk: int, rj: int,
                r1: float, rc: float, G: float, eps2: float,
                interpret: bool):
    c = int(chunk)
    w = int(rj) * c
    kernel = functools.partial(_kernel, r1=r1, rc=rc, G=G, eps2=eps2)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(k_ch, w_blk),
        in_specs=[
            pl.BlockSpec((c, 4), lambda i, q, jbl: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, w), lambda i, q, jbl: (0, jbl[i * w_blk + q]),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c, 4), lambda i, q, jbl: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    pairs = k_ch * w_blk * c * w
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k_ch * c, 4), f32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=40 * pairs,
            bytes_accessed=k_ch * w_blk * (c * 4 + 4 * w) * 4
            + k_ch * c * 4 * 4,
            transcendentals=pairs,
        ),
        interpret=interpret,
    )


def near_acc_slots_pallas(
    xs: jax.Array, ys: jax.Array, zs: jax.Array, ms: jax.Array,
    jbl: jax.Array,
    *,
    r1: float, rc: float, G: float, eps2: float,
    chunk: int = 32, rj: int = 4, interpret: bool = False,
    resident: bool | None = None,
    i0: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Drop-in Pallas counterpart of ``ops.neighbor.near_acc_slots``:
    same slot-space channels in, same ``(acc [K_ch*C, 3], pe [K_ch*C])``
    out (tested equal; the j-block table is walked identically).

    ``resident=None`` (default) picks the VMEM-resident kernel whenever
    the packed table fits comfortably (~48 MB padded; every 65k-scale
    headline window does), falling back to the streaming two-axis grid
    beyond that. Pass True/False to force either path (tests).

    ``i0`` (dynamic chunk offset): sweep only i-chunks
    ``[i0, i0 + jbl.shape[0])`` — the mesh-sharding hook (the caller
    passes its slice of the jbl table; the j side stays global). Forces
    the streaming kernel (the resident variant has no offset plumbing
    and is interpret-only anyway)."""
    k_ch, w_blk = jbl.shape
    c, rjn = int(chunk), int(rj)
    _validate_block_geom(c, rjn)
    n_slots = xs.shape[0]
    blkw = rjn * c
    n_blocks = n_slots // blkw
    pjt = jnp.stack([xs, ys, zs, ms], axis=0)          # [4, n_slots]
    if i0 is not None:
        resident = False
    if resident is None:
        # MEASURED r3: the resident kernel HANGS the TPU remote compiler
        # (>9 min on a 736-chunk toy geometry, dynamic-trip and
        # fixed-trip variants alike — the dynamic leading-index read of
        # the whole VMEM-resident j-table is the pathological shape for
        # Mosaic on this platform). It stays available for interpret
        # tests and as an explicit opt-in, but auto NEVER picks it on a
        # real TPU backend.
        resident = bool(interpret) and (
            n_blocks * 8 * blkw * 4 <= 48 * 1024 * 1024)
    if resident:
        jt3 = pjt.reshape(4, n_blocks, blkw).transpose(1, 0, 2)
        pbods = pjt.T                                  # [n_slots, 4]
        cnt = jnp.sum(jbl != n_blocks - 1, axis=1, dtype=jnp.int32)
        call = _build_call_resident(k_ch, w_blk, n_blocks, c, rjn,
                                    float(r1), float(rc), float(G),
                                    float(eps2), bool(interpret))
        out = call(cnt, jbl.reshape(-1), pbods, jt3)
        pe = out[:, 3] - ms[:k_ch * c] * (float(eps2) ** -0.5)
        return out[:, :3], pe
    pbods = pjt.T                                      # [n_slots, 4]
    if i0 is not None:
        # i side: this shard's slot rows; the grid's i index then runs
        # over local chunks while jbl entries keep their global meaning
        pbods_i = lax.dynamic_slice_in_dim(pbods, i0 * c, k_ch * c, 0)
        ms_i = lax.dynamic_slice_in_dim(ms, i0 * c, k_ch * c, 0)
    else:
        pbods_i, ms_i = pbods, ms[:k_ch * c]
    call = _build_call(k_ch, w_blk, n_slots, c, rjn,
                       float(r1), float(rc), float(G), float(eps2),
                       bool(interpret))
    out = call(jbl.reshape(-1), pbods_i, pjt)
    # self-pair PE correction: zero acceleration through dx = 0, but a
    # finite m_i * rsqrt(eps2) * S(0) rides the PE sum (S(0) = 1)
    pe = out[:, 3] - ms_i * (float(eps2) ** -0.5)
    return out[:, :3], pe


def _kernel_wl(wl_i_ref, wl_jb_ref, first_ref, ib_ref, jb_ref, out_ref, *,
               r1: float, rc: float, G: float, eps2: float):
    """Worklist variant: ONE real (i-chunk, j-block) entry per grid step.

    The streaming 2-axis kernel above pays ``k_ch * w_blk`` grid steps —
    ``w_blk`` is the probed MAX block count (mean is ~half of it) times
    budget headroom, so at the 65k headline geometry ~80% of its steps
    are all-sentinel tiles (measured census: 118.5k padded vs 22.4k real
    entries). Here the jbl table is compacted once per macro window into
    ``(wl_i, wl_jb)`` sorted by i-chunk; the OUTPUT block index is
    ``wl_i[g]`` — monotone non-decreasing — so partial sums accumulate in
    VMEM across the consecutive run of each chunk's entries and the block
    is flushed exactly once. ``first_ref[g]`` (host of the run-start
    predicate ``g == 0 or wl_i[g] != wl_i[g-1]``, computed outside) picks
    init vs accumulate; only this one i32 is read in-kernel — the big
    dynamic VMEM reads that hang the Mosaic compiler (resident kernel
    above) never appear, all body blocks arrive through index-map DMA.
    """
    del wl_i_ref, wl_jb_ref  # consumed by the index maps
    g = pl.program_id(0)
    wx, wy, wz, pe = _pair_terms(ib_ref[...], jb_ref[...], r1=r1, rc=rc,
                                 eps2=eps2)
    contrib = jnp.concatenate([G * wx, G * wy, G * wz, pe], axis=1)
    first = first_ref[g] != 0

    @pl.when(first)
    def _init():
        out_ref[...] = contrib

    @pl.when(jnp.logical_not(first))
    def _acc():
        out_ref[...] += contrib


@functools.lru_cache(maxsize=None)
def _build_call_wl(qp: int, k_ch: int, n_slots: int, chunk: int, rj: int,
                   r1: float, rc: float, G: float, eps2: float,
                   interpret: bool):
    c = int(chunk)
    w = int(rj) * c
    kernel = functools.partial(_kernel_wl, r1=r1, rc=rc, G=G, eps2=eps2)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(qp,),
        in_specs=[
            pl.BlockSpec((c, 4), lambda g, wli, wljb, first: (wli[g], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, w), lambda g, wli, wljb, first: (0, wljb[g]),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c, 4), lambda g, wli, wljb, first:
                               (wli[g], 0), memory_space=pltpu.VMEM),
    )
    pairs = qp * c * w
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        # one sentinel out block past the chunk table catches the
        # compacted tail (wl_i = k_ch), flushed once like any other run
        out_shape=jax.ShapeDtypeStruct(((k_ch + 1) * c, 4), f32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=40 * pairs,
            bytes_accessed=qp * (c * 4 + 4 * w + c * 4) * 4,
            transcendentals=pairs,
        ),
        interpret=interpret,
    )


def near_acc_slots_pallas_wl(
    xs: jax.Array, ys: jax.Array, zs: jax.Array, ms: jax.Array,
    wl_i: jax.Array, wl_jb: jax.Array, wl_first: jax.Array,
    wl_row_live: jax.Array | None,
    *,
    r1: float, rc: float, G: float, eps2: float,
    chunk: int = 32, rj: int = 4, interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Worklist near sweep: same (acc, pe) contract as
    ``near_acc_slots_pallas`` but driven by the compacted
    ``(wl_i, wl_jb, wl_first)`` arrays from
    ``neighbor_geometry(..., wl_entries=...)`` instead of the padded jbl
    table. ``wl_row_live`` (bool [max_chunks*chunk], from the geometry's
    ``wl_live``) zeroes rows of chunks the worklist never visits — their
    VMEM blocks are otherwise uninitialized garbage; pass None only when
    the caller consumes acc exclusively through ``unpack_slots`` AND the
    geometry reported ``q_overflow == 0`` (then every live body's chunk
    is visited and dead rows are never read)."""
    qp = wl_i.shape[0]
    c, rjn = int(chunk), int(rj)
    _validate_block_geom(c, rjn)
    n_slots = xs.shape[0]
    blkw = rjn * c
    k_ch = n_slots // c - rjn
    pjt = jnp.stack([xs, ys, zs, ms], axis=0)          # [4, n_slots]
    pbods = pjt.T                                      # [n_slots, 4]
    call = _build_call_wl(qp, k_ch, n_slots, c, rjn, float(r1), float(rc),
                          float(G), float(eps2), bool(interpret))
    out = call(wl_i, wl_jb, wl_first, pbods, pjt)[:k_ch * c]
    if wl_row_live is not None:
        out = jnp.where(wl_row_live[:, None], out, 0.0)
    pe = out[:, 3] - ms[:k_ch * c] * (float(eps2) ** -0.5)
    return out[:, :3], pe


def _kernel_sb(ib_ref, jb_ref, out_ref, *, w_blk: int, r1: float,
               rc: float, G: float, eps2: float):
    """Superblock variant: ONE grid step per i-chunk. The caller gathers
    each chunk's w_blk j-blocks into a contiguous [k_ch, w_blk, 4, W]
    table per SUBSTEP (positions move), so both operands stream as fat
    regular blocks — per-step overhead is paid k_ch times total, and the
    only index maps are the identity. Sentinel j-columns are inert by
    value (mass 0); the block walk is a static unrolled loop over the
    same (4, W) tiles the streaming kernel uses."""
    ib = ib_ref[...]                       # (C, 4)
    acc = None
    for t in range(w_blk):
        part = _pair_terms(ib, jb_ref[0, t], r1=r1, rc=rc, eps2=eps2)
        acc = part if acc is None else tuple(
            a + b for a, b in zip(acc, part))
    out_ref[...] = jnp.concatenate(
        [G * acc[0], G * acc[1], G * acc[2], acc[3]], axis=1)


@functools.lru_cache(maxsize=None)
def _build_call_sb(k_ch: int, w_blk: int, blkw: int, chunk: int, r1: float,
                   rc: float, G: float, eps2: float, interpret: bool):
    c = int(chunk)
    kernel = functools.partial(_kernel_sb, w_blk=w_blk, r1=r1, rc=rc, G=G,
                               eps2=eps2)
    w_sb = w_blk * blkw
    return pl.pallas_call(
        kernel,
        grid=(k_ch,),
        in_specs=[
            pl.BlockSpec((c, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w_blk, 4, blkw), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c, 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k_ch * c, 4), f32),
        compiler_params=pltpu.CompilerParams(
            # every grid step owns its out block exclusively (unlike the
            # worklist kernel's accumulation runs) -> parallel is legal
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=40 * k_ch * c * w_sb,
            bytes_accessed=k_ch * (c * 4 + 4 * w_sb + c * 4) * 4,
            transcendentals=k_ch * c * w_sb,
        ),
        interpret=interpret,
    )


def near_acc_slots_pallas_sb(
    xs: jax.Array, ys: jax.Array, zs: jax.Array, ms: jax.Array,
    jbl: jax.Array,
    *,
    r1: float, rc: float, G: float, eps2: float,
    chunk: int = 32, rj: int = 4, interpret: bool = False,
    i0: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Superblock near sweep: same contract as ``near_acc_slots_pallas``
    (slot channels + jbl table in, (acc, pe) in slot order out).

    Per call (= per substep): gather each chunk's j-blocks contiguous —
    ``[4, n_blocks, W] take jbl -> [k_ch, 4, w_blk*W]`` — one
    bandwidth-bound XLA gather of 2 KB blocks, then one grid step per
    chunk over fat regular blocks. Pays ~2x the padded-table HBM traffic
    per substep but collapses the per-grid-step overhead that dominates
    the entry-granular kernels (measured ~0.4 us/step; DESIGN §7).

    ``i0`` (dynamic chunk offset): sweep only i-chunks
    ``[i0, i0 + jbl.shape[0])`` with the j side global — the
    mesh-sharding hook; both the superblock gather and the grid shrink
    to the local slice, so compute scales 1/D per device."""
    k_ch, w_blk = jbl.shape
    c, rjn = int(chunk), int(rj)
    _validate_block_geom(c, rjn)
    n_slots = xs.shape[0]
    blkw = rjn * c
    n_blocks = n_slots // blkw
    pjt = jnp.stack([xs, ys, zs, ms], axis=0)          # [4, n_slots]
    pbods = pjt.T                                      # [n_slots, 4]
    if i0 is not None:
        pbods_i = lax.dynamic_slice_in_dim(pbods, i0 * c, k_ch * c, 0)
        ms_i = lax.dynamic_slice_in_dim(ms, i0 * c, k_ch * c, 0)
    else:
        pbods_i, ms_i = pbods[:k_ch * c], ms[:k_ch * c]
    # per-substep contiguous superblock table: [k_ch, w_blk, 4, W] comes
    # straight off a block gather of the (cheaply) transposed j-table —
    # no big-array transpose afterwards
    jt_b = jnp.swapaxes(pjt.reshape(4, n_blocks, blkw), 0, 1)
    sb = jt_b[jbl]                                     # [k_ch, w_blk, 4, W]
    call = _build_call_sb(k_ch, w_blk, blkw, c, float(r1), float(rc),
                          float(G), float(eps2), bool(interpret))
    out = call(pbods_i, sb)
    pe = out[:, 3] - ms_i * (float(eps2) ** -0.5)
    return out[:, :3], pe
