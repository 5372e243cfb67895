"""Pallas worklist kernel for the tree's near field (``near="kernel"``).

The chunk-pair near field (``ops/tree.py:_near_pairs``) is
gather-bandwidth-bound: its j side is fetched with XLA row gathers at a
measured ~50 ns/row (~13 GB/s effective for 640 B packed rows), while the
pair arithmetic itself is ~1000x cheaper per element (DESIGN.md access-cost
table). This module replaces the gathers with *contiguous DMA streams*:

  * Every i-chunk's trimmed j-runs (consecutive chunk rows of the packed
    table — ``_pairs_geometry`` guarantees consecutiveness per neighbor
    column) are rounded to RJ-row blocks, deduplicated, and flattened into
    ONE worklist of ``(i_chunk, j_block)`` entries.
  * A Pallas kernel walks the worklist with
    ``PrefetchScalarGridSpec``-driven index maps: the i side streams
    ``(C, 8)`` body blocks from a slot-major table, the j side streams
    ``(8, RJ*C)`` blocks from a channel-major (transposed) table. Both are
    contiguous-in-HBM reads that Mosaic double-buffers across grid steps —
    the manual-DMA row streaming lever named in ROADMAP ("Performance
    levers" #3), realized through the pipeline rather than hand-rolled
    ``make_async_copy`` (same DMAs, less code).
  * Block rounding can pull in rows outside the true run; correctness does
    not depend on run bounds at all: every pair is gated in-kernel by the
    exact finest-cell band ``|ci - cj|_inf <= ws`` (cell coordinates ride
    the tables as channels, derived from the deposited cell ids — the same
    cells the far field subtracts, so the near/far partition stays exact).
    Deduplication only prevents double-counting; masking handles the rest.

Layouts (C = chunk, W = RJ*C, all f32):

  Pbods [Kpad*C, 8]   slot-major   x y z m idx cx cy cz   (i side)
  PJt   [8, Kpad*C]   channel-major (Pbods.T)             (j side)
  out   [Qp*C, 8]     per-(entry, i-body) ax ay az pe idx 0 0 0

so the kernel's broadcasts — i on sublanes ``(C, 1)``, j on lanes
``(1, W)`` — come straight off the VMEM tiles with **no in-kernel
relayouts**, and ``W % 128 == 0`` keeps the lane dimension aligned.

Like every sweep in ops/tree.py, per-body results leave the kernel as
``(idx, acc, pe)`` rows that the caller segment-sums; dropped i-chunks
(worklist budget exhausted) are counted in the overflow, never silently
lost. Sentinel rows carry mass 0 / idx n / position 1e30, so padded
entries are inert without any validity masking in the kernel.

Budgets: ``max_chunks`` (shared with ``near="pairs"``) and ``wl_entries``
(total worklist blocks) — size both with :func:`tree_wl_budgets`, which
shares ``_pairs_geometry`` and :func:`_wl_runs` with the kernel so the
accounting cannot drift.

Reference lineage: this accelerates the near half of the tree force whose
exact counterpart is the reference's O(N^2) loop (core/physics.py:125-159);
the far half is unchanged (ops/tree.py conv pyramid).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["tree_wl_probe", "tree_wl_budgets"]

f32 = jnp.float32
i32 = jnp.int32


def _wl_runs(g, rj: int, k_ch: int, kpad: int):
    """RJ-aligned, deduplicated j-block runs per (i-chunk, neighbor).

    ``_pairs_geometry`` emits the 9 (at ws=1) neighbor runs in increasing
    table order (its ``nb2`` loop walks column ids ascending and distinct
    columns occupy disjoint, ascending chunk-row ranges), so a running
    coverage watermark dedups the overlap that RJ-rounding introduces
    between adjacent runs — without it a table row shared by two rounded
    blocks of the SAME i-chunk would be double-counted (the in-kernel cell
    band passes it both times).

    Returns ``(start_blk, n_blk)`` of shape [K_ch, n_nb], in j-block units.
    """
    j_lo, cnt = g["j_lo"], g["cnt"]  # [K_ch, n_nb], chunk-row units
    max_blk = kpad // rj
    has = cnt > 0
    lo_blk = jnp.where(has, j_lo // rj, 0)
    hi_blk = jnp.where(has, jnp.minimum(-(-(j_lo + cnt) // rj), max_blk), 0)
    watermark = jnp.zeros((k_ch,), i32)
    starts, counts = [], []
    for t in range(j_lo.shape[1]):
        s = jnp.maximum(lo_blk[:, t], watermark)
        c = jnp.where(has[:, t], jnp.maximum(hi_blk[:, t] - s, 0), 0)
        starts.append(jnp.where(c > 0, s, 0))
        counts.append(c)
        watermark = jnp.where(has[:, t],
                              jnp.maximum(watermark, hi_blk[:, t]),
                              watermark)
    return jnp.stack(starts, axis=1), jnp.stack(counts, axis=1)


def _wl_expand(start_blk, n_blk, k_ch: int, q: int, qp: int):
    """Flatten the per-(chunk, neighbor) block runs into the worklist.

    Entry q of run r (exclusive-cumsum offsets) carries
    ``(i_chunk, start_blk[r] + (q - off[r]))``. An i-chunk whose sweep
    does not fit inside the ``q`` budget loses its WHOLE sweep (entries
    masked to the sentinel chunk) and is reported via ``drop_chunk`` — the
    same drop-and-count semantics as ``_near_pairs``'s octave budgets.
    """
    n_nb = n_blk.shape[1]
    cnt_f = n_blk.reshape(-1)  # [K_ch * n_nb], k-major
    start_f = start_blk.reshape(-1)
    off = jnp.cumsum(cnt_f) - cnt_f  # exclusive
    over_run = (off + cnt_f > q) & (cnt_f > 0)
    drop_chunk = jnp.any(over_run.reshape(k_ch, n_nb), axis=1)
    drop_f = jnp.repeat(drop_chunk, n_nb)

    # scatter each emitted run's index at its offset, forward-max fills
    emit = (cnt_f > 0) & (off < q)
    n_runs = cnt_f.shape[0]
    run_mark = jnp.zeros((qp,), i32).at[
        jnp.where(emit, off, qp)].max(
        jnp.arange(1, n_runs + 1, dtype=i32), mode="drop")
    run = lax.associative_scan(jnp.maximum, run_mark) - 1
    runc = jnp.clip(run, 0, n_runs - 1)
    pos_q = jnp.arange(qp, dtype=i32)
    local = pos_q - off[runc]
    valid = ((run >= 0) & (local < cnt_f[runc]) & ~drop_f[runc]
             & (pos_q < q))
    wl_i = jnp.where(valid, runc // n_nb, k_ch).astype(i32)
    wl_jb = jnp.where(valid, start_f[runc] + local, 0).astype(i32)
    return wl_i, wl_jb, drop_chunk


def _entry_math(ib, jb, ws: int, eps2: float):
    """One (i-chunk, j-block) interaction: ``(C, 1) x (1, W)`` broadcasts
    on the VPU — ~26 ops + rsqrt per pair, mask = exact cell band &
    self-pair exclusion. All sentinel handling is by value (mass 0 ->
    zero weight & PE; idx n routes to the dropped segment), so there is
    no control flow at all. ib is (C, 8) x y z m idx cx cy cz; jb is its
    (8, W) channel-major counterpart; returns the (C, 8) output rows
    ax ay az pe idx 0 0 0. Shared by the Pallas kernel and the
    sharded-interpret emulation so the two can never diverge."""
    c = ib.shape[0]
    xi, yi, zi = ib[:, 0:1], ib[:, 1:2], ib[:, 2:3]
    idx_i = ib[:, 4:5]
    cxi, cyi, czi = ib[:, 5:6], ib[:, 6:7], ib[:, 7:8]
    xj, yj, zj = jb[0:1, :], jb[1:2, :], jb[2:3, :]
    mj, idx_j = jb[3:4, :], jb[4:5, :]
    cxj, cyj, czj = jb[5:6, :], jb[6:7, :], jb[7:8, :]

    dx = xj - xi  # (C, W)
    dy = yj - yi
    dz = zj - zi
    r2 = dx * dx + dy * dy + dz * dz + eps2
    inv_r = lax.rsqrt(r2)
    wsf = float(ws)
    take = ((jnp.abs(cxj - cxi) <= wsf)
            & (jnp.abs(cyj - cyi) <= wsf)
            & (jnp.abs(czj - czi) <= wsf)
            & (idx_i != idx_j))
    w = jnp.where(take, mj * (inv_r * inv_r * inv_r), 0.0)
    pe = jnp.sum(jnp.where(take, mj * inv_r, 0.0), axis=1,
                 keepdims=True)
    ax = jnp.sum(w * dx, axis=1, keepdims=True)
    ay = jnp.sum(w * dy, axis=1, keepdims=True)
    az = jnp.sum(w * dz, axis=1, keepdims=True)
    return jnp.concatenate(
        [ax, ay, az, pe, idx_i, jnp.zeros((c, 3), f32)], axis=1)


def _wl_kernel(wl_i_ref, wl_jb_ref, *refs, group: int, chunk: int,
               ws: int, eps2: float):
    """One grid step: GROUP independent (i-chunk, j-block) interactions
    (see :func:`_entry_math`)."""
    del wl_i_ref, wl_jb_ref  # consumed by the index maps
    i_refs = refs[:group]
    j_refs = refs[group:2 * group]
    out_ref = refs[2 * group]
    c = chunk
    for t in range(group):
        out_ref[t * c:(t + 1) * c, :] = _entry_math(
            i_refs[t][:, :], j_refs[t][:, :], ws, eps2)


@functools.lru_cache(maxsize=None)
def _build_wl_call(qp: int, kpad: int, chunk: int, rj: int, group: int,
                   ws: int, eps2: float, interpret: bool,
                   vma: str | None = None):
    c, w = chunk, rj * chunk
    kernel = functools.partial(_wl_kernel, group=group, chunk=c, ws=ws,
                               eps2=eps2)
    def _ix(gi, t):
        # under shard_map the prefetched worklist varies over the mesh
        # axis while the grid index does not; promote the index so the
        # vma checker sees matching varying axes on the lookup. The
        # interpreter replays the index-map jaxpr with the real
        # (already-varying) per-device values, where any pvary recorded
        # at trace time double-promotes — vma flows naturally there, so
        # skip the promotion (the out_shape vma below still holds).
        i = gi * group + t
        if vma is not None and not interpret:
            i = lax.pcast(i, vma, to="varying")
        return i

    def i_map(t):
        return lambda gi, wli, wljb: (wli[_ix(gi, t)], 0)

    def j_map(t):
        return lambda gi, wli, wljb: (0, wljb[_ix(gi, t)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(qp // group,),
        in_specs=(
            [pl.BlockSpec((c, 8), i_map(t), memory_space=pltpu.VMEM)
             for t in range(group)]
            + [pl.BlockSpec((8, w), j_map(t), memory_space=pltpu.VMEM)
               for t in range(group)]),
        out_specs=pl.BlockSpec((group * c, 8), lambda gi, wli, wljb: (gi, 0),
                               memory_space=pltpu.VMEM),
    )
    pairs = qp * c * w
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (qp * c, 8), f32,
            # under shard_map the worklist slice (so the output) varies
            # across the mesh axis; check_vma needs that stated
            vma=None if vma is None else frozenset({vma})),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=26 * pairs,
            bytes_accessed=qp * (c * 8 + 8 * w + c * 8) * 4,
            transcendentals=pairs,
        ),
        interpret=interpret,
    )


def _near_wl(sc, pos_srt, m_srt, sort_idx, n, M, ws, eps2, G,
             max_chunks, chunk, wl_entries, wl_rj, wl_group,
             _n_parts, _part_index, _pairs_geometry, _vma=None):
    """Near field at chunk-pair granularity through the Pallas worklist
    kernel. Same return contract as ``_near_pairs``:
    ``(idx, acc, pe, cap_overflow, cell_overflow)`` rows for the caller's
    segment-sum (acc includes G; pe is sum_j m_j/r). ``_pairs_geometry``
    is passed in from ops/tree.py so the two modules share one geometry.
    """
    c = int(chunk)
    rj = int(wl_rj)
    group = int(wl_group)
    if (rj * c) % 128 != 0:
        raise ValueError(
            f"near='kernel' needs wl_rj*chunk % 128 == 0 for lane "
            f"alignment (got {rj}*{c}={rj * c})")
    if c % 8 != 0:
        raise ValueError(f"near='kernel' needs chunk % 8 == 0 (got {c})")
    q = int(wl_entries)
    if q <= 0:
        raise ValueError(
            "near='kernel' needs wl_entries > 0 — size it with "
            "ops.tree_near_wl.tree_wl_budgets")
    k_ch = int(max_chunks) if max_chunks > 0 else (-(-n // c) + min(n, M * M))
    kpad = -(-(k_ch + 1) // rj) * rj

    g = _pairs_geometry(sc, n, M, ws, c, k_ch)
    cap_overflow = jnp.sum(g["valid_b"] & (g["chunk_ord"] >= k_ch),
                           dtype=i32)

    parts = max(1, int(_n_parts))
    q_part = -(-(-(-q // group) * group) // parts)
    q_part = -(-q_part // group) * group
    qp = q_part * parts

    start_blk, n_blk = _wl_runs(g, rj, k_ch, kpad)
    wl_i, wl_jb, drop_chunk = _wl_expand(start_blk, n_blk, k_ch, q, qp)

    # dropped i-chunks lose their TARGET sweep; count their kept bodies
    # (identical semantics to _near_pairs's octave-budget drops)
    dropped_b = jnp.concatenate([drop_chunk, jnp.zeros((1,), bool)])[
        jnp.minimum(g["chunk_ord"], k_ch)]
    cell_overflow = jnp.sum(g["keep"] & dropped_b, dtype=i32)

    # slot-major body table + channel-major transpose (one XLA transpose,
    # same cost class as the pairwise kernel's pts.T)
    keep = g["keep"]
    rank_in_chunk = g["rank_c"] % c
    slot = jnp.where(keep, g["chunk_ord"] * c + rank_in_chunk, k_ch * c)
    col_valid = g["col_s"] < M * M
    cx = jnp.where(col_valid, g["col_s"] // M, 0).astype(f32)
    cy = jnp.where(col_valid, g["col_s"] % M, 0).astype(f32)
    cz = jnp.where(col_valid, sc % M, 0).astype(f32)
    sent = jnp.array([1e30, 1e30, 1e30, 0.0, float(n), 1e9, 1e9, 1e9], f32)
    vals = jnp.stack(
        [pos_srt[:, 0], pos_srt[:, 1], pos_srt[:, 2], m_srt,
         sort_idx.astype(f32), cx, cy, cz], axis=1)
    vals = jnp.where(keep[:, None], vals, sent[None, :])
    pbods = jnp.broadcast_to(sent, (kpad * c, 8)).at[slot].set(
        vals, mode="drop")
    pjt = pbods.T

    interpret = jax.default_backend() != "tpu"
    if parts > 1 and _part_index is not None:
        base = _part_index * q_part
        wl_i = lax.dynamic_slice(wl_i, (base,), (q_part,))
        wl_jb = lax.dynamic_slice(wl_jb, (base,), (q_part,))
    else:
        wl_i = wl_i[:q_part]
        wl_jb = wl_jb[:q_part]
    if interpret and _vma is not None:
        # the Pallas interpreter replays index-map jaxprs in a vma
        # context that differs from trace time (the promotion recorded
        # for the compiled path double-promotes at replay) — under
        # shard_map on CPU, run the same math as plain XLA instead.
        # _entry_math is shared with the kernel, so this cannot drift.
        wblk = rj * c

        def _one(ii, jjb):
            zero = jnp.zeros((), i32)
            ib = lax.dynamic_slice(pbods, (ii * c, zero), (c, 8))
            jb = lax.dynamic_slice(pjt, (zero, jjb * wblk), (8, wblk))
            return _entry_math(ib, jb, int(ws), float(eps2))

        out = jax.vmap(_one)(wl_i, wl_jb).reshape(q_part * c, 8)
    else:
        call = _build_wl_call(q_part, kpad, c, rj, group, int(ws),
                              float(eps2), interpret, _vma)
        out = call(wl_i, wl_jb, *([pbods] * group), *([pjt] * group))

    idx_flat = out[:, 4].astype(i32)
    acc_flat = G * out[:, 0:3]
    pe_flat = out[:, 3]
    return idx_flat, acc_flat, pe_flat, cap_overflow, cell_overflow


def _host_probe_wl(jit_fn):
    """CPU-pin the worklist probe via ops.tree._host_probe, imported
    INSIDE the wrapper so this module never imports ops.tree at import
    time — tree.py is free to import tree_near_wl at top level without
    creating a cycle (ADVICE r3: the previous decorator-time import was
    only accidentally safe)."""
    import functools as _ft

    @_ft.wraps(jit_fn)
    def run(*args, **kw):
        from orbital_tpu.ops import tree as _tree

        return _tree._host_probe(jit_fn)(*args, **kw)

    run._jit_fn = jit_fn  # same introspection hook as _host_probe
    return run


@_host_probe_wl
@functools.partial(jax.jit,
                   static_argnames=("levels", "ws", "chunk", "rj"))
def tree_wl_probe(pos, alive=None, *, levels: int = 6, ws: int = 1,
                  chunk: int = 32, rj: int = 8, box=None):
    """Worklist census for ``near="kernel"``: returns (total chunk count,
    total j-block worklist entries) — the ``max_chunks`` / ``wl_entries``
    sizers. Shares ``_pairs_geometry`` and :func:`_wl_runs` with the
    kernel (same box fit, dead-body handling, chunking, z-trimmed runs,
    RJ rounding, and dedup), so the budgets can never drift from the
    sweep's own accounting. Costs one sort."""
    from orbital_tpu.ops.tree import _pairs_geometry, _probe_sorted_cells

    sc, n, M = _probe_sorted_cells(pos, alive, levels, box)
    c = int(chunk)
    k_safe = -(-n // c) + min(n, M * M)
    kpad = -(-(k_safe + 1) // int(rj)) * int(rj)
    g = _pairs_geometry(sc, n, M, ws, c, k_safe)
    _, n_blk = _wl_runs(g, int(rj), k_safe, kpad)
    total_chunks = jnp.sum(g["chunk_valid"].astype(i32))
    return total_chunks, jnp.sum(n_blk)


def tree_wl_budgets(pos, alive=None, *, levels: int, ws: int = 1,
                    chunk: int = 32, rj: int = 8, box=None,
                    headroom: float = 1.5) -> tuple[int, int]:
    """Host-side ``(max_chunks, wl_entries)`` sizing for
    ``near="kernel"`` — one :func:`tree_wl_probe` call, headroom-scaled
    and alignment-rounded (the analog of ``tree_pairs_budgets``)."""
    total, entries = tree_wl_probe(pos, alive, levels=levels, ws=ws,
                                   chunk=chunk, rj=rj, box=box)
    max_chunks = max(256, -(-int(int(total) * headroom) // 256) * 256)
    wl_entries = max(64, -(-int(int(entries) * headroom) // 64) * 64)
    return max_chunks, wl_entries
