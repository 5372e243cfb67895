r"""Multilevel tree gravity: hierarchical monopole far field + exact near field.

The third member of the force family (exact kernels -> P3M -> PM), built for
**strongly concentrated** systems — the regime the docstring of ops/p3m.py
excludes: a single flat cell grid must size its per-cell capacity for the
densest core cell, so centrally-concentrated clusters overflow any fixed
capacity. Here the near field runs on cells 2^levels per side (far finer
than P3M's ~r_cut grid), and everything farther is absorbed by a multipole
pyramid — the classic tree-code trade (Barnes & Hut), reshaped for TPU.

How pairs are partitioned (exactly once) across levels
------------------------------------------------------
Level ``l`` has ``2^l`` cells per side. A pair of bodies is *claimed* by
level ``l`` iff their level-``l`` cells are separated by more than ``ws``
cells (max-norm) while their parent cells at level ``l-1`` are within
``ws``. Since per-axis offsets shrink monotonically under floor-halving,
the claim indicator crosses exactly once: **every pair is handled by
exactly one level**, or — if the finest-level offset is still <= ws — by
the exact near-field sweep. The level-``l`` claim set is the static
stencil ``{d in [-(2ws+1), 2ws+1]^3 : max|d| > ws}`` with a per-axis
parity mask at ``|d_axis| = 2ws+1`` (offset +(2ws+1) is claimed by even
target cells, -(2ws+1) by odd ones — the floor-halving boundary).

Each claimed (target cell, source cell) interaction is evaluated as the
source *monopole* (mass at COM) acting at the *target COM*, plus its 3x3
Jacobian (symmetric, 6 channels); expansions are pushed down the pyramid
with exact re-centering (``A_child = A + J (COM_child - COM_parent)``) and
each body applies a final first-order Taylor step ``a(x) = A + J (x -
COM_cell)``. COM-COM monopole pairs are antisymmetric and the Taylor
terms are mass-weighted about each COM, so **total momentum is conserved
to rounding**.

Two sweep regimes (the TPU lesson: empty octants must cost nothing)
-------------------------------------------------------------------
* Levels <= ``_DENSE_LEVELS``: one ``lax.scan`` over the stencil,
  ``dynamic_slice``-shifted copies of the padded (count, mass, COM) grid,
  accumulating for every cell simultaneously — pure dense VPU arithmetic,
  zero gathers. Cost ~ stencil x 8^level, independent of N; cheap through
  level 6 (~260k cells).
* Deeper levels: a dense sweep would pay 316 x 8^level on mostly-empty
  cells (the failure that killed the prototyped static-grid design,
  ROADMAP round-3 notes). Instead only **occupied** target cells (a
  compacted, sorted id list; parents found by ``searchsorted``, never a
  dense inverse map) gather their stencil sources from the dense value
  grid by computed linear index. Cost ~ stencil x occupied(level) <=
  stencil x N.

Near field: only occupied finest-level cells are swept, each against its
``(2ws+1)^3`` neighborhood through P3M-style static-capacity body tables
with per-cell pre-gather. Bodies beyond ``capacity`` or occupied cells
beyond ``max_cells`` are *counted* in the returned overflow (0 => every
near pair was summed exactly). Deep ``levels`` is how concentration is
tamed: each extra level cuts the densest cell's occupancy ~8x while the
sparse far sweeps stay O(occupied).

Accuracy: ``ws=1`` is the fast default (316-shift stencil); ``ws=2``
(1206 shifts) roughly a decade better — measured RMS force errors on
concentrated clusters are in DESIGN.md (~1e-2 / ~3e-3). Softening
``eps2`` applies in *both* ranges, so the computed force is a consistent
(if cell-assignment-discontinuous) approximation of the softened
Hamiltonian. The reference has no analog (exact O(N^2) Python only,
core/physics.py:125-159); this extends the framework to concentrated
large-N systems past both the exact kernels' O(N^2) ceiling and P3M's
density-contrast bound.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from .pm import _bounding_cube

__all__ = ["tree_acc_potential", "tree_occupancy_probe", "tree_stencil"]

# levels up to this depth use dense shifted-grid stencil sweeps (zero
# gathers); deeper levels use occupied-cell sparse sweeps
_DENSE_LEVELS = 6
# value-grid channels: count, mass, m*x, m*y, m*z
_CH = 5


def tree_stencil(ws: int) -> list[tuple[int, int, int]]:
    """Static claim stencil: all offsets with ``ws < max|d| <= 2 ws + 1``."""
    p = 2 * ws + 1
    return [
        (a, b, c)
        for a in range(-p, p + 1)
        for b in range(-p, p + 1)
        for c in range(-p, p + 1)
        if max(abs(a), abs(b), abs(c)) > ws
    ]


def _apply_sym(j6, v):
    """Apply a symmetric 3x3 (packed xx,yy,zz,xy,xz,yz) to vectors [..., 3]."""
    vx, vy, vz = v[..., 0], v[..., 1], v[..., 2]
    ax = j6[..., 0] * vx + j6[..., 3] * vy + j6[..., 4] * vz
    ay = j6[..., 3] * vx + j6[..., 1] * vy + j6[..., 5] * vz
    az = j6[..., 4] * vx + j6[..., 5] * vy + j6[..., 2] * vz
    return jnp.stack([ax, ay, az], axis=-1)


def _monopole_terms(ms, r, *, G, eps2):
    """Monopole acc/Jacobian/potential of sources ``ms`` at displacement
    ``r = COM_target - COM_source`` [..., 3]. Returns (dA [...,3],
    dJ [...,6], dphi [...]); multiply ms by the claim/validity mask first."""
    r2 = r[..., 0] ** 2 + r[..., 1] ** 2 + r[..., 2] ** 2 + eps2
    inv = lax.rsqrt(r2)
    inv2 = inv * inv
    w = (G * ms) * (inv * inv2)               # G m_s / R^3
    dA = -w[..., None] * r
    k = (3.0 * w) * inv2
    rx, ry, rz = r[..., 0], r[..., 1], r[..., 2]
    dJ = jnp.stack([k * rx * rx - w, k * ry * ry - w, k * rz * rz - w,
                    k * rx * ry, k * rx * rz, k * ry * rz], axis=-1)
    dphi = -w * r2                            # -G m_s / R
    return dA, dJ, dphi


def _com_of(rows, centers):
    """COM from (count, mass, m x) channel rows, cell center for empty."""
    mass = rows[..., 1:2]
    return jnp.where(mass > 0.0, rows[..., 2:5] / jnp.maximum(mass, 1e-30),
                     centers)


def _cell_centers_of(ids, m, origin, h):
    """Cell-center coordinates of linear cell ids (any shape)."""
    cz = ids % m
    cy = (ids // m) % m
    cx = ids // (m * m)
    return origin + (jnp.stack([cx, cy, cz], axis=-1).astype(jnp.float32)
                     + 0.5) * h


def _dense_centers(m, origin, h):
    c = (jnp.arange(m, dtype=jnp.float32) + 0.5) * h
    gx = jnp.broadcast_to(c[:, None, None], (m, m, m))
    gy = jnp.broadcast_to(c[None, :, None], (m, m, m))
    gz = jnp.broadcast_to(c[None, None, :], (m, m, m))
    return origin + jnp.stack([gx, gy, gz], axis=-1)


def _upsample(x):
    """Nearest-neighbor 2x upsample of [m, m, m, C] -> [2m, 2m, 2m, C]."""
    m = x.shape[0]
    c = x.shape[-1]
    x = jnp.broadcast_to(x[:, None, :, None, :, None, :],
                         (m, 2, m, 2, m, 2, c))
    return x.reshape(2 * m, 2 * m, 2 * m, c)


def _dense_level_sweep(grid, com_t, *, G, eps2, ws, A, J, phi):
    """Dense shifted-grid stencil sweep: accumulate one level's claims into
    (A, J, phi) for EVERY cell simultaneously. grid [m,m,m,_CH]."""
    m = grid.shape[0]
    p = 2 * ws + 1
    f32 = jnp.float32

    src = jnp.concatenate([grid[..., 1:2], com_t], axis=-1)   # mass + COM
    src_pad = jnp.pad(src, ((p, p), (p, p), (p, p), (0, 0)))

    even = (jnp.arange(m) % 2 == 0).astype(f32)
    odd = 1.0 - even
    ones = jnp.ones((m,), f32)

    def axis_mask(d):
        return jnp.where(d == p, even, jnp.where(d == -p, odd, ones))

    shifts = jnp.asarray(tree_stencil(ws), jnp.int32)

    def body(carry, d):
        A, J, phi = carry
        zero = jnp.zeros((), d.dtype)
        sd = lax.dynamic_slice(src_pad, (p + d[0], p + d[1], p + d[2], zero),
                               (m, m, m, 4))
        mask = (axis_mask(d[0])[:, None, None]
                * axis_mask(d[1])[None, :, None]
                * axis_mask(d[2])[None, None, :])
        dA, dJ, dphi = _monopole_terms(sd[..., 0] * mask, com_t - sd[..., 1:4],
                                       G=G, eps2=eps2)
        return (A + dA, J + dJ, phi + dphi), None

    (A, J, phi), _ = lax.scan(body, (A, J, phi), shifts)
    return A, J, phi


def _sparse_level_sweep(grid_flat, occ_ids, com_t, *, m, origin, h, G, eps2,
                        ws, block=256):
    """Occupied-cell stencil sweep at a deep level: each target cell in
    ``occ_ids`` (sorted, sentinel m^3 padded) gathers its stencil sources
    from the dense value grid by computed linear index. Returns per-target
    (A [K,3], J [K,6], phi [K]) — empty octants cost nothing."""
    f32 = jnp.float32
    p = 2 * ws + 1
    offs = jnp.asarray(tree_stencil(ws), jnp.int32)           # [S, 3]
    m3 = m * m * m
    grid_pad = jnp.concatenate(
        [grid_flat, jnp.zeros((1, _CH), f32)], axis=0)        # sentinel row
    K = occ_ids.shape[0]
    n_blocks = -(-K // block)
    ids_pad = jnp.concatenate(
        [occ_ids, jnp.full((n_blocks * block - K,), m3, jnp.int32)])
    com_pad = jnp.concatenate([com_t, jnp.zeros((n_blocks * block - K, 3),
                                                f32)], axis=0)

    def do_block(b0):
        ids = lax.dynamic_slice(ids_pad, (b0,), (block,))
        ct = lax.dynamic_slice(com_pad, (b0, 0), (block, 3))
        valid = ids < m3
        idc = jnp.where(valid, ids, 0)
        cz = idc % m
        cy = (idc // m) % m
        cx = idc // (m * m)
        nx = cx[:, None] + offs[None, :, 0]                   # [B, S]
        ny = cy[:, None] + offs[None, :, 1]
        nz = cz[:, None] + offs[None, :, 2]
        ok = ((0 <= nx) & (nx < m) & (0 <= ny) & (ny < m)
              & (0 <= nz) & (nz < m) & valid[:, None])
        nid = jnp.where(ok, (nx * m + ny) * m + nz, m3)
        rows = grid_pad[nid]                                  # [B, S, _CH]
        # parity claim masks at |d| = p (see module docstring)
        par = jnp.stack([cx, cy, cz], axis=-1) % 2            # [B, 3]

        def amask(axis):
            d = offs[None, :, axis]
            pa = par[:, None, axis]
            return jnp.where(d == p, (pa == 0),
                             jnp.where(d == -p, (pa == 1), True))

        claim = amask(0) & amask(1) & amask(2)
        ms = rows[..., 1] * (ok & claim).astype(f32)
        centers_s = _cell_centers_of(nid, m, origin, h)
        com_s = _com_of(rows, centers_s)
        dA, dJ, dphi = _monopole_terms(ms, ct[:, None, :] - com_s,
                                       G=G, eps2=eps2)
        return dA.sum(1), dJ.sum(1), dphi.sum(1)

    starts = jnp.arange(0, n_blocks * block, block)
    A_b, J_b, phi_b = lax.map(do_block, starts)
    return (A_b.reshape(-1, 3)[:K], J_b.reshape(-1, 6)[:K],
            phi_b.reshape(-1)[:K])


def _occupied_ids(grid_flat, K, m3):
    """Sorted linear ids of occupied cells (count > 0), padded with the
    sentinel ``m3``; plus the true occupied total (for overflow counting)."""
    occupied = grid_flat[:, 0] > 0.0
    ids = jnp.nonzero(occupied, size=K, fill_value=m3)[0].astype(jnp.int32)
    return ids, jnp.sum(occupied.astype(jnp.int32))


def _lookup_slot(sorted_ids, query):
    """Row index of ``query`` in the sorted (sentinel-padded) id list, or
    ``len(sorted_ids)`` when absent — the dense-inverse-map replacement
    (a [8^levels] int32 map would not fit at deep levels)."""
    K = sorted_ids.shape[0]
    slot = jnp.searchsorted(sorted_ids, query).astype(jnp.int32)
    hit = sorted_ids[jnp.minimum(slot, K - 1)] == query
    return jnp.where(hit, jnp.minimum(slot, K - 1), K)


@partial(jax.jit,
         static_argnames=("G_grav", "eps2", "levels", "capacity", "ws",
                          "max_cells", "cell_block", "with_potential"))
def tree_acc_potential(
    pos: jax.Array,
    mass: jax.Array,
    alive: Optional[jax.Array] = None,
    *,
    G_grav: float,
    eps2: float,
    levels: int = 6,
    capacity: int = 48,
    ws: int = 1,
    max_cells: int = 0,
    cell_block: int = 32,
    with_potential: bool = True,
    box=None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Tree accelerations, potential, and the near-field overflow count.

    Args:
        levels: pyramid depth; the near field runs on ``2^levels`` cells
            per side. Deeper = ~8x lower per-cell occupancy (tames
            concentration) at O(occupied) sparse far-field cost per extra
            level.
        capacity: max bodies per finest-level cell in the near-field
            tables. Size from :func:`tree_occupancy_probe`.
        ws: well-separation in cells. 1 = fast (316-shift stencil, 27-cell
            near field), 2 = accurate (1206 shifts, 125-cell near field).
        max_cells: static occupied-cell budget for the near-field sweep
            and the deep-level sparse far sweeps (0 = ``min(N,
            8^levels)``, always safe). Occupied cells beyond it are
            *dropped and counted* in the overflow.
        box: optional (center [3], half) pinning the grid (recommended for
            long rollouts, same rationale as ``SimConfig.pm_box``); default
            refits the live bounding cube every call. Bodies outside a
            pinned box clip into the boundary cells.

    Returns (acc [N,3], U, overflow int32). ``overflow`` counts live bodies
    excluded from the near-field sum (cell past ``capacity`` or occupied
    cell past ``max_cells``); results are only trustworthy at 0. Requires
    ``eps2 > 0`` (shared-cell coincident pairs would otherwise divide by
    zero, exactly like the reference's unsoftened path).
    """
    if eps2 <= 0.0:
        raise ValueError("the tree solver requires eps2 > 0")
    if ws not in (1, 2):
        raise ValueError("ws must be 1 or 2")
    if levels < 2 or levels > 8:
        raise ValueError("levels must be in [2, 8]")
    n = pos.shape[0]
    M = 2 ** levels
    M3 = M * M * M
    f32 = jnp.float32
    G = float(G_grav)
    eps2 = float(eps2)

    pos32 = pos.astype(f32)
    alive_b = (jnp.ones((n,), bool) if alive is None else alive.astype(bool))
    alive_f = alive_b.astype(f32)
    m_eff = mass.astype(f32) * alive_f

    if box is None:
        center, half = _bounding_cube(pos32, alive_f, M, None)
    else:
        center = jnp.asarray(box[0], f32)
        half = jnp.asarray(box[1], f32)
    h = 2.0 * half / M
    origin = center - half

    cc = jnp.clip(jnp.floor((pos32 - origin) / h).astype(jnp.int32),
                  0, M - 1)
    cell_id = (cc[:, 0] * M + cc[:, 1]) * M + cc[:, 2]
    cell_id = jnp.where(alive_b, cell_id, M3)  # dead bodies -> sentinel

    # ---- multipole pyramid: NGP deposit of (1, m, m x) + coarsening -------
    data = jnp.concatenate(
        [alive_f[:, None], m_eff[:, None], m_eff[:, None] * pos32], axis=1)
    fine = jax.ops.segment_sum(data, cell_id, num_segments=M3 + 1)[:M3]
    grids = {levels: fine.reshape(M, M, M, _CH)}
    for lev in range(levels - 1, 1, -1):
        g = grids[lev + 1]
        mm = g.shape[0] // 2
        grids[lev] = g.reshape(mm, 2, mm, 2, mm, 2, _CH).sum(axis=(1, 3, 5))

    K = min(n, M3) if max_cells <= 0 else int(max_cells)
    n_dense = min(levels, _DENSE_LEVELS)

    # ---- far field, dense regime: coarse -> level n_dense -----------------
    m2 = grids[2].shape[0]
    A = jnp.zeros((m2, m2, m2, 3), f32)
    J = jnp.zeros((m2, m2, m2, 6), f32)
    phi = jnp.zeros((m2, m2, m2), f32)
    com_prev = None
    for lev in range(2, n_dense + 1):
        g = grids[lev]
        mlev = g.shape[0]
        h_lev = 2.0 * half / mlev
        com_t = _com_of(g, _dense_centers(mlev, origin, h_lev))
        if com_prev is not None:
            A_u, J_u, phi_u = _upsample(A), _upsample(J), _upsample(phi[..., None])
            delta = com_t - _upsample(com_prev)
            phi = phi_u[..., 0] - jnp.sum(A_u * delta, axis=-1)
            A = A_u + _apply_sym(J_u, delta)
            J = J_u
        A, J, phi = _dense_level_sweep(g, com_t, G=G, eps2=eps2, ws=ws,
                                       A=A, J=J, phi=phi)
        com_prev = com_t

    # ---- far field, sparse regime: occupied cells only at deep levels -----
    if levels > _DENSE_LEVELS:
        md = grids[n_dense].shape[0]
        A_d = A.reshape(md ** 3, 3)
        J_d = J.reshape(md ** 3, 6)
        phi_d = phi.reshape(md ** 3)
        com_d = com_prev.reshape(md ** 3, 3)
        occ_prev = None  # (ids, A, J, phi, com) rows at the previous level
        for lev in range(_DENSE_LEVELS + 1, levels + 1):
            mlev = 2 ** lev
            h_lev = 2.0 * half / mlev
            grid_flat = grids[lev].reshape(mlev ** 3, _CH)
            Kl = min(K, mlev ** 3)
            ids, _ = _occupied_ids(grid_flat, Kl, mlev ** 3)
            valid = ids < mlev ** 3
            idc = jnp.where(valid, ids, 0)
            centers = _cell_centers_of(ids, mlev, origin, h_lev)
            com_t = _com_of(grid_flat[idc], centers)
            # pull the parent expansion down onto this level's COMs
            cz = idc % mlev
            cy = (idc // mlev) % mlev
            cx = idc // (mlev * mlev)
            mp = mlev // 2
            pid = ((cx >> 1) * mp + (cy >> 1)) * mp + (cz >> 1)
            if occ_prev is None:
                A_p, J_p, phi_p, com_p = (A_d[pid], J_d[pid], phi_d[pid],
                                          com_d[pid])
            else:
                p_ids, Ap, Jp, php, cmp_ = occ_prev
                slot = _lookup_slot(p_ids, pid)
                sl = jnp.minimum(slot, p_ids.shape[0] - 1)
                # every occupied cell's parent is occupied; sentinel target
                # rows may miss — their contribution is masked out below
                A_p, J_p, phi_p, com_p = Ap[sl], Jp[sl], php[sl], cmp_[sl]
            delta = com_t - com_p
            A_t = A_p + _apply_sym(J_p, delta)
            phi_t = phi_p - jnp.sum(A_p * delta, axis=-1)
            J_t = J_p
            dA, dJ, dphi = _sparse_level_sweep(
                grid_flat, ids, com_t, m=mlev, origin=origin, h=h_lev,
                G=G, eps2=eps2, ws=ws)
            vf = valid.astype(f32)
            A_t = (A_t + dA) * vf[:, None]
            J_t = (J_t + dJ) * vf[:, None]
            phi_t = (phi_t + dphi) * vf
            occ_prev = (ids, A_t, J_t, phi_t, com_t)

        occ_L, A_L, J_L, phi_L, com_L = occ_prev
        body_slot = _lookup_slot(occ_L, jnp.minimum(cell_id, M3))
        pad = jnp.zeros((1,), f32)
        A_b = jnp.concatenate([A_L, jnp.zeros((1, 3), f32)])[body_slot]
        J_b = jnp.concatenate([J_L, jnp.zeros((1, 6), f32)])[body_slot]
        phi_b = jnp.concatenate([phi_L, pad])[body_slot]
        com_b = jnp.concatenate([com_L, jnp.zeros((1, 3), f32)])[body_slot]
    else:
        F = jnp.concatenate([A, J, phi[..., None], com_prev], axis=-1)
        F = F.reshape(M3, 13)
        F = jnp.concatenate([F, jnp.zeros((1, 13), f32)], axis=0)
        rows = F[jnp.minimum(cell_id, M3)]
        A_b, J_b, phi_b, com_b = (rows[:, 0:3], rows[:, 3:9], rows[:, 9],
                                  rows[:, 10:13])

    dx = pos32 - com_b
    a_far = A_b + _apply_sym(J_b, dx)
    phi_far = phi_b - jnp.sum(A_b * dx, axis=-1)

    # ---- near field: exact sweep over OCCUPIED finest cells only ----------
    grid_L_flat = grids[levels].reshape(M3, _CH)
    occ_idx, occ_total = _occupied_ids(grid_L_flat, K, M3)

    order = jnp.argsort(cell_id)
    sc = cell_id[order]
    first = jnp.searchsorted(sc, sc, side="left")
    rank = jnp.arange(n, dtype=jnp.int32) - first.astype(jnp.int32)
    slot = _lookup_slot(occ_idx, jnp.minimum(sc, M3))
    keep = (rank < capacity) & (sc < M3) & (slot < K)
    cap_overflow = jnp.sum((rank >= capacity) & (sc < M3) & (slot < K),
                           dtype=jnp.int32)
    cell_overflow = jnp.sum((slot >= K) & (sc < M3), dtype=jnp.int32)

    table = jnp.full((K + 1, capacity), n, jnp.int32)
    table = table.at[jnp.where(keep, slot, K),
                     jnp.clip(rank, 0, capacity - 1)].set(
        jnp.where(keep, order.astype(jnp.int32), n))

    pos_pad = jnp.concatenate([pos32, jnp.full((1, 3), 1e30, f32)], axis=0)
    m_pad = jnp.concatenate([m_eff, jnp.zeros((1,), f32)])
    cell_pos = pos_pad[table]                                # [K+1, C, 3]
    cell_m = m_pad[table]                                    # [K+1, C]

    nb_off = [(a, b, c) for a in range(-ws, ws + 1)
              for b in range(-ws, ws + 1) for c in range(-ws, ws + 1)]
    n_blocks = -(-K // cell_block)

    def block(s0):
        slots = s0 + jnp.arange(cell_block)
        ids = occ_idx[jnp.minimum(slots, K - 1)]
        valid = (slots < K) & (ids < M3)
        cz = ids % M
        cy = (ids // M) % M
        cx = ids // (M * M)
        nb_slots = []
        for a, b, c in nb_off:
            nx, ny, nz = cx + a, cy + b, cz + c
            ok = ((0 <= nx) & (nx < M) & (0 <= ny) & (ny < M)
                  & (0 <= nz) & (nz < M) & valid)
            nid = jnp.where(ok, (nx * M + ny) * M + nz, M3)
            nb_slots.append(_lookup_slot(occ_idx, nid))
        nb = jnp.stack(nb_slots, axis=1)                     # [B, n_nb]

        own = jnp.where(valid, slots, K)
        idx_my = table[own]                                  # [B, C]
        idx_nb = table[nb].reshape(cell_block, -1)           # [B, n_nb C]
        pi = cell_pos[own]                                   # [B, C, 3]
        pj = cell_pos[nb].reshape(cell_block, -1, 3)
        mj = cell_m[nb].reshape(cell_block, -1)

        dx = pj[:, None, :, 0] - pi[:, :, None, 0]           # [B, C, n_nb C]
        dy = pj[:, None, :, 1] - pi[:, :, None, 1]
        dz = pj[:, None, :, 2] - pi[:, :, None, 2]
        r2 = dx * dx + dy * dy + dz * dz + eps2
        inv_r = lax.rsqrt(r2)
        not_self = idx_my[:, :, None] != idx_nb[:, None, :]
        w = jnp.where(not_self, mj[:, None, :] * (inv_r * inv_r * inv_r), 0.0)
        acc_b = G * jnp.stack(
            [jnp.sum(w * dx, -1), jnp.sum(w * dy, -1), jnp.sum(w * dz, -1)],
            axis=-1)
        pe_b = jnp.sum(jnp.where(not_self, mj[:, None, :] * inv_r, 0.0), -1)
        return idx_my, acc_b, pe_b

    starts = jnp.arange(0, n_blocks * cell_block, cell_block)
    idx_all, acc_all, pe_all = lax.map(block, starts)
    idx_flat = idx_all.reshape(-1)
    acc_near = jax.ops.segment_sum(
        acc_all.reshape(-1, 3), idx_flat, num_segments=n + 1)[:n]
    pe_near = jax.ops.segment_sum(
        pe_all.reshape(-1), idx_flat, num_segments=n + 1)[:n]

    acc = (a_far + acc_near) * alive_f[:, None]
    overflow = cap_overflow + cell_overflow

    if with_potential:
        U = jnp.sum(m_eff * (0.5 * phi_far - 0.5 * G * pe_near))
    else:
        U = jnp.zeros((), f32)
    return acc.astype(pos.dtype), U.astype(pos.dtype), overflow


@partial(jax.jit, static_argnames=("levels",))
def tree_occupancy_probe(
    pos: jax.Array,
    alive: Optional[jax.Array] = None,
    *,
    levels: int = 6,
    box=None,
) -> tuple[jax.Array, jax.Array]:
    """(max bodies per finest cell, occupied finest-cell count) — the
    ``capacity`` / ``max_cells`` sizers, binned exactly like
    :func:`tree_acc_potential` (same box fit and dead-body handling), at
    the cost of one segment-sum."""
    n = pos.shape[0]
    M = 2 ** levels
    M3 = M * M * M
    f32 = jnp.float32
    pos32 = pos.astype(f32)
    alive_b = (jnp.ones((n,), bool) if alive is None else alive.astype(bool))
    if box is None:
        center, half = _bounding_cube(pos32, alive_b.astype(f32), M, None)
    else:
        center = jnp.asarray(box[0], f32)
        half = jnp.asarray(box[1], f32)
    h = 2.0 * half / M
    cc = jnp.clip(jnp.floor((pos32 - (center - half)) / h).astype(jnp.int32),
                  0, M - 1)
    cell_id = (cc[:, 0] * M + cc[:, 1]) * M + cc[:, 2]
    cell_id = jnp.where(alive_b, cell_id, M3)
    counts = jax.ops.segment_sum(alive_b.astype(jnp.int32), cell_id,
                                 num_segments=M3 + 1)[:M3]
    return jnp.max(counts), jnp.sum((counts > 0).astype(jnp.int32))
