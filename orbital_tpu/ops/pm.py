"""Particle-mesh (PM) gravity: FFT Poisson solve for N >> 10^5.

The exact O(N^2) kernels top out around N ~ 1.3e5 per chip (DESIGN.md);
this solver trades small-scale accuracy for O(N + G^3 log G) cost, the
standard Hockney–Eastwood open-boundary scheme recast in XLA primitives
(FFTs run on the TPU tensor cores; deposits/gathers are segment-sums):

  1. cloud-in-cell (CIC) deposit of particle masses onto a G^3 grid over
     the live bodies' bounding cube;
  2. potential by convolution with the softened Green's function
     K(r) = 1/sqrt(|r|^2 + eps^2): zero-pad to (2G)^3 so the circular
     FFT convolution equals the open-boundary linear one (no periodic
     images), phi = -G_grav * IFFT(FFT(K) . FFT(rho)), with the CIC
     k-space window deconvolved (halves the force error);
  3. acc = -grad(phi) by centered differences (the padded solution is
     exact one cell beyond the image region, so edges need no one-sided
     stencils), CIC-gathered back to the particles.

Accuracy contract (documented, NOT the exact-kernel contract): pair
forces are accurate to ~(h/r)^2 beyond a few cell spacings h and smoothed
below ~h, so the *effective* softening is max(eps, ~h). Use it when the
physics is collisionless (clusters, disks, cosmology-style runs) — for
collisional dynamics use the exact kernels at small N or the P3M solver
(``ops.p3m``) at large N. The potential diagnostic subtracts the leading
CIC self-energy and is approximate at O(h/eps).

This is a capability extension beyond the reference (which is exact
O(N^2) only, core/physics.py:125-159); it exists to push past the exact
path's single-chip ceiling (ROADMAP: N >> 1.3e5).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["pm_acc_potential"]


def _cic_weights(uc):
    """Trilinear (CIC) base cells and weights. uc: [N, 3] cell-center
    coords. Returns (i0 [N,3] int32, fr [N,3] in [0,1])."""
    i0 = jnp.floor(uc).astype(jnp.int32)
    fr = uc - i0
    return i0, fr


def _bounding_cube(pos32, alive_f, g, axis_name):
    """Center/half-width of the live bodies' bounding cube (collective when
    sharded), with a 2%-plus-one-cell margin so CIC clips never touch live
    particles."""
    f32 = jnp.float32
    big = jnp.asarray(3.4e38, f32)
    lo = jnp.min(jnp.where(alive_f[:, None] > 0, pos32, big), axis=0)
    hi = jnp.max(jnp.where(alive_f[:, None] > 0, pos32, -big), axis=0)
    if axis_name is not None:
        lo = jax.lax.pmin(lo, axis_name)
        hi = jax.lax.pmax(hi, axis_name)
    center = 0.5 * (lo + hi)
    half = jnp.maximum(jnp.max(0.5 * (hi - lo)), 1e-30) * (1.02 + 2.0 / g)
    return center, half


def _cic_corners(pos32, origin, h, g):
    """Flattened cell indices and weights of the 8 CIC corners, as [8, N]
    stacks (a [N, 2, 2, 2] layout gets 64x-padded by TPU (8, 128) tiling
    and OOMs at multi-million N)."""
    uc = (pos32 - origin) / h - 0.5
    uc = jnp.clip(uc, 0.0, g - 1.001)        # also tames far-parked dead
    i0, fr = _cic_weights(uc)
    i1 = jnp.minimum(i0 + 1, g - 1)
    wxs = (1.0 - fr[:, 0], fr[:, 0])
    wys = (1.0 - fr[:, 1], fr[:, 1])
    wzs = (1.0 - fr[:, 2], fr[:, 2])
    ixs = (i0[:, 0], i1[:, 0])
    iys = (i0[:, 1], i1[:, 1])
    izs = (i0[:, 2], i1[:, 2])
    corners = [(a, b, c) for a in (0, 1) for b in (0, 1) for c in (0, 1)]
    flat8 = jnp.stack(
        [(ixs[a] * g + iys[b]) * g + izs[c] for a, b, c in corners])
    w8 = jnp.stack([wxs[a] * wys[b] * wzs[c] for a, b, c in corners])
    return flat8, w8


def _pm_core(pos32, m_eff, alive_f, *, g: int, G_grav: float, kern_builder,
             with_potential: bool, axis_name, deconvolve: bool, box=None):
    """Shared mesh pipeline: deposit -> padded FFT convolution with the
    kernel produced by ``kern_builder(r2_grid, h)`` -> gradient -> gather.
    Returns (acc [N,3] alive-masked, phi_at [N] or None, h, center, half).

    ``box`` (center [3], half scalar) fixes the mesh instead of re-fitting
    it to the live extent every call: with a static box the mesh force is
    a FIXED smooth approximate Hamiltonian, so leapfrog conserves its
    energy instead of random-walking on per-step grid re-snaps (measured:
    orders of magnitude on 10k-step drift). Bodies outside a static box
    clip to the boundary cells — size it with margin."""
    f32 = jnp.float32
    if box is None:
        center, half = _bounding_cube(pos32, alive_f, g, axis_name)
    else:
        center = jnp.asarray(box[0], f32)
        half = jnp.asarray(box[1], f32)
    h = 2.0 * half / g
    origin = center - half

    flat8, w8 = _cic_corners(pos32, origin, h, g)
    rho = jax.ops.segment_sum((w8 * m_eff[None]).reshape(-1),
                              flat8.reshape(-1),
                              num_segments=g * g * g).reshape(g, g, g)
    if axis_name is not None:
        rho = jax.lax.psum(rho, axis_name)  # global density, one collective

    # open-boundary Green's function on the zero-padded cube: coordinate
    # k in [0, 2g) maps to the mirrored displacement ((k+g) mod 2g) - g
    p = 2 * g
    k = jnp.arange(p)
    d = (jnp.where(k > g, k - p, k)).astype(f32) * h   # [p] displacements
    r2 = (d[:, None, None] ** 2 + d[None, :, None] ** 2
          + d[None, None, :] ** 2)
    kern_hat = jnp.fft.rfftn(kern_builder(r2, h))
    if deconvolve:
        # undo the CIC cloud smearing of BOTH the deposit and the gather:
        # divide the Green's function by the squared CIC k-space window
        # (sinc^2 per axis, so sinc^4 total). Capped away from the Nyquist
        # zero to avoid noise amplification. Measured: halves the RMS
        # force error (1.0% -> 0.44% at eps ~ 3 cells, grid 64).
        xf = jnp.pi * jnp.fft.fftfreq(p)
        xr = jnp.pi * jnp.fft.rfftfreq(p)
        s2 = jnp.where(xf == 0, 1.0,
                       jnp.sin(xf) / jnp.where(xf == 0, 1.0, xf)) ** 2
        s2r = jnp.where(xr == 0, 1.0,
                        jnp.sin(xr) / jnp.where(xr == 0, 1.0, xr)) ** 2
        W2 = (s2[:, None, None] * s2[None, :, None] * s2r[None, None, :]) ** 2
        kern_hat = kern_hat / jnp.maximum(W2, 0.05)

    rho_p = jnp.zeros((p, p, p), f32).at[:g, :g, :g].set(rho)
    phi = -G_grav * jnp.fft.irfftn(jnp.fft.rfftn(rho_p) * kern_hat,
                                   s=(p, p, p))

    # centered-difference field; the padded phi is exact one cell beyond
    # the image region, so rolls never alias wrong data into [0, g)
    inv2h = 1.0 / (2.0 * h)

    def grad_axis(a):
        return ((jnp.roll(phi, -1, a) - jnp.roll(phi, 1, a))
                * -inv2h)[:g, :g, :g]

    fields = [grad_axis(0), grad_axis(1), grad_axis(2)]
    if with_potential:
        fields.append(phi[:g, :g, :g])
    # one channel-stacked gather instead of one per field: the random HBM
    # access dominates PM cost (the FFT is ~2% at 1M bodies), and fetching
    # all channels per cell index amortizes it. Layout [C, 8, N] keeps the
    # long axis last.
    F = jnp.stack([f.reshape(-1) for f in fields], axis=0)   # [C, g^3]
    vals = F[:, flat8]                                       # [C, 8, N]
    out = jnp.sum(vals * w8[None], axis=1)                   # [C, N]

    acc = out[0:3].T * alive_f[:, None]
    phi_at = out[3] if with_potential else None
    return acc, phi_at, h, center, half


@partial(jax.jit,
         static_argnames=("G_grav", "eps2", "grid", "with_potential",
                          "axis_name", "deconvolve"))
def pm_acc_potential(
    pos: jax.Array,
    mass: jax.Array,
    alive: Optional[jax.Array] = None,
    *,
    G_grav: float,
    eps2: float,
    grid: int = 64,
    with_potential: bool = True,
    axis_name: Optional[str] = None,
    deconvolve: bool = True,
    box=None,
) -> tuple[jax.Array, jax.Array]:
    """PM accelerations (and approximate potential) for all bodies.

    ``box = (center [3], half)`` pins the mesh (recommended for long
    rollouts: a fixed mesh makes the approximate force conservative, see
    ``_pm_core``); default refits the live bounding cube every call.

    Same call contract as the exact force kernels: (acc [N,3], U scalar),
    dead bodies inert. ``grid`` is the mesh resolution per axis (the FFT
    runs on the zero-padded (2*grid)^3 cube). Requires eps2 > 0.

    Multi-chip: with ``axis_name`` set (inside shard_map over body-sharded
    particles), the bounding box is agreed via pmin/pmax, each shard
    deposits its particles locally and ONE psum of the G^3 mass grid (a
    few MB over ICI) makes the density global; the FFT solve is replicated
    per device (cheap — the grid is tiny next to the particles) and the
    gather stays local. N then scales with the mesh.
    """
    if eps2 <= 0.0:
        raise ValueError("the PM solver requires eps2 > 0")
    n = pos.shape[0]
    g = int(grid)
    f32 = jnp.float32

    pos32 = pos.astype(f32)
    alive_f = (jnp.ones((n,), f32) if alive is None else alive.astype(f32))
    m_eff = mass.astype(f32) * alive_f

    def kern(r2_grid, h):
        return jax.lax.rsqrt(r2_grid + f32(eps2))

    acc, phi_at, _, _, _ = _pm_core(
        pos32, m_eff, alive_f, g=g, G_grav=G_grav, kern_builder=kern,
        with_potential=with_potential, axis_name=axis_name,
        deconvolve=deconvolve, box=box)

    if with_potential:
        # subtract the leading CIC self-interaction (each particle sees its
        # own smoothed cloud): -G m K(0) = -G m / eps
        self_phi = -G_grav * m_eff * (1.0 / float(eps2) ** 0.5)
        U = 0.5 * jnp.sum(m_eff * (phi_at - self_phi))
        if axis_name is not None:
            U = jax.lax.psum(U, axis_name)
    else:
        U = jnp.zeros((), f32)
    return acc.astype(pos.dtype), U.astype(pos.dtype)
