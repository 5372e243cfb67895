"""Whole-rollout fused Pallas kernel: K leapfrog steps in one launch.

For small and mid N the scan-based stepper pays per-step XLA op and
pipeline overheads that dwarf the O(N^2) compute. This kernel keeps the
*entire simulation state resident in VMEM* — positions+masses packed
[8, N] lane-major, velocities likewise, an acceleration scratch — and runs
the complete KDK loop (kick, drift, force sweep over (i, j) tiles, kick)
inside a single Pallas program: zero HBM traffic and zero dispatches
between steps.

Layout: row r of the packed arrays holds (0:x, 1:y, 2:z, 3:mass,
4:x_lo, 5:y_lo, 6:z_lo, 7:pad); the _lo rows are the double-single
compensation terms under the ds32 policy (zeros for plain f32 — the
arithmetic is identical, compensation just stays 0-ish and is dropped on
unpack). The i-side column tiles are produced by in-kernel [1, TI] ->
[TI, 1] transposes (supported by Mosaic; verified on this toolchain).

Constraints: eps2 > 0 (mask-free self-pair cancellation), no collisions,
no recording inside the kernel (chunk rollouts for recording), N a
multiple of the tile sizes, and 96*N bytes of VMEM for state (N <= ~40k)
plus interaction tile temps.

Semantics match ``make_step_fn``'s KDK with ds32 compensation exactly; see
tests/test_fused_rollout.py for the equivalence check against the scan
path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..engine.dsfloat import fast_two_sum, two_sum
from ..engine.state import NBodyState
from ..utils.config import SimConfig

__all__ = ["fused_rollout", "FUSED_MAX_N"]

_PACK = 8
FUSED_MAX_N = 32768  # 3 x 8 x N x 4B of VMEM state + tile temps


def _ds_row_add(hi, lo, inc):
    """Compensated (hi, lo) += inc on [3, N] row slabs."""
    s, e = two_sum(hi, inc)
    e = e + lo
    return fast_two_sum(s, e)


def _fused_kernel(steps_ref, ptsT_in, velT_in, ptsT_ref, velT_ref, accT_ref,
                  *, dt: float, G: float, eps2: float, n: int,
                  tile_i: int, tile_j: int):
    ptsT_ref[:] = ptsT_in[:]
    velT_ref[:] = velT_in[:]

    n_i = n // tile_i
    n_j = n // tile_j

    def forces():
        # one full O(N^2) interaction sweep into accT rows 0:3
        def i_tile(i, _):
            base = i * tile_i
            xi = ptsT_ref[0:1, pl.ds(base, tile_i)].reshape(tile_i, 1)
            yi = ptsT_ref[1:2, pl.ds(base, tile_i)].reshape(tile_i, 1)
            zi = ptsT_ref[2:3, pl.ds(base, tile_i)].reshape(tile_i, 1)

            def j_tile(j, acc):
                ax, ay, az = acc
                off = j * tile_j
                xj = ptsT_ref[0:1, pl.ds(off, tile_j)]
                yj = ptsT_ref[1:2, pl.ds(off, tile_j)]
                zj = ptsT_ref[2:3, pl.ds(off, tile_j)]
                mj = ptsT_ref[3:4, pl.ds(off, tile_j)]
                dx = xj - xi
                dy = yj - yi
                dz = zj - zi
                inv = lax.rsqrt(dx * dx + dy * dy + dz * dz + eps2)
                w = mj * (inv * inv * inv)  # self-pairs cancel via dx == 0
                return (ax + jnp.sum(w * dx, axis=1),
                        ay + jnp.sum(w * dy, axis=1),
                        az + jnp.sum(w * dz, axis=1))

            zero = jnp.zeros((tile_i,), jnp.float32)
            ax, ay, az = lax.fori_loop(0, n_j, j_tile, (zero, zero, zero))
            accT_ref[0, pl.ds(base, tile_i)] = G * ax
            accT_ref[1, pl.ds(base, tile_i)] = G * ay
            accT_ref[2, pl.ds(base, tile_i)] = G * az
            return _

        lax.fori_loop(0, n_i, i_tile, 0)

    def kick(half_dt):
        hi, lo = _ds_row_add(velT_ref[0:3, :], velT_ref[4:7, :],
                             half_dt * accT_ref[0:3, :])
        velT_ref[0:3, :] = hi
        velT_ref[4:7, :] = lo

    def drift():
        inc = dt * velT_ref[0:3, :]
        inc_lo = dt * velT_ref[4:7, :]
        hi, lo = _ds_row_add(ptsT_ref[0:3, :], ptsT_ref[4:7, :], inc)
        hi, lo = _ds_row_add(hi, lo, inc_lo)
        ptsT_ref[0:3, :] = hi
        ptsT_ref[4:7, :] = lo

    forces()  # seed a(t) (reference seeds in the constructor)

    def step(_, carry):
        kick(0.5 * dt)
        drift()
        forces()
        kick(0.5 * dt)
        return carry

    lax.fori_loop(0, steps_ref[0], step, 0)


@functools.lru_cache(maxsize=None)
def _build(n: int, dt: float, G: float, eps2: float, tile_i: int,
           tile_j: int, interpret: bool):
    kernel = functools.partial(_fused_kernel, dt=dt, G=G, eps2=eps2, n=n,
                               tile_i=tile_i, tile_j=tile_j)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[pltpu.VMEM((_PACK, n), jnp.float32)],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((_PACK, n), jnp.float32),
            jax.ShapeDtypeStruct((_PACK, n), jnp.float32),
        ),
        interpret=interpret,
    )


def _pick_tiles(n: int, tile_i: int, tile_j: int) -> tuple[int, int]:
    ti, tj = tile_i, tile_j
    while ti > 8 and n % ti != 0:
        ti //= 2
    while tj > 128 and n % tj != 0:
        tj //= 2
    if n % ti or n % tj:
        raise ValueError(f"N={n} must divide by the fused tile sizes")
    return ti, tj


@functools.partial(jax.jit, static_argnames=("cfg", "tile_i", "tile_j"))
def fused_rollout(
    state: NBodyState,
    cfg: SimConfig,
    steps: jax.Array | int,
    tile_i: int = 256,
    tile_j: int = 1024,
) -> NBodyState:
    """Advance ``steps`` KDK steps entirely inside one Pallas kernel.

    Steps is a *dynamic* scalar (no recompile per trip count). Equivalent
    to ``rollout(state, cfg, steps)`` for f32/ds32 states with
    ``collisions='none'`` and eps2 > 0; the acceleration cache and
    potential are refreshed by the caller afterwards if needed.
    """
    if cfg.collisions != "none":
        raise ValueError("fused_rollout does not support collisions")
    if cfg.eps2 <= 0.0:
        raise ValueError("fused_rollout requires eps2 > 0")
    if cfg.integrator != "kdk":
        raise ValueError("fused_rollout implements the kdk integrator only")
    n = state.n_bodies
    if n > FUSED_MAX_N:
        raise ValueError(f"N={n} exceeds FUSED_MAX_N={FUSED_MAX_N}")
    ti, tj = _pick_tiles(n, tile_i, tile_j)

    pos32 = state.pos.astype(jnp.float32)
    vel32 = state.vel.astype(jnp.float32)
    mass32 = (state.mass * state.alive.astype(state.mass.dtype)).astype(jnp.float32)
    pos_lo = state.pos_lo if state.pos_lo is not None else jnp.zeros_like(pos32)
    vel_lo = state.vel_lo if state.vel_lo is not None else jnp.zeros_like(vel32)

    zrow = jnp.zeros((1, n), jnp.float32)
    ptsT = jnp.concatenate([pos32.T, mass32[None, :], pos_lo.T, zrow], axis=0)
    velT = jnp.concatenate([vel32.T, zrow, vel_lo.T, zrow], axis=0)

    interpret = jax.default_backend() != "tpu"
    steps_arr = jnp.asarray(steps, jnp.int32).reshape(1)
    outP, outV = _build(n, float(cfg.dt), float(cfg.G), float(cfg.eps2),
                        ti, tj, interpret)(steps_arr, ptsT, velT)

    new_pos = outP[0:3, :].T
    new_vel = outV[0:3, :].T
    kwargs = dict(
        pos=new_pos.astype(state.pos.dtype),
        vel=new_vel.astype(state.vel.dtype),
        time=state.time + cfg.dt * jnp.asarray(steps, state.time.dtype),
        step=state.step + jnp.asarray(steps, jnp.int32),
    )
    if state.pos_lo is not None:
        kwargs["pos_lo"] = outP[4:7, :].T
        kwargs["vel_lo"] = outV[4:7, :].T
    return state.replace(**kwargs)
