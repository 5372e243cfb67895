"""Exact-kernel rsqrt lever study (ROADMAP "levers not yet pulled" #1,
VERDICT r4 #4): the shipped kernel evaluates lax.rsqrt per pair; this
measures approximate-reciprocal formulations against it.

Variants (hot path: inv_r3 only, compute_pe=False like the headline):
  v0  lax.rsqrt(r2e); inv_r3 = y*y*y                       [baseline]
  v1  y = pl.reciprocal(sqrt(r2e), approx=True); y*y*y
  v2  i2 = pl.reciprocal(r2e, approx=True); inv_r3 = i2 * sqrt(i2)
  v3  inv_r3 = pl.reciprocal(r2e * sqrt(r2e), approx=True)
  v4  v1 + one Newton step on the reciprocal (y = y*(2 - s*y))

Usage: python rsqrt_variants.py N VARIANT [TILE_I TILE_J]
Appends rate + max relative acc error vs v0 to rsqrt_variants_r12.jsonl.
"""
import functools
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
import jax  # noqa: E402

os.makedirs("/tmp/jaxcache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from orbital_tpu.utils.timing import bench_chained  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "rsqrt_variants_r12.jsonl")
_PACK = 8


def _kernel(i_ref, jT_ref, out_ref, *, G, eps2, variant):
    @pl.when(pl.program_id(1) == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    xi, yi, zi = i_ref[:, 0:1], i_ref[:, 1:2], i_ref[:, 2:3]
    xj, yj, zj, mj = (jT_ref[0:1, :], jT_ref[1:2, :], jT_ref[2:3, :],
                      jT_ref[3:4, :])
    dx, dy, dz = xj - xi, yj - yi, zj - zi
    r2e = dx * dx + dy * dy + dz * dz + eps2
    if variant == "v0":
        y = lax.rsqrt(r2e)
        inv_r3 = y * y * y
    elif variant == "v1":
        y = pl.reciprocal(jnp.sqrt(r2e), approx=True)
        inv_r3 = y * y * y
    elif variant == "v2":
        i2 = pl.reciprocal(r2e, approx=True)
        inv_r3 = i2 * jnp.sqrt(i2)
    elif variant == "v3":
        inv_r3 = pl.reciprocal(r2e * jnp.sqrt(r2e), approx=True)
    elif variant == "v4":
        s = jnp.sqrt(r2e)
        y = pl.reciprocal(s, approx=True)
        y = y * (2.0 - s * y)
        inv_r3 = y * y * y
    else:
        raise ValueError(variant)
    w = mj * inv_r3
    out_ref[:, 0] += G * jnp.sum(w * dx, axis=1)
    out_ref[:, 1] += G * jnp.sum(w * dy, axis=1)
    out_ref[:, 2] += G * jnp.sum(w * dz, axis=1)


@functools.lru_cache(maxsize=None)
def _call(n, ti, tj, G, eps2, variant):
    k = functools.partial(_kernel, G=G, eps2=eps2, variant=variant)
    return pl.pallas_call(
        k,
        grid=(n // ti, n // tj),
        in_specs=[
            pl.BlockSpec((ti, _PACK), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_PACK, tj), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ti, _PACK), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, _PACK), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=15 * n * n, bytes_accessed=3 * n * _PACK * 4,
            transcendentals=n * n),
    )


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    variant = sys.argv[2] if len(sys.argv) > 2 else "v0"
    ti = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    tj = int(sys.argv[4]) if len(sys.argv) > 4 else 2048
    eps2 = 1e-4
    rng = np.random.default_rng(0)
    pos = rng.normal(size=(n, 3)).astype(np.float32)
    mass = np.full((n,), 1.0 / n, np.float32)
    pts = jnp.asarray(np.concatenate(
        [pos, mass[:, None], np.zeros((n, _PACK - 4), np.float32)], axis=1))
    ptsT = pts.T

    def step(p, _v=variant):
        out = _call(n, ti, tj, 1.0, eps2, _v)(p, ptsT)
        return p + 1e-20 * out

    row = dict(n=n, variant=variant, tile_i=ti, tile_j=tj)
    try:
        sec = bench_chained(step, pts, iters=4, iters_hi=12)
        row.update(ms_per_eval=round(sec * 1e3, 3),
                   tpairs_per_s=round(n * n / sec / 1e12, 4))
        a_v = np.asarray(_call(n, ti, tj, 1.0, eps2, variant)(pts, ptsT))[:, :3]
        a_0 = np.asarray(_call(n, ti, tj, 1.0, eps2, "v0")(pts, ptsT))[:, :3]
        den = np.linalg.norm(a_0, axis=1)
        err = np.linalg.norm(a_v - a_0, axis=1) / np.maximum(den, 1e-30)
        row.update(max_rel_err=float(err.max()),
                   rms_rel_err=float(np.sqrt(np.mean(err ** 2))))
    except Exception as e:  # noqa: BLE001
        row.update(error=str(e)[:200])
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
