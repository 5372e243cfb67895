"""One far-phase datapoint: argv-driven (n, levels, iters, nhwc, prec,
combine), one process per combo (no clear_cache games).

Usage: python far_one.py N LEVELS ITERS NHWC{0,1} PREC{DEFAULT,HIGH,HIGHEST} [COMBINE{lazy,push}] [ERR{0,1}]
Appends to benchmarks/studies/far_sweep_r11.jsonl.
"""
import json
import sys
import time

sys.path.insert(0, '/root/repo')
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import numpy as np
import jax.numpy as jnp
from jax import lax

from bench import make_plummer, tree_cfg_probed
import orbital_tpu.ops.tree as T
from orbital_tpu.utils.timing import bench_chained

n, levels, iters = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
nhwc = bool(int(sys.argv[4]))
prec = sys.argv[5]
combine = sys.argv[6] if len(sys.argv) > 6 else None
with_err = bool(int(sys.argv[7])) if len(sys.argv) > 7 else False

T._FAR_NHWC = nhwc
if combine is not None:
    # no silent-skip guard: a missing attribute would otherwise write a
    # JSONL row labeled with a combine mode that was never in effect
    # (advisor r4) — fail loudly instead
    assert hasattr(T, "_FAR_COMBINE"), "tree module lost _FAR_COMBINE"
    T._FAR_COMBINE = combine
if prec != "HIGHEST":
    _orig = lax.conv_general_dilated
    _p = {"DEFAULT": lax.Precision.DEFAULT, "HIGH": lax.Precision.HIGH}[prec]

    def _wrapped(*a, **k):
        k["precision"] = _p
        return _orig(*a, **k)

    lax.conv_general_dilated = _wrapped

t0 = time.time()
pos_np, _, mass_np = make_plummer(n)
pos = jnp.asarray(pos_np, jnp.float32)
mass = jnp.asarray(mass_np, jnp.float32)
import probe_cache
_d = probe_cache.load(n, levels, "columns", 32)
if _d is not None:
    cfg = probe_cache.Budgets(_d)
    print("probe cache hit", flush=True)
else:
    cfg = tree_cfg_probed(pos_np, levels, dt=1e-4, G=1.0, eps2=1e-6,
                          tree_near="columns", track_potential=False)
    probe_cache.save(cfg, n, levels, "columns", 32)
kw = dict(G_grav=1.0, eps2=1e-6, levels=levels, ws=1,
          capacity=cfg.tree_capacity, max_cells=cfg.tree_max_cells,
          max_big=cfg.tree_max_big, max_frontier=cfg.tree_max_frontier,
          max_chunks=cfg.tree_max_chunks, near="columns",
          with_potential=False)
print(f"setup in {time.time()-t0:.0f}s", flush=True)


def step(p):
    a, _, _ = T.tree_acc_potential(p, mass, _phase="far", **kw)
    return p + jnp.float32(1e-20) * a


rec = dict(n=n, levels=levels, nhwc=nhwc, prec=prec, combine=combine,
           phase="far")
try:
    ms = 1e3 * bench_chained(step, pos, iters=iters, iters_hi=iters + 1,
                             repeats=2)
    rec.update(ms=round(ms, 2))
    if with_err:
        from orbital_tpu.ops.forces import pairwise_acc_chunked
        a_ref = np.asarray(pairwise_acc_chunked(pos, mass, G=1.0,
                                                eps2=1e-6)[0])
        rms = np.sqrt(np.mean(np.sum(a_ref ** 2, -1)))
        a_f, _, _ = T.tree_acc_potential(pos, mass, _phase="far", **kw)
        a_n, _, _ = T.tree_acc_potential(pos, mass, _phase="near", **kw)
        a = np.asarray(a_f) + np.asarray(a_n)
        err = np.sqrt(np.mean(np.sum((a - a_ref) ** 2, -1))) / rms
        rec.update(rms_err=float(err))
except Exception as e:  # noqa: BLE001 — record the failure row
    rec.update(error=str(e)[:200])
rec.update(wall_s=round(time.time() - t0))
print(json.dumps(rec), flush=True)
with open('/root/repo/benchmarks/studies/far_sweep_r11.jsonl', 'a') as f:
    f.write(json.dumps(rec) + "\n")
