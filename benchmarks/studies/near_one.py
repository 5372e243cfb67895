"""One (n, levels, near, chunk) tree near-phase datapoint, argv-driven.

Usage: python near_one.py N LEVELS ITERS NEAR [CHUNK]
Appends a JSON line to benchmarks/studies/near_sweep_r11.jsonl so partial
sweeps survive kills (ROADMAP process note). Compile cache on.
"""
import json
import sys
import time

sys.path.insert(0, '/root/repo')
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import jax.numpy as jnp

from bench import make_plummer, tree_cfg_probed
from orbital_tpu.ops.tree import tree_acc_potential
from orbital_tpu.utils.timing import bench_chained

n, levels, iters = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
near = sys.argv[4]
chunk = int(sys.argv[5]) if len(sys.argv) > 5 else 32
phase = sys.argv[6] if len(sys.argv) > 6 else "near"

t0 = time.time()
pos_np, _, mass_np = make_plummer(n)
pos = jnp.asarray(pos_np, jnp.float32)
mass = jnp.asarray(mass_np, jnp.float32)

# probe results depend only on (n, levels, near, chunk) for the fixed
# Plummer seed — cache the budget INTEGERS (JSON, repo-local, versioned;
# see probe_cache.py for why not pickle-in-/tmp) so repeat configs skip
# the ~5 min CPU-backend probe compiles
import probe_cache
_d = probe_cache.load(n, levels, near, chunk)
if _d is not None:
    cfg = probe_cache.Budgets(_d)
    print("probe cache hit", flush=True)
else:
    cfg = tree_cfg_probed(pos_np, levels, dt=1e-4, G=1.0, eps2=1e-6,
                          tree_near=near, tree_chunk=chunk,
                          track_potential=False)
    probe_cache.save(cfg, n, levels, near, chunk)
kw = dict(G_grav=1.0, eps2=1e-6, levels=levels, ws=1,
          max_chunks=cfg.tree_max_chunks, near=near, with_potential=False)
if near == "pairs":
    kw.update(chunk=chunk, pair_entries=cfg.tree_pair_entries)
elif near == "kernel":
    kw.update(chunk=chunk, wl_entries=cfg.tree_wl_entries,
              wl_rj=cfg.tree_wl_rj)
else:
    kw.update(capacity=cfg.tree_capacity, max_cells=cfg.tree_max_cells,
              max_big=cfg.tree_max_big, max_frontier=cfg.tree_max_frontier)
print(f"probed in {time.time()-t0:.0f}s", flush=True)


def step(p):
    a, _, _ = tree_acc_potential(p, mass, _phase=phase, **kw)
    return p + jnp.float32(1e-20) * a


rec = dict(n=n, levels=levels, near=near, chunk=chunk, phase=phase)
try:
    ms = 1e3 * bench_chained(step, pos, iters=iters, iters_hi=iters + 1,
                             repeats=2)
    _, _, ovf = tree_acc_potential(pos, mass, _phase=phase, **kw)
    rec.update(ms=round(ms, 2), ovf=int(ovf), wall_s=round(time.time() - t0))
except Exception as e:  # noqa: BLE001 — record the failure row
    rec.update(error=str(e)[:200], wall_s=round(time.time() - t0))
print(json.dumps(rec), flush=True)
with open('/root/repo/benchmarks/studies/near_sweep_r11.jsonl', 'a') as f:
    f.write(json.dumps(rec) + "\n")
