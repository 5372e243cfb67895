"""Does the single-program tree step now compile at 512k l8 after the
restructure (sort moved, lazy far field, fewer intermediates)?"""
import sys
sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
from bench import make_plummer, tree_cfg_probed
from orbital_tpu.ops.tree import tree_acc_potential
from orbital_tpu.utils.timing import bench_chained

for n in (524288, 1048576):
    pos_np, _, mass_np = make_plummer(n)
    pos = jnp.asarray(pos_np, jnp.float32); mass = jnp.asarray(mass_np, jnp.float32)
    cfg = tree_cfg_probed(pos_np, 8, dt=1e-4, G=1.0, eps2=1e-6,
                          tree_near="columns", track_potential=False)
    kw = dict(G_grav=1.0, eps2=1e-6, levels=8, ws=1,
              capacity=cfg.tree_capacity, max_cells=cfg.tree_max_cells,
              max_big=cfg.tree_max_big, max_frontier=cfg.tree_max_frontier,
              max_chunks=cfg.tree_max_chunks, near="columns",
              with_potential=False)
    def step(p):
        a, _, _ = tree_acc_potential(p, mass, **kw)
        return p + jnp.float32(1e-20) * a
    try:
        ms = 1e3 * bench_chained(step, pos, iters=1, iters_hi=2, repeats=2)
        print(f"n={n} l8 SINGLE-PROGRAM whole eval: {ms:.1f} ms", flush=True)
    except Exception as e:
        print(f"n={n} l8 single-program: FAIL {str(e)[:140]}", flush=True)
