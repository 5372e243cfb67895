"""Far phase under _FAR_NHWC False/True — real code path, both regimes.

CPU-verified bit-identical outputs (order 1 and 2); this measures which
layout the TPU prefers for the octant conv + pack/unpack transposes.
"""
import sys
sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
from bench import make_plummer, tree_cfg_probed
import orbital_tpu.ops.tree as T
from orbital_tpu.utils.timing import bench_chained

for n, levels, iters in ((65536, 7, 3), (1048576, 8, 1)):
    pos_np, _, mass_np = make_plummer(n)
    pos = jnp.asarray(pos_np, jnp.float32); mass = jnp.asarray(mass_np, jnp.float32)
    cfg = tree_cfg_probed(pos_np, levels, dt=1e-4, G=1.0, eps2=1e-6,
                          tree_near="columns", track_potential=False)
    kw = dict(G_grav=1.0, eps2=1e-6, levels=levels, ws=1,
              capacity=cfg.tree_capacity, max_cells=cfg.tree_max_cells,
              max_big=cfg.tree_max_big, max_frontier=cfg.tree_max_frontier,
              max_chunks=cfg.tree_max_chunks, near="columns",
              with_potential=False)
    for nhwc in (False, True):
        T._FAR_NHWC = nhwc
        T.tree_acc_potential.clear_cache()  # layout flag isn't a jit key
        def step(p):
            a, _, _ = T.tree_acc_potential(p, mass, _phase="far", **kw)
            return p + jnp.float32(1e-20) * a
        try:
            ms = 1e3 * bench_chained(step, pos, iters=iters,
                                     iters_hi=iters + 1, repeats=2)
            print(f"n={n} l{levels} far NHWC={nhwc}: {ms:.1f} ms", flush=True)
        except Exception as e:
            print(f"n={n} l{levels} far NHWC={nhwc}: FAIL {str(e)[:120]}",
                  flush=True)
