"""Far-field level combination: 'push' (level-by-level pushdown,
traffic-optimal) vs 'lazy' (per-level shift to the finest grid,
one truncation order tighter) — far-phase ms/eval at 65k l7 / 512k l8 /
1M l8. Module flag is not a jit cache key: clear_cache() per combo."""
import sys
sys.path.insert(0, '/root/repo')
import jax.numpy as jnp

from bench import make_plummer, tree_cfg_probed
import orbital_tpu.ops.tree as T
from orbital_tpu.ops.tree import tree_acc_potential
from orbital_tpu.utils.timing import bench_chained


def run(n, levels, iters):
    pos_np, _, mass_np = make_plummer(n)
    pos = jnp.asarray(pos_np, jnp.float32)
    mass = jnp.asarray(mass_np, jnp.float32)
    cfg = tree_cfg_probed(pos_np, levels, dt=1e-4, G=1.0, eps2=1e-6,
                          tree_near="columns", track_potential=False)
    kw = dict(G_grav=1.0, eps2=1e-6, levels=levels, ws=1,
              capacity=cfg.tree_capacity, max_cells=cfg.tree_max_cells,
              max_big=cfg.tree_max_big, max_frontier=cfg.tree_max_frontier,
              max_chunks=cfg.tree_max_chunks, near="columns",
              with_potential=False)
    for mode in ("push", "lazy"):
        T._FAR_COMBINE = mode
        tree_acc_potential.clear_cache()

        def step(p):
            a, _, _ = tree_acc_potential(p, mass, _phase="far", **kw)
            return p + jnp.float32(1e-20) * a

        try:
            ms = 1e3 * bench_chained(step, pos, iters=iters,
                                     iters_hi=iters + 1, repeats=2)
            print(f"n={n} l{levels} far[{mode}]: {ms:.1f} ms", flush=True)
        except Exception as e:
            print(f"n={n} l{levels} far[{mode}]: FAIL {str(e)[:140]}",
                  flush=True)
    tree_acc_potential.clear_cache()


for n, lv, it in ((65536, 7, 3), (524288, 8, 1), (1048576, 8, 1)):
    run(n, lv, it)
