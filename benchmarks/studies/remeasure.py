import sys
sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
from bench import make_plummer, tree_cfg_probed
from orbital_tpu.ops.tree import tree_acc_potential
from orbital_tpu.utils.timing import bench_chained

def phases(n, levels, iters=1):
    pos_np, _, mass_np = make_plummer(n)
    pos = jnp.asarray(pos_np, jnp.float32); mass = jnp.asarray(mass_np, jnp.float32)
    cfg = tree_cfg_probed(pos_np, levels, dt=1e-4, G=1.0, eps2=1e-6,
                          tree_near="columns", track_potential=False)
    kw = dict(G_grav=1.0, eps2=1e-6, levels=levels, ws=1,
              capacity=cfg.tree_capacity, max_cells=cfg.tree_max_cells,
              max_big=cfg.tree_max_big, max_frontier=cfg.tree_max_frontier,
              max_chunks=cfg.tree_max_chunks, near="columns",
              with_potential=False)
    out = {}
    for ph in ("far", "near"):
        def step(p, _ph=ph):
            a, _, _ = tree_acc_potential(p, mass, _phase=_ph, **kw)
            return p + jnp.float32(1e-20) * a
        out[ph] = 1e3 * bench_chained(step, pos, iters=iters, iters_hi=iters+1, repeats=2)
    _, _, ovf = tree_acc_potential(pos, mass, _phase="near", **kw)
    print(f"n={n} l{levels}: far={out['far']:.1f} near={out['near']:.1f} "
          f"sum={out['far']+out['near']:.1f} ms ovf={int(ovf)}", flush=True)

for n, lv, it in ((65536, 7, 3), (524288, 8, 1), (1048576, 8, 1)):
    phases(n, lv, it)

# 65k single-program whole eval
pos_np, _, mass_np = make_plummer(65536)
pos = jnp.asarray(pos_np, jnp.float32); mass = jnp.asarray(mass_np, jnp.float32)
cfg = tree_cfg_probed(pos_np, 7, dt=1e-4, G=1.0, eps2=1e-6,
                      tree_near="columns", track_potential=False)
kw = dict(G_grav=1.0, eps2=1e-6, levels=7, ws=1,
          capacity=cfg.tree_capacity, max_cells=cfg.tree_max_cells,
          max_big=cfg.tree_max_big, max_frontier=cfg.tree_max_frontier,
          max_chunks=cfg.tree_max_chunks, near="columns", with_potential=False)
def step(p):
    a, _, _ = tree_acc_potential(p, mass, **kw)
    return p + jnp.float32(1e-20) * a
ms = 1e3 * bench_chained(step, pos, iters=3, iters_hi=6, repeats=2)
print(f"n=65536 l7 whole eval = {ms:.1f} ms", flush=True)
