"""near='pairs' vs near='columns' on TPU: near-phase ms/eval at
65k l7 / 512k l8 / 1M l8 (staged phases), chunk 32 and 64."""
import sys
sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
from bench import make_plummer, tree_cfg_probed
from orbital_tpu.ops.tree import tree_acc_potential
from orbital_tpu.utils.timing import bench_chained

def run(n, levels, iters, near, chunk=32):
    pos_np, _, mass_np = make_plummer(n)
    pos = jnp.asarray(pos_np, jnp.float32)
    mass = jnp.asarray(mass_np, jnp.float32)
    cfg = tree_cfg_probed(pos_np, levels, dt=1e-4, G=1.0, eps2=1e-6,
                          tree_near=near, tree_chunk=chunk,
                          track_potential=False)
    kw = dict(G_grav=1.0, eps2=1e-6, levels=levels, ws=1,
              max_chunks=cfg.tree_max_chunks, near=near,
              with_potential=False)
    if near == "pairs":
        kw.update(chunk=chunk, pair_entries=cfg.tree_pair_entries)
    else:
        kw.update(capacity=cfg.tree_capacity, max_cells=cfg.tree_max_cells,
                  max_big=cfg.tree_max_big,
                  max_frontier=cfg.tree_max_frontier)

    def step(p):
        a, _, _ = tree_acc_potential(p, mass, _phase="near", **kw)
        return p + jnp.float32(1e-20) * a

    try:
        ms = 1e3 * bench_chained(step, pos, iters=iters,
                                 iters_hi=iters + 1, repeats=2)
        _, _, ovf = tree_acc_potential(pos, mass, _phase="near", **kw)
        tag = f"{near}" + (f"/c{chunk}" if near == "pairs" else "")
        print(f"n={n} l{levels} near[{tag}]: {ms:.1f} ms ovf={int(ovf)}",
              flush=True)
    except Exception as e:
        print(f"n={n} l{levels} near[{near}/c{chunk}]: "
              f"FAIL {str(e)[:140]}", flush=True)

for n, lv, it in ((65536, 7, 3), (524288, 8, 1), (1048576, 8, 1)):
    run(n, lv, it, "columns")
    run(n, lv, it, "pairs", 32)
    run(n, lv, it, "pairs", 64)
