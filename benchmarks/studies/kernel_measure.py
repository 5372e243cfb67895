"""near='kernel' (Pallas worklist) vs near='pairs' on TPU: near-phase
ms/eval at 65k l7 / 512k l8 / 1M l8 (staged phases), chunk x rj x group
sweep. The worklist kernel replaces ~50 ns/row XLA gathers with
contiguous double-buffered DMA streams (ops/tree_near_wl.py)."""
import sys
sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
from bench import make_plummer, tree_cfg_probed
from orbital_tpu.ops.tree import tree_acc_potential
from orbital_tpu.utils.timing import bench_chained

def run(n, levels, iters, near, chunk=32, rj=None, group=8):
    pos_np, _, mass_np = make_plummer(n)
    pos = jnp.asarray(pos_np, jnp.float32)
    mass = jnp.asarray(mass_np, jnp.float32)
    kw_cfg = dict(dt=1e-4, G=1.0, eps2=1e-6, tree_near=near,
                  tree_chunk=chunk, track_potential=False)
    if near == "kernel" and rj is not None:
        kw_cfg["tree_wl_rj"] = rj
    cfg = tree_cfg_probed(pos_np, levels, **kw_cfg)
    kw = dict(G_grav=1.0, eps2=1e-6, levels=levels, ws=1,
              max_chunks=cfg.tree_max_chunks, near=near,
              with_potential=False)
    if near == "pairs":
        kw.update(chunk=chunk, pair_entries=cfg.tree_pair_entries)
        tag = f"pairs/c{chunk}"
    else:
        kw.update(chunk=chunk, wl_entries=cfg.tree_wl_entries,
                  wl_rj=cfg.tree_wl_rj, wl_group=group)
        tag = f"kernel/c{chunk}/rj{cfg.tree_wl_rj}/g{group}"

    def step(p):
        a, _, _ = tree_acc_potential(p, mass, _phase="near", **kw)
        return p + jnp.float32(1e-20) * a

    try:
        ms = 1e3 * bench_chained(step, pos, iters=iters,
                                 iters_hi=iters + 1, repeats=2)
        _, _, ovf = tree_acc_potential(pos, mass, _phase="near", **kw)
        print(f"n={n} l{levels} near[{tag}]: {ms:.1f} ms ovf={int(ovf)} "
              f"(wl_entries={kw.get('wl_entries', '-')})", flush=True)
    except Exception as e:
        print(f"n={n} l{levels} near[{tag}]: FAIL {str(e)[:140]}",
              flush=True)

for n, lv, it in ((65536, 7, 3), (524288, 8, 1), (1048576, 8, 1)):
    run(n, lv, it, "pairs", 32)
    run(n, lv, it, "kernel", 32)           # rj=8 -> W=256
    run(n, lv, it, "kernel", 32, rj=4)     # W=128
    run(n, lv, it, "kernel", 32, group=16)
    run(n, lv, it, "kernel", 64, rj=2)     # W=128, taller i tiles
