"""One pairs-near-phase ANATOMY datapoint: geometry build vs sweep.

The round-12 pairs near field at 1M measures 379 ms/eval; this splits
it: the per-eval geometry (sort, rank table, chunk maps, packed table)
vs the octave sweeps that consume it.

Usage: python near_anatomy.py N LEVELS ITERS STAGE [CHUNK]
  STAGE in:
    geom  — argsort + _pairs_geometry + the packed-table build, chained
            through table/count sums (no octave sweep)
    full  — the whole near phase (tree_acc_potential _phase="near")
Appends to benchmarks/studies/near_anatomy_r12.jsonl.
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
import orbital_tpu.ops.tree as T
from orbital_tpu.utils.timing import bench_chained

n, levels, iters = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
stage = sys.argv[4]
chunk = int(sys.argv[5]) if len(sys.argv) > 5 else 64

t0 = time.time()
pos_np, _, mass_np = make_plummer(n)
pos = jnp.asarray(pos_np, jnp.float32)
mass = jnp.asarray(mass_np, jnp.float32)
import probe_cache
_d = probe_cache.load(n, levels, "pairs", chunk)
if _d is not None:
    cfg = probe_cache.Budgets(_d)
    print("probe cache hit", flush=True)
else:
    cfg = tree_cfg_probed(pos_np, levels, dt=1e-4, G=1.0, eps2=1e-6,
                          tree_near="pairs", tree_chunk=chunk,
                          track_potential=False)
    probe_cache.save(cfg, n, levels, "pairs", chunk)
kw = dict(G_grav=1.0, eps2=1e-6, levels=levels, ws=1,
          max_chunks=cfg.tree_max_chunks, near="pairs", chunk=chunk,
          pair_entries=tuple(cfg.tree_pair_entries), with_potential=False)
print(f"setup in {time.time()-t0:.0f}s", flush=True)

f32 = jnp.float32
M = 2 ** levels
M3 = M * M * M

if stage == "geom":
    K_ch = int(cfg.tree_max_chunks)

    def step(p):
        alive_f = jnp.ones((n,), f32)
        center, half = T._bounding_cube(p, alive_f, M, None)
        h = 2.0 * half / M
        origin = center - half
        cc = jnp.clip(jnp.floor((p - origin) / h).astype(jnp.int32),
                      0, M - 1)
        cell_id = (cc[:, 0] * M + cc[:, 1]) * M + cc[:, 2]
        sort_idx = jnp.argsort(cell_id)
        sc = cell_id[sort_idx]
        g = T._pairs_geometry(sc, n, M, 1, chunk, K_ch)
        # the packed-table build, exactly as _near_pairs does it
        pos_srt = p[sort_idx]
        m_srt = mass[sort_idx]
        idx_srt = sort_idx.astype(f32)

        def _pack_rows(slot_b, rank_b, keep_b, Kcap, Wd):
            s = jnp.where(keep_b, slot_b, Kcap)
            r = jnp.clip(rank_b, 0, Wd - 1)
            sent = jnp.concatenate([jnp.full((3 * Wd,), 1e30, f32),
                                    jnp.zeros((Wd,), f32),
                                    jnp.full((Wd,), float(n), f32)])
            P = jnp.broadcast_to(sent, (Kcap + 1, 5 * Wd))
            cols = (pos_srt[:, 0], pos_srt[:, 1], pos_srt[:, 2], m_srt,
                    idx_srt)
            sentv = (1e30, 1e30, 1e30, 0.0, float(n))
            for c, (v, sv) in enumerate(zip(cols, sentv)):
                P = P.at[s, c * Wd + r].set(jnp.where(keep_b, v, sv),
                                            mode="drop")
            return P

        P = _pack_rows(g["chunk_ord"], g["rank_c"] % chunk, g["keep"],
                       K_ch, chunk)
        s = (jnp.sum(P[:64]) + jnp.sum(g["j_lo"]) + jnp.sum(g["cnt"])
             + jnp.sum(g["S_ch"]))
        return p + jnp.float32(1e-30) * s
elif stage == "full":
    def step(p):
        a, _, _ = T.tree_acc_potential(p, mass, _phase="near", **kw)
        return p + jnp.float32(1e-20) * a
else:
    raise SystemExit(f"unknown stage {stage}")

rec = dict(n=n, levels=levels, stage=stage, chunk=chunk, phase="near")
try:
    ms = 1e3 * bench_chained(step, pos, iters=iters, iters_hi=iters + 1,
                             repeats=2)
    rec.update(ms=round(ms, 2))
except Exception as e:  # noqa: BLE001
    rec.update(error=str(e)[:200])
rec.update(wall_s=round(time.time() - t0))
print(json.dumps(rec), flush=True)
with open('/root/repo/benchmarks/studies/near_anatomy_r12.jsonl', 'a') as f:
    f.write(json.dumps(rec) + "\n")
