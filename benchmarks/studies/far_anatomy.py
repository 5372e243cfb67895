"""One far-phase ANATOMY datapoint: which sub-stage owns the time.

Usage: python far_anatomy.py N LEVELS ITERS STAGE [NHWC{0,1}]
  STAGE in:
    pyramid — NGP deposit + coarsen only (chans pyramid, no conv)
    body    — per-body far evaluation only (gather of precomputed finest
              field channels + Taylor step); F_ch are program INPUTS
    grid    — _far_field only (deposit + coarsen + conv + combine),
              chained through channel sums, no body eval
    grid_noconv — grid with _level_conv stubbed to zeros: isolates the
              octant pack / unpack / push-combine traffic from the
              conv arithmetic
    full    — the whole far phase (same program bench_tree_staged times)

Appends a JSON line to benchmarks/studies/far_anatomy_r12.jsonl.
"""
import json
import sys
import time

sys.path.insert(0, '/root/repo')
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import jax.numpy as jnp
import numpy as np

from bench import make_plummer, tree_cfg_probed
import orbital_tpu.ops.tree as T
from orbital_tpu.utils.timing import bench_chained

n, levels, iters = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
stage = sys.argv[4]
nhwc = bool(int(sys.argv[5])) if len(sys.argv) > 5 else False
import orbital_tpu.ops.tree as _T_flag
_T_flag._FAR_NHWC = nhwc  # module flag — applies to every stage

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

f32 = jnp.float32
M = 2 ** levels
M3 = M * M * M


def _grid_geom(p32):
    center, half = T._bounding_cube(p32, jnp.ones((n,), f32), M, None)
    h = 2.0 * half / M
    origin = center - half
    cc = jnp.clip(jnp.floor((p32 - origin) / h).astype(jnp.int32), 0, M - 1)
    cell_id = (cc[:, 0] * M + cc[:, 1]) * M + cc[:, 2]
    return center, half, h, origin, cc, cell_id


def _pyramid(p32, cell_id):
    m_eff = mass
    raw = [m_eff, m_eff * p32[:, 0], m_eff * p32[:, 1], m_eff * p32[:, 2]]
    chans = {levels: tuple(
        jax.ops.segment_sum(c, cell_id, num_segments=M3 + 1)[:M3]
        for c in raw)}
    for lev in range(levels - 1, 1, -1):
        mm = 2 ** lev
        chans[lev] = tuple(T._coarsen2(c, mm) for c in chans[lev + 1])
    return chans


if stage == "pyramid":
    def step(p):
        _, _, _, _, _, cell_id = _grid_geom(p)
        chans = _pyramid(p, cell_id)
        s = jnp.zeros((), f32)
        for lev in chans:
            for c in chans[lev]:
                s = s + jnp.sum(c)
        return p + jnp.float32(1e-20) * s
elif stage in ("grid", "grid_noconv"):
    if stage == "grid_noconv":
        _real_conv = T._level_conv

        def _zero_conv(moments, ws, h, G, eps2, order):
            s = moments.shape[0]
            out_ch = 8 * T._N_FLD[order]
            shape = ((s, s, s, out_ch) if T._FAR_NHWC
                     else (s, out_ch, s, s))
            # chain through the input so the pack isn't DCE'd
            return jnp.zeros(shape, jnp.float32) + jnp.float32(
                1e-30) * jnp.sum(moments)

        T._level_conv = _zero_conv

    def step(p):
        _, half, h, origin, _, cell_id = _grid_geom(p)
        chans = _pyramid(p, cell_id)
        F_ch = T._far_field(chans, levels, 1, half, origin, 1.0, 1e-6, 1)
        s = jnp.zeros((), f32)
        for c in F_ch:
            s = s + jnp.sum(c)
        return p + jnp.float32(1e-20) * s
elif stage == "body":
    # F_ch ride the bench carry (REAL runtime inputs — as closure
    # constants the compiler has to ingest 10 x M3 x 4B of literals,
    # which wedges the remote compile at l8): times the per-body far
    # evaluation alone — channel gathers + Taylor step
    rng = np.random.default_rng(0)
    F_ch0 = tuple(jnp.asarray(rng.normal(size=(M3,)) * 1e-6, f32)
                  for _ in range(10))

    def step(carry):
        p, F_ch = carry
        _, half, h, origin, cc, cell_id = _grid_geom(p)
        idx_b = jnp.minimum(cell_id, M3)
        zpad = jnp.zeros((1,), f32)
        Fb = [jnp.concatenate([c, zpad])[idx_b] for c in F_ch]
        A_b = jnp.stack(Fb[0:3], axis=-1)
        J_b = jnp.stack(Fb[3:9], axis=-1)
        centers_b = origin + (cc.astype(f32) + 0.5) * h
        dx = p - centers_b
        a_far = A_b + T._apply_sym(J_b, dx)
        return (p + jnp.float32(1e-20) * a_far, F_ch)

    pos = (pos, F_ch0)
elif stage == "full":
    def step(p):
        a, _, _ = T.tree_acc_potential(p, mass, _phase="far", **kw)
        return p + jnp.float32(1e-20) * a
else:
    raise SystemExit(f"unknown stage {stage}")

rec = dict(n=n, levels=levels, stage=stage, nhwc=nhwc, phase="far")
try:
    ms = 1e3 * bench_chained(step, pos, iters=iters, iters_hi=iters + 1,
                             repeats=2)
    rec.update(ms=round(ms, 2))
except Exception as e:  # noqa: BLE001 — record the failure row
    rec.update(error=str(e)[:200])
rec.update(wall_s=round(time.time() - t0))
print(json.dumps(rec), flush=True)
with open('/root/repo/benchmarks/studies/far_anatomy_r12.jsonl', 'a') as f:
    f.write(json.dumps(rec) + "\n")
