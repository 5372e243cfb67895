"""Tree force-family configuration sweep: ms/eval across (near impl,
levels, N) on the concentrated Plummer IC.

Motivation (round-2): the column near field (ops/tree.py `near="columns"`)
changes the cost model — near-field row-gathers scale with occupied
COLUMNS (M^2 grid) instead of occupied cells (M^3), so the optimal
pyramid depth is expected to move SHALLOWER (each level removed cuts
far-field plumbing ~8x while the column sweep pays only ~4x more padded
pair arithmetic, which is ~1000x cheaper per unit than the gathers it
replaces). This sweep measures the (near, levels) plane so bench.py's
defaults are chosen from data, not guesses.

Run on the TPU tunnel: `python benchmarks/tree_sweep.py [--n 65536]`.
Appends one JSON line per config to benchmarks/tree_sweep.jsonl.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import make_plummer, tree_cfg_probed  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "tree_sweep.jsonl")


def emit(rec: dict) -> None:
    print(json.dumps(rec))
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=65536)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--levels", type=str, default="")
    ap.add_argument("--near", type=str, default="cells,columns")
    ap.add_argument("--order", type=int, default=1)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp  # noqa: F401

    import orbital_tpu as ot
    from orbital_tpu.engine.integrators import make_step_fn
    from orbital_tpu.engine.rollout import resolve_force_fn
    from orbital_tpu.engine.state import make_state
    from orbital_tpu.utils.timing import bench_chained

    n = args.n
    pos, vel, mass = make_plummer(n)
    levels_list = ([int(x) for x in args.levels.split(",") if x]
                   or ([5, 6, 7] if n <= 1 << 17 else [6, 7, 8]))
    cap_bound = {"cells": 4096, "columns": 16384, "pairs": 1 << 30}

    for near in args.near.split(","):
        for levels in levels_list:
            tag = f"{near}_l{levels}_n{n}"
            try:
                cfg = tree_cfg_probed(pos, levels, tree_near=near,
                                      tree_order=args.order, dt=1e-4,
                                      G=1.0, eps2=1e-6,
                                      track_potential=False)
                if near != "pairs" and cfg.tree_capacity > cap_bound[near]:
                    emit({"name": tag, "skipped":
                          f"capacity {cfg.tree_capacity} over bound"})
                    continue
                state = ot.init_forces(
                    make_state(pos, vel, mass, precision="f32"), cfg)
                step = make_step_fn(cfg, resolve_force_fn(cfg, n))
                sec = bench_chained(step, state, iters=args.iters,
                                    iters_hi=3 * args.iters)
                rec = {"name": tag, "n": n, "near": near, "levels": levels,
                       "order": args.order,
                       "ms_per_eval": round(sec * 1e3, 3),
                       "body_steps_per_s": round(n / sec, 1)}
                if near == "pairs":
                    rec.update(max_chunks=cfg.tree_max_chunks,
                               pair_entries=list(cfg.tree_pair_entries))
                else:
                    rec.update(capacity=cfg.tree_capacity,
                               max_cells=cfg.tree_max_cells,
                               max_big=cfg.tree_max_big,
                               max_frontier=cfg.tree_max_frontier)
                emit(rec)
            except Exception as e:  # noqa: BLE001
                emit({"name": tag, "error": str(e)[:300]})
                if "UNAVAILABLE" in str(e):
                    for _ in range(20):
                        time.sleep(60)
                        try:
                            import jax.numpy as _j

                            float(_j.ones(()) + 1.0)
                            break
                        except Exception:  # noqa: BLE001
                            continue
            print(f"[{time.strftime('%H:%M:%S')}] {tag} done",
                  file=sys.stderr)


if __name__ == "__main__":
    main()
