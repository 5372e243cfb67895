"""Long-horizon |dE/E| + ms/step for every force family at N=65536.

VERDICT r1 #1/#7: the north-star budget (>= 1e9 body-steps/s at
|dE/E| <= 1e-6 over 10k KDK steps) permits any method, but only the exact
kernel had a measured drift. This sweep measures the approximate family
under the SAME protocol as the headline bench (same cluster IC, dt=1e-3,
10k steps, energy in exact f64 via the native oracle at both ends, plus
intermediate checkpoints to separate secular drift from fluctuation).

Run on the TPU tunnel: `python benchmarks/drift_sweep.py [--steps 10000]`.
Appends one JSON line per config to benchmarks/drift_sweep.jsonl.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import energy_hybrid, make_cluster  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "drift_sweep.jsonl")
CHUNK = 500  # worker-watchdog bound per XLA program at N=65k


def run_config(name: str, cfg, state, steps: int, e_every: int,
               n: int, eps2: float, force_fn=None, iters: int = 4) -> dict:
    import jax
    from jax import lax

    import orbital_tpu as ot
    from orbital_tpu.engine.integrators import make_step_fn
    from orbital_tpu.engine.rollout import resolve_force_fn
    from orbital_tpu.utils.timing import bench_chained

    fn = force_fn or resolve_force_fn(cfg, n)
    state = ot.init_forces(state, cfg, force_fn=fn)
    step = make_step_fn(cfg, fn)
    sec = bench_chained(step, state, iters=iters, iters_hi=3 * iters)

    chunk_fn = jax.jit(
        lambda s: lax.fori_loop(0, CHUNK, lambda _, x: step(x), s))

    energies = [energy_hybrid(state, eps2)]
    marks = [0]
    final = state
    done = 0
    assert e_every % CHUNK == 0 and steps % e_every == 0
    while done < steps:
        for _ in range(e_every // CHUNK):
            final = chunk_fn(final)
            float(final.time)  # host sync per program
        done += e_every
        energies.append(energy_hybrid(final, eps2))
        marks.append(done)
    e = np.array(energies)
    rel = np.abs((e - e[0]) / e[0])
    rec = {
        "name": name,
        "n": n,
        "steps": steps,
        "ms_per_step": round(sec * 1e3, 3),
        "body_steps_per_s": round(n / sec, 1),
        "drift_end": float(rel[-1]),
        "drift_max": float(np.max(rel)),
        "marks": marks,
        "rel_energy": [float(x) for x in rel],
    }
    print(json.dumps(rec))
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10000)
    ap.add_argument("--e-every", type=int, default=2000)
    ap.add_argument("--only", type=str, default="",
                    help="comma-separated config-name filter")
    args = ap.parse_args()

    import jax.numpy as jnp

    import orbital_tpu as ot
    from orbital_tpu.engine.state import make_state

    n = 65536
    pos, vel, mass, eps2 = make_cluster(n)
    # pinned box: generous enough that ~no live body leaves it over the
    # run (cluster is virialized at sigma ~ 1; escapers clip into boundary
    # cells and only their own force degrades)
    box = (0.0, 0.0, 0.0, 8.0)  # SimConfig form: (cx, cy, cz, half)
    box_j = (jnp.zeros(3, jnp.float32), jnp.float32(8.0))

    def fresh(precision="ds32"):
        return make_state(pos, vel, mass, precision=precision)

    base = dict(dt=1e-3, G=1.0, eps2=eps2)
    configs: list[tuple] = []

    configs.append(("exact_pallas", ot.SimConfig(**base), "ds32", None))
    configs.append(("pm_grid128_box", ot.SimConfig(
        **base, force_impl="pm", pm_grid=128, pm_box=box), "f32", None))

    from orbital_tpu.ops.p3m import p3m_acc_potential, p3m_max_occupancy

    for grid, sig, cut, tag in [
        (64, 1.5, 4.5, "p3m_grid64_default"),
        (128, 1.5, 4.5, "p3m_grid128"),
        (128, 2.0, 6.0, "p3m_grid128_s2c6"),
    ]:
        occ = int(p3m_max_occupancy(jnp.asarray(pos, jnp.float32),
                                    grid=grid, box=box_j))
        cap = max(32, -(-int(occ * 1.5) // 8) * 8)
        cfg = ot.SimConfig(**base, force_impl="p3m", pm_grid=grid,
                           p3m_capacity=cap, pm_box=box)

        def p3m_fn(pos_, mass_, alive_, cfg=cfg, sig=sig, cut=cut):
            acc, U, _ = p3m_acc_potential(
                pos_, mass_, alive_, G_grav=cfg.G, eps2=cfg.eps2,
                grid=cfg.pm_grid, capacity=cfg.p3m_capacity,
                sigma_cells=sig, cut_sigma=cut,
                with_potential=cfg.track_potential,
                box=cfg.pm_box_arrays())
            return acc, U

        configs.append((tag, cfg, "f32", p3m_fn))

    from orbital_tpu.ops.tree import tree_occupancy_probe

    for levels, order, ws, tag in [(7, 1, 1, "tree_l7_o1_ws1"),
                                   (7, 2, 1, "tree_l7_o2_ws1"),
                                   (7, 2, 2, "tree_l7_o2_ws2")]:
        cap_t, occ_t = tree_occupancy_probe(
            jnp.asarray(pos, jnp.float32), levels=levels, box=box_j)
        cfg = ot.SimConfig(
            **base, force_impl="tree", tree_levels=levels,
            tree_capacity=int(np.ceil((int(cap_t) + 8) / 16) * 16),
            tree_max_cells=int(np.ceil((int(occ_t) * 1.3) / 512) * 512),
            tree_ws=ws, tree_order=order, pm_box=box)
        configs.append((tag, cfg, "f32", None))

    only = {s for s in args.only.split(",") if s}
    for name, cfg, precision, force_fn in configs:
        if only and name not in only:
            continue
        try:
            run_config(name, cfg, fresh(precision), args.steps,
                       args.e_every, n, eps2, force_fn=force_fn)
        except Exception as e:  # noqa: BLE001
            rec = {"name": name, "error": str(e)[:300]}
            print(json.dumps(rec))
            with open(OUT, "a") as f:
                f.write(json.dumps(rec) + "\n")
        t = time.strftime("%H:%M:%S")
        print(f"[{t}] {name} done", file=sys.stderr)


if __name__ == "__main__":
    main()
