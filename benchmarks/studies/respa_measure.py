"""RESPA (multirate) stepper at the headline config: ms/substep and
10k-substep |dE/E| at N = 65536 for a (K, rc) sweep — the VERDICT-r2 #1
measurement (beat the exact kernel at 65k inside the 1e-6 drift budget).

Per-config JSONL persistence (/tmp/studies_r3/respa.jsonl + mirrored to
benchmarks/respa_sweep.jsonl when run from the repo) so partial sweeps
survive tunnel outages — the bench.py process-notes contract.
"""
import json
import os
import sys

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

OUT = os.environ.get("RESPA_OUT", "/tmp/studies_r3/respa.jsonl")


def emit(rec):
    line = json.dumps(rec)
    print(line, flush=True)
    for fp in (OUT, "/root/repo/benchmarks/respa_sweep.jsonl"):
        try:
            with open(fp, "a") as f:
                f.write(line + "\n")
        except OSError:
            pass


def run(k, rc_mult, cell_mult=2.0, drift_steps=10000, impl="auto",
        headroom=1.5, refresh=1, w_headroom=None, r1_mult=0.0):
    import jax

    import orbital_tpu as ot
    from bench import energy_hybrid, make_cluster
    from orbital_tpu.engine.multirate import respa_rollout_dyn
    from orbital_tpu.engine.rollout import init_forces
    from orbital_tpu.engine.state import make_state
    from orbital_tpu.ops.neighbor import neighbor_budgets

    pos, vel, mass, eps2 = make_cluster(65536)
    rc = rc_mult * float(np.sqrt(eps2))
    cell = cell_mult * rc
    m_grid, k_ch, w_blk, wl_q = neighbor_budgets(pos, cell=cell, chunk=32,
                                                 rj=4, with_wl=True,
                                                 headroom=headroom,
                                                 w_headroom=w_headroom)
    # only the worklist backend reads the compacted arrays — building
    # them for sb/xla would bill dead compaction work to those rows
    if impl in ("pallas_sb", "xla"):
        wl_q = 0
    cfg = ot.SimConfig(dt=1e-3, G=1.0, eps2=eps2, integrator="respa",
                       respa_k=k, respa_rc=rc, respa_cell=cell,
                       respa_m=m_grid, respa_max_chunks=k_ch,
                       respa_w_blk=w_blk, respa_impl=impl,
                       respa_wl_entries=wl_q, respa_refresh=refresh,
                       respa_r1=r1_mult * rc)
    state = init_forces(make_state(pos, vel, mass, precision="ds32"), cfg)
    rec = dict(k=k, rc=round(rc, 5), cell=round(cell, 5), m_grid=m_grid,
               k_ch=k_ch, w_blk=w_blk, wl_q=wl_q, impl=impl,
               headroom=headroom, refresh=refresh,
               w_headroom=w_headroom, r1=round(r1_mult * rc, 5))
    try:
        del jax  # only the backend import side effect is needed
        # rate from the SAME dynamic-trip rollout program the drift loop
        # uses (one ~20-min remote compile per config instead of two):
        # slope between two macro trip counts, min over repeats, trips
        # perturbed so the platform can't dedup (utils/timing contract)
        import time as _t

        def timed(n_m):
            t0 = _t.perf_counter()
            f, _ = respa_rollout_dyn(state, cfg, n_m)
            float(f.time)  # real device->host sync
            return _t.perf_counter() - t0

        timed(2)  # compile + warm-up
        lo_t, lo_n = min((timed(2 + r), 2 + r) for r in range(2))
        hi_t, hi_n = min((timed(12 + r), 12 + r) for r in range(2))
        sec = max(hi_t - lo_t, 1e-9) / (hi_n - lo_n)
        rec["ms_per_substep"] = round(1e3 * sec / k, 4)
        rec["body_steps_per_s"] = round(65536 * k / sec, 1)
    except Exception as e:  # noqa: BLE001
        rec["rate_error"] = str(e)[:200]
        emit(rec)
        return
    if drift_steps:
        try:
            E0 = energy_hybrid(state, eps2)
            # chunk so one XLA program stays under the worker watchdog;
            # dynamic trip count -> ONE compile serves every chunk size
            chunk_m = max(1, int(20.0 / max(sec, 1e-3)))
            final, done = state, 0
            cnt = dict.fromkeys(("overflow", "cap_overflow", "w_overflow",
                                 "q_overflow", "skin_violation"), 0)
            while done < drift_steps:
                n_m = min(chunk_m, -(-(drift_steps - done) // k))
                final, d = respa_rollout_dyn(final, cfg, n_m)
                for key in cnt:
                    cnt[key] = max(cnt[key], int(d[key]))
                done += n_m * k
            ovf, skin = cnt["overflow"], cnt["skin_violation"]
            E1 = energy_hybrid(final, eps2)
            rec["drift"] = abs((E1 - E0) / E0)
            rec["drift_steps"] = done
            rec.update(cnt)
        except Exception as e:  # noqa: BLE001
            rec["drift_error"] = str(e)[:200]
    emit(rec)


if __name__ == "__main__":
    # rate-first pass (cheap) across the K ladder, then drift on the
    # promising rungs; rc = 5 eps, cell = 2 rc (skin = rc)
    for k in (8, 16, 32):
        run(k, rc_mult=5.0, drift_steps=0)
    for k in (8, 16, 32):
        run(k, rc_mult=5.0, drift_steps=10000)
    # sensitivity: tighter switch (cheaper near, rougher far)
    run(16, rc_mult=3.0, drift_steps=10000)
