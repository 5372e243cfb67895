"""Round-10 tile sweep of the exact pair kernel at the headline N.

The headline runs at ~86% of the measured ~0.22 Tpairs/s VPU ceiling
(DESIGN §1); this sweeps (tile_i, tile_j) around the long-standing
(512, 2048) default to check whether any remaining headroom is tiling
(ROADMAP "levers not yet pulled" #1; VERDICT r3 #4 "final tile sweep").
Appends one JSON row per config to stdout and
benchmarks/studies/tile_sweep_r10.jsonl.
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
import jax  # noqa: E402

os.makedirs("/tmp/jaxcache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from orbital_tpu.ops.pallas_forces import pairwise_acc_pallas  # noqa: E402
from orbital_tpu.utils.timing import bench_chained  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "tile_sweep_r10.jsonl")


def main() -> None:
    n = 65536
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    mass = jnp.full((n,), 1.0 / n, jnp.float32)
    for ti in (256, 512, 1024):
        for tj in (1024, 2048, 4096):
            def step(p, _ti=ti, _tj=tj):
                a, _ = pairwise_acc_pallas(p, mass, G=1.0, eps2=1e-4,
                                           tile_i=_ti, tile_j=_tj,
                                           with_potential=False)
                return p + jnp.float32(1e-20) * a

            try:
                sec = bench_chained(step, pos, iters=4, iters_hi=12)
                row = dict(n=n, tile_i=ti, tile_j=tj,
                           ms_per_eval=round(sec * 1e3, 3),
                           tpairs_per_s=round(n * n / sec / 1e12, 4))
            except Exception as e:  # noqa: BLE001
                row = dict(n=n, tile_i=ti, tile_j=tj, error=str(e)[:160])
            print(json.dumps(row))
            sys.stdout.flush()
            with open(OUT, "a") as f:
                f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
