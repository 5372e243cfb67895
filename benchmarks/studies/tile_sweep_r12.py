"""Round-12 tile sweep of the exact pair kernel, N-parameterized.

VERDICT r4 #3: N=131,072 runs ~20% off perfect N^2 scaling from the 65k
headline (101.6 ms measured vs 84.6 predicted) and the round-10 sweep
only ever measured n=65536, so the shipped (512, 2048) geometry is
untuned at the only other exact-N rung the bench publishes. This sweeps
(tile_i, tile_j) at argv-chosen N.

Usage: python tile_sweep_r12.py N [TI,TI,...] [TJ,TJ,...]
Appends one JSON row per config to benchmarks/studies/tile_sweep_r12.jsonl.
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
                   "tile_sweep_r12.jsonl")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
    tis = ([int(x) for x in sys.argv[2].split(",")]
           if len(sys.argv) > 2 else [256, 512, 1024])
    tjs = ([int(x) for x in sys.argv[3].split(",")]
           if len(sys.argv) > 3 else [1024, 2048, 4096])
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    mass = jnp.full((n,), 1.0 / n, jnp.float32)
    for ti in tis:
        for tj in tjs:
            def step(p, _ti=ti, _tj=tj):
                a, _ = pairwise_acc_pallas(p, mass, G=1.0, eps2=1e-4,
                                           tile_i=_ti, tile_j=_tj,
                                           with_potential=False)
                return p + jnp.float32(1e-20) * a

            try:
                sec = bench_chained(step, pos, iters=2, iters_hi=6)
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
