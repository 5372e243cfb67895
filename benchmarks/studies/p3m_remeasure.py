"""P3M short-range perf after the scatter-pack + scan-bounds landing.

Uniform box (P3M's own regime) at N=65536 and N=262144, same configs the
drift sweep uses. Compares ms/eval of the whole p3m_acc_potential.
"""
import sys
sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
from orbital_tpu.ops.p3m import p3m_acc_potential, p3m_max_occupancy
from orbital_tpu.utils.timing import bench_chained

for n, grid in ((65536, 64), (262144, 64)):
    rng = np.random.default_rng(0)
    box = 1.0
    pos_np = rng.uniform(0.05, 0.95, (n, 3)).astype(np.float32)
    mass_np = np.full((n,), 1.0 / n, np.float32)
    pos = jnp.asarray(pos_np); mass = jnp.asarray(mass_np)
    occ = int(p3m_max_occupancy(pos_np, grid, box))
    cap = max(8, int(1.5 * occ))
    if cap > 4096:
        print(f"n={n} grid={grid}: capacity {cap} too large, skip", flush=True)
        continue

    def step(p):
        a, _, _ = p3m_acc_potential(p, mass, G_grav=1.0, eps2=1e-8,
                                    grid=grid, box=box, capacity=cap)
        return p + jnp.float32(1e-20) * a

    ms = 1e3 * bench_chained(step, pos, iters=2, iters_hi=4, repeats=2)
    _, _, ovf = p3m_acc_potential(pos, mass, G_grav=1.0, eps2=1e-8,
                                  grid=grid, box=box, capacity=cap)
    print(f"n={n} grid={grid} cap={cap}: {ms:.1f} ms/eval ovf={int(ovf)}",
          flush=True)
