"""Worker for the multi-process (DCN-analog) sharding test.

Launched twice by ``test_parallel.py::test_multiprocess_sharded_step``:
each process contributes 4 virtual CPU devices to one jax.distributed
cluster, so the 8-device ``body`` mesh spans a REAL process boundary —
the closest this single-host container gets to a multi-slice (DCN) mesh.
The collectives in the sharded step (ppermute ring + psums) therefore
cross the inter-process transport instead of staying in one runtime.

Usage: python dcn_worker.py PORT PROCESS_ID
Prints ``PARITY_OK <checksum>`` when every addressable shard of the
sharded one-step result matches the process-locally computed unsharded
step bit-for-bit (CPU arithmetic is deterministic and both processes
build identical inputs from the same seed).
"""
import os
import sys

PORT, PID = sys.argv[1], int(sys.argv[2])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{PORT}",
                           num_processes=2, process_id=PID)

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import orbital_tpu as ot  # noqa: E402
from orbital_tpu.engine.integrators import make_step_fn  # noqa: E402
from orbital_tpu.engine.rollout import resolve_force_fn  # noqa: E402
from orbital_tpu.engine.state import make_state  # noqa: E402
from orbital_tpu.parallel.mesh import make_mesh  # noqa: E402
from orbital_tpu.parallel.sharded import (  # noqa: E402
    make_sharded_step, shard_state)

assert len(jax.devices()) == 8, jax.devices()
assert jax.process_count() == 2

n = 256
rng = np.random.default_rng(42)
pos = rng.normal(size=(n, 3))
vel = 0.1 * rng.normal(size=(n, 3))
mass = rng.uniform(0.5, 1.5, n) / n
cfg = ot.SimConfig(dt=1e-3, G=1.0, eps2=1e-3)

st = ot.init_forces(make_state(pos, vel, mass, precision="f64"), cfg)

# unsharded reference, computed process-locally on one device
ref = make_step_fn(cfg, resolve_force_fn(cfg, n))(st)
ref_pos = np.asarray(ref.pos)
ref_vel = np.asarray(ref.vel)

mesh = make_mesh()  # all 8 global devices on the body axis
sst = shard_state(mesh, st)
out = make_sharded_step(cfg, mesh, st)(sst)

shard_n = n // 8
ok = True
for arr, refa in ((out.pos, ref_pos), (out.vel, ref_vel)):
    for s in arr.addressable_shards:
        lo = s.index[0].start or 0
        # ring vs dense force differ only in f64 summation order
        if not np.allclose(np.asarray(s.data), refa[lo:lo + shard_n],
                           rtol=1e-12, atol=1e-13):
            ok = False
checksum = float(np.sum(ref_pos))
print("PARITY_OK" if ok else "PARITY_FAIL", checksum, flush=True)
sys.exit(0 if ok else 1)
