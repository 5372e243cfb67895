"""Far-field conv precision x layout study at 65k l7 and 1M l8.

HIGHEST = 6 bf16 passes, HIGH = 3, DEFAULT = 1. The far field's method
error is ~1e-2 RMS (order 1, ws=1), so cheaper conv precisions may be
free accuracy-wise. Measures far-phase ms/eval and RMS force error vs
the dense oracle (65k only) for each (precision, NHWC) combo.
"""
import sys
sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
from jax import lax
from bench import make_plummer, tree_cfg_probed
import orbital_tpu.ops.tree as T
from orbital_tpu.ops.forces import pairwise_acc_chunked
from orbital_tpu.utils.timing import bench_chained

PRECS = {"DEFAULT": lax.Precision.DEFAULT, "HIGH": lax.Precision.HIGH,
         "HIGHEST": lax.Precision.HIGHEST}

def patch_precision(p):
    """Monkeypatch the conv precision inside _level_conv."""
    import functools
    orig = lax.conv_general_dilated
    def wrapped(*a, **k):
        k["precision"] = p
        return orig(*a, **k)
    return orig, wrapped

for n, levels, iters, with_err in ((65536, 7, 3, True),
                                   (1048576, 8, 1, False)):
    pos_np, _, mass_np = make_plummer(n)
    pos = jnp.asarray(pos_np, jnp.float32)
    mass = jnp.asarray(mass_np, jnp.float32)
    cfg = tree_cfg_probed(pos_np, levels, dt=1e-4, G=1.0, eps2=1e-6,
                          tree_near="pairs", track_potential=False)
    kw = dict(G_grav=1.0, eps2=1e-6, levels=levels, ws=1,
              max_chunks=cfg.tree_max_chunks, chunk=32,
              pair_entries=cfg.tree_pair_entries, near="pairs",
              with_potential=False)
    a_ref = None
    if with_err:
        a_ref = np.asarray(pairwise_acc_chunked(pos, mass, G=1.0,
                                                eps2=1e-6)[0])
        rms = np.sqrt(np.mean(np.sum(a_ref ** 2, -1)))
    for pname, p in PRECS.items():
        for nhwc in (False, True):
            T._FAR_NHWC = nhwc
            # neither the layout flag nor the patched conv precision is a
            # jit cache key — force a fresh trace per combo
            T.tree_acc_potential.clear_cache()
            orig, wrapped = patch_precision(p)
            lax.conv_general_dilated = wrapped
            try:
                def step(q):
                    a, _, _ = T.tree_acc_potential(q, mass, _phase="far",
                                                   **kw)
                    return q + jnp.float32(1e-20) * a
                ms = 1e3 * bench_chained(step, pos, iters=iters,
                                         iters_hi=iters + 1, repeats=2)
                msg = f"n={n} far[{pname} nhwc={nhwc}]: {ms:.1f} ms"
                if with_err:
                    a_f, _, _ = T.tree_acc_potential(pos, mass,
                                                     _phase="far", **kw)
                    a_n, _, _ = T.tree_acc_potential(pos, mass,
                                                     _phase="near", **kw)
                    a = np.asarray(a_f) + np.asarray(a_n)
                    err = np.sqrt(np.mean(np.sum((a - a_ref) ** 2, -1))) / rms
                    msg += f" rms_err={err:.3e}"
                print(msg, flush=True)
            except Exception as e:
                print(f"n={n} far[{pname} nhwc={nhwc}]: FAIL "
                      f"{str(e)[:120]}", flush=True)
            finally:
                lax.conv_general_dilated = orig
