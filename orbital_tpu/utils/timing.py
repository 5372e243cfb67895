"""Honest TPU benchmarking harness.

Two platform artifacts make naive timing lie here:
  * ``jax.block_until_ready`` returns before the computation finishes on
    the axon tunnel, so only a device->host value fetch truly synchronizes;
  * that fetch costs a ~25-35 ms round trip, which swamps small kernels.

The fix: chain iterations through a data dependency inside one jitted
``fori_loop``, fetch a scalar once at the end, time two different iteration
counts, and report the *slope* (d wall / d iters) — the RTT and dispatch
constants cancel exactly.
"""
from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["bench_chained"]


def _run_and_sync(run, carry0, iters):
    t0 = time.perf_counter()
    carry = run(iters, carry0)
    leaves = jax.tree_util.tree_leaves(carry)
    jnp.sum(leaves[0]).item()  # real device->host sync
    return time.perf_counter() - t0


def bench_chained(
    step: Callable,
    carry0,
    iters: int = 10,
    repeats: int = 3,
    iters_hi: int | None = None,
) -> float:
    """Median seconds per iteration of ``carry = step(carry)``.

    ``step`` must be jit-compatible and return a pytree of the same
    structure as ``carry0``. The result is the slope between runs of
    ``iters`` and ``iters_hi`` (default 3x) iterations, cancelling the
    fetch round trip.
    """
    iters_hi = iters_hi or 3 * iters

    @jax.jit
    def run(n, carry):
        return jax.lax.fori_loop(0, n, lambda _, c: step(c), carry)

    # compile + warm both trip counts
    _run_and_sync(run, carry0, iters)
    _run_and_sync(run, carry0, iters_hi)

    slopes = []
    for _ in range(repeats):
        t_lo = _run_and_sync(run, carry0, iters)
        t_hi = _run_and_sync(run, carry0, iters_hi)
        slopes.append((t_hi - t_lo) / (iters_hi - iters))
    return sorted(slopes)[len(slopes) // 2]
