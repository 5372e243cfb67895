"""Repo-local JSON probe-budget cache for the per-row study runners.

Replaces the round-4 pickle cache in predictable world-writable /tmp
paths (advisor r4: pickle.load executes arbitrary code if a file is
pre-planted, and stale caches survived probe-logic changes because no
code-version or seed token was in the key). Here only the handful of
integer budgets are serialized, as JSON, under the repo, keyed by a
PROBE_VERSION token plus the Plummer seed.
"""
import json
import os

# bump when tree_cfg_probed / the probe logic / the Plummer IC changes
PROBE_VERSION = 2
_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    ".probe_cache")

# the SimConfig fields the study runners actually consume
_FIELDS = ("tree_capacity", "tree_max_cells", "tree_max_big",
           "tree_max_frontier", "tree_max_chunks", "tree_pair_entries",
           "tree_wl_entries", "tree_wl_rj")


def _path(n, levels, near, chunk, seed):
    return os.path.join(
        _DIR, f"v{PROBE_VERSION}_s{seed}_{n}_{levels}_{near}_{chunk}.json")


def load(n, levels, near, chunk, seed=0):
    """Return the cached budget dict, or None on miss/corruption."""
    try:
        with open(_path(n, levels, near, chunk, seed)) as f:
            d = json.load(f)
        return d if isinstance(d, dict) else None
    except (OSError, ValueError):
        return None


def save(cfg, n, levels, near, chunk, seed=0):
    """Persist the probe budgets from a SimConfig-like object."""
    os.makedirs(_DIR, exist_ok=True)
    d = {k: getattr(cfg, k, None) for k in _FIELDS}
    d = {k: v for k, v in d.items() if v is not None}
    with open(_path(n, levels, near, chunk, seed), "w") as f:
        json.dump(d, f)
    return d


class Budgets:
    """Attribute view over a budget dict (drop-in for the cfg fields).
    JSON round-trips tuples as lists — restore tuples so values stay
    hashable as jit static arguments."""

    def __init__(self, d):
        self.__dict__.update(
            {k: tuple(v) if isinstance(v, list) else v
             for k, v in d.items()})
