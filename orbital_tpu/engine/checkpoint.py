"""Checkpoint / resume for device state.

The reference writes JSONL frames but never reads them back (write-only
cache, core/engine.py:48-57; no load path exists). Here checkpointing is a
first-class round trip: the full SoA state (including ds32 compensation
arrays, clock, and step counter) goes to a single ``.npz`` via one
device->host transfer, and ``load_state`` restores it exactly. Orbax is
used instead when a directory path is given (async-capable, multi-host
friendly); npz is the dependency-free default.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Optional

import jax.numpy as jnp
import numpy as np

from .state import NBodyState

__all__ = ["save_state", "load_state"]

_ARRAY_FIELDS = ["pos", "vel", "mass", "radius", "alive", "acc",
                 "potential", "time", "step", "pos_lo", "vel_lo", "jerk"]


def save_state(state: NBodyState, path: str | Path, meta: Optional[dict] = None) -> None:
    """Write the state (and optional JSON-serializable metadata) to ``path``.

    ``path`` ending in ``.npz`` -> numpy archive; anything else is treated
    as an orbax checkpoint directory.
    """
    path = Path(path)
    if path.suffix == ".npz":
        arrays = {}
        for f in _ARRAY_FIELDS:
            v = getattr(state, f)
            if v is not None:
                arrays[f] = np.asarray(v)
        if meta:
            arrays["_meta"] = np.frombuffer(
                json.dumps(meta).encode(), dtype=np.uint8
            )
        path.parent.mkdir(parents=True, exist_ok=True)
        np.savez(path, **arrays)
        return

    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    payload = {f: getattr(state, f) for f in _ARRAY_FIELDS
               if getattr(state, f) is not None}
    ckptr.save(path.resolve(), payload, force=True)
    ckptr.wait_until_finished()
    if meta:
        (path / "meta.json").write_text(json.dumps(meta))


def load_state(path: str | Path) -> tuple[NBodyState, dict]:
    """Restore a state written by :func:`save_state`. Returns (state, meta)."""
    path = Path(path)
    if path.suffix == ".npz":
        with np.load(path) as data:
            meta = {}
            if "_meta" in data:
                meta = json.loads(bytes(data["_meta"]).decode())
            kwargs = {f: jnp.asarray(data[f]) for f in _ARRAY_FIELDS if f in data}
    else:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(path.resolve())
        kwargs = {k: jnp.asarray(v) for k, v in restored.items()}
        meta_fp = path / "meta.json"
        meta = json.loads(meta_fp.read_text()) if meta_fp.exists() else {}
    for f in ("pos_lo", "vel_lo", "jerk"):
        kwargs.setdefault(f, None)
    return NBodyState(**kwargs), meta
