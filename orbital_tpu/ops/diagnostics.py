"""On-device conservation diagnostics.

Reference formulas (core/engine.py:104-121): total energy is the kinetic
sum plus the softened potential cached by the last force evaluation;
angular momentum is sum_i r_i x (m_i v_i). Computed as fused reductions on
device; the host only sees scalars.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["kinetic_energy", "total_energy", "angular_momentum", "momentum", "barycenter"]


def kinetic_energy(vel: jax.Array, mass: jax.Array) -> jax.Array:
    """K = sum_i 1/2 m_i |v_i|^2 (spin KE excluded, as in the reference)."""
    return 0.5 * jnp.sum(mass * jnp.sum(vel * vel, axis=-1), axis=-1)


def total_energy(vel: jax.Array, mass: jax.Array, potential: jax.Array) -> jax.Array:
    """K + U with U from the most recent force evaluation
    (reference: core/engine.py:104-112)."""
    return kinetic_energy(vel, mass) + potential


def angular_momentum(pos: jax.Array, vel: jax.Array, mass: jax.Array) -> jax.Array:
    """L = sum_i r_i x m_i v_i, shape [..., 3]
    (reference: core/engine.py:114-121)."""
    return jnp.sum(jnp.cross(pos, mass[..., None] * vel), axis=-2)


def momentum(vel: jax.Array, mass: jax.Array) -> jax.Array:
    """Total linear momentum [..., 3]."""
    return jnp.sum(mass[..., None] * vel, axis=-2)


def barycenter(pos: jax.Array, mass: jax.Array) -> jax.Array:
    """Mass-weighted center [..., 3]."""
    total = jnp.sum(mass, axis=-1, keepdims=True)
    return jnp.sum(mass[..., None] * pos, axis=-2) / jnp.where(total > 0, total, 1.0)
