"""Simulation engine: SoA device state, jitted integrators, scan rollouts,
the OO SimulationEngine facade, and checkpointing."""
from . import dsfloat, integrators, rollout, state  # noqa: F401
