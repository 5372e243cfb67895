"""Compat: reference core/examples.py surface (orbital_tpu.models.examples)."""
from orbital_tpu.models.examples import (  # noqa: F401
    sol_from_kepler_dataset,
    sun_earth_moon,
    three_body_equilateral,
    two_body_problem,
)
