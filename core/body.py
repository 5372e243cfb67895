"""Compat: reference core/body.py surface (orbital_tpu.models.body)."""
from orbital_tpu.models.body import Body, System  # noqa: F401
from orbital_tpu.models.constants import STANDARD  # noqa: F401

G = STANDARD.G
