"""Compat: reference core/datasets.py surface (orbital_tpu.models.datasets)."""
from orbital_tpu.models.body import System  # noqa: F401
from orbital_tpu.models.datasets import (  # noqa: F401
    EPOCH,
    solar_system,
    solar_system_v2,
)
