"""Device compute kernels: pairwise gravity (dense XLA and Pallas TPU),
collision resolution, Kepler solver, and conservation diagnostics."""
from . import collisions, diagnostics, forces  # noqa: F401
