"""Host-side scene definition: units, constants, Keplerian bodies, datasets,
dynamic objects, and bundled example systems."""
from . import body, constants, datasets, kepler, objects, rigid, units  # noqa: F401
