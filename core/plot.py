"""Compat: reference core/plot.py surface (orbital_tpu.viz)."""
from orbital_tpu.viz.plot import plot_orbits  # noqa: F401
from orbital_tpu.viz.video import EngineView, render_orbital_mp4  # noqa: F401
