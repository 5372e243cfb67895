"""The `core.*` drop-in layer: reference user code runs unchanged.

Runs in a subprocess so the compat `core` package never collides with the
golden-test fixture's import of the actual reference `core`.
"""
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

SCRIPT = '''
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np

# verbatim reference-style user code
from core.constants import STANDARD, get_unit_profile
from core.units import AU, Meters
from core.physics import Object, Coordinates, ObjectCollection, set_circular_orbit, solve_kepler
from core.body import Body, System
from core.datasets import solar_system_v2
from core.engine import SimulationEngine, run_simulation

assert get_unit_profile("si") is STANDARD
assert abs(AU(1.0).to_meters().value - 1.495978707e11) < 1

system = solar_system_v2(moons=True)
system.standardize_units(mass_unit="kilograms", distance_unit="meters",
                         angle_unit="radians", time_unit="seconds")
assert len(system) == 26

a = Object(5.972e24, 6.371e6, velocity=np.zeros(3), coordinates=Coordinates(0, 0, 0))
b = Object(7.348e22, 1.737e6, velocity=np.zeros(3), coordinates=Coordinates(3.844e8, 0, 0))
set_circular_orbit(a, b)
engine = SimulationEngine(ObjectCollection([a, b]), dt=3600.0, softening=1e3,
                          restitution=1.0, cache=False, max_hist=None)
run_simulation(engine, steps=200, print_every=100)
assert engine.step_idx == 200
assert len(engine.named_history()["%s" % a.name]) == 201
print("COMPAT_OK")
'''


def test_reference_user_code_runs_unchanged():
    out = subprocess.run([sys.executable, "-c", SCRIPT], cwd=str(REPO),
                         capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr
    assert "COMPAT_OK" in out.stdout
