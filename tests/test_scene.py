"""Keplerian scene layer: constants, Kepler solver, Body derivation,
elements -> state vectors, System standardization, datasets."""
import math

import numpy as np
import pytest

from orbital_tpu.models.body import Body, System
from orbital_tpu.models.constants import (
    ASTRO,
    STANDARD,
    DEFAULT_ASTRO_INTEGRATOR,
    DEFAULT_STANDARD_INTEGRATOR,
    get_unit_profile,
)
from orbital_tpu.models.datasets import solar_system_v2
from orbital_tpu.models.kepler import solve_kepler
from orbital_tpu.models.units import AU, Degrees, Kilograms, Meters


def test_unit_profiles():
    assert get_unit_profile("si") is STANDARD
    assert get_unit_profile("astro") is ASTRO
    assert STANDARD.G == pytest.approx(6.67430e-11)
    assert ASTRO.G == pytest.approx(2.959122082855911e-4)
    assert DEFAULT_STANDARD_INTEGRATOR.dt == 3600
    assert DEFAULT_ASTRO_INTEGRATOR.softening == 1e-6
    with pytest.raises(ValueError):
        get_unit_profile("cgs")


def test_solve_kepler_residual():
    for e in (0.0, 0.1, 0.7, 0.9, 0.99):
        for M in np.linspace(0, 2 * math.pi, 17):
            E = solve_kepler(M, e)
            assert abs(E - e * math.sin(E) - M) < 1e-10


def test_solve_kepler_vectorized():
    M = np.linspace(0, 2 * math.pi, 64)
    e = np.full_like(M, 0.6)
    E = solve_kepler(M, e)
    np.testing.assert_allclose(E - 0.6 * np.sin(E), M, atol=1e-10)


def test_solve_kepler_matches_reference(reference):
    ref = reference["core.physics"]
    for M, e in [(0.3, 0.0167), (2.5, 0.9), (5.9, 0.2), (1.0, 0.95)]:
        assert solve_kepler(M, e) == pytest.approx(ref.solve_kepler(M, e), abs=1e-12)


def _earth():
    sol = Body(parent=None, name="Sol", mass=Kilograms(1.9885e30), radius=Meters(6.9634e8),
               a=AU(0), e=0, I=Degrees(0), L=Degrees(0), long_peri=Degrees(0),
               long_node=Degrees(0), arg_peri=None, M=None)
    return Body(parent=sol, name="Earth", mass=Kilograms(5.9722e24), radius=Meters(6.371e6),
                a=AU(1.00000261), e=0.01671123, I=Degrees(-0.00001531),
                L=Degrees(100.46457166), long_peri=Degrees(102.93768193),
                long_node=Degrees(0.0), M=None, arg_peri=None)


def test_body_derivation_identities():
    earth = _earth()
    # varpi = Omega + omega and L = varpi + M (mod 360)
    assert earth.arg_peri.value == pytest.approx(
        (earth.long_peri.value - earth.long_node.value) % 360.0)
    assert earth.M.value == pytest.approx(
        (earth.L.value - earth.long_peri.value) % 360.0)
    # b = a sqrt(1 - e^2) (returned in meters)
    a_m = earth.a.to_meters().value
    assert earth.b.value == pytest.approx(a_m * math.sqrt(1 - earth.e**2))
    # mu = G m; fg = mu / r^2
    assert earth.mu == pytest.approx(STANDARD.G * 5.9722e24)
    assert earth.fg == pytest.approx(earth.mu / 6.371e6**2)
    # Kepler's third law: T = 2 pi sqrt(a^3 / (G M_sun)) ~ 1 year
    assert earth.T.value == pytest.approx(365.25 * 86400, rel=2e-3)
    # mean motion consistent with period
    assert earth.mean_motion() == pytest.approx(2 * math.pi / earth.T.value, rel=1e-12)


def test_body_get_state_physical():
    earth = _earth()
    r, v = earth.get_state()
    # at J2000 Earth is ~0.983 AU out moving ~30 km/s, r.v small
    assert np.linalg.norm(r) == pytest.approx(0.9833 * 1.495978707e11, rel=1e-3)
    assert np.linalg.norm(v) == pytest.approx(30287, rel=1e-3)
    # parentless bodies sit at the origin
    assert earth.parent.get_state() == ([0.0, 0.0, 0.0], [0.0, 0.0, 0.0])


def test_get_state_matches_reference(reference):
    ref_ds = reference["core.datasets"]
    ours = solar_system_v2(moons=True)
    theirs = ref_ds.solar_system_v2(moons=True)
    ours.standardize_units(mass_unit="kilograms", distance_unit="meters",
                           angle_unit="radians", time_unit="seconds")
    theirs.standardize_units(mass_unit="kilograms", distance_unit="meters",
                             angle_unit="radians", time_unit="seconds")
    assert len(ours) == len(theirs) == 26
    for b_ours, b_ref in zip(ours, theirs):
        assert b_ours.name == b_ref.name
        r0, v0 = b_ours.get_state()
        r1, v1 = b_ref.get_state()
        np.testing.assert_allclose(r0, r1, rtol=1e-12, atol=1e-6)
        np.testing.assert_allclose(v0, v1, rtol=1e-12, atol=1e-12)
        assert b_ours.mass.value == b_ref.mass.value
        assert b_ours.radius.value == b_ref.radius.value


def test_dataset_structure():
    s = solar_system_v2(moons=False)
    assert len(s) == 15
    s = solar_system_v2(moons=True)
    assert len(s) == 26
    names = [b.name for b in s]
    assert names[0] == "Sol" and "Luna" in names and "Triton" in names
    luna = next(b for b in s if b.name == "Luna")
    assert luna.parent.name == "Earth"
    io = next(b for b in s if b.name == "Io")
    assert io.parent.name == "Jupiter"
    # moons derive varpi from omega + Omega
    assert luna.long_peri is not None and luna.L is not None


def test_system_standardize_roundtrip():
    s = solar_system_v2(moons=False)
    a0 = s[2].a.value  # AU
    s.standardize_units(distance_unit="meters", mass_unit="kilograms",
                        angle_unit="radians", time_unit="seconds")
    assert s[2].a.unit == "meters"
    assert s[2].I.unit == "radians"
    assert s[2].mass.unit == "kilograms"
    s.standardize_units(distance_unit="au")
    assert s[2].a.unit == "au"
    assert s[2].a.value == pytest.approx(a0)
    # to_json collapses Units to floats
    j = s.to_json()
    assert isinstance(j["Earth"]["a"], float)


def test_device_kepler_matches_host():
    import jax.numpy as jnp

    from orbital_tpu.ops.kepler import elements_to_state
    from orbital_tpu.ops.kepler import solve_kepler as solve_dev

    M = np.linspace(0.0, 2 * math.pi, 33)
    for e in (0.0, 0.3, 0.9):
        E_host = solve_kepler(M, np.full_like(M, e))
        E_dev = np.asarray(solve_dev(jnp.asarray(M), jnp.asarray(np.full_like(M, e))))
        np.testing.assert_allclose(E_dev, E_host, atol=1e-10)

    # elements->state agrees with Body.get_state for the whole dataset
    sys_ = solar_system_v2(moons=True)
    sys_.standardize_units(mass_unit="kilograms", distance_unit="meters",
                           angle_unit="radians", time_unit="seconds")
    bodies = [b for b in sys_ if b.parent is not None]
    a = np.array([b.a.value for b in bodies])
    e = np.array([b.e for b in bodies])
    inc = np.array([b.I.value for b in bodies])
    ln = np.array([b.long_node.value for b in bodies])
    ap = np.array([b.arg_peri.value for b in bodies])
    Ma = np.array([b.M.value for b in bodies])
    mu = np.array([b.parent.mu for b in bodies])
    pos, vel = elements_to_state(a, e, inc, ln, ap, Ma, mu)
    for i, b in enumerate(bodies):
        r, v = b.get_state()
        np.testing.assert_allclose(np.asarray(pos)[i], r, rtol=1e-10, atol=1e-4)
        np.testing.assert_allclose(np.asarray(vel)[i], v, rtol=1e-10, atol=1e-10)
