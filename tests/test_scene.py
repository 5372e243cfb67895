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


def _wrap_angle_diff(x, y):
    """Smallest signed difference between two angles."""
    return (np.asarray(x) - np.asarray(y) + np.pi) % (2 * np.pi) - np.pi


def test_state_to_elements_roundtrip_host_and_device():
    """elements -> state -> elements recovers the inputs (both versions)."""
    import jax.numpy as jnp

    from orbital_tpu.models.kepler import state_to_elements as s2e_host
    from orbital_tpu.ops.kepler import elements_to_state
    from orbital_tpu.ops.kepler import state_to_elements as s2e_dev

    rng = np.random.default_rng(7)
    n = 64
    a = rng.uniform(0.5, 40.0, n) * 1.495978707e11
    e = rng.uniform(0.01, 0.9, n)
    inc = rng.uniform(0.01, math.pi - 0.01, n)
    ln = rng.uniform(0.0, 2 * math.pi, n)
    ap = rng.uniform(0.0, 2 * math.pi, n)
    Ma = rng.uniform(0.0, 2 * math.pi, n)
    mu = np.full(n, 1.32712440018e20)

    pos, vel = elements_to_state(a, e, inc, ln, ap, Ma, mu)
    pos, vel = np.asarray(pos), np.asarray(vel)

    for impl, (a2, e2, i2, ln2, ap2, Ma2) in (
        ("host", s2e_host(pos, vel, mu)),
        ("device", tuple(np.asarray(x) for x in s2e_dev(
            jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(mu)))),
    ):
        np.testing.assert_allclose(a2, a, rtol=1e-8, err_msg=impl)
        np.testing.assert_allclose(e2, e, atol=1e-9, err_msg=impl)
        np.testing.assert_allclose(i2, inc, atol=1e-9, err_msg=impl)
        np.testing.assert_allclose(_wrap_angle_diff(ln2, ln), 0.0,
                                   atol=1e-8, err_msg=impl)
        np.testing.assert_allclose(_wrap_angle_diff(ap2, ap), 0.0,
                                   atol=1e-7, err_msg=impl)
        np.testing.assert_allclose(_wrap_angle_diff(Ma2, Ma), 0.0,
                                   atol=1e-7, err_msg=impl)


def test_state_to_elements_recovers_dataset():
    """Every dataset body's get_state() inverts to an equivalent element
    set: a/e/cos(I) match exactly, and re-converting the extracted elements
    reproduces the state. (Raw angle comparison would be wrong — element
    sets aren't unique: e.g. Earth's J2000 I = -0.00001531 deg normalizes
    to ~2*pi, which the canonical i in [0, pi] represents as +eps with the
    node/periapsis shifted by pi.)"""
    from orbital_tpu.models.kepler import state_to_elements
    from orbital_tpu.ops.kepler import elements_to_state

    sys_ = solar_system_v2(moons=True)
    sys_.standardize_units(mass_unit="kilograms", distance_unit="meters",
                           angle_unit="radians", time_unit="seconds")
    for b in sys_:
        if b.parent is None:
            continue
        r, v = b.get_state()
        els = state_to_elements(r, v, b.parent.mu)
        a2, e2, i2 = els[0], els[1], els[2]
        assert a2 == pytest.approx(b.a.value, rel=1e-9), b.name
        assert e2 == pytest.approx(b.e, abs=1e-10), b.name
        assert math.cos(i2) == pytest.approx(math.cos(b.I.value),
                                             abs=1e-12), b.name
        assert 0.0 <= i2 <= math.pi, b.name
        pos, vel = elements_to_state(*(np.array([x]) for x in els),
                                     np.array([b.parent.mu]))
        r_scale = np.linalg.norm(r)
        np.testing.assert_allclose(np.asarray(pos)[0], r, rtol=0,
                                   atol=1e-7 * r_scale, err_msg=b.name)
        np.testing.assert_allclose(np.asarray(vel)[0], v, rtol=0,
                                   atol=1e-7 * np.linalg.norm(v),
                                   err_msg=b.name)


def test_state_to_elements_degenerate_conventions():
    """Circular / equatorial / retrograde states stay finite, follow the
    documented conventions, and round-trip through elements_to_state."""
    from orbital_tpu.models.kepler import state_to_elements
    from orbital_tpu.ops.kepler import elements_to_state

    mu = 1.32712440018e20
    R = 1.495978707e11
    v_circ = math.sqrt(mu / R)

    # circular equatorial prograde, body at +x moving +y: all angles 0
    a, e, inc, ln, ap, Ma = state_to_elements(
        [R, 0.0, 0.0], [0.0, v_circ, 0.0], mu)
    assert a == pytest.approx(R, rel=1e-12)
    assert e == pytest.approx(0.0, abs=1e-12)
    assert inc == pytest.approx(0.0, abs=1e-12)
    assert ln == 0.0 and ap == 0.0
    assert Ma == pytest.approx(0.0, abs=1e-12)

    # quarter-orbit later (+y moving -x): mean argument of latitude pi/2
    _, _, _, _, _, Ma2 = state_to_elements(
        [0.0, R, 0.0], [-v_circ, 0.0, 0.0], mu)
    assert Ma2 == pytest.approx(math.pi / 2, rel=1e-12)

    # retrograde equatorial (i = pi), slightly eccentric: round-trips
    r0 = np.array([R, 0.0, 0.0])
    v0 = np.array([0.0, -1.1 * v_circ, 0.0])
    els = state_to_elements(r0, v0, mu)
    assert els[2] == pytest.approx(math.pi, abs=1e-12)
    pos, vel = elements_to_state(*(np.array([x]) for x in els),
                                 np.array([mu]))
    np.testing.assert_allclose(np.asarray(pos)[0], r0, rtol=1e-9, atol=1.0)
    np.testing.assert_allclose(np.asarray(vel)[0], v0, rtol=1e-9, atol=1e-6)

    # polar circular orbit (node well-defined, periapsis not)
    r1 = [0.0, 0.0, R]
    v1 = [-v_circ, 0.0, 0.0]  # h = r x v = (0, -R*v, 0): node at -y... compute
    a1, e1, i1, ln1, ap1, Ma1 = state_to_elements(r1, v1, mu)
    assert i1 == pytest.approx(math.pi / 2, abs=1e-12)
    assert ap1 == 0.0 and e1 == pytest.approx(0.0, abs=1e-12)
    pos1, vel1 = elements_to_state(*(np.array([x]) for x in
                                     (a1, e1, i1, ln1, ap1, Ma1)),
                                   np.array([mu]))
    np.testing.assert_allclose(np.asarray(pos1)[0], r1, rtol=1e-9, atol=1.0)
    np.testing.assert_allclose(np.asarray(vel1)[0], v1, rtol=1e-9, atol=1e-6)


def test_body_from_state():
    """Body.from_state inverts Body.get_state on a real dataset body and
    rejects unbound orbits."""
    sys_ = solar_system_v2(moons=True)
    sys_.standardize_units(mass_unit="kilograms", distance_unit="meters",
                           angle_unit="radians", time_unit="seconds")
    by_name = {b.name: b for b in sys_}
    luna, earth = by_name["Luna"], by_name["Earth"]
    r, v = luna.get_state()
    rebuilt = Body.from_state("Luna2", r, v, mass=luna.mass,
                              radius=luna.radius, parent=earth)
    assert rebuilt.a.value == pytest.approx(luna.a.value, rel=1e-9)
    assert rebuilt.e == pytest.approx(luna.e, abs=1e-10)
    assert rebuilt.I.value == pytest.approx(luna.I.value, abs=1e-10)
    # derived quantities come out consistent too
    assert rebuilt.T.value == pytest.approx(luna.T.value, rel=1e-9)
    r2, v2 = rebuilt.get_state()
    np.testing.assert_allclose(r2, r, rtol=1e-8)
    np.testing.assert_allclose(v2, v, rtol=1e-8)

    v_esc = math.sqrt(2 * 6.67430e-11 * earth.mass.value / np.linalg.norm(r))
    with pytest.raises(ValueError, match="not a bound orbit"):
        Body.from_state("hyper", r, np.array([v_esc * 1.1, 0.0, 0.0]),
                        mass=luna.mass, radius=luna.radius, parent=earth)
