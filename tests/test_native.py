"""C++ f64 verification oracle vs independent numpy formulas."""
import numpy as np
import pytest

from orbital_tpu.utils import native


@pytest.fixture
def cluster(rng):
    n = 512
    return rng.normal(size=(n, 3)), rng.uniform(0.5, 1.5, n)


def test_fallback_matches_native_or_runs(cluster):
    pos, mass = cluster
    U = native.potential_f64(pos, mass, 1e-4, G=1.3)
    acc = native.accelerations_f64(pos, mass, 1e-4, G=1.3)
    # independent oracle
    d = pos[None] - pos[:, None]
    r2 = np.einsum("ijk,ijk->ij", d, d) + 1e-4
    inv = 1.0 / np.sqrt(r2)
    np.fill_diagonal(inv, 0.0)
    U_ref = -0.5 * 1.3 * np.sum(mass[:, None] * mass[None] * inv)
    acc_ref = 1.3 * np.einsum("ij,ijk->ik", mass[None] * inv**3, d)
    assert U == pytest.approx(U_ref, rel=1e-12)
    np.testing.assert_allclose(acc, acc_ref, rtol=1e-11)


def test_native_lib_is_built():
    # the library ships with the repo build (make -C native); this test
    # documents that the native path is exercised in CI here
    assert native.HAVE_NATIVE


def test_numpy_fallback_agrees(cluster, monkeypatch):
    pos, mass = cluster
    U_nat = native.potential_f64(pos, mass, 1e-3)
    a_nat = native.accelerations_f64(pos, mass, 1e-3)
    monkeypatch.setattr(native, "_lib", None)
    U_np = native.potential_f64(pos, mass, 1e-3)
    a_np = native.accelerations_f64(pos, mass, 1e-3)
    assert U_np == pytest.approx(U_nat, rel=1e-13)
    np.testing.assert_allclose(a_np, a_nat, rtol=1e-12)
