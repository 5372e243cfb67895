"""Host dynamic-object layer: Object/ObjectCollection semantics, forces,
collisions, circular-orbit construction."""
import numpy as np
import pytest

from orbital_tpu.models.constants import STANDARD
from orbital_tpu.models.objects import (
    Coordinates,
    Object,
    ObjectCollection,
    collide_spheres,
    fragmentation_probability,
    pairwise_accelerations,
    set_circular_orbit,
)
from orbital_tpu.models.rigid import moment_of_inertia

G = STANDARD.G


def _two_bodies():
    a = Object(5.972e24, 6.371e6, velocity=np.zeros(3), coordinates=Coordinates(0, 0, 0))
    b = Object(7.348e22, 1.737e6, velocity=np.zeros(3), coordinates=Coordinates(3.844e8, 0, 0))
    return a, b


def test_object_defaults_and_dict_roundtrip():
    o = Object(10.0, 2.0, velocity=np.array([1.0, 2.0, 3.0]), coordinates=Coordinates(4, 5, 6))
    assert o.moi == pytest.approx(moment_of_inertia(10.0, 2.0, shape="sphere"))
    assert o.name == o.uuid[:6]
    d = o.to_dict()
    o2 = Object.from_dict(d)
    assert o2.uuid == o.uuid
    np.testing.assert_allclose(o2.velocity, o.velocity)
    assert o2.coordinates.to_array() == pytest.approx(o.position())
    assert o2.unit_profile is STANDARD


def test_force_vector_antisymmetry():
    a, b = _two_bodies()
    fab = a.force_vector(b)
    fba = b.force_vector(a)
    np.testing.assert_allclose(fab, -fba)
    expected = G * a.mass * b.mass / 3.844e8**2
    assert np.linalg.norm(fab) == pytest.approx(expected)
    # coincident bodies feel no force
    c = Object(1.0, 1.0, velocity=np.zeros(3), coordinates=Coordinates(0, 0, 0))
    np.testing.assert_array_equal(a.force_vector(c), np.zeros(3))


def test_pairwise_accelerations_matches_reference(reference, rng):
    ref = reference["core.physics"]
    objs = [
        Object(float(m), 1.0, velocity=np.zeros(3),
               coordinates=Coordinates(*c))
        for m, c in zip(rng.uniform(1e20, 1e24, 8), rng.uniform(-1e9, 1e9, (8, 3)))
    ]
    ref_objs = [
        ref.Object(o.mass, o.radius, velocity=np.zeros(3),
                   coordinates=ref.Coordinates(*o.position()), uuid=o.uuid)
        for o in objs
    ]
    acc, U = pairwise_accelerations(objs, eps=1e5)
    acc_ref, U_ref = ref.pairwise_accelerations(ref_objs, eps=1e5)
    assert U == pytest.approx(U_ref, rel=1e-12)
    for o in objs:
        np.testing.assert_allclose(acc[o.uuid], acc_ref[o.uuid], rtol=1e-12)


def test_set_circular_orbit_zero_momentum():
    a, b = _two_bodies()
    set_circular_orbit(a, b)
    p = a.mass * a.velocity + b.mass * b.velocity
    np.testing.assert_allclose(p, np.zeros(3), atol=1e-6)
    v_expected = np.sqrt(G * (a.mass + b.mass) / 3.844e8)
    assert np.linalg.norm(b.velocity) == pytest.approx(v_expected)


def test_collide_spheres_elastic_swap():
    # equal masses, head-on, e=1: velocities along the normal swap
    a = Object(5.0, 1.0, velocity=np.array([1.0, 0, 0]), coordinates=Coordinates(0, 0, 0))
    b = Object(5.0, 1.0, velocity=np.array([-1.0, 0, 0]), coordinates=Coordinates(1.5, 0, 0))
    collide_spheres(a, b, restitution=1.0)
    assert a.velocity[0] == pytest.approx(-1.0)
    assert b.velocity[0] == pytest.approx(1.0)
    # de-overlap pushed them apart
    assert b.position()[0] - a.position()[0] >= 2.0 - 1e-9


def test_collide_spheres_separating_noop():
    a = Object(5.0, 1.0, velocity=np.array([-1.0, 0, 0]), coordinates=Coordinates(0, 0, 0))
    b = Object(5.0, 1.0, velocity=np.array([1.0, 0, 0]), coordinates=Coordinates(1.5, 0, 0))
    collide_spheres(a, b, restitution=1.0)
    assert a.velocity[0] == -1.0 and b.velocity[0] == 1.0


def test_handle_collisions_merge():
    a = Object(6.0, 1.0, velocity=np.array([1.0, 0, 0]), coordinates=Coordinates(0, 0, 0))
    b = Object(3.0, 1.0, velocity=np.array([-2.0, 0, 0]), coordinates=Coordinates(1.0, 0, 0))
    coll = ObjectCollection([a, b])
    coll.handle_collisions(merge_on_capture=True)
    assert len(coll) == 1
    merged = coll[0]
    assert merged.mass == 9.0
    np.testing.assert_allclose(merged.velocity, [(6 * 1 + 3 * -2) / 9.0, 0, 0])
    np.testing.assert_allclose(merged.position(), [(3 * 1.0) / 9.0, 0, 0])
    assert merged.radius == pytest.approx(2 ** (1 / 3))


def test_euler_update():
    o = Object(1.0, 1.0, velocity=np.array([0.0, 1.0, 0.0]), coordinates=Coordinates(0, 0, 0))
    o.update(np.array([1.0, 0.0, 0.0]), dt=2.0)
    np.testing.assert_allclose(o.velocity, [2.0, 1.0, 0.0])
    np.testing.assert_allclose(o.position(), [4.0, 2.0, 0.0])


def test_fragmentation_probability_monotone():
    a = Object(1e3, 1.0, velocity=np.array([500.0, 0, 0]), coordinates=Coordinates(0, 0, 0))
    b = Object(1e3, 1.0, velocity=np.array([-500.0, 0, 0]), coordinates=Coordinates(1.0, 0, 0))
    slow = Object(1e3, 1.0, velocity=np.zeros(3), coordinates=Coordinates(1.0, 0, 0))
    assert 0.0 <= fragmentation_probability(a, slow) <= fragmentation_probability(a, b) <= 1.0


def test_collection_container_api():
    a, b = _two_bodies()
    coll = ObjectCollection([a])
    coll.append(b)
    assert len(coll) == 2 and coll[1] is b
    coll.remove(a)
    assert list(coll) == [b]
    coll.extend([a])
    assert coll.pop().uuid == a.uuid
    rt = ObjectCollection.from_dict(ObjectCollection([a, b]).to_dict())
    assert [o.uuid for o in rt] == [a.uuid, b.uuid]
