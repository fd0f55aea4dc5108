"""Material scatter tests (semantics of Material.cuh:34-177)."""

import numpy as np

from cudaraytracer_tpu.ops import materials as mats


def call_scatter(ray_dir, normal, mat_type, fuzz=0.0, ior=1.5, light=2.0,
                 tex=(0.5, 0.5, 0.5), sphere_sample=(0.0, 0.0, 0.0), uniform=0.5):
    n = len(ray_dir)
    return mats.scatter(
        np.asarray(ray_dir, np.float32),
        np.zeros((n, 3), np.float32),
        np.asarray(normal, np.float32),
        np.full(n, mat_type, np.int32),
        np.full(n, fuzz, np.float32),
        np.full(n, ior, np.float32),
        np.full(n, light, np.float32),
        np.tile(np.asarray(tex, np.float32), (n, 1)),
        np.tile(np.asarray(sphere_sample, np.float32), (n, 1)),
        np.full(n, uniform, np.float32),
    )


def test_lambertian_direction_and_attenuation():
    s = (0.1, 0.2, -0.3)
    out = call_scatter([[0.0, -1.0, 0.0]], [[0.0, 1.0, 0.0]], mats.LAMBERTIAN,
                       sphere_sample=s, tex=(0.3, 0.4, 0.5))
    # dir = normal + sample (Material.cuh:46-47)
    np.testing.assert_allclose(out.direction, [[0.1, 1.2, -0.3]], atol=1e-6)
    np.testing.assert_allclose(out.attenuation, [[0.3, 0.4, 0.5]], atol=1e-6)
    assert bool(out.scattered[0])
    np.testing.assert_allclose(out.emitted, 0.0)


def test_metal_mirror_and_absorb():
    # fuzz 0: perfect mirror of the unit incoming dir
    out = call_scatter([[1.0, -1.0, 0.0]], [[0.0, 1.0, 0.0]], mats.METAL)
    np.testing.assert_allclose(
        out.direction, [[1.0 / np.sqrt(2), 1.0 / np.sqrt(2), 0.0]], atol=1e-6
    )
    assert bool(out.scattered[0])
    # heavy fuzz pushing the ray below the surface: absorbed (Material.cuh:93)
    out = call_scatter([[1.0, -1.0, 0.0]], [[0.0, 1.0, 0.0]], mats.METAL,
                       fuzz=1.0, sphere_sample=(0.0, -0.99, 0.0))
    assert not bool(out.scattered[0])


def test_dielectric_attenuation_is_one_and_always_scatters():
    out = call_scatter([[0.0, -1.0, 0.0]], [[0.0, 1.0, 0.0]], mats.DIELECTRIC)
    np.testing.assert_allclose(out.attenuation, 1.0)
    assert bool(out.scattered[0])


def test_dielectric_refracts_straight_through():
    # normal incidence, uniform sample above schlick prob -> refract
    # schlick at cos=1: r0 = ((1-1.5)/(2.5))^2 = 0.04
    out = call_scatter([[0.0, -1.0, 0.0]], [[0.0, 1.0, 0.0]], mats.DIELECTRIC,
                       uniform=0.9)
    d = np.asarray(out.direction[0])
    d = d / np.linalg.norm(d)
    np.testing.assert_allclose(d, [0.0, -1.0, 0.0], atol=1e-5)


def test_dielectric_reflects_when_sample_below_schlick():
    out = call_scatter([[0.0, -1.0, 0.0]], [[0.0, 1.0, 0.0]], mats.DIELECTRIC,
                       uniform=0.01)
    # reflection of raw dir (0,-1,0) about n=(0,1,0) is (0,1,0)
    np.testing.assert_allclose(out.direction, [[0.0, 1.0, 0.0]], atol=1e-6)


def test_dielectric_total_internal_reflection():
    # leaving the medium at a shallow angle: must reflect regardless of sample
    th = 0.9  # > critical angle for ior 1.5
    d = [[np.sin(th), np.cos(th), 0.0]]  # moving up, exiting through +y surface
    out = call_scatter(d, [[0.0, 1.0, 0.0]], mats.DIELECTRIC, uniform=0.999)
    refl = np.asarray(out.direction[0])
    np.testing.assert_allclose(refl, [np.sin(th), -np.cos(th), 0.0], atol=1e-5)


def test_diffuse_light_emits_and_terminates():
    out = call_scatter([[0.0, -1.0, 0.0]], [[0.0, 1.0, 0.0]], mats.DIFFUSE_LIGHT,
                       light=3.0, tex=(1.0, 0.5, 0.25))
    np.testing.assert_allclose(out.emitted, [[3.0, 1.5, 0.75]], atol=1e-6)
    assert not bool(out.scattered[0])


def test_branch_isolation():
    # each lane gets its own material; verify masks don't bleed across lanes
    out = mats.scatter(
        np.array([[0.0, -1.0, 0.0]] * 4, np.float32),
        np.zeros((4, 3), np.float32),
        np.array([[0.0, 1.0, 0.0]] * 4, np.float32),
        np.array([mats.LAMBERTIAN, mats.METAL, mats.DIELECTRIC, mats.DIFFUSE_LIGHT], np.int32),
        np.zeros(4, np.float32),
        np.full(4, 1.5, np.float32),
        np.full(4, 2.0, np.float32),
        np.tile(np.array([0.6, 0.6, 0.6], np.float32), (4, 1)),
        np.zeros((4, 3), np.float32),
        np.full(4, 0.5, np.float32),
    )
    scattered = np.asarray(out.scattered)
    assert scattered.tolist() == [True, True, True, False]
    emitted = np.asarray(out.emitted)
    assert emitted[:3].sum() == 0.0 and emitted[3, 0] == 1.2
    att = np.asarray(out.attenuation)
    np.testing.assert_allclose(att[0], 0.6)
    np.testing.assert_allclose(att[2], 1.0)
