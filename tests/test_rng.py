"""Distribution tests for the closed-form sampling that replaces the
reference's curand rejection loops (Math.cuh:252-285)."""

import jax
import numpy as np

from cudaraytracer_tpu.utils import rng as rngu


def test_unit_vector_on_sphere():
    v = np.asarray(rngu.unit_vector(jax.random.PRNGKey(0), (4096,)))
    np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, rtol=1e-5)
    # mean should vanish, each axis variance = 1/3 for the uniform sphere
    assert np.abs(v.mean(0)).max() < 0.05
    np.testing.assert_allclose(v.var(0), 1.0 / 3.0, atol=0.03)


def test_in_unit_sphere_uniform_volume():
    p = np.asarray(rngu.in_unit_sphere(jax.random.PRNGKey(1), (8192,)))
    r = np.linalg.norm(p, axis=-1)
    assert r.max() <= 1.0
    # for uniform volume, r^3 is uniform on [0,1]
    u = np.sort(r**3)
    ks = np.abs(u - np.linspace(0, 1, len(u))).max()
    assert ks < 0.02, f"KS distance {ks}"
    assert np.abs(p.mean(0)).max() < 0.03


def test_in_unit_disk():
    p = np.asarray(rngu.in_unit_disk(jax.random.PRNGKey(2), (8192,)))
    assert np.all(p[:, 2] == 0.0)
    r2 = p[:, 0] ** 2 + p[:, 1] ** 2
    assert r2.max() <= 1.0
    # uniform area: r^2 uniform on [0,1]
    u = np.sort(r2)
    ks = np.abs(u - np.linspace(0, 1, len(u))).max()
    assert ks < 0.02


def test_in_unit_hemisphere():
    import jax.numpy as jnp

    n = jnp.tile(jnp.array([[0.0, 1.0, 0.0]]), (2048, 1))
    p = np.asarray(rngu.in_unit_hemisphere(jax.random.PRNGKey(3), n))
    assert (p[:, 1] >= 0).all()
    assert (np.linalg.norm(p, axis=-1) <= 1.0).all()


def test_counter_keys_deterministic():
    k = rngu.base_key(123)
    a = rngu.bounce_key(rngu.frame_key(k, 5), 2)
    b = rngu.bounce_key(rngu.frame_key(k, 5), 2)
    c = rngu.bounce_key(rngu.frame_key(k, 5), 3)
    assert (np.asarray(a) == np.asarray(b)).all()
    assert (np.asarray(a) != np.asarray(c)).any()
