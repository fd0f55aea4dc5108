"""Unit tests for utils.vec against NumPy oracles."""

import jax.numpy as jnp
import numpy as np
import pytest

from cudaraytracer_tpu.utils import vec

RNG = np.random.RandomState(0)


def rand_vecs(n=64):
    return RNG.randn(n, 3).astype(np.float32)


def test_dot_cross_length():
    a, b = rand_vecs(), rand_vecs()
    np.testing.assert_allclose(vec.dot(a, b), np.sum(a * b, -1), rtol=1e-5)
    np.testing.assert_allclose(vec.cross(a, b), np.cross(a, b), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(vec.length(a), np.linalg.norm(a, axis=-1), rtol=1e-5)


def test_normalize():
    a = rand_vecs()
    n = np.asarray(vec.normalize(a))
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, rtol=1e-5)
    # direction preserved
    cos = np.sum(n * a, -1) / np.linalg.norm(a, axis=-1)
    np.testing.assert_allclose(cos, 1.0, rtol=1e-5)


def test_reflect():
    # reflecting about the normal flips the normal component only
    v = np.array([[1.0, -1.0, 0.0]], np.float32)
    n = np.array([[0.0, 1.0, 0.0]], np.float32)
    np.testing.assert_allclose(vec.reflect(v, n), [[1.0, 1.0, 0.0]], atol=1e-6)
    # |reflect(v)| == |v| for unit normals
    v = rand_vecs()
    n = np.asarray(vec.normalize(rand_vecs()))
    r = np.asarray(vec.reflect(v, n))
    np.testing.assert_allclose(
        np.linalg.norm(r, axis=-1), np.linalg.norm(v, axis=-1), rtol=1e-4
    )


def test_refract_snell():
    # straight-on ray refracts straight through
    uv = np.array([[0.0, -1.0, 0.0]], np.float32)
    n = np.array([[0.0, 1.0, 0.0]], np.float32)
    can, r = vec.refract(uv, n, jnp.float32(1.0 / 1.5))
    assert bool(can[0])
    np.testing.assert_allclose(r, [[0.0, -1.0, 0.0]], atol=1e-6)

    # Snell's law: sin(theta_t) = (n1/n2) sin(theta_i)
    theta_i = 0.5
    uv = np.array([[np.sin(theta_i), -np.cos(theta_i), 0.0]], np.float32)
    can, r = vec.refract(uv, n, jnp.float32(1.0 / 1.5))
    assert bool(can[0])
    r = np.asarray(r[0])
    sin_t = r[0] / np.linalg.norm(r)
    np.testing.assert_allclose(sin_t, np.sin(theta_i) / 1.5, rtol=1e-5)


def test_refract_total_internal_reflection():
    # shallow ray leaving dense medium: no refraction possible
    theta_i = 0.9  # > critical angle asin(1/1.5)=0.7297
    uv = np.array([[np.sin(theta_i), -np.cos(theta_i), 0.0]], np.float32)
    n = np.array([[0.0, 1.0, 0.0]], np.float32)
    can, _ = vec.refract(uv, n, jnp.float32(1.5))
    assert not bool(can[0])


def test_lerp_clamp():
    a = np.zeros((4, 3), np.float32)
    b = np.ones((4, 3), np.float32)
    t = np.array([0.0, 0.5, 1.0, 0.25], np.float32)
    np.testing.assert_allclose(vec.lerp(a, b, t)[:, 0], t, atol=1e-6)
    np.testing.assert_allclose(
        vec.clamp01(np.array([-1.0, 0.5, 2.0], np.float32)), [0.0, 0.5, 0.999]
    )
