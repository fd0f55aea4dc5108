"""Intersection tests vs NumPy oracles (semantics of Hittable.cuh:80-294)."""

import numpy as np
import pytest

from cudaraytracer_tpu.ops import intersect as isect

RNG = np.random.RandomState(42)
BIG = 3.4e38


# ---------------------------------------------------------------- oracles
def sphere_hit_oracle(o, d, c, rad, t_min, t_max):
    """Scalar transliteration of Sphere::Hit (Hittable.cuh:80-110)."""
    oc = o - c
    a = d @ d
    b = oc @ d
    cc = oc @ oc - rad * rad
    disc = b * b - a * cc
    if disc <= 0:
        return None
    for sgn in (-1.0, 1.0):
        t = (-b + sgn * np.sqrt(disc)) / a
        if t_min < t < t_max:
            return t
    return None


def rect_hit_oracle(o, d, ptype, center, size, t_min, t_max):
    """Scalar transliteration of {XY,XZ,YZ}Rect::Hit (Hittable.cuh:128-294)."""
    k_ax = {1: 2, 2: 1, 3: 0}[ptype]
    a_ax = {1: 0, 2: 0, 3: 1}[ptype]
    b_ax = {1: 1, 2: 2, 3: 2}[ptype]
    ext_a = size[0] if ptype in (1, 2) else size[1]
    ext_b = size[1] if ptype in (1, 2) else size[0]
    if d[k_ax] == 0:
        return None
    t = (center[k_ax] - o[k_ax]) / d[k_ax]
    if not (t_min < t < t_max):
        return None
    pa = o[a_ax] + t * d[a_ax]
    pb = o[b_ax] + t * d[b_ax]
    if abs(pa - center[a_ax]) > ext_a / 2 or abs(pb - center[b_ax]) > ext_b / 2:
        return None
    return t


def scene_oracle(o, d, ptypes, centers, sizes, active, t_min=1e-3, t_max=BIG):
    best_t, best_i = BIG, -1
    for i in range(len(ptypes)):
        if not active[i]:
            continue
        if ptypes[i] == 0:
            t = sphere_hit_oracle(o, d, centers[i], sizes[i][0], t_min, min(t_max, best_t))
        else:
            t = rect_hit_oracle(o, d, ptypes[i], centers[i], sizes[i], t_min, min(t_max, best_t))
        if t is not None and t < best_t:
            best_t, best_i = t, i
    return (best_i >= 0), best_t, best_i


def random_scene(n=20):
    ptypes = RNG.randint(0, 4, n).astype(np.int32)
    centers = RNG.uniform(-3, 3, (n, 3)).astype(np.float32)
    sizes = RNG.uniform(0.3, 1.5, (n, 2)).astype(np.float32)
    active = RNG.rand(n) > 0.2
    return ptypes, centers, sizes, active


def random_rays(r=50):
    o = RNG.uniform(-5, 5, (r, 3)).astype(np.float32)
    d = RNG.randn(r, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


# ------------------------------------------------------------------ tests
@pytest.mark.parametrize("block", [4, 64])
def test_hit_scene_matches_oracle(block):
    ptypes, centers, sizes, active = random_scene(23)
    o, d = random_rays(60)
    hit, t, idx = isect.hit_scene(o, d, ptypes, centers, sizes, active, block=block)
    hit, t, idx = np.asarray(hit), np.asarray(t), np.asarray(idx)
    for r in range(len(o)):
        oh, ot, oi = scene_oracle(o[r], d[r], ptypes, centers, sizes, active)
        assert hit[r] == oh, f"ray {r} hit mismatch"
        if oh:
            np.testing.assert_allclose(t[r], ot, rtol=2e-4, atol=1e-5)
            assert idx[r] == oi, f"ray {r} prim mismatch {idx[r]} vs {oi}"


def test_sphere_from_inside():
    # ray starting inside a sphere must hit the far shell (second root)
    o = np.zeros((1, 3), np.float32)
    d = np.array([[1.0, 0.0, 0.0]], np.float32)
    hit, t, idx = isect.hit_scene(
        o, d,
        np.array([0], np.int32), np.zeros((1, 3), np.float32),
        np.array([[2.0, 2.0]], np.float32), np.array([True]),
    )
    assert bool(hit[0]) and np.isclose(float(t[0]), 2.0, rtol=1e-5)


def test_t_window():
    o = np.array([[0.0, 0.0, 5.0]], np.float32)
    d = np.array([[0.0, 0.0, -1.0]], np.float32)
    prim = (np.array([0], np.int32), np.zeros((1, 3), np.float32),
            np.array([[1.0, 1.0]], np.float32), np.array([True]))
    hit, t, _ = isect.hit_scene(o, d, *prim)
    assert bool(hit[0]) and np.isclose(float(t[0]), 4.0, rtol=1e-5)
    # t_max in front of the sphere: no hit
    hit, _, _ = isect.hit_scene(o, d, *prim, t_max=3.0)
    assert not bool(hit[0])
    # t_min beyond both roots: no hit
    hit, _, _ = isect.hit_scene(o, d, *prim, t_min=7.0)
    assert not bool(hit[0])


def test_inactive_masked():
    o = np.array([[0.0, 0.0, 5.0]], np.float32)
    d = np.array([[0.0, 0.0, -1.0]], np.float32)
    hit, _, _ = isect.hit_scene(
        o, d, np.array([0], np.int32), np.zeros((1, 3), np.float32),
        np.array([[1.0, 1.0]], np.float32), np.array([False]),
    )
    assert not bool(hit[0])


def test_hit_record_sphere_normal_uv():
    # hit the +x pole of a unit sphere: normal +x, u = 0.5 (phi=pi), v = 0.5
    o = np.array([[5.0, 0.0, 0.0]], np.float32)
    d = np.array([[-1.0, 0.0, 0.0]], np.float32)
    prims = (np.array([0], np.int32), np.zeros((1, 3), np.float32),
             np.array([[1.0, 1.0]], np.float32))
    hit, t, idx = isect.hit_scene(o, d, *prims, np.array([True]))
    rec = isect.make_hit_record(o, d, hit, t, idx, *prims)
    np.testing.assert_allclose(rec.point, [[1.0, 0.0, 0.0]], atol=1e-5)
    np.testing.assert_allclose(rec.normal, [[1.0, 0.0, 0.0]], atol=1e-5)
    # GetSphereUV (Hittable.cuh:119-125): phi=atan2(-0,1)+pi=pi -> u=0.5;
    # theta=acos(0)=pi/2 -> v=0.5
    np.testing.assert_allclose(rec.u, [0.5], atol=1e-5)
    np.testing.assert_allclose(rec.v, [0.5], atol=1e-5)
    assert bool(rec.front_face[0])


def test_hit_record_sphere_inside_normal_not_flipped():
    # reference sphere normals are raw (p-c)/r, NOT face-flipped
    o = np.zeros((1, 3), np.float32)
    d = np.array([[1.0, 0.0, 0.0]], np.float32)
    prims = (np.array([0], np.int32), np.zeros((1, 3), np.float32),
             np.array([[1.0, 1.0]], np.float32))
    hit, t, idx = isect.hit_scene(o, d, *prims, np.array([True]))
    rec = isect.make_hit_record(o, d, hit, t, idx, *prims)
    np.testing.assert_allclose(rec.normal, [[1.0, 0.0, 0.0]], atol=1e-5)
    assert not bool(rec.front_face[0])


def test_hit_record_rect_uv_and_flip():
    # xz rect 4 wide (x), 2 high (z), centered at origin, hit from above at
    # (1, 0, 0.5) -> u=(1-(-2))/4=0.75, v=(0.5-(-1))/2=0.75, normal flipped to +y
    o = np.array([[1.0, 3.0, 0.5]], np.float32)
    d = np.array([[0.0, -1.0, 0.0]], np.float32)
    prims = (np.array([2], np.int32), np.zeros((1, 3), np.float32),
             np.array([[4.0, 2.0]], np.float32))
    hit, t, idx = isect.hit_scene(o, d, *prims, np.array([True]))
    rec = isect.make_hit_record(o, d, hit, t, idx, *prims)
    assert bool(hit[0])
    np.testing.assert_allclose(rec.u, [0.75], atol=1e-5)
    np.testing.assert_allclose(rec.v, [0.75], atol=1e-5)
    np.testing.assert_allclose(rec.normal, [[0.0, 1.0, 0.0]], atol=1e-6)
    assert bool(rec.front_face[0])
    # from below: normal flips to -y, front_face False... but SetFaceNormal
    # semantics: outward +y, d.y>0 -> front_face False, normal -y
    o2 = np.array([[1.0, -3.0, 0.5]], np.float32)
    d2 = np.array([[0.0, 1.0, 0.0]], np.float32)
    hit, t, idx = isect.hit_scene(o2, d2, *prims, np.array([True]))
    rec = isect.make_hit_record(o2, d2, hit, t, idx, *prims)
    np.testing.assert_allclose(rec.normal, [[0.0, -1.0, 0.0]], atol=1e-6)
    assert not bool(rec.front_face[0])


def test_yz_rect_uv_axes():
    # YZRect: u from y (height extent), v from z (width extent)
    # (Hittable.cuh:251-277)
    center = np.array([[0.0, 1.0, 2.0]], np.float32)
    prims = (np.array([3], np.int32), center, np.array([[6.0, 4.0]], np.float32))
    # width=6 (z extent), height=4 (y extent)
    o = np.array([[5.0, 2.0, 3.5]], np.float32)  # y=2 -> u=(2-(-1))/4=0.75; z=3.5 -> v=(3.5-(-1))/6=0.75
    d = np.array([[-1.0, 0.0, 0.0]], np.float32)
    hit, t, idx = isect.hit_scene(o, d, *prims, np.array([True]))
    rec = isect.make_hit_record(o, d, hit, t, idx, *prims)
    assert bool(hit[0])
    np.testing.assert_allclose(rec.u, [0.75], atol=1e-5)
    np.testing.assert_allclose(rec.v, [0.75], atol=1e-5)
