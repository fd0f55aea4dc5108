"""BVH builder + traversal tests: BVH closest-hit must equal brute force."""

import numpy as np
import pytest

from cudaraytracer_tpu.models import scenes
from cudaraytracer_tpu.models.bvh import build_bvh, primitive_aabbs
from cudaraytracer_tpu.models.scene import Scene
from cudaraytracer_tpu.ops import intersect as isect
from cudaraytracer_tpu.ops.bvh_traverse import bvh_closest_hit

RNG = np.random.RandomState(3)


def random_rays(r=128, spread=12.0):
    o = RNG.uniform(-spread, spread, (r, 3)).astype(np.float32)
    d = RNG.randn(r, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


def assert_bvh_matches_brute(scene, rays=256):
    sd = scene.device()
    bvh = build_bvh(scene, use_native=False)
    o, d = random_rays(rays)
    bh, bt, bi = isect.hit_scene(o, d, sd.prim_type, sd.center, sd.size, sd.active)
    vh, vt, vi = bvh_closest_hit(o, d, bvh, sd.prim_type, sd.center, sd.size)
    bh, bt, bi = np.asarray(bh), np.asarray(bt), np.asarray(bi)
    vh, vt, vi = np.asarray(vh), np.asarray(vt), np.asarray(vi)
    np.testing.assert_array_equal(vh, bh)
    sel = bh
    np.testing.assert_allclose(vt[sel], bt[sel], rtol=2e-4, atol=1e-5)
    # identical winning primitive except when two prims tie in t
    diff = sel & (vi != bi)
    if diff.any():
        np.testing.assert_allclose(vt[diff], bt[diff], rtol=1e-3)


def test_bvh_matches_brute_default_scene():
    assert_bvh_matches_brute(scenes.default_scene())


def test_bvh_matches_brute_rtow_scene():
    assert_bvh_matches_brute(scenes.rtow_final_scene(capacity=512), rays=200)


def test_bvh_matches_brute_cornell():
    assert_bvh_matches_brute(scenes.cornell_like_scene())


def test_bvh_matches_brute_random_mixed():
    s = Scene(capacity=64)
    for _ in range(40):
        pt = RNG.randint(0, 4)
        c = RNG.uniform(-5, 5, 3)
        if pt == 0:
            s.add_sphere(c, RNG.uniform(0.2, 1.0))
        else:
            [s.add_xy_rect, s.add_xz_rect, s.add_yz_rect][pt - 1](
                c, RNG.uniform(0.5, 2.0), RNG.uniform(0.5, 2.0)
            )
    # deactivate a few: BVH must exclude them
    for i in list(s.active_indices())[::7]:
        s.delete(int(i))
    assert_bvh_matches_brute(s)


def test_empty_scene_bvh():
    s = Scene(capacity=8)
    bvh = build_bvh(s, use_native=False)
    o, d = random_rays(16)
    sd = s.device()
    h, t, i = bvh_closest_hit(o, d, bvh, sd.prim_type, sd.center, sd.size)
    assert not np.asarray(h).any()


def test_single_primitive_bvh():
    s = Scene(capacity=8)
    s.add_sphere((0, 0, 0), 1.0)
    assert_bvh_matches_brute(s, rays=64)


def test_skip_links_are_forward():
    scene = scenes.rtow_final_scene(capacity=512)
    bvh = build_bvh(scene, use_native=False)
    m = int(bvh.n_nodes)
    skip = np.asarray(bvh.node_skip)[:m]
    idxs = np.arange(m)
    valid = skip != -1
    assert (skip[valid] > idxs[valid]).all()
    # node count = 2 * leaves - 1 for a binary tree with 1-prim leaves
    prim = np.asarray(bvh.node_prim)[:m]
    leaves = (prim >= 0).sum()
    assert m == 2 * leaves - 1
    assert leaves == scene.num_active


def test_primitive_aabbs_sphere_and_rects():
    s = Scene(capacity=8)
    s.add_sphere((1, 2, 3), 0.5)
    s.add_xz_rect((0, -0.5, 0), 4.0, 2.0)
    bmin, bmax = primitive_aabbs(s, s.active_indices())
    np.testing.assert_allclose(bmin[0], [0.5, 1.5, 2.5])
    np.testing.assert_allclose(bmax[0], [1.5, 2.5, 3.5])
    np.testing.assert_allclose(bmin[1], [-2.0, -0.5001, -1.0], atol=1e-6)
    np.testing.assert_allclose(bmax[1], [2.0, -0.4999, 1.0], atol=1e-6)


@pytest.mark.slow
def test_renderer_with_bvh_matches_brute_statistically():
    import jax

    from cudaraytracer_tpu.models.renderer import Renderer
    from cudaraytracer_tpu.utils import rng as rngu

    scene = scenes.default_scene()
    sd = scene.device()
    cam = scenes.default_scene_camera()
    bvh = build_bvh(scene, use_native=False)
    r = Renderer(32, 32)
    key = rngu.base_key()
    a = np.asarray(r.render(sd, cam, key, spp=2, max_depth=4))
    b = np.asarray(r.render(sd, cam, key, spp=2, max_depth=4, bvh=bvh))
    # identical RNG stream + identical closest-hit -> identical images
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4)


def test_native_builder_matches_brute():
    from cudaraytracer_tpu.native import bvh_native

    if not bvh_native.available():
        import pytest

        pytest.skip("native library not built")
    scene = scenes.rtow_final_scene(capacity=512)
    sd = scene.device()
    bvh = build_bvh(scene, use_native=True)
    o, d = random_rays(200)
    bh, bt, bi = isect.hit_scene(o, d, sd.prim_type, sd.center, sd.size, sd.active)
    vh, vt, vi = bvh_closest_hit(o, d, bvh, sd.prim_type, sd.center, sd.size)
    np.testing.assert_array_equal(np.asarray(vh), np.asarray(bh))
    sel = np.asarray(bh)
    np.testing.assert_allclose(np.asarray(vt)[sel], np.asarray(bt)[sel], rtol=2e-4, atol=1e-5)
