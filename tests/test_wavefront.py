"""Sorted-wavefront renderer tests (hit kernel in interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cudaraytracer_tpu.models import scenes
from cudaraytracer_tpu.models.renderer import render_radiance
from cudaraytracer_tpu.models.wavefront import (
    WavefrontRenderer,
    _sort_keys,
    pack_wavefront_tables,
)
from cudaraytracer_tpu.ops import intersect
from cudaraytracer_tpu.ops.pallas.hit_kernel import TILE, pallas_closest_hit
from cudaraytracer_tpu.utils import rng as rngu

RNG = np.random.RandomState(1)


def unit_rays(r):
    o = RNG.uniform(-6, 6, (r, 3)).astype(np.float32)
    d = RNG.randn(r, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


@pytest.mark.parametrize("scene_name", ["default", "cornell"])
def test_hit_kernel_matches_brute(scene_name):
    scene = scenes.SCENES[scene_name][0]()
    sd = scene.device()
    tables, ns, has_rects, _ht = pack_wavefront_tables(scene)
    o, d = unit_rays(2 * TILE)
    hit, t, col = pallas_closest_hit(
        tables.S, tables.clusters, tables.supers, ns, 2 * TILE,
        jnp.asarray(o), jnp.asarray(d), has_rects=has_rects, interpret=True,
    )
    slot = np.asarray(tables.prim_map)[np.maximum(np.asarray(col), 0)]
    bh, bt, bi = intersect.hit_scene(o, d, sd.prim_type, sd.center, sd.size, sd.active)
    bh, bt, bi = map(np.asarray, (bh, bt, bi))
    hit, t = np.asarray(hit), np.asarray(t)
    np.testing.assert_array_equal(hit, bh)
    sel = bh
    np.testing.assert_allclose(t[sel], bt[sel], rtol=2e-4, atol=1e-4)
    diff = sel & (slot != bi)
    if diff.any():  # only genuine t-ties may disagree on the winner
        np.testing.assert_allclose(t[diff], bt[diff], rtol=1e-3)


def test_hit_kernel_respects_n_alive():
    scene = scenes.default_scene()
    tables, ns, has_rects, _ht = pack_wavefront_tables(scene)
    o, d = unit_rays(2 * TILE)
    # second tile entirely past n_alive: must report no hits there
    hit, t, col = pallas_closest_hit(
        tables.S, tables.clusters, tables.supers, ns, TILE // 2,
        jnp.asarray(o), jnp.asarray(d), has_rects=has_rects, interpret=True,
    )
    hit = np.asarray(hit)
    assert not hit[TILE:].any()
    assert not hit[TILE // 2 : TILE].any()  # masked lanes within the live tile


def test_sort_keys_orders_dead_last():
    scene = scenes.default_scene()
    tables, _, _, _ = pack_wavefront_tables(scene)
    o, d = unit_rays(512)
    alive = jnp.asarray(RNG.rand(512) > 0.5)
    keys = np.asarray(_sort_keys(jnp.asarray(o), jnp.asarray(d), alive, tables))
    dead_min = keys[~np.asarray(alive)].min()
    live_max = keys[np.asarray(alive)].max()
    assert live_max < dead_min


@pytest.mark.slow
@pytest.mark.parametrize("sort", [True, False])
def test_wavefront_matches_xla_statistically(sort):
    scene = scenes.default_scene()
    sd = scene.device()
    cam = scenes.default_scene_camera()
    wr = WavefrontRenderer(scene, 48, 32, camera_model="two_plane",
                           sort=sort, interpret=True)
    img = np.asarray(wr.render(cam, rngu.base_key(), spp=4, max_depth=6)) / 4
    ref = np.asarray(
        render_radiance(sd, cam, rngu.base_key(), 4, 6, width=48, height=32)
    ) / 4
    assert np.isfinite(img).all()
    assert np.abs(img.mean((0, 1)) - ref.mean((0, 1))).max() < 0.05
    # block means agree (same algorithm, different RNG streams)
    bg = ref.reshape(8, 4, 12, 4, 3).mean((1, 3))
    bo = img.reshape(8, 4, 12, 4, 3).mean((1, 3))
    assert np.abs(bg - bo).mean() < 0.06


@pytest.mark.slow
def test_wavefront_smooth_mesh_matches_xla():
    """Vattr scenes through the wavefront path (every-accel-path claim):
    a smooth-shaded mesh renders statistically identical to the XLA
    renderer, and visibly different from its flat twin."""
    from cudaraytracer_tpu.models.camera import make_camera_params
    from cudaraytracer_tpu.models.scene import Scene
    from cudaraytracer_tpu.utils import mesh

    def build(smooth):
        sc = Scene(capacity=128)
        sc.add_sphere((0, -100.6, -1), 100.0, albedo=(0.5, 0.5, 0.5))
        v, f = mesh.icosphere(1)
        sc.add_mesh(mesh.transformed(v, scale=0.7, translate=(0, 0.05, -0.9)),
                    f, normals=v if smooth else None,
                    mat_type=1, albedo=(0.85, 0.7, 0.3), fuzz=0.0)
        return sc

    cam = make_camera_params(origin=(0, 0.3, 1.9), forward=(0, -0.1, -1))
    sc = build(True)
    wr = WavefrontRenderer(sc, 48, 32, camera_model="look_at",
                           interpret=True)
    img = np.asarray(wr.render(cam, rngu.base_key(), spp=4, max_depth=4)) / 4
    ref = np.asarray(
        render_radiance(sc.device(), cam, rngu.base_key(), 4, 4,
                        width=48, height=32, camera_model="look_at")) / 4
    assert np.isfinite(img).all()
    bg = ref.reshape(8, 4, 12, 4, 3).mean((1, 3))
    bo = img.reshape(8, 4, 12, 4, 3).mean((1, 3))
    assert np.abs(bg - bo).mean() < 0.06
    # the smooth normals are actually live in this path
    wf = WavefrontRenderer(build(False), 48, 32, camera_model="look_at",
                           interpret=True)
    flat = np.asarray(wf.render(cam, rngu.base_key(), spp=4, max_depth=4)) / 4
    assert np.abs(img - flat).max() > 0.05


def test_wavefront_image_textures():
    # the wavefront path must support IMAGE textures (the megakernel can't)
    from cudaraytracer_tpu.models.scene import IMAGE, LAMBERTIAN, Scene

    scene = Scene(capacity=8, atlas_slots=1, atlas_size=16)
    img8 = np.zeros((8, 8, 3), np.uint8)
    img8[:, :, 0] = 255  # pure red
    slot = scene.load_image_texture(img8)
    scene.add_sphere((0, 0, -3), 1.0, mat_type=LAMBERTIAN,
                     tex_type=IMAGE, tex_id=slot)
    from cudaraytracer_tpu.models.camera import make_camera_params

    cam = make_camera_params(origin=(0, 0, 2))
    wr = WavefrontRenderer(scene, 32, 32, camera_model="two_plane", interpret=True)
    out = np.asarray(wr.render(cam, rngu.base_key(), spp=4, max_depth=3)) / 4
    center = out[12:20, 12:20]
    # red texture: red channel dominates green/blue on the sphere
    assert center[..., 0].mean() > 2.5 * center[..., 1].mean()
