"""Golden statistical test: JAX renderer vs the scalar NumPy oracle.

Different RNG streams mean per-pixel values differ; the renderers must
agree in expectation, so we compare block-averaged images (the
pixel-statistical-match requirement of BASELINE.json's north star).
"""

import numpy as np

from cudaraytracer_tpu.models import scenes
from cudaraytracer_tpu.models.renderer import render_radiance
from cudaraytracer_tpu.utils import rng as rngu

import oracle


def test_default_scene_matches_oracle():
    W, H, SPP, DEPTH = 24, 16, 12, 6
    scene = scenes.default_scene()
    cam_origin = (0.0, 2.0, 12.0)
    forward = (0.0, 0.0, -1.0)

    gold = oracle.render(scene, cam_origin, forward, W, H, SPP, DEPTH, seed=5)

    sd = scene.device()
    cam = scenes.default_scene_camera()
    ours = np.asarray(
        render_radiance(sd, cam, rngu.base_key(), SPP * 2, DEPTH, width=W, height=H)
    ) / (SPP * 2)

    # whole-image channel means agree
    np.testing.assert_allclose(ours.mean((0, 1)), gold.mean((0, 1)), atol=0.04)
    # 4x4 block means agree everywhere (loose: Monte-Carlo noise at this spp)
    blk_g = gold.reshape(H // 4, 4, W // 4, 4, 3).mean((1, 3))
    blk_o = ours.reshape(H // 4, 4, W // 4, 4, 3).mean((1, 3))
    err = np.abs(blk_g - blk_o)
    assert err.mean() < 0.05, f"mean block error {err.mean()}"
    assert err.max() < 0.35, f"max block error {err.max()}"


def test_emissive_scene_matches_oracle():
    from cudaraytracer_tpu.models.scene import DIFFUSE_LIGHT, LAMBERTIAN, METAL, Scene

    W, H, SPP, DEPTH = 16, 12, 16, 5
    scene = Scene(capacity=8, background_start=(0.02, 0.02, 0.02),
                  background_end=(0.02, 0.02, 0.02))
    scene.add_xz_rect((0, 0, 0), 40, 40, mat_type=LAMBERTIAN, albedo=(0.7, 0.7, 0.7))
    scene.add_sphere((0, 4, -3), 1.5, mat_type=DIFFUSE_LIGHT, albedo=(1, 1, 1), light=4.0)
    scene.add_sphere((0, 1, -3), 1.0, mat_type=METAL, albedo=(0.9, 0.9, 0.9), fuzz=0.1)

    cam_origin = (0.0, 2.0, 6.0)
    forward = (0.0, 0.0, -1.0)
    gold = oracle.render(scene, cam_origin, forward, W, H, SPP, DEPTH, seed=11)

    from cudaraytracer_tpu.models.camera import make_camera_params

    sd = scene.device()
    cam = make_camera_params(origin=cam_origin, forward=forward)
    ours = np.asarray(
        render_radiance(sd, cam, rngu.base_key(), SPP * 2, DEPTH, width=W, height=H)
    ) / (SPP * 2)

    np.testing.assert_allclose(ours.mean((0, 1)), gold.mean((0, 1)), atol=0.05)


def test_pallas_framing_at_non_tile_multiple():
    """Regression: the megakernel's camera math must use the TRUE image
    dims, not the tile-padded ones — at 96x24 (pads to 256x32) the old code
    computed s/t and aspect for the padded frame, shifting and rescaling
    the image vs the XLA paths (ADVICE r1, medium)."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from cudaraytracer_tpu.models import scenes as scn
    from cudaraytracer_tpu.ops.pallas.render_kernel import (
        pack_camera, pack_scene_tables, pallas_render_sample)

    scene = scn.default_scene()
    sd = scene.device()
    cam = scn.default_scene_camera()
    W, H, SPP, DEPTH = 96, 24, 8, 3
    t = pack_scene_tables(scene)
    tabs = tuple(jnp.asarray(x) for x in (t.S, t.P, t.clusters, t.supers))
    cam_vec = pack_camera(cam, sd, W, H, 1e-3)
    acc = 0.0
    with pltpu.force_tpu_interpret_mode():
        for s in range(SPP):
            img = pallas_render_sample(
                *tabs, t.n_super, cam_vec, 7 + s, DEPTH,
                width=W, height=H, camera_model="two_plane",
                tile_h=16, tile_w=256,
            )
            acc = acc + img[:H, :W]
    pal = np.asarray(acc) / SPP
    xla = np.asarray(
        render_radiance(sd, cam, rngu.base_key(), SPP, DEPTH,
                        width=W, height=H, camera_model="two_plane")
    ) / SPP
    # coarse block means: framing errors (scale/offset) blow these up by
    # >0.5; MC noise (interpret-mode prng is seed-insensitive, so pal is
    # effectively 1 spp) stays under ~0.25
    pb = pal.reshape(3, 8, 12, 8, 3).mean((1, 3))
    xb = xla.reshape(3, 8, 12, 8, 3).mean((1, 3))
    assert np.abs(pb - xb).max() < 0.3
    assert abs(pal.mean() - xla.mean()) < 0.02
