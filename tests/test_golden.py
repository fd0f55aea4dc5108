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
