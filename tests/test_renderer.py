"""End-to-end renderer tests (semantics of Kernel.cu:30-158)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cudaraytracer_tpu.models import scenes
from cudaraytracer_tpu.models.camera import make_camera_params
from cudaraytracer_tpu.models.renderer import Renderer, render_radiance
from cudaraytracer_tpu.models.scene import DIFFUSE_LIGHT, LAMBERTIAN, METAL, Scene
from cudaraytracer_tpu.ops.sky import sky_color
from cudaraytracer_tpu.utils import rng as rngu


def test_empty_scene_is_exact_sky():
    scene = Scene(capacity=4)  # nothing active
    sd = scene.device()
    cam = make_camera_params()
    key = rngu.base_key()
    rad = render_radiance(sd, cam, key, 1, 8, width=16, height=16)
    rad = np.asarray(rad).reshape(-1, 3)
    # with no geometry every ray returns throughput * sky exactly
    from cudaraytracer_tpu.models.camera import generate_rays_two_plane

    skey = jax.random.fold_in(rngu.frame_key(key, 0), 0)
    k_pix, _ = jax.random.split(skey)
    _, dirn = generate_rays_two_plane(cam, 16, 16, k_pix)
    expect = np.asarray(sky_color(dirn, sd.background_start, sd.background_end))
    np.testing.assert_allclose(rad, expect, rtol=1e-5, atol=1e-6)


def test_zero_depth_is_black():
    scene = scenes.default_scene()
    sd = scene.device()
    cam = scenes.default_scene_camera()
    rad = render_radiance(sd, cam, rngu.base_key(), 1, 0, width=8, height=8)
    np.testing.assert_allclose(np.asarray(rad), 0.0)


def test_deterministic_and_key_sensitivity():
    scene = scenes.default_scene()
    sd = scene.device()
    cam = scenes.default_scene_camera()
    r = Renderer(32, 32)
    a = np.asarray(r.render(sd, cam, rngu.base_key(), spp=2, max_depth=4))
    b = np.asarray(r.render(sd, cam, rngu.base_key(), spp=2, max_depth=4))
    c = np.asarray(r.render(sd, cam, jax.random.PRNGKey(7), spp=2, max_depth=4))
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 0


def test_radiance_finite_nonnegative():
    scene = scenes.default_scene()
    sd = scene.device()
    cam = scenes.default_scene_camera()
    rad = np.asarray(
        render_radiance(sd, cam, rngu.base_key(), 2, 6, width=32, height=32)
    )
    assert np.isfinite(rad).all()
    assert (rad >= 0).all()


def test_light_illuminates_dark_scene():
    # black sky + emissive sphere above a lambertian floor: nonzero image
    scene = Scene(capacity=8, background_start=(0, 0, 0), background_end=(0, 0, 0))
    scene.add_xz_rect((0, 0, 0), 20, 20, mat_type=LAMBERTIAN, albedo=(0.8, 0.8, 0.8))
    scene.add_sphere((0, 3, 0), 1.0, mat_type=DIFFUSE_LIGHT, albedo=(1, 1, 1), light=5.0)
    sd = scene.device()
    cam = make_camera_params(origin=(0, 2, 10))
    rad = np.asarray(
        render_radiance(sd, cam, rngu.base_key(), 4, 6, width=24, height=24)
    )
    assert rad.sum() > 0
    assert np.isfinite(rad).all()


@pytest.mark.slow
def test_spp_scales_linearly_in_expectation():
    scene = scenes.default_scene()
    sd = scene.device()
    cam = scenes.default_scene_camera()
    k = rngu.base_key()
    r1 = np.asarray(render_radiance(sd, cam, k, 8, 4, width=16, height=16)) / 8
    r2 = np.asarray(render_radiance(sd, cam, k, 16, 4, width=16, height=16)) / 16
    # means should agree well since r1's samples are a subset of r2's draws
    assert abs(r1.mean() - r2.mean()) < 0.05


def test_traced_knobs_do_not_recompile():
    scene = scenes.default_scene()
    sd = scene.device()
    cam = scenes.default_scene_camera()
    r = Renderer(16, 16)
    r.render(sd, cam, rngu.base_key(), spp=1, max_depth=2).block_until_ready()
    sizes0 = r._render._cache_size()
    r.render(sd, cam, rngu.base_key(), spp=3, max_depth=9).block_until_ready()
    # scene edit: move a sphere (new arrays, same shapes)
    scene.update(scene.active_indices()[1], center=(9.0, 0.2, 0.0))
    r.render(scene.device(), cam, rngu.base_key(), spp=1, max_depth=2).block_until_ready()
    assert r._render._cache_size() == sizes0


def test_metal_floor_mirrors_sky():
    # perfect-mirror floor under gradient sky: downward rays bounce to sky,
    # so everything is sky-colored and bright
    scene = Scene(capacity=4)
    scene.add_xz_rect((0, 0, 0), 1000, 1000, mat_type=METAL, albedo=(1, 1, 1), fuzz=0.0)
    sd = scene.device()
    cam = make_camera_params(origin=(0, 2, 0))
    rad = np.asarray(
        render_radiance(sd, cam, rngu.base_key(), 2, 4, width=16, height=16)
    ) / 2
    assert rad.min() > 0.3  # sky gradient is bright everywhere


@pytest.mark.slow
def test_russian_roulette_unbiased():
    """RR from bounce 2 must preserve the radiance expectation (survivors
    are compensated by 1/p) — validated statistically on the CPU RNG."""
    scene = scenes.default_scene()
    sd = scene.device()
    cam = scenes.default_scene_camera()
    W, H, SPP, D = 24, 16, 48, 8
    base = np.asarray(
        render_radiance(sd, cam, rngu.base_key(), SPP, D, width=W, height=H)
    ) / SPP
    rr = np.asarray(
        render_radiance(sd, cam, jax.random.PRNGKey(9), SPP, D, width=W, height=H,
                        rr_start=2)
    ) / SPP
    assert np.isfinite(rr).all()
    # same expectation (different RNG streams + extra RR variance)
    np.testing.assert_allclose(rr.mean((0, 1)), base.mean((0, 1)), atol=0.05)
