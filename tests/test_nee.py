"""Importance-sampled light transport (RTOW book 3) — BEYOND-REFERENCE.

``nee=True`` (ops/sampling.py, models/renderer.py) switches lambertian
scatters to the book-3 estimator: TRUE-cosine sampling mixed with light
solid-angle sampling, throughput weighted scattering_pdf / mixture_pdf.
The CUDA reference has no PDFs (its lambertian is the book-1
normal+in_unit_sphere approximation, kept as the parity default), so
the ground truth here is self-consistency: the sampler and the density
must agree (the MC integral test — the linchpin of unbiasedness), the
p=0 and p=0.5 estimators must agree in the mean, and the p=0.5
estimator must converge measurably faster on light-driven scenes.
"""

import numpy as np
import pytest

from cudaraytracer_tpu.models import scenes
from cudaraytracer_tpu.models.renderer import Renderer, render_radiance
from cudaraytracer_tpu.models.scene import (DIELECTRIC, DIFFUSE_LIGHT,
                                            LAMBERTIAN, METAL, Scene)
from cudaraytracer_tpu.ops import sampling
from cudaraytracer_tpu.utils import rng as rngu


def _small_light_cornell():
    """Cornell room with a TINY bright ceiling light (0.4x0.4 at
    intensity 60): cosine sampling almost never finds it, so this is
    where the mixture estimator's advantage is unambiguous."""
    s = 5.0
    sc = Scene(capacity=32, background_start=(0, 0, 0),
               background_end=(0, 0, 0))
    sc.add_yz_rect((-s / 2, s / 2, 0.0), s, s, mat_type=LAMBERTIAN,
                   albedo=(0.65, 0.05, 0.05))
    sc.add_yz_rect((s / 2, s / 2, 0.0), s, s, mat_type=LAMBERTIAN,
                   albedo=(0.12, 0.45, 0.15))
    sc.add_xz_rect((0, 0, 0), s, s, mat_type=LAMBERTIAN,
                   albedo=(0.73, 0.73, 0.73))
    sc.add_xz_rect((0, s, 0), s, s, mat_type=LAMBERTIAN,
                   albedo=(0.73, 0.73, 0.73))
    sc.add_xy_rect((0, s / 2, -s / 2), s, s, mat_type=LAMBERTIAN,
                   albedo=(0.73, 0.73, 0.73))
    sc.add_xz_rect((0, s - 0.01, 0), 0.4, 0.4, mat_type=DIFFUSE_LIGHT,
                   light=60.0)
    return sc


def _render(sd, cam, spp, p, seed=0, W=48, H=32, D=8, **kw):
    return np.asarray(render_radiance(
        sd, cam, rngu.base_key(seed), spp, D, width=W, height=H,
        camera_model="two_plane", nee=True, nee_p=p, **kw)) / spp


def _block_err(a, ref, H=32, W=48):
    ab = a.reshape(H // 8, 8, W // 8, 8, 3).mean((1, 3))
    rb = ref.reshape(H // 8, 8, W // 8, 8, 3).mean((1, 3))
    return np.abs(ab - rb).mean()


def test_mixture_pdf_consistency_mc_integral():
    """THE unbiasedness linchpin: with tex=1 the returned attenuation is
    scattering_pdf / mixture_pdf, whose expectation under the mixture
    sampler is the integral of the cosine lobe == 1 — for a table mixing
    all three rect orientations AND a sphere light, from a point seeing
    them at oblique angles.  Any sampler/density disagreement (wrong
    axis map, wrong cone solid angle, wrong area) breaks this at the
    third decimal."""
    import jax
    import jax.numpy as jnp

    sc = Scene(capacity=16, background_start=(0, 0, 0),
               background_end=(0, 0, 0))
    sc.add_xz_rect((0.5, 3.0, 0.2), 1.2, 0.8, mat_type=DIFFUSE_LIGHT,
                   light=5.0)
    sc.add_sphere((-2.0, 1.5, 1.0), 0.5, mat_type=DIFFUSE_LIGHT,
                  light=3.0)
    sc.add_yz_rect((2.0, 1.0, 0.0), 1.0, 1.4, mat_type=DIFFUSE_LIGHT,
                   light=2.0)
    sc.add_xy_rect((0.3, 1.2, -2.0), 1.3, 0.7, mat_type=DIFFUSE_LIGHT,
                   light=2.0)
    lights = sampling.collect_lights(sc.device())
    assert float(lights[-1]) == 4.0
    R = 200000
    point = jnp.tile(jnp.asarray([[0.1, 0.0, -0.3]]), (R, 1))
    normal = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]]), (R, 1))
    for p_light, seed in ((0.5, 3), (0.8, 4)):
        _, att, _ = sampling.nee_lambertian(
            point, normal, jnp.ones((R, 3)), lights,
            jax.random.PRNGKey(seed), R, p_light)
        est = float(np.asarray(att[:, 0]).mean())
        assert abs(est - 1.0) < 0.01, (p_light, est)


def test_mixture_pdf_consistency_with_triangle_lights():
    """Triangle emitters (round 5): the same MC integral pin with a
    table mixing two oblique TRIANGLES, a rect and a sphere — the
    sqrt-barycentric area sampler and the Moller-Trumbore solid-angle
    density must agree or the cosine-lobe integral misses 1.0."""
    import jax
    import jax.numpy as jnp

    sc = Scene(capacity=16, background_start=(0, 0, 0),
               background_end=(0, 0, 0))
    sc.add_triangle((-1.0, 2.5, 0.3), (0.8, 3.1, -0.4), (0.1, 2.2, 1.1),
                    mat_type=DIFFUSE_LIGHT, light=4.0)
    sc.add_triangle((2.0, 1.0, -1.0), (2.6, 2.2, -0.2), (1.4, 1.8, 0.9),
                    mat_type=DIFFUSE_LIGHT, light=4.0)
    sc.add_xz_rect((0.5, 3.5, 0.2), 1.2, 0.8, mat_type=DIFFUSE_LIGHT,
                   light=5.0)
    sc.add_sphere((-2.0, 1.5, 1.0), 0.5, mat_type=DIFFUSE_LIGHT,
                  light=3.0)
    lights = sampling.collect_lights(sc.device())
    assert float(lights[-1]) == 4.0
    R = 200000
    point = jnp.tile(jnp.asarray([[0.1, 0.0, -0.3]]), (R, 1))
    normal = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]]), (R, 1))
    for p_light, seed in ((0.5, 3), (0.8, 4)):
        _, att, _ = sampling.nee_lambertian(
            point, normal, jnp.ones((R, 3)), lights,
            jax.random.PRNGKey(seed), R, p_light)
        est = float(np.asarray(att[:, 0]).mean())
        assert abs(est - 1.0) < 0.01, (p_light, est)


def test_degenerate_triangle_light_excluded():
    """A zero-area emissive triangle must not enter the table (its
    solid-angle pdf is undefined); a real one must."""
    sc = Scene(capacity=8)
    sc.add_triangle((0, 2, 0), (1, 2, 0), (2, 2, 0),  # collinear
                    mat_type=DIFFUSE_LIGHT, light=5.0)
    assert float(sampling.collect_lights(sc.device())[-1]) == 0.0
    assert float(sampling.pack_lights_np(sc)[0]) == 0.0
    sc.add_triangle((0, 2, 0), (1, 2, 0), (0, 2, 1),
                    mat_type=DIFFUSE_LIGHT, light=5.0)
    assert float(sampling.collect_lights(sc.device())[-1]) == 1.0
    assert float(sampling.pack_lights_np(sc)[0]) == 1.0


def test_light_table_overflow_contract():
    """12 emitters, 8 table slots: the tabled set is the stable first-8
    (top_k keeps index order on ties), and the truncated estimator stays
    UNBIASED — the p=0.5 render of the 12-light scene agrees in the mean
    with the cosine-only one (overflow lights still arrive through the
    cosine component, and the pdf averages over TABLED lights only)."""
    sc = Scene(capacity=32, background_start=(0, 0, 0),
               background_end=(0, 0, 0))
    sc.add_xz_rect((0, 0, 0), 20, 20, mat_type=LAMBERTIAN,
                   albedo=(0.6, 0.6, 0.6))
    centers = []
    for i in range(12):
        c = (-5.5 + i, 6.0, -2.0 + 0.3 * (i % 3))
        centers.append(c)
        sc.add_sphere(c, 0.4, mat_type=DIFFUSE_LIGHT, light=3.0)
    lights = sampling.collect_lights(sc.device())
    assert float(lights[-1]) == 8.0
    np.testing.assert_allclose(np.asarray(lights[1]),
                               np.asarray(centers[:8], np.float32))
    v = sampling.pack_lights_np(sc)
    assert float(v[0]) == 8.0  # host packer truncates identically
    np.testing.assert_allclose(v[2 + 1:2 + 4], centers[0])
    cam = scenes.cornell_like_camera()
    nee = _render(sc.device(), cam, 192, 0.5, seed=3)
    cos = _render(sc.device(), cam, 192, 0.0, seed=4)
    assert abs(nee.mean() - cos.mean()) < 0.015, (nee.mean(), cos.mean())


@pytest.mark.slow
def test_triangle_light_variance_reduction():
    """cornell_mesh_light (two tilted emissive TRIANGLES, the only light
    in the room): the mixture estimator's 16-spp block error vs a
    512-spp reference is several times below the cosine-only
    estimator's — mesh emitters get the importance-sampling payoff
    (round-4 fell back to cosine for them).  The free-hanging two-sided
    panel keeps some real residual variance (the ceiling hotspot above
    it), so the bounds are looser than the flush-rect scene's —
    test_triangle_sampler_matches_rect_sampler below is the tight
    apples-to-apples statement."""
    sd = scenes.cornell_mesh_light_scene().device()
    cam = scenes.cornell_like_camera()
    ref = _render(sd, cam, 512, 0.5, seed=9)
    cos16 = _render(sd, cam, 16, 0.0, seed=1)
    nee16 = _render(sd, cam, 16, 0.5, seed=1)
    e_cos, e_nee = _block_err(cos16, ref), _block_err(nee16, ref)
    assert e_nee < 0.025, e_nee  # measured 0.0170 (seed-deterministic)
    assert e_nee < 0.4 * e_cos, (e_nee, e_cos)  # measured ratio 4.0x
    assert abs(nee16.mean() - ref.mean()) < 0.015


@pytest.mark.slow
def test_triangle_sampler_matches_rect_sampler():
    """THE apples-to-apples contract: _small_light_cornell with its rect
    light replaced by two coplanar triangles covering the IDENTICAL
    0.4x0.4 area must give the mixture estimator the same error as the
    rect table does (measured 0.0042 vs 0.0041 at 16 spp — the
    triangle area sampler + MT solid-angle pdf are exactly as tight as
    the closed-form rect pair)."""
    s = 5.0
    sc = _small_light_cornell()
    sc.delete(5)  # the rect light (slot order: 5 walls then the light)
    h, a = s - 0.01, 0.2
    q = [(-a, h, -a), (a, h, -a), (a, h, a), (-a, h, a)]
    sc.add_triangle(q[0], q[1], q[2], mat_type=DIFFUSE_LIGHT, light=60.0)
    sc.add_triangle(q[0], q[2], q[3], mat_type=DIFFUSE_LIGHT, light=60.0)
    assert float(sampling.collect_lights(sc.device())[-1]) == 2.0
    cam = scenes.cornell_like_camera()
    sd_tri = sc.device()
    sd_rect = _small_light_cornell().device()
    ref_t = _render(sd_tri, cam, 512, 0.5, seed=9)
    ref_r = _render(sd_rect, cam, 512, 0.5, seed=9)
    e_tri = _block_err(_render(sd_tri, cam, 16, 0.5, seed=1), ref_t)
    e_rect = _block_err(_render(sd_rect, cam, 16, 0.5, seed=1), ref_r)
    assert e_tri < 1.3 * e_rect, (e_tri, e_rect)
    assert e_tri < 0.01, e_tri


@pytest.mark.slow
def test_nee_converges_faster_and_to_the_same_mean():
    """Small-light Cornell: at 16 spp the mixture estimator's block
    error vs a 768-spp reference is several times below the cosine-only
    estimator's (measured ~7x), and both estimate the same transport."""
    sd = _small_light_cornell().device()
    cam = scenes.cornell_like_camera()
    ref = _render(sd, cam, 768, 0.5, seed=9)
    cos16 = _render(sd, cam, 16, 0.0, seed=1)
    nee16 = _render(sd, cam, 16, 0.5, seed=1)
    e_cos, e_nee = _block_err(cos16, ref), _block_err(nee16, ref)
    assert e_nee < 0.01, e_nee
    assert e_nee < 0.5 * e_cos, (e_nee, e_cos)
    # same mean (the 16-spp cosine estimate is spiky; compare loosely)
    assert abs(nee16.mean() - ref.mean()) < 0.01


def test_no_lights_reduces_to_cosine_bit_identically():
    """With an empty light table the effective mixture weight is 0:
    p=0.5 and p=0.0 renders of a light-free scene are BIT-identical
    (the weight is scene-derived and select-gated, never sampled)."""
    sc = Scene(capacity=8, background_start=(0.4, 0.5, 0.7),
               background_end=(0.8, 0.85, 0.95))
    sc.add_xz_rect((0, 0, 0), 20, 20, mat_type=LAMBERTIAN,
                   albedo=(0.5, 0.5, 0.5))
    sc.add_sphere((0, 1, -2), 1.0, mat_type=LAMBERTIAN,
                  albedo=(0.7, 0.3, 0.3))
    sd = sc.device()
    cam = scenes.cornell_like_camera()
    a = _render(sd, cam, 4, 0.5, seed=2)
    b = _render(sd, cam, 4, 0.0, seed=2)
    assert np.abs(a - b).max() == 0.0


def test_specular_scene_unchanged_by_nee():
    """nee touches ONLY lambertian lanes: an all-specular scene renders
    BIT-identically with the estimator on and off (the extra RNG stream
    is fold_in(23) — disjoint from every existing draw)."""
    sc = Scene(capacity=8, background_start=(0, 0, 0),
               background_end=(0, 0, 0))
    sc.add_sphere((0, 5, -3), 1.5, mat_type=DIFFUSE_LIGHT, light=5.0)
    sc.add_sphere((-1, 1, -3), 1.0, mat_type=METAL,
                  albedo=(0.9, 0.8, 0.7), fuzz=0.1)
    sc.add_sphere((1.2, 1, -3), 1.0, mat_type=DIELECTRIC, ior=1.5)
    sd = sc.device()
    cam = scenes.cornell_like_camera()
    W, H, D = 48, 32, 6
    on = np.asarray(render_radiance(
        sd, cam, rngu.base_key(4), 4, D, width=W, height=H,
        camera_model="two_plane", nee=True)) / 4
    off = np.asarray(render_radiance(
        sd, cam, rngu.base_key(4), 4, D, width=W, height=H,
        camera_model="two_plane", nee=False)) / 4
    assert np.abs(on - off).max() == 0.0


def test_moving_lights_excluded_from_table():
    """A moving diffuse-light sphere must NOT enter the light table (the
    table stores the static center; sampling it would bias the
    shutter-time render) — it still lights the scene via cosine."""
    sc = Scene(capacity=8)
    sc.add_moving_sphere((0, 4, -3), (1, 4, -3), 1.0,
                         mat_type=DIFFUSE_LIGHT, light=5.0)
    sc.add_xz_rect((0, 0, 0), 10, 10, mat_type=LAMBERTIAN,
                   albedo=(0.6, 0.6, 0.6))
    lights = sampling.collect_lights(sc.device())
    assert float(lights[-1]) == 0.0
    sc.add_sphere((0, 6, 0), 0.5, mat_type=DIFFUSE_LIGHT, light=2.0)
    lights = sampling.collect_lights(sc.device())
    assert float(lights[-1]) == 1.0


@pytest.mark.slow
def test_nee_bvh_matches_brute():
    """The estimator composes with the BVH accel (hit_fn is orthogonal
    to the scatter estimator): statistically identical images."""
    from cudaraytracer_tpu.models.bvh import build_bvh, make_bvh_hit_fn

    sc = _small_light_cornell()
    sd = sc.device()
    cam = scenes.cornell_like_camera()
    brute = _render(sd, cam, 32, 0.5, seed=5)
    bvh = build_bvh(sc)
    accel = _render(sd, cam, 32, 0.5, seed=6,
                    hit_fn=make_bvh_hit_fn(bvh, sd))
    assert _block_err(accel, brute) < 0.012


def test_nee_with_media_scene_finite_and_lit():
    """Fog + lambertian + lights under the mixture estimator: medium
    lanes keep their phase sampler (book 3 leaves non-diffuse lobes
    alone), the render stays finite and lit."""
    import test_media

    sc, cam = test_media._small_smoke()
    img = np.asarray(render_radiance(
        sc.device(), cam, rngu.base_key(), 8, 6, width=32, height=24,
        camera_model="look_at", nee=True)) / 8
    assert np.isfinite(img).all()
    assert img.mean() > 0.02


@pytest.mark.slow
def test_renderer_class_nee_mode():
    """Renderer(nee=True) is a static estimator switch (like accel):
    renders the small-light Cornell close to the reference image at a
    small spp, and scene edits still reuse the compiled callable."""
    sc = _small_light_cornell()
    sd = sc.device()
    cam = scenes.cornell_like_camera()
    r = Renderer(48, 32, nee=True)
    img16 = np.asarray(r.render(sd, cam, rngu.base_key(1), spp=16,
                                max_depth=8)) / 16
    ref = _render(sd, cam, 256, 0.5, seed=9)
    assert _block_err(img16, ref) < 0.012
    sizes = r._render._cache_size()
    sc.update(0, albedo=(0.6, 0.1, 0.1))
    np.asarray(r.render(sc.device(), cam, rngu.base_key(2), spp=2,
                        max_depth=8))
    assert r._render._cache_size() == sizes  # edits never recompile
