"""Golden statistical test: JAX renderer vs the scalar NumPy oracle.

Different RNG streams mean per-pixel values differ; the renderers must
agree in expectation, so we compare block-averaged images (the
pixel-statistical-match requirement of BASELINE.json's north star).
"""

import numpy as np
import pytest

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


@pytest.mark.slow
def test_mesh_scene_matches_oracle():
    """Triangle meshes against the scalar golden model: a smooth-shaded
    lambertian icosphere and a flat metal tetrahedron over the ground,
    rendered through the look_at camera — block means must agree with the
    oracle's scalar Möller–Trumbore + interpolated-normal path."""
    from cudaraytracer_tpu.models.camera import make_camera_params
    from cudaraytracer_tpu.models.scene import LAMBERTIAN, METAL, Scene
    from cudaraytracer_tpu.utils import mesh

    W, H, SPP, DEPTH = 24, 16, 16, 5
    sc = Scene(capacity=64)
    sc.add_xz_rect((0, -0.5, 0), 30.0, 30.0, mat_type=LAMBERTIAN,
                   albedo=(0.5, 0.5, 0.5))
    v, f = mesh.icosphere(0)  # 20 coarse faces: smooth shading is visible
    sc.add_mesh(mesh.transformed(v, scale=0.55, translate=(-0.7, 0.1, -2.0)),
                f, normals=v, mat_type=LAMBERTIAN, albedo=(0.8, 0.3, 0.25))
    tet = np.array([(0, 0, 0), (1, 0, 0), (0.5, 1.0, 0.3), (0.4, 0.1, 1.0)],
                   np.float32)
    tf = np.array([(0, 1, 2), (0, 3, 1), (0, 2, 3), (1, 3, 2)], np.int64)
    sc.add_mesh(mesh.transformed(tet, scale=0.9, translate=(0.5, -0.4, -2.2)),
                tf, mat_type=METAL, albedo=(0.8, 0.8, 0.6), fuzz=0.1)

    origin, forward, fov = (0.0, 0.6, 0.9), (0.0, -0.25, -1.0), 55.0
    gold = oracle.render_look_at(sc, origin, forward, W, H, SPP, DEPTH,
                                 seed=9, fov_deg=fov)
    cam = make_camera_params(origin=origin, forward=forward, fov_deg=fov)
    ours = np.asarray(
        render_radiance(sc.device(), cam, rngu.base_key(), SPP * 2, DEPTH,
                        width=W, height=H, camera_model="look_at")
    ) / (SPP * 2)

    np.testing.assert_allclose(ours.mean((0, 1)), gold.mean((0, 1)), atol=0.04)
    blk_g = gold.reshape(H // 4, 4, W // 4, 4, 3).mean((1, 3))
    blk_o = ours.reshape(H // 4, 4, W // 4, 4, 3).mean((1, 3))
    err = np.abs(blk_g - blk_o)
    assert err.mean() < 0.05, f"mean block error {err.mean()}"
    assert err.max() < 0.35, f"max block error {err.max()}"

    # the smooth icosphere really shades smoothly in the ORACLE too:
    # flat-normal variant differs visibly (guards the oracle's own path)
    sc_flat = Scene(capacity=64)
    sc_flat.add_xz_rect((0, -0.5, 0), 30.0, 30.0, mat_type=LAMBERTIAN,
                        albedo=(0.5, 0.5, 0.5))
    sc_flat.add_mesh(
        mesh.transformed(v, scale=0.55, translate=(-0.7, 0.1, -2.0)), f,
        mat_type=LAMBERTIAN, albedo=(0.8, 0.3, 0.25))
    gold_flat = oracle.render_look_at(sc_flat, origin, forward, W, H, SPP,
                                      DEPTH, seed=9, fov_deg=fov)
    assert np.abs(gold - gold_flat).max() > 0.05


def test_image_texture_matches_oracle_exact_interior():
    """Image textures against the ORACLE (independent of the XLA path the
    other image tests compare to): an emissive quadrant-textured rect on a
    black background terminates every path at the first hit, so interior
    pixels (where every jittered sample lands on one texel) must match the
    scalar golden model exactly."""
    from cudaraytracer_tpu.models.camera import make_camera_params
    from cudaraytracer_tpu.models.scene import DIFFUSE_LIGHT, IMAGE, Scene

    img = np.zeros((64, 64, 3), np.uint8)
    img[:32, :32] = (255, 40, 40)
    img[:32, 32:] = (40, 255, 40)
    img[32:, :32] = (40, 40, 255)
    img[32:, 32:] = (250, 250, 60)

    sc = Scene(capacity=8, background_start=(0, 0, 0),
               background_end=(0, 0, 0))
    slot = sc.load_image_texture(img)
    sc.add_xy_rect((0, 0, -2), 2.0, 2.0, mat_type=DIFFUSE_LIGHT, light=2.0,
                   tex_type=IMAGE, tex_id=slot)

    W, H, DEPTH = 32, 24, 2
    origin, forward = (0.0, 0.0, 0.0), (0.0, 0.0, -1.0)
    gold = oracle.render_look_at(sc, origin, forward, W, H, 1, DEPTH,
                                 seed=3, fov_deg=60.0)
    cam = make_camera_params(origin=origin, forward=forward, fov_deg=60.0)
    ours = np.asarray(
        render_radiance(sc.device(), cam, rngu.base_key(5), 1, DEPTH,
                        width=W, height=H, camera_model="look_at"))

    # interior mask: 3x3-constant neighborhoods in BOTH renders
    def const_mask(a):
        m = np.ones((H, W), bool)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                sh = np.roll(np.roll(a, dy, 0), dx, 1)
                m &= (np.abs(sh - a) < 1e-6).all(-1)
        m[[0, -1], :] = False
        m[:, [0, -1]] = False
        return m

    interior = const_mask(gold) & const_mask(ours)
    assert interior.sum() > H * W * 0.3
    assert np.abs(gold[interior] - ours[interior]).max() < 1e-5
    # all four quadrant colors appear in the interior
    assert len({tuple(np.round(c, 3)) for c in ours[interior]}) >= 4


@pytest.mark.slow
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


@pytest.mark.slow
def test_pallas_image_texture_matches_xla():
    """In-kernel image textures via first-hit deferral (render_kernel.py):
    a two-band image-textured sphere must render like the XLA path
    (Texture.cuh:70-109 nearest-neighbor semantics).  Interpret-mode PRNG
    is effectively single-sample, so tolerances are MC-noise loose; the
    tight comparison (block err < 0.025 at 64 spp) runs on real TPU."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from cudaraytracer_tpu.models.camera import make_camera_params
    from cudaraytracer_tpu.models.scene import IMAGE, LAMBERTIAN, Scene
    from cudaraytracer_tpu.ops.pallas.render_kernel import (
        pack_camera, pack_scene_tables, pallas_render_sample)

    scene = Scene(capacity=8)
    scene.add_xz_rect((0, -0.5, 0), 100, 100, mat_type=LAMBERTIAN,
                      albedo=(0.5, 0.5, 0.5))
    tex = np.zeros((32, 64, 3), np.uint8)
    tex[:16] = (255, 40, 40)
    tex[16:] = (40, 40, 255)
    slot = scene.load_image_texture(tex)
    scene.add_sphere((0, 1, -3), 1.2, mat_type=LAMBERTIAN,
                     tex_type=IMAGE, tex_id=slot)
    sd = scene.device()
    cam = make_camera_params(origin=(0.0, 1.5, 3.0), forward=(0.0, -0.05, -1.0))
    W, H, SPP, D = 96, 48, 8, 4
    from cudaraytracer_tpu.ops.pallas.render_kernel import P_ROWS_UV

    t = pack_scene_tables(scene, with_uv=True)
    assert t.P.shape[0] == P_ROWS_UV  # uv rows present
    tabs = tuple(jnp.asarray(x) for x in (t.S, t.P, t.clusters, t.supers))
    cam_vec = pack_camera(cam, sd, W, H, 1e-3)
    acc = 0.0
    cnt = 0.0
    with pltpu.force_tpu_interpret_mode():
        for s in range(SPP):
            img, counts = pallas_render_sample(
                *tabs, t.n_super, cam_vec, 11 + s, D,
                width=W, height=H, camera_model="look_at",
                tile_h=16, tile_w=256, atlas=sd.atlas, tex_hw=sd.tex_hw,
            )
            acc = acc + img[:H, :W]
            cnt = cnt + counts[:H, :W]
    # sum/count ratio (lanes park at their first image hit; Wald-consistent)
    pal = np.asarray(acc) / np.maximum(np.asarray(cnt), 1.0)[..., None]
    xla = np.asarray(
        render_radiance(sd, cam, rngu.base_key(), SPP * 2, D,
                        width=W, height=H, camera_model="look_at")
    ) / (SPP * 2)
    assert np.isfinite(pal).all()
    pb = pal.reshape(6, 8, 12, 8, 3).mean((1, 3))
    xb = xla.reshape(6, 8, 12, 8, 3).mean((1, 3))
    assert np.abs(pb - xb).max() < 0.2
    assert abs(pal.mean() - xla.mean()) < 0.03
    # the texture's two bands must land on the right hemispheres:
    # upper sphere region red-dominant, lower region blue-dominant
    top = pal[15:24, 42:54]
    bot = pal[28:36, 42:54]
    assert top[..., 0].mean() > top[..., 2].mean()
    assert bot[..., 2].mean() > bot[..., 0].mean()


@pytest.mark.slow
def test_pallas_two_image_hits_one_path_exact():
    """ADVERSARIAL two-image-hit case (round-2 verdict Missing #2): an
    image-textured MIRROR (fuzz 0) reflecting onto an image-textured LIGHT
    gives a path with two image-texture factors and ZERO Monte-Carlo
    randomness — radiance = texA(u1,v1) * intensity * texB(u2,v2) exactly.
    The two-record deferral (render_kernel.py) must match the XLA renderer
    (exact per-hit sampling, Texture.cuh:83-105) to float tolerance; the
    old single-record kernel would have used texB's MEAN COLOR here."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from cudaraytracer_tpu.models.camera import make_camera_params
    from cudaraytracer_tpu.models.scene import (
        DIFFUSE_LIGHT, IMAGE, METAL, Scene)
    from cudaraytracer_tpu.ops.pallas.render_kernel import (
        pack_camera, pack_scene_tables, pallas_render_sample)

    scene = Scene(capacity=8, background_start=(0, 0, 0),
                  background_end=(0, 0, 0))
    # mirror texture: left half orange, right half cyan — NOT its mean
    texa = np.zeros((16, 32, 3), np.uint8)
    texa[:, :16] = (255, 128, 0)
    texa[:, 16:] = (0, 128, 255)
    sa = scene.load_image_texture(texa)
    # light texture: top green, bottom magenta — NOT its mean either
    texb = np.zeros((16, 32, 3), np.uint8)
    texb[:8] = (255, 0, 255)   # image rows 0.. = v near 1 (texture TOP)
    texb[8:] = (0, 255, 0)
    sb = scene.load_image_texture(texb)
    scene.add_xy_rect((0, 1, -2), 6, 6, mat_type=METAL, fuzz=0.0,
                      tex_type=IMAGE, tex_id=sa)
    scene.add_xy_rect((0, 1, 2), 20, 20, mat_type=DIFFUSE_LIGHT, light=2.0,
                      tex_type=IMAGE, tex_id=sb)
    sd = scene.device()
    cam = make_camera_params(origin=(0.0, 1.0, 0.0), forward=(0.0, 0.0, -1.0))
    W, H, D = 128, 16, 3
    t = pack_scene_tables(scene, with_uv=True)
    tabs = tuple(jnp.asarray(x) for x in (t.S, t.P, t.clusters, t.supers))
    cam_vec = pack_camera(cam, sd, W, H, 1e-3)
    with pltpu.force_tpu_interpret_mode():
        img, counts = pallas_render_sample(
            *tabs, t.n_super, cam_vec, 3, D,
            width=W, height=H, camera_model="look_at",
            tile_h=16, tile_w=128, atlas=sd.atlas, tex_hw=sd.tex_hw,
        )
    pal = np.asarray(img)[:H, :W] / np.maximum(
        np.asarray(counts)[:H, :W], 1.0)[..., None]
    xla = np.asarray(
        render_radiance(sd, cam, rngu.base_key(), 1, D,
                        width=W, height=H, camera_model="look_at"))
    assert np.isfinite(pal).all()
    # the path is deterministic (mirror fuzz 0, light terminates) but the
    # SUBPIXEL jitter differs between the two RNGs, so pixels straddling a
    # geometry or texel edge flip either way: compare away from xla's
    # discontinuities (3x3 local spread < 1e-2)
    from scipy.ndimage import maximum_filter, minimum_filter
    spread = (maximum_filter(xla, size=(3, 3, 1))
              - minimum_filter(xla, size=(3, 3, 1))).max(-1)
    smooth = spread < 1e-2
    assert smooth.mean() > 0.8  # the mask keeps the bulk of the image
    err = np.abs(pal - xla).max(-1)
    assert err[smooth].max() < 1e-4, (
        f"max interior err {err[smooth].max()} (mean-color leak?)")
    # sanity: the product structure is visible — the mirror's right half
    # (cyan texel) kills red while the light's lower half (green texel)
    # lights it, and the old mean-color kernel could produce neither
    assert pal.max() > 0.5  # the light does illuminate the mirror
    assert (pal[:, :, 1] > 0.9).any()  # texA.g * 2 * texB.g == 1.004 region


@pytest.mark.slow
def test_pallas_two_samples_one_image_hit_each():
    """Cross-sample use of the second deferral record: with spp=2 batched
    in ONE launch, a lane whose first sample consumed record 1 must run its
    SECOND sample through record 2 (unchained: texel2 only), completing
    counts=2 — the old kernel parked at counts=1.  Camera stares at an
    image-textured light: both samples are the same deterministic one-hit
    path, so sum/count equals intensity * texel exactly."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from cudaraytracer_tpu.models.camera import make_camera_params
    from cudaraytracer_tpu.models.scene import DIFFUSE_LIGHT, IMAGE, Scene
    from cudaraytracer_tpu.ops.pallas.render_kernel import (
        pack_camera, pack_scene_tables, pallas_render_sample)

    scene = Scene(capacity=4, background_start=(0, 0, 0),
                  background_end=(0, 0, 0))
    tex = np.zeros((16, 32, 3), np.uint8)
    tex[:, :16] = (200, 60, 20)
    tex[:, 16:] = (20, 60, 200)
    slot = scene.load_image_texture(tex)
    scene.add_xy_rect((0, 1, -2), 20, 20, mat_type=DIFFUSE_LIGHT, light=1.5,
                      tex_type=IMAGE, tex_id=slot)
    sd = scene.device()
    cam = make_camera_params(origin=(0.0, 1.0, 0.0), forward=(0.0, 0.0, -1.0))
    W, H, D = 128, 16, 3
    t = pack_scene_tables(scene, with_uv=True)
    tabs = tuple(jnp.asarray(x) for x in (t.S, t.P, t.clusters, t.supers))
    cam_vec = pack_camera(cam, sd, W, H, 1e-3)
    with pltpu.force_tpu_interpret_mode():
        img, counts = pallas_render_sample(
            *tabs, t.n_super, cam_vec, 5, D,
            width=W, height=H, camera_model="look_at",
            tile_h=16, tile_w=128, spp=2, atlas=sd.atlas, tex_hw=sd.tex_hw,
        )
    img = np.asarray(img)[:H, :W]
    counts = np.asarray(counts)[:H, :W]
    # both samples completed: record 2 extends occupancy past the old
    # park-at-first-image-hit behavior
    assert counts.min() == 2 and counts.max() == 2
    pal = img / counts[..., None]
    xla = np.asarray(
        render_radiance(sd, cam, rngu.base_key(), 1, D,
                        width=W, height=H, camera_model="look_at"))
    assert np.abs(pal - xla).max() < 1e-4


def test_look_at_camera_geometry():
    """Geometric golden test for the look_at camera (camera.py:90-116):
    a bright sphere at a known world position must project to the pixel
    predicted by independent pinhole math (s = 0.5 + x/(2 d tan(fov/2) a),
    t = 0.5 + y/(2 d tan(fov/2)); row 0 is the image top for look_at)."""
    import math

    from cudaraytracer_tpu.models.camera import make_camera_params
    from cudaraytracer_tpu.models.scene import DIFFUSE_LIGHT, Scene

    W, H, FOV = 64, 32, 60.0
    P = (2.0, 1.0, -10.0)
    scene = Scene(capacity=4, background_start=(0, 0, 0),
                  background_end=(0, 0, 0))
    scene.add_sphere(P, 0.4, mat_type=DIFFUSE_LIGHT, albedo=(1, 1, 1),
                     light=5.0)
    sd = scene.device()
    cam = make_camera_params(origin=(0.0, 0.0, 0.0), forward=(0.0, 0.0, -1.0),
                             fov_deg=FOV)
    img = np.asarray(
        render_radiance(sd, cam, rngu.base_key(), 8, 2, width=W, height=H,
                        camera_model="look_at")
    )
    half_h = math.tan(math.radians(FOV) / 2.0)
    half_w = (W / H) * half_h
    d = -P[2]
    s = 0.5 + P[0] / (2.0 * d * half_w)
    t = 0.5 + P[1] / (2.0 * d * half_h)
    exp_x = s * W
    exp_y = H - t * H  # look_at renders row 0 at the image top
    bright = img.sum(-1)
    cy, cx = np.unravel_index(np.argmax(bright), bright.shape)
    assert abs(cx - exp_x) <= 2.0, (cx, exp_x)
    assert abs(cy - exp_y) <= 2.0, (cy, exp_y)


@pytest.mark.slow
def test_pallas_negative_radius_hollow_glass():
    """Negative radii flip the normal inward ((p-c)/r with SIGNED r,
    Hittable.cuh:96) — the RTOW hollow-glass idiom.  The megakernel must
    agree with the XLA path, which divides by the signed radius."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from cudaraytracer_tpu.models.camera import make_camera_params
    from cudaraytracer_tpu.models.scene import DIELECTRIC, LAMBERTIAN, Scene
    from cudaraytracer_tpu.ops.pallas.render_kernel import (
        pack_camera, pack_scene_tables, pallas_render_sample)

    scene = Scene(capacity=8)
    scene.add_xz_rect((0, -0.5, 0), 100, 100, mat_type=LAMBERTIAN,
                      albedo=(0.8, 0.3, 0.3))
    scene.add_sphere((0, 0.5, -2.5), 0.9, mat_type=DIELECTRIC, ior=1.5)
    scene.add_sphere((0, 0.5, -2.5), -0.8, mat_type=DIELECTRIC, ior=1.5)
    sd = scene.device()
    cam = make_camera_params(origin=(0.0, 0.6, 1.0), forward=(0.0, 0.0, -1.0))
    W, H, SPP, D = 96, 48, 8, 8
    t = pack_scene_tables(scene)
    tabs = tuple(jnp.asarray(x) for x in (t.S, t.P, t.clusters, t.supers))
    cam_vec = pack_camera(cam, sd, W, H, 1e-3)
    acc = 0.0
    with pltpu.force_tpu_interpret_mode():
        for s in range(SPP):
            acc = acc + pallas_render_sample(
                *tabs, t.n_super, cam_vec, 3 + s, D,
                width=W, height=H, camera_model="look_at",
                tile_h=16, tile_w=256,
            )[:H, :W]
    pal = np.asarray(acc) / SPP
    xla = np.asarray(
        render_radiance(sd, cam, rngu.base_key(), SPP * 2, D,
                        width=W, height=H, camera_model="look_at")
    ) / (SPP * 2)
    assert np.isfinite(pal).all()
    pb = pal.reshape(6, 8, 12, 8, 3).mean((1, 3))
    xb = xla.reshape(6, 8, 12, 8, 3).mean((1, 3))
    assert np.abs(pb - xb).max() < 0.25
    assert abs(pal.mean() - xla.mean()) < 0.03


@pytest.mark.slow
def test_pallas_rect_image_uv_matches_xla():
    """Rect image-texture UV (axis selection by prim type, Hittable.cuh:
    128-294) in the megakernel's deferred path must match the XLA sampler:
    a half-green/half-magenta XY rect keeps its halves on the right sides."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from cudaraytracer_tpu.models.camera import make_camera_params
    from cudaraytracer_tpu.models.scene import IMAGE, LAMBERTIAN, Scene
    from cudaraytracer_tpu.ops.pallas.render_kernel import (
        pack_camera, pack_scene_tables, pallas_render_sample)

    scene = Scene(capacity=8, background_start=(0.1, 0.1, 0.1),
                  background_end=(0.1, 0.1, 0.1))
    tex = np.zeros((16, 32, 3), np.uint8)
    tex[:, :16] = (40, 220, 40)
    tex[:, 16:] = (220, 40, 220)
    slot = scene.load_image_texture(tex)
    scene.add_xy_rect((0, 1, -4), 4, 2, mat_type=LAMBERTIAN,
                      tex_type=IMAGE, tex_id=slot)
    sd = scene.device()
    cam = make_camera_params(origin=(0.0, 1.0, 0.0), forward=(0.0, 0.0, -1.0))
    W, H, SPP, D = 96, 48, 4, 2
    t = pack_scene_tables(scene, with_uv=True)
    tabs = tuple(jnp.asarray(x) for x in (t.S, t.P, t.clusters, t.supers))
    cam_vec = pack_camera(cam, sd, W, H, 1e-3)
    acc = 0.0
    cnt = 0.0
    with pltpu.force_tpu_interpret_mode():
        for s in range(SPP):
            img, counts = pallas_render_sample(
                *tabs, t.n_super, cam_vec, 5 + s, D,
                width=W, height=H, camera_model="look_at",
                tile_h=16, tile_w=256, atlas=sd.atlas, tex_hw=sd.tex_hw,
            )
            acc = acc + img[:H, :W]
            cnt = cnt + counts[:H, :W]
    pal = np.asarray(acc) / np.maximum(np.asarray(cnt), 1.0)[..., None]
    xla = np.asarray(
        render_radiance(sd, cam, rngu.base_key(), SPP * 2, D,
                        width=W, height=H, camera_model="look_at")
    ) / (SPP * 2)
    pb = pal.reshape(6, 8, 12, 8, 3).mean((1, 3))
    xb = xla.reshape(6, 8, 12, 8, 3).mean((1, 3))
    assert np.abs(pb - xb).max() < 0.1
    lp, rp = pal[20:28, 30:44], pal[20:28, 52:66]
    assert lp[..., 1].mean() > lp[..., 0].mean()  # left: green dominant
    assert rp[..., 0].mean() > rp[..., 1].mean()  # right: magenta dominant


@pytest.mark.slow
def test_cluster_super_parameterization_invariance():
    """Tables packed and rendered with any (cluster, super) geometry must
    produce bit-identical images (culling geometry never affects hit
    results), and the native packer must agree with NumPy at non-default
    geometries (round-3 scene-size-adaptive plumbing)."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from cudaraytracer_tpu.ops.pallas.render_kernel import (
        pack_camera, pack_scene_tables, pallas_render_sample)

    scene = scenes.default_scene()
    sd = scene.device()
    W, H = 128, 16
    cam_vec = pack_camera(scenes.default_scene_camera(), sd, W, H, 1e-3)
    outs = []
    for (c, s) in [(28, 4), (20, 2), (12, 8)]:
        t = pack_scene_tables(scene, cluster=c, super_=s)
        assert (t.cluster, t.super_) == (c, s)
        tn = pack_scene_tables(scene, force_numpy=True, cluster=c, super_=s)
        for a, b in zip(t[:4], tn[:4]):
            assert a.shape == b.shape and np.array_equal(a, b)
        tabs = tuple(jnp.asarray(x) for x in (t.S, t.P, t.clusters, t.supers))
        with pltpu.force_tpu_interpret_mode():
            img = pallas_render_sample(
                *tabs, t.n_super, cam_vec, 7, 4,
                width=W, height=H, camera_model="two_plane",
                tile_h=16, tile_w=128, cluster=t.cluster, super_=t.super_)
        outs.append(np.asarray(img))
    assert np.array_equal(outs[0], outs[1])
    assert np.array_equal(outs[0], outs[2])


@pytest.mark.slow
def test_random_feature_scenes_packing_invariance():
    """Fuzz: random scenes mixing EVERY feature class — spheres, rects,
    triangle meshes (flat / smooth / uv-mapped), all four materials —
    must render bit-identically across packing geometries (cluster/super)
    and the octant-split knob, and the native packer must agree with
    NumPy column-for-column.  Mixed clusters on vattr scenes are exactly
    where the carry_uv search threads junk (u, v) for non-triangle
    winners; any masking bug shows up here as a pixel diff."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from cudaraytracer_tpu.models.camera import make_camera_params
    from cudaraytracer_tpu.models.scene import (
        DIELECTRIC, DIFFUSE_LIGHT, LAMBERTIAN, METAL, Scene)
    from cudaraytracer_tpu.ops.pallas.render_kernel import (
        pack_camera, pack_scene_tables, pallas_render_sample)
    from cudaraytracer_tpu.utils import mesh

    W, H = 128, 16
    for seed in (3, 11):
        rng = np.random.RandomState(seed)
        sc = Scene(capacity=256)
        sc.add_xz_rect((0, -0.5, 0), 40.0, 40.0, mat_type=LAMBERTIAN,
                       albedo=(0.5, 0.5, 0.5))
        for _ in range(rng.randint(4, 10)):
            c = rng.uniform(-3, 3, 3) * (1, 0.4, 1) + (0, 0.3, -3)
            mat = int(rng.randint(0, 4))
            kw = dict(mat_type=mat, albedo=tuple(rng.uniform(0.2, 0.9, 3)))
            if mat == METAL:
                kw["fuzz"] = float(rng.uniform(0, 0.5))
            elif mat == DIELECTRIC:
                kw["ior"] = float(rng.uniform(1.2, 2.0))
            elif mat == DIFFUSE_LIGHT:
                kw["light"] = float(rng.uniform(1.0, 3.0))
            if rng.rand() < 0.5:
                sc.add_sphere(c, float(rng.uniform(0.2, 0.7)), **kw)
            else:
                add = [sc.add_xy_rect, sc.add_xz_rect, sc.add_yz_rect][
                    rng.randint(0, 3)]
                add(c, float(rng.uniform(0.5, 1.5)),
                    float(rng.uniform(0.5, 1.5)), **kw)
        v, f = mesh.icosphere(1)
        mkw = {}
        if seed % 2:  # per-vertex attrs on one of the fuzz scenes
            theta = np.arccos(np.clip(-v[:, 1], -1, 1))
            phi = np.arctan2(-v[:, 2], v[:, 0]) + np.pi
            mkw = dict(uvs=np.stack([phi / (2 * np.pi), theta / np.pi],
                                    1).astype(np.float32), normals=v)
        sc.add_mesh(mesh.transformed(v, scale=0.6, translate=(0, 0.2, -2.2)),
                    f, mat_type=METAL, albedo=(0.8, 0.8, 0.7), fuzz=0.05,
                    **mkw)
        sd = sc.device()
        cam = make_camera_params(origin=(0, 1.0, 2.0),
                                 forward=(0, -0.25, -1))
        cam_vec = pack_camera(cam, sd, W, H, 1e-3)
        has_vattrs = sc.has_vertex_attrs
        outs = []
        for (c, s, octant) in [(28, 4, False), (12, 8, False), (28, 4, True)]:
            t = pack_scene_tables(sc, cluster=c, super_=s)
            tn = pack_scene_tables(sc, force_numpy=True, cluster=c, super_=s)
            for a, b in zip(t[:4], tn[:4]):
                assert np.array_equal(a, b), (seed, c, s)
            assert t.vattrs == has_vattrs
            tabs = tuple(jnp.asarray(x) for x in (t.S, t.P, t.clusters,
                                                  t.supers))
            with pltpu.force_tpu_interpret_mode():
                img = pallas_render_sample(
                    *tabs, t.n_super, cam_vec, 7, 4,
                    width=W, height=H, camera_model="look_at",
                    tile_h=16, tile_w=128, cluster=c, super_=s,
                    octant_split=octant, has_tris=True,
                    has_vattrs=has_vattrs)
            outs.append(np.asarray(img))
        assert np.isfinite(outs[0]).all() and outs[0].sum() > 0, seed
        assert np.array_equal(outs[0], outs[1]), seed
        assert np.array_equal(outs[0], outs[2]), seed


@pytest.mark.slow
def test_octant_split_bit_identical():
    """The octant-split search probe (round-3 verdict Next #8) must be a
    pure perf knob: partitioning lanes by direction sign and searching per
    bucket cannot change any closest hit, so images are bit-identical."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from cudaraytracer_tpu.ops.pallas.render_kernel import (
        pack_camera, pack_scene_tables, pallas_render_sample)

    scene = scenes.default_scene()
    sd = scene.device()
    W, H = 128, 16
    cam_vec = pack_camera(scenes.default_scene_camera(), sd, W, H, 1e-3)
    t = pack_scene_tables(scene)
    tabs = tuple(jnp.asarray(x) for x in (t.S, t.P, t.clusters, t.supers))
    outs = []
    for octant in (False, True):
        with pltpu.force_tpu_interpret_mode():
            img = pallas_render_sample(
                *tabs, t.n_super, cam_vec, 7, 4,
                width=W, height=H, camera_model="two_plane",
                tile_h=16, tile_w=128, cluster=t.cluster, super_=t.super_,
                octant_split=octant)
        outs.append(np.asarray(img))
    assert np.array_equal(outs[0], outs[1])


@pytest.mark.slow
def test_pallas_attrless_tri_image_exact():
    """Image textures on ATTR-LESS triangles (no per-vertex uvs) sample at
    the RAW barycentric uv in every render path — the uv map the XLA
    record carries (ops/intersect.py) — not the atlas MEAN color the
    round-3 kernel substituted (the last PARITY image gap; round-3 VERDICT
    Next #7).  Adversarial form mirrors the two-image-hit test: an
    emissive quadrant-textured triangle on black terminates every path at
    its first hit, so radiance = intensity * texel(u, v) exactly and the
    megakernel must match the XLA path to float tolerance away from
    geometry/texel edges.  The old mean-color kernel rendered this
    triangle one flat color."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from cudaraytracer_tpu.models.camera import make_camera_params
    from cudaraytracer_tpu.models.scene import DIFFUSE_LIGHT, IMAGE, Scene
    from cudaraytracer_tpu.ops.pallas.render_kernel import (
        pack_camera, pack_scene_tables, pallas_render_sample)

    tex = np.zeros((32, 32, 3), np.uint8)
    tex[:16, :16] = (255, 40, 40)
    tex[:16, 16:] = (40, 255, 40)
    tex[16:, :16] = (40, 40, 255)
    tex[16:, 16:] = (250, 250, 60)

    sc = Scene(capacity=8, background_start=(0, 0, 0),
               background_end=(0, 0, 0))
    slot = sc.load_image_texture(tex)
    v = np.array([(-3, -2, -3), (3, -2, -3), (-3, 4, -3)], np.float32)
    f = np.array([(0, 1, 2)], np.int64)
    sc.add_mesh(v, f, mat_type=DIFFUSE_LIGHT, light=2.0,
                tex_type=IMAGE, tex_id=slot)
    assert not sc.has_vertex_attrs  # the gap under test is the plain mesh
    sd = sc.device()
    cam = make_camera_params(origin=(-0.5, 0.0, 0.5), forward=(0, 0, -1),
                             fov_deg=70.0)
    W, H, D = 128, 32, 2
    t = pack_scene_tables(sc, with_uv=True)
    tabs = tuple(jnp.asarray(x) for x in (t.S, t.P, t.clusters, t.supers))
    cam_vec = pack_camera(cam, sd, W, H, 1e-3)
    with pltpu.force_tpu_interpret_mode():
        img, counts = pallas_render_sample(
            *tabs, t.n_super, cam_vec, 3, D,
            width=W, height=H, camera_model="look_at",
            tile_h=16, tile_w=128, atlas=sd.atlas, tex_hw=sd.tex_hw,
            has_tris=True,
        )
    pal = np.asarray(img)[:H, :W] / np.maximum(
        np.asarray(counts)[:H, :W], 1.0)[..., None]
    xla = np.asarray(
        render_radiance(sd, cam, rngu.base_key(), 1, D,
                        width=W, height=H, camera_model="look_at"))
    assert np.isfinite(pal).all()
    # subpixel jitter differs between the RNGs: compare away from EITHER
    # image's geometry/texel discontinuities (3x3 local spread < 1e-2;
    # unlike the two-image-hit test this scene has a free triangle
    # silhouette, where a pallas-jittered ray can hit while xla's whole
    # 3x3 neighborhood misses — so both masks are needed)
    from scipy.ndimage import maximum_filter, minimum_filter

    def spread(a):
        return (maximum_filter(a, size=(3, 3, 1))
                - minimum_filter(a, size=(3, 3, 1))).max(-1)

    smooth = (spread(xla) < 1e-2) & (spread(pal) < 1e-2)
    assert smooth.mean() > 0.5
    err = np.abs(pal - xla).max(-1)
    assert err[smooth].max() < 1e-4, (
        f"max interior err {err[smooth].max()} (mean-color leak?)")
    # the three barycentric-reachable quadrant colors appear on the lit
    # triangle (u + v <= 1 excludes the fourth): the mean-color kernel
    # could only produce ONE flat color here
    lit = pal[pal.max(-1) > 0.2]
    assert len({tuple(np.round(c, 2)) for c in lit}) >= 3


@pytest.mark.slow
def test_pallas_third_image_hit_is_exactly_quantized_atlas_mean():
    """PIN THE DOCUMENTED APPROXIMATION (PARITY.md "Known gaps"): the
    megakernel defers at most TWO image-texture factors per lane; a
    THIRD image hit on the same path shades with the atlas slot's mean
    color instead of the texel (reference samples the image at EVERY
    hit, Texture.cuh:83-105).  This test turns that prose into a tested
    contract with an adversarial deterministic 3-image-hit chain —
    floor mirror A -> ceiling mirror B -> floor image LIGHT C (each
    bounce flips only dy, so the ray advances in -z and the whole frame
    completes the chain):

      kernel(orig) == XLA(twin)  to float tolerance, where twin is the
      SAME scene with C's texture replaced by round(mean*255)/255 — the
      u8 quantization the payload's 8:8:8 albedo rows (P_PACKA) apply.

    It also measures the approximation's true cost vs the exact render
    (mean |err| ~0.76 here), which only an adversarial all-mirror chain
    reaches — rtow_image-class scenes never stack 3 image factors."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu
    from scipy.ndimage import maximum_filter, minimum_filter

    from cudaraytracer_tpu.models.camera import make_camera_params
    from cudaraytracer_tpu.models.scene import (
        DIFFUSE_LIGHT, IMAGE, METAL, Scene)
    from cudaraytracer_tpu.ops.pallas.render_kernel import (
        pack_camera, pack_scene_tables, pallas_render_sample)

    def build(third_constant_mean):
        scene = Scene(capacity=8, background_start=(0, 0, 0),
                      background_end=(0, 0, 0))
        texa = np.zeros((16, 32, 3), np.uint8)
        texa[:, :16] = (255, 128, 0)
        texa[:, 16:] = (0, 128, 255)
        sa = scene.load_image_texture(texa)
        texb = np.zeros((16, 32, 3), np.uint8)
        texb[:8] = (255, 0, 255)
        texb[8:] = (0, 255, 0)
        sb = scene.load_image_texture(texb)
        texc = np.zeros((16, 32, 3), np.uint8)
        texc[:, :16] = (255, 255, 0)
        texc[:, 16:] = (0, 64, 255)
        slot_c = scene.load_image_texture(texc)
        scene.add_xz_rect((0, 0, -4.5), 60, 4.0, mat_type=METAL, fuzz=0.0,
                          tex_type=IMAGE, tex_id=sa)
        scene.add_xz_rect((0, 4, -13.75), 60, 11.0, mat_type=METAL,
                          fuzz=0.0, tex_type=IMAGE, tex_id=sb)
        kw = dict(mat_type=DIFFUSE_LIGHT, light=2.0)
        if third_constant_mean:
            meanc = (texc.astype(np.float32) / 255.0).mean((0, 1))
            meanq = np.round(meanc * 255.0) / 255.0  # P_PACKA quantization
            scene.add_xz_rect((0, 0, -23.0), 60, 17.5,
                              albedo=tuple(meanq), **kw)
        else:
            scene.add_xz_rect((0, 0, -23.0), 60, 17.5,
                              tex_type=IMAGE, tex_id=slot_c, **kw)
        return scene

    f = np.array([0.0, -1.0, -2.0])
    f /= np.linalg.norm(f)
    cam = make_camera_params(origin=(0.0, 2.0, 0.0), forward=tuple(f),
                             fov_deg=20.0)
    W, H, D = 64, 32, 5
    orig, twin = build(False), build(True)
    x_orig = np.asarray(render_radiance(
        orig.device(), cam, rngu.base_key(), 1, D,
        width=W, height=H, camera_model="look_at"))
    x_twin = np.asarray(render_radiance(
        twin.device(), cam, rngu.base_key(), 1, D,
        width=W, height=H, camera_model="look_at"))
    sd = orig.device()
    t = pack_scene_tables(orig, with_uv=True)
    tabs = tuple(jnp.asarray(x) for x in (t.S, t.P, t.clusters, t.supers))
    cam_vec = pack_camera(cam, sd, W, H, 1e-3)
    with pltpu.force_tpu_interpret_mode():
        img, counts = pallas_render_sample(
            *tabs, t.n_super, cam_vec, t.n_super, D,
            width=W, height=H, camera_model="look_at",
            tile_h=16, tile_w=128, atlas=sd.atlas, tex_hw=sd.tex_hw,
        )
    pal = np.asarray(img)[:H, :W] / np.maximum(
        np.asarray(counts)[:H, :W], 1.0)[..., None]
    assert np.isfinite(pal).all()
    # the chain lights the bulk of the frame (geometry sanity)
    assert (x_orig.max(-1) > 0.01).mean() > 0.8
    # subpixel jitter differs between the two RNGs: compare away from
    # the twin render's discontinuities (texel/geometry edges)
    spread = (maximum_filter(x_twin, size=(3, 3, 1))
              - minimum_filter(x_twin, size=(3, 3, 1))).max(-1)
    smooth = spread < 1e-2
    assert smooth.mean() > 0.5
    err = np.abs(pal - x_twin).max(-1)
    assert err[smooth].max() < 1e-4, (
        f"third-hit contract broken: max err {err[smooth].max()}")
    # and the approximation is REAL: vs the exact reference-semantics
    # render this adversarial scene pays a large error (banked ~0.76
    # mean), i.e. the mean-color branch actually engaged above
    err_exact = np.abs(pal - x_orig).max(-1)
    assert err_exact[smooth].max() > 0.5
