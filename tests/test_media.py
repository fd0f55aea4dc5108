"""Constant-density participating media (smoke/fog) — BEYOND-REFERENCE.

The RTOW book-2 ConstantMedium analog (the CUDA reference has no
volumes): a sphere whose material is ISOTROPIC is a medium, not a
surface — rays entering it scatter isotropically at a distance sampled
from exp(-density * s).  Wired through every path: the XLA brute scan
(ops/intersect.py medium branch), the BVH accel (media live OUTSIDE the
tree, combined by closest hit), the megakernel (ptype-5 columns, kind-4
clusters, density in the S_DENS row) in BOTH table layouts, the oracle,
the scene registry ("smoke") and save/load.

Megakernel validation note: the interpret-mode PRNG is wave-insensitive
(CLAUDE.md), which CORRELATES the per-wave medium distance draws and
biases multi-scatter fog dark in interpret runs — measured on REAL v5e
the kernel matches XLA to MC noise (64 spp: mean block err 0.004, max
0.042; streamed bit-identical, run banked in BASELINE.md).  Interpret
tests below therefore check structure/identities, not tight radiance.
"""

import os

import numpy as np
import pytest

from cudaraytracer_tpu.models import scenes
from cudaraytracer_tpu.models.camera import make_camera_params
from cudaraytracer_tpu.models.renderer import render_radiance
from cudaraytracer_tpu.models.scene import (DIFFUSE_LIGHT, ISOTROPIC,
                                            LAMBERTIAN, METAL, Scene)
from cudaraytracer_tpu.utils import rng as rngu

import oracle


def _small_smoke():
    sc = Scene(capacity=16, background_start=(0.05, 0.05, 0.07),
               background_end=(0.05, 0.05, 0.07))
    sc.add_xz_rect((0, -1, 0), 40, 40, mat_type=LAMBERTIAN,
                   albedo=(0.6, 0.6, 0.6))
    sc.add_sphere((0, 5, -3), 1.6, mat_type=DIFFUSE_LIGHT, light=5.0)
    sc.add_medium_sphere((0, 1.2, -3), 1.8, density=1.0,
                         albedo=(0.85, 0.85, 0.9))
    sc.add_sphere((0, 1.0, -3), 0.6, mat_type=METAL,
                  albedo=(0.9, 0.7, 0.4), fuzz=0.05)
    cam = make_camera_params(origin=(0.0, 1.8, 5.0),
                             forward=(0.0, -0.05, -1.0), fov_deg=55.0)
    return sc, cam


@pytest.mark.slow
def test_smoke_matches_oracle():
    """Fog-light scattering + an embedded metal sphere vs the scalar
    oracle's transliterated ConstantMedium (block means)."""
    sc, cam = _small_smoke()
    W, H, SPP, D = 24, 16, 16, 8
    gold = oracle.render_look_at(sc, (0.0, 1.8, 5.0), (0.0, -0.05, -1.0),
                                 W, H, SPP, D, seed=7, fov_deg=55.0)
    ours = np.asarray(
        render_radiance(sc.device(), cam, rngu.base_key(), SPP * 2, D,
                        width=W, height=H, camera_model="look_at")
    ) / (SPP * 2)
    np.testing.assert_allclose(ours.mean((0, 1)), gold.mean((0, 1)),
                               atol=0.05)
    blk_g = gold.reshape(H // 4, 4, W // 4, 4, 3).mean((1, 3))
    blk_o = ours.reshape(H // 4, 4, W // 4, 4, 3).mean((1, 3))
    assert np.abs(blk_g - blk_o).mean() < 0.05


def test_medium_limits():
    """Physical limits pin the sampling math: a near-zero-density medium
    is EXACTLY transparent (scatter distance -> inf), and an extremely
    dense one blocks like a surface shell (background never visible
    through its silhouette)."""
    W, H = 32, 24
    cam = make_camera_params(origin=(0, 0, 3), forward=(0, 0, -1),
                             fov_deg=60.0)
    bg = np.array([0.2, 0.3, 0.5], np.float32)
    sc = Scene(capacity=4, background_start=tuple(bg),
               background_end=tuple(bg))
    sc.add_medium_sphere((0, 0, -2), 1.2, density=1e-6, albedo=(1, 0, 0))
    thin = np.asarray(render_radiance(
        sc.device(), cam, rngu.base_key(), 4, 6, width=W, height=H,
        camera_model="look_at")) / 4
    np.testing.assert_allclose(
        thin, np.broadcast_to(bg, thin.shape), atol=1e-5)

    sc2 = Scene(capacity=4, background_start=tuple(bg),
                background_end=tuple(bg))
    sc2.add_medium_sphere((0, 0, -2), 1.2, density=200.0,
                          albedo=(0.2, 0.2, 0.2))
    dense = np.asarray(render_radiance(
        sc2.device(), cam, rngu.base_key(), 8, 12, width=W, height=H,
        camera_model="look_at")) / 8
    # center pixels look straight into the dense ball: transmission is
    # ~zero, so only near-surface BACKSCATTER remains — bounded by one
    # albedo factor (0.2 * bg ~ 0.04-0.1) and far below the direct bg
    mid = dense[H // 2 - 3:H // 2 + 3, W // 2 - 3:W // 2 + 3]
    assert mid.max() < 0.12, mid.max()
    assert mid.mean() < 0.06, mid.mean()
    # corner pixels miss it: exact background
    np.testing.assert_allclose(dense[0, 0], bg, atol=1e-5)


def test_bvh_accel_matches_brute():
    """The BVH path keeps media OUT of the tree and combines a brute
    media-only pass by closest hit — statistically identical images."""
    from cudaraytracer_tpu.models.bvh import build_bvh, make_bvh_hit_fn

    sc, cam = _small_smoke()
    sd = sc.device()
    W, H, SPP, D = 24, 16, 16, 6
    brute = np.asarray(render_radiance(
        sd, cam, rngu.base_key(), SPP, D, width=W, height=H,
        camera_model="look_at")) / SPP
    bvh = build_bvh(sc)
    accel = np.asarray(render_radiance(
        sd, cam, rngu.base_key(3), SPP, D, width=W, height=H,
        camera_model="look_at",
        hit_fn=make_bvh_hit_fn(bvh, sd))) / SPP
    blk_b = brute.reshape(H // 4, 4, W // 4, 4, 3).mean((1, 3))
    blk_a = accel.reshape(H // 4, 4, W // 4, 4, 3).mean((1, 3))
    assert np.abs(blk_b - blk_a).mean() < 0.05


def _pallas_render(sc, cam, W, H, D, seed, streamed=False, spp=1,
                   force_boxm=None):
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from cudaraytracer_tpu.ops.pallas.render_kernel import (
        pack_camera_np, pack_scene_tables, pack_stream_tiles,
        pallas_render_sample)

    t = pack_scene_tables(sc)
    cam_vec = jnp.asarray(pack_camera_np(
        cam, sc.background_start, sc.background_end, W, H, 1e-3))
    # BOX-bounded media compile the slab-chord branch (STATIC flag,
    # mirroring _PallasPipeline); non-zero yaw compiles the ROTATED chord
    idx0 = sc.active_indices()
    has_boxm = bool((sc.prim_type[idx0] == 5).any())
    if force_boxm is not None:
        has_boxm = force_boxm
    has_rotm = bool(
        (sc.edge2[idx0][sc.prim_type[idx0] == 5, 0] != 0).any())
    kw = dict(width=W, height=H, camera_model="look_at", tile_h=16,
              tile_w=128, has_rects=True, cluster=t.cluster,
              super_=t.super_, has_media=True, has_boxm=has_boxm,
              has_rotm=has_rotm, spp=spp)
    with pltpu.force_tpu_interpret_mode():
        if streamed:
            st = pack_stream_tiles(t)
            stabs = tuple(jnp.asarray(x) for x in
                          (st.tiles, st.block_boxes, st.clusters, st.supers))
            return np.asarray(pallas_render_sample(
                *stabs, st.n_blocks, cam_vec, seed, D,
                stream_b=st.block_b, **kw))
        tabs = tuple(jnp.asarray(x) for x in
                     (t.S, t.P, t.clusters, t.supers))
        return np.asarray(pallas_render_sample(
            *tabs, t.n_super, cam_vec, seed, D, **kw))


@pytest.mark.slow
def test_pallas_medium_structure_and_stream_identity():
    """Interpret-mode structural checks (tight radiance runs on hardware,
    module docstring): the megakernel fog image is finite, lands in the
    right brightness class (fog glows above the dark background, the
    embedded metal sphere is NOT directly visible as a sharp silhouette),
    and the HBM-streamed layout reproduces the resident one BIT-FOR-BIT
    (the medium's per-prim uniform hashes the prim's CENTER, not its
    column index, exactly so the two layouts cannot drift)."""
    sc, cam = _small_smoke()
    W, H, D = 128, 32, 6
    a = _pallas_render(sc, cam, W, H, D, seed=3)
    b = _pallas_render(sc, cam, W, H, D, seed=3, streamed=True)
    assert np.isfinite(a).all()
    assert np.abs(a - b).max() == 0.0  # resident == streamed, exactly
    img = a[:H, :W]
    # the scene renders with real structure: light + fog glow well above
    # black, and the frame is not a constant (media actually scatter)
    assert img.mean() > 0.02
    assert img.std() > 0.02


@pytest.mark.slow
@pytest.mark.skipif(not os.environ.get("CRT_TPU_TESTS"),
                    reason="tight medium radiance needs real-TPU PRNG "
                           "(interpret draws are wave-correlated)")
def test_pallas_medium_matches_xla_tpu():
    """REAL-chip contract (banked run in BASELINE.md): 64-spp megakernel
    fog == XLA to MC noise.  Subprocess keeps this process off the TPU
    (the conftest pins the test process to CPU)."""
    import subprocess
    import sys

    code = r"""
import numpy as np, jax.numpy as jnp
import sys
sys.path.insert(0, "tests")
from test_media import _small_smoke
from cudaraytracer_tpu.models.renderer import render_radiance
from cudaraytracer_tpu.utils import rng as rngu
from cudaraytracer_tpu.ops.pallas.render_kernel import (
    pack_camera_np, pack_scene_tables, pallas_render_sample)

sc, cam = _small_smoke()
W, H, D = 128, 32, 8
t = pack_scene_tables(sc)
tabs = tuple(jnp.asarray(x) for x in (t.S, t.P, t.clusters, t.supers))
cam_vec = jnp.asarray(pack_camera_np(
    cam, sc.background_start, sc.background_end, W, H, 1e-3))
img = pallas_render_sample(
    *tabs, t.n_super, cam_vec, 7, D, spp=64, width=W, height=H,
    camera_model="look_at", tile_h=16, tile_w=128, has_rects=True,
    cluster=t.cluster, super_=t.super_, has_media=True)
pal = np.asarray(img)[:H, :W] / 64
xla = np.asarray(render_radiance(
    sc.device(), cam, rngu.base_key(), 64, D, width=W, height=H,
    camera_model="look_at")) / 64
pb = pal.reshape(H // 8, 8, W // 8, 8, 3).mean((1, 3))
xb = xla.reshape(H // 8, 8, W // 8, 8, 3).mean((1, 3))
assert np.abs(pb - xb).mean() < 0.02, np.abs(pb - xb).mean()
assert abs(pal.mean() - xla.mean()) < 0.01
print("OK")
"""
    out = subprocess.run([sys.executable, "-c", code], cwd=".",
                         capture_output=True, text=True, timeout=1200)
    assert out.returncode == 0 and "OK" in out.stdout, (
        out.stdout[-2000:], out.stderr[-2000:])


def test_gbuffer_sees_through_media():
    """Feature buffers ignore fog in BOTH G-buffer paths: depth/normal
    come from the surfaces behind it, so the denoiser's edge stopping is
    never poisoned by a stochastic fog 'surface'."""
    from jax.experimental.pallas import tpu as pltpu

    from cudaraytracer_tpu.ops.gbuffer import primary_features
    from test_gbuffer_kernel import _pallas_gb

    sc, cam = _small_smoke()
    W, H = 128, 32
    gb = primary_features(sc.device(), cam, width=W, height=H,
                          camera_model="look_at")
    d_x = np.asarray(gb.depth)
    # ground truth: the SAME scene with the fog deleted — the feature
    # buffers must be IDENTICAL (the fog boundary never registers)
    sc2, _ = _small_smoke()
    for k in sc2.active_indices():
        if int(sc2.mat_type[k]) == ISOTROPIC:
            sc2.delete(int(k))
    gb2 = primary_features(sc2.device(), cam, width=W, height=H,
                           camera_model="look_at")
    np.testing.assert_array_equal(d_x, np.asarray(gb2.depth))
    np.testing.assert_array_equal(np.asarray(gb.normal),
                                  np.asarray(gb2.normal))
    with pltpu.force_tpu_interpret_mode():
        n_p, a_p, d_p = _pallas_gb(sc, cam, "look_at", W, H)
    assert ((d_x > 0) != (d_p > 0)).mean() == 0.0
    both = (d_x > 0) & (d_p > 0)
    np.testing.assert_allclose(d_p[both], d_x[both], rtol=5e-4, atol=1e-4)


def test_media_save_load_roundtrip(tmp_path):
    """density persists through the scene document and has_media is
    restored (the static flag drives graph selection)."""
    sc, _ = _small_smoke()
    path = str(tmp_path / "smoke.json")
    sc.save(path)
    sc2 = Scene.load(path)
    i = [int(k) for k in sc2.active_indices()
         if sc2.mat_type[k] == ISOTROPIC]
    assert len(i) == 1 and float(sc2.density[i[0]]) == 1.0
    assert sc2.device().has_media


def test_viewer_smoke_scene_e2e():
    """The registered smoke scene renders through the viewer's pallas
    path (has_media compiled in) and the AOV export sees through fog."""
    from jax.experimental.pallas import tpu as pltpu

    from cudaraytracer_tpu.config import RenderConfig
    from cudaraytracer_tpu.viewer.app import Application

    cfg = RenderConfig(width=128, height=16, scene="smoke", accel="pallas",
                       progressive=True, max_depth=4,
                       camera_model="look_at")
    app = Application(cfg)
    with pltpu.force_tpu_interpret_mode():
        rl = app.setup_default_layers()
        assert rl._pallas is not None and rl._pallas.has_media
        app.run(max_frames=2)
        img = rl.framebuffer_rgba8()
        aov = rl.aov()
    app.close()
    assert img[..., :3].sum() > 0 and np.isfinite(img[..., :3]).all()
    assert np.isfinite(aov["depth"]).all()


@pytest.mark.slow
def test_media_sharded_multichip():
    """Media through the multi-chip sharded megakernel: an 8-device
    rows x samples mesh on the CPU backend (interpret kernels) renders
    the smoke scene finite and band-consistent — the volumes feature
    composes with the scaling story."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from cudaraytracer_tpu.ops.pallas.render_kernel import (
        pack_camera_np, pack_scene_tables)
    from cudaraytracer_tpu.parallel import make_mesh, render_sharded_pallas

    sc, cam = _small_smoke()
    t = pack_scene_tables(sc)
    mesh = make_mesh(n_rows=4, n_samples=2)
    W, H = 128, 64
    cam_vec = jnp.asarray(pack_camera_np(
        cam, sc.background_start, sc.background_end, W, H, 1e-3))
    tables = tuple(map(jnp.asarray, (t.S, t.P, t.clusters, t.supers)))
    with pltpu.force_tpu_interpret_mode():
        out = render_sharded_pallas(
            tables, t.n_super, cam_vec, 7, 4,
            width=W, height=H, mesh=mesh, camera_model="look_at",
            tile_h=16, tile_w=128, cluster=t.cluster, super_=t.super_,
            has_media=True)
        out.block_until_ready()
    img = np.asarray(out) / 2  # psum over 2 sample streams
    assert img.shape == (H, W, 3)
    assert np.isfinite(img).all()
    assert img.mean() > 0.02 and img.std() > 0.02
