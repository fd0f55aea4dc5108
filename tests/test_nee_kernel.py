"""Megakernel importance sampling (has_nee) — the in-kernel mirror of
ops/sampling.py (RTOW book 3, BEYOND-REFERENCE).

The kernel redraws lambertian directions from the cosine/light mixture
using an 8-slot SMEM light table appended to the camera vector
(sampling.pack_lights_np) and weights throughput by
scattering_pdf / mixture_pdf.  Interpret-mode PRNG is wave-insensitive
(CLAUDE.md), so CPU tests check structure and identities; the tight
radiance contract vs the XLA NEE path runs on hardware under
CRT_TPU_TESTS (both implement the SAME book-3 transport, so they must
agree to MC noise — unlike the parity default, which is a different
estimator).
"""

import os

import numpy as np
import pytest

from cudaraytracer_tpu.models import scenes
from cudaraytracer_tpu.ops.sampling import LIGHT_BLOCK_LEN, pack_lights_np
from cudaraytracer_tpu.utils import rng as rngu

import test_nee


def _pallas_nee(sc, cam, W, H, D, seed, nee=True, streamed=False, spp=1,
                model="two_plane", has_tris=False):
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from cudaraytracer_tpu.ops.pallas.render_kernel import (
        pack_camera_np, pack_scene_tables, pack_stream_tiles,
        pallas_render_sample)

    t = pack_scene_tables(sc)
    cam_np = pack_camera_np(
        cam, sc.background_start, sc.background_end, W, H, 1e-3)
    if nee:
        cam_np = np.concatenate([cam_np, pack_lights_np(sc)])
    cam_vec = jnp.asarray(cam_np)
    kw = dict(width=W, height=H, camera_model=model, tile_h=16,
              tile_w=128, has_rects=True, cluster=t.cluster,
              super_=t.super_, has_nee=nee, spp=spp, has_tris=has_tris)
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


def test_pack_lights_matches_collect_lights():
    """The host packer and the in-graph table derive the SAME light set
    and parameters (axis maps, halves, radii) — the two NEE
    implementations cannot drift at the table level."""
    from cudaraytracer_tpu.ops.sampling import collect_lights

    sc = test_nee._small_light_cornell()
    sc.add_sphere((1.0, 2.0, 1.0), 0.3, mat_type=3, light=4.0)
    v = pack_lights_np(sc)
    assert v.shape == (LIGHT_BLOCK_LEN,)
    sc.add_triangle((0.0, 4.0, -1.0), (0.6, 4.2, -1.0), (0.1, 4.0, -0.3),
                    mat_type=3, light=2.0)
    v = pack_lights_np(sc)
    lt, lc, ls, le1, le2, lv, nl = collect_lights(sc.device())
    assert float(v[0]) == float(nl) == 3.0
    # slot 0 = the rect light: kax=1 (xz), halves 0.2
    b = 2
    assert v[b] == 0.0 and v[b + 10] == 1.0
    np.testing.assert_allclose(v[b + 7:b + 9], (0.2, 0.2))
    # slot 1 = the sphere light: radius 0.3
    b = 2 + 14
    assert v[b] == 1.0 and abs(v[b + 9] - 0.3) < 1e-6
    # slot 2 = the triangle light: type 2, v0 + edges
    b = 2 + 28
    assert v[b] == 2.0
    np.testing.assert_allclose(v[b + 1:b + 4], (0.0, 4.0, -1.0))
    np.testing.assert_allclose(v[b + 4:b + 7], np.asarray(le1)[2],
                               atol=1e-6)
    np.testing.assert_allclose(v[b + 7:b + 10], np.asarray(le2)[2],
                               atol=1e-6)
    # centers agree with the in-graph table (order: top_k is stable)
    np.testing.assert_allclose(v[2 + 1:2 + 4], np.asarray(lc)[0])
    np.testing.assert_allclose(v[2 + 14 + 1:2 + 14 + 4], np.asarray(lc)[1])


@pytest.mark.slow
def test_kernel_nee_structure_and_stream_identity():
    """Interpret-mode structure: the has_nee kernel renders the
    small-light Cornell finite and LIT (interpret draws are degenerate
    but light sampling still points lambertian bounces at the light —
    without nee the same interpret render is pitch black), and the
    HBM-streamed layout reproduces the resident one BIT-FOR-BIT (the
    light table rides the camera vector, identical in both layouts)."""
    sc = test_nee._small_light_cornell()
    cam = scenes.cornell_like_camera()
    W, H, D = 128, 32, 5
    a = _pallas_nee(sc, cam, W, H, D, seed=3)
    b = _pallas_nee(sc, cam, W, H, D, seed=3, streamed=True)
    assert np.isfinite(a).all()
    assert np.abs(a - b).max() == 0.0
    img = a[:H, :W]
    assert img.mean() > 0.005 and img.std() > 0.005
    off = _pallas_nee(sc, cam, W, H, D, seed=3, nee=False)[:H, :W]
    assert img.mean() > 10.0 * max(off.mean(), 1e-9)


@pytest.mark.slow
def test_kernel_nee_triangle_lights_structure():
    """Triangle emitters in the kernel table (round 5): the
    cornell_mesh_light room is lit ONLY by two tilted emissive
    triangles.  In interpret mode the nee kernel must light the room
    through its type-2 slots (nee-off is pitch black — cosine draws
    are degenerate in interpret mode), resident == streamed
    bit-for-bit, everything finite."""
    sc = scenes.cornell_mesh_light_scene()
    cam = scenes.cornell_like_camera()
    W, H, D = 128, 32, 5
    a = _pallas_nee(sc, cam, W, H, D, seed=3, has_tris=True)
    b = _pallas_nee(sc, cam, W, H, D, seed=3, streamed=True,
                    has_tris=True)
    assert np.isfinite(a).all()
    assert np.abs(a - b).max() == 0.0
    img = a[:H, :W]
    assert img.mean() > 0.005 and img.std() > 0.005
    off = _pallas_nee(sc, cam, W, H, D, seed=3, nee=False,
                      has_tris=True)[:H, :W]
    assert img.mean() > 10.0 * max(off.mean(), 1e-9)


@pytest.mark.slow
def test_kernel_nee_off_is_the_historical_graph():
    """has_nee=False with a plain 38-float camera vector traces the
    identical historical kernel (the block is statically gated): renders
    match the pre-feature output bit-for-bit across layouts."""
    sc = scenes.cornell_like_scene()
    cam = scenes.cornell_like_camera()
    W, H, D = 128, 32, 4
    a = _pallas_nee(sc, cam, W, H, D, seed=7, nee=False)
    b = _pallas_nee(sc, cam, W, H, D, seed=7, nee=False, streamed=True)
    assert np.abs(a - b).max() == 0.0


def test_viewer_pallas_nee_e2e():
    """cfg.nee with accel=pallas compiles the mixture estimator into the
    megakernel (pipeline has_nee, light table appended per frame) and
    the app renders finite frames; the G-buffer pass (no nee) still
    works for AOV/denoise."""
    from jax.experimental.pallas import tpu as pltpu

    from cudaraytracer_tpu.config import RenderConfig
    from cudaraytracer_tpu.viewer.app import Application

    cfg = RenderConfig(width=128, height=16, scene="cornell",
                       accel="pallas", progressive=True, max_depth=4,
                       nee=True)
    app = Application(cfg)
    with pltpu.force_tpu_interpret_mode():
        rl = app.setup_default_layers()
        assert rl._pallas is not None and rl._pallas.has_nee
        app.run(max_frames=2)
        img = rl.framebuffer_rgba8()
        aov = rl.aov()
    app.close()
    assert np.isfinite(img[..., :3]).all() and img[..., :3].sum() > 0
    assert np.isfinite(aov["depth"]).all()


def test_viewer_nee_toggle_e2e():
    """HTTP surface (round 5: NEE is user-visible, not a process-start
    flag): the NEE checkbox posts {"nee": true}; the server rebuilds the
    pipeline with the mixture estimator compiled in (has_nee), /state
    reports it, and it toggles cleanly back off — same static-rebuild
    lever as the adaptive toggle (test_adaptive.py)."""
    import json
    import urllib.request

    from jax.experimental.pallas import tpu as pltpu

    from cudaraytracer_tpu.config import RenderConfig
    from cudaraytracer_tpu.viewer.app import Application
    from cudaraytracer_tpu.viewer.server import ViewerServer

    def get(port, path):
        with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as r:
            return r.read()

    def post(port, path, body):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}", data=json.dumps(body).encode(),
            method="POST")
        with urllib.request.urlopen(req) as r:
            return r.read()

    cfg = RenderConfig(width=128, height=16, spp=1, max_depth=3,
                       scene="cornell", accel="pallas", progressive=True)
    app = Application(cfg)
    with pltpu.force_tpu_interpret_mode():
        rl = app.setup_default_layers()
        app.run(max_frames=1)
        assert rl._pallas is not None and not rl._pallas.has_nee
        server = ViewerServer(app, port=0)
        httpd = server.start()
        port = httpd.server_address[1]
        try:
            s = json.loads(get(port, "/state"))
            assert s["options"]["nee"] is False
            post(port, "/options", {"nee": True})
            app.run(max_frames=2)  # resync rebuilds the pipeline
            s = json.loads(get(port, "/state"))
            assert s["options"]["nee"] is True
            assert rl._pallas.has_nee
            img = rl.framebuffer_rgba8()
            assert np.isfinite(img[..., :3]).all()
            assert img[..., :3].sum() > 0
            post(port, "/options", {"nee": False})
            app.run(max_frames=1)
            s = json.loads(get(port, "/state"))
            assert s["options"]["nee"] is False
            assert not rl._pallas.has_nee
        finally:
            server.stop()
            app.close()


@pytest.mark.slow
def test_kernel_all_flags_book2_final_compiles():
    """The full megakernel static-flag matrix in ONE compile (guards the
    book2_final docstring claim against bit-rot): a scaled-down
    book2_final (3x3 ground boxes, 8 cluster spheres) carries
    has_tris + has_images + has_noise + has_media + has_motion, plus
    has_nee from the config — the app renders it finite through the
    megakernel in interpret mode."""
    from jax.experimental.pallas import tpu as pltpu

    from cudaraytracer_tpu.config import RenderConfig
    from cudaraytracer_tpu.viewer.app import Application

    sc = scenes.book2_final_scene(boxes_per_side=3, cluster_spheres=8,
                                  capacity=512)
    cfg = RenderConfig(width=128, height=16, scene="book2_final",
                       accel="pallas", progressive=True, max_depth=4,
                       camera_model="look_at", nee=True)
    app = Application(cfg)
    with pltpu.force_tpu_interpret_mode():
        rl = app.setup_default_layers(scene=sc)
        p = rl._pallas
        assert p is not None
        assert (p.has_images and p.has_noise and p.has_media
                and p.has_motion and p.has_nee)
        assert p._kcfg[3]  # has_tris
        app.run(max_frames=1)
        img = rl.framebuffer_rgba8()
    app.close()
    assert np.isfinite(img[..., :3]).all() and img[..., :3].sum() > 0


@pytest.mark.slow
def test_kernel_nee_sharded_multichip():
    """NEE through the multi-chip sharded megakernel: an 8-device mesh
    on the CPU backend renders the small-light Cornell finite and lit —
    the estimator composes with the scaling story."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from cudaraytracer_tpu.ops.pallas.render_kernel import (
        pack_camera_np, pack_scene_tables)
    from cudaraytracer_tpu.parallel import make_mesh, render_sharded_pallas

    sc = test_nee._small_light_cornell()
    cam = scenes.cornell_like_camera()
    t = pack_scene_tables(sc)
    mesh = make_mesh(n_rows=4, n_samples=2)
    W, H = 128, 64
    cam_np = np.concatenate([
        pack_camera_np(cam, sc.background_start, sc.background_end,
                       W, H, 1e-3),
        pack_lights_np(sc)])
    tables = tuple(map(jnp.asarray, (t.S, t.P, t.clusters, t.supers)))
    with pltpu.force_tpu_interpret_mode():
        out = render_sharded_pallas(
            tables, t.n_super, jnp.asarray(cam_np), 7, 4,
            width=W, height=H, mesh=mesh, camera_model="two_plane",
            tile_h=16, tile_w=128, cluster=t.cluster, super_=t.super_,
            has_nee=True)
        out.block_until_ready()
    img = np.asarray(out) / 2
    assert img.shape == (H, W, 3)
    assert np.isfinite(img).all()
    assert img.mean() > 0.005


@pytest.mark.slow
@pytest.mark.skipif(not os.environ.get("CRT_TPU_TESTS"),
                    reason="tight NEE radiance needs real-TPU PRNG "
                           "(interpret draws are wave-correlated)")
def test_kernel_nee_matches_xla_nee_tpu():
    """REAL-chip contract: the megakernel mixture estimator and the XLA
    mixture estimator implement the SAME book-3 transport — 64-spp
    renders of the small-light Cornell agree to MC noise."""
    import subprocess
    import sys

    code = r"""
import numpy as np, jax.numpy as jnp
import sys
sys.path.insert(0, "tests")
import test_nee
from cudaraytracer_tpu.models import scenes
from cudaraytracer_tpu.models.renderer import render_radiance
from cudaraytracer_tpu.utils import rng as rngu
from cudaraytracer_tpu.ops.sampling import pack_lights_np
from cudaraytracer_tpu.ops.pallas.render_kernel import (
    pack_camera_np, pack_scene_tables, pallas_render_sample)

sc = test_nee._small_light_cornell()
cam = scenes.cornell_like_camera()
W, H, D, SPP = 128, 32, 8, 64
t = pack_scene_tables(sc)
tabs = tuple(jnp.asarray(x) for x in (t.S, t.P, t.clusters, t.supers))
cam_np = np.concatenate([
    pack_camera_np(cam, sc.background_start, sc.background_end, W, H, 1e-3),
    pack_lights_np(sc)])
img = pallas_render_sample(
    *tabs, t.n_super, jnp.asarray(cam_np), 7, D, spp=SPP, width=W,
    height=H, camera_model="two_plane", tile_h=16, tile_w=128,
    has_rects=True, cluster=t.cluster, super_=t.super_, has_nee=True)
pal = np.asarray(img)[:H, :W] / SPP
xla = np.asarray(render_radiance(
    sc.device(), cam, rngu.base_key(), SPP, D, width=W, height=H,
    camera_model="two_plane", nee=True)) / SPP
pb = pal.reshape(H // 8, 8, W // 8, 8, 3).mean((1, 3))
xb = xla.reshape(H // 8, 8, W // 8, 8, 3).mean((1, 3))
assert np.abs(pb - xb).mean() < 0.015, np.abs(pb - xb).mean()
assert abs(pal.mean() - xla.mean()) < 0.008, (pal.mean(), xla.mean())
print("OK")
"""
    out = subprocess.run([sys.executable, "-c", code], cwd=".",
                         capture_output=True, text=True, timeout=1200)
    assert out.returncode == 0 and "OK" in out.stdout, (
        out.stdout[-2000:], out.stderr[-2000:])
