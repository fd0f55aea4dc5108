"""Adaptive sampling: per-tile convergence masks in the megakernel.

Beyond-reference feature (the CUDA reference re-renders every pixel every
frame, Kernel.cu:130-148): converged tiles skip their whole wave loop
in-kernel (render_kernel.py mask gate), so progressive frame time scales
with the UNCONVERGED tile count.  Display stays a sum/count ratio over a
per-tile stopping time — consistent by Wald's identity, the same argument
as image-mode lane parking.

Interpret-mode caveat: the interpret prng is seed-insensitive (CLAUDE.md),
so per-launch means are identical across launches and every tile's
variance estimate is ~0 — tiles converge exactly at the adaptive_min
launch count.  That makes the mechanics (mask freezing, counts
bookkeeping, display divisor) fully testable here; REAL variance-ordered
convergence (noisy glass tiles outliving sky tiles) is a TPU-hardware
property, exercised by the CRT_TPU_TESTS-gated test at the bottom.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from cudaraytracer_tpu.config import RenderConfig
from cudaraytracer_tpu.viewer.app import Application


def small_cfg(**kw):
    d = dict(width=128, height=16, spp=2, max_depth=3, scene="default",
             accel="pallas", progressive=True)
    d.update(kw)
    return RenderConfig(**d)


@pytest.mark.slow
def test_tile_mask_skips_tiles_bit_identically():
    """A masked launch must render active tiles BIT-IDENTICALLY to the
    unmasked launch (per-tile seeding is mask-independent) and return
    exact zeros for skipped tiles."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from cudaraytracer_tpu.models import scenes as scn
    from cudaraytracer_tpu.ops.pallas.render_kernel import (
        pack_camera, pack_scene_tables, pallas_render_sample)

    scene = scn.default_scene()
    sd = scene.device()
    cam = scn.default_scene_camera()
    W, H = 256, 32  # tile 16x256 -> 2x1 grid: tile 0 = rows 0-15
    t = pack_scene_tables(scene)
    tabs = tuple(jnp.asarray(x) for x in (t.S, t.P, t.clusters, t.supers))
    cam_vec = pack_camera(cam, sd, W, H, 1e-3)
    kw = dict(width=W, height=H, camera_model="two_plane",
              tile_h=16, tile_w=256)
    with pltpu.force_tpu_interpret_mode():
        full = pallas_render_sample(*tabs, t.n_super, cam_vec, 7, 3, **kw)
        part = pallas_render_sample(
            *tabs, t.n_super, cam_vec, 7, 3,
            tile_mask=jnp.array([1, 0], jnp.int32), **kw)
    full = np.asarray(full)
    part = np.asarray(part)
    assert np.array_equal(full[:16], part[:16])  # active tile: identical
    assert np.abs(part[16:]).max() == 0.0  # skipped tile: exact zeros
    assert np.abs(full[16:]).max() > 0.0  # ... that would have rendered


@pytest.mark.slow
def test_tile_mask_zeroes_image_mode_counts():
    """In image-texture mode skipped tiles' done_f lands at spp; the
    wrapper must report their completed-sample counts as 0."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from cudaraytracer_tpu.models import scenes as scn
    from cudaraytracer_tpu.ops.pallas.render_kernel import (
        pack_camera, pack_scene_tables, pallas_render_sample)

    scene = scn.rtow_image_scene()
    sd = scene.device()
    cam = scn.rtow_final_camera()
    W, H = 256, 32
    t = pack_scene_tables(scene, with_uv=True)
    tabs = tuple(jnp.asarray(x) for x in (t.S, t.P, t.clusters, t.supers))
    cam_vec = pack_camera(cam, sd, W, H, 1e-3)
    with pltpu.force_tpu_interpret_mode():
        img, counts = pallas_render_sample(
            *tabs, t.n_super, cam_vec, 7, 3,
            width=W, height=H, camera_model="look_at",
            tile_h=16, tile_w=256,
            atlas=jnp.asarray(scene.atlas), tex_hw=jnp.asarray(scene.tex_hw),
            tile_mask=jnp.array([0, 1], jnp.int32))
    counts = np.asarray(counts)
    assert np.abs(counts[:16]).max() == 0.0  # skipped tile: zero counts
    assert counts[16:].min() >= 1.0  # active tile: >= 1 sample per pixel
    assert np.abs(np.asarray(img)[:16]).max() == 0.0


@pytest.mark.slow
def test_adaptive_app_converges_and_displays():
    """End-to-end: the adaptive viewer app freezes tiles after
    adaptive_min launches (interpret prng => zero variance), stops
    accumulating on frozen tiles, and displays the same image as a
    non-adaptive run of the same frames (identical per-launch renders in
    interpret mode => the ratio estimator is exact here)."""
    from jax.experimental.pallas import tpu as pltpu

    frames = 6
    amin = 3
    cfg = small_cfg(adaptive=True, adaptive_min=amin, adaptive_tau=0.05,
                    progressive_spp=1)
    app = Application(cfg)
    with pltpu.force_tpu_interpret_mode():
        rl = app.setup_default_layers()
        assert rl._pallas is not None and rl._pallas.adaptive
        app.run(max_frames=frames)
        adaptive_img = rl.display_float()
        counts = np.asarray(rl._counts)
        frac = rl._pallas.active_fraction()
    app.close()

    # interpret-mode prng is launch-insensitive => every tile converges
    # exactly at the adaptive_min-th launch and the mask empties
    assert frac == 0.0
    # counts per pixel = launches-while-active * spp = adaptive_min * 1
    assert counts.min() == amin and counts.max() == amin

    cfg2 = small_cfg(adaptive=False, progressive_spp=1)
    app2 = Application(cfg2)
    with pltpu.force_tpu_interpret_mode():
        rl2 = app2.setup_default_layers()
        app2.run(max_frames=frames)
        plain_img = rl2.display_float()
    app2.close()
    # same seed schedule + mean-of-identical-launches => identical display
    assert np.allclose(adaptive_img, plain_img, atol=1e-5)


def test_adaptive_reset_on_camera_move():
    """A camera bump must re-activate every tile and restart the stats."""
    from jax.experimental.pallas import tpu as pltpu

    cfg = small_cfg(adaptive=True, adaptive_min=2, progressive_spp=1)
    app = Application(cfg)
    with pltpu.force_tpu_interpret_mode():
        rl = app.setup_default_layers()
        app.run(max_frames=4)
        assert rl._pallas.active_fraction() == 0.0  # all frozen
        rl.fly.process_keys(["w"])  # camera move bumps fly.version
        app.run(max_frames=1)
        assert rl._pallas.active_fraction() == 1.0  # reset re-activated
        assert float(np.asarray(rl._counts).max()) == 1.0
    app.close()


@pytest.mark.skipif(not os.environ.get("CRT_TPU_TESTS"),
                    reason="real-TPU adaptive ordering (CRT_TPU_TESTS=1)")
def test_adaptive_variance_ordering_tpu():
    """On hardware (real per-launch randomness): low-variance sky tiles
    must converge before high-variance geometry tiles, and the adaptive
    display must match a fixed-spp render statistically.  Runs in a
    subprocess to keep this process off the TPU."""
    code = r"""
import numpy as np
from cudaraytracer_tpu.config import RenderConfig
from cudaraytracer_tpu.viewer.app import Application

# 256x128 = 8 row-tiles: the top tiles are pure sky (low variance, display
# stderr sub-level quickly), the horizon tiles carry sphere edges + RR
# fireflies (slow).  Convergence must differentiate them.
cfg = RenderConfig(width=256, height=128, max_depth=6, scene="rtow_final",
                   camera_model="look_at", accel="pallas", progressive=True,
                   progressive_spp=2, adaptive=True, adaptive_min=4,
                   sync_every=0)
app = Application(cfg)
rl = app.setup_default_layers()
app.run(max_frames=150)
counts = np.asarray(rl._counts)
frac = rl._pallas.active_fraction()
img = rl.display_float()
app.close()

cfg2 = RenderConfig(width=256, height=128, max_depth=6, scene="rtow_final",
                    camera_model="look_at", accel="pallas", progressive=True,
                    progressive_spp=2, adaptive=False, sync_every=0)
app2 = Application(cfg2)
rl2 = app2.setup_default_layers()
app2.run(max_frames=150)
ref = rl2.display_float()
app2.close()

# tiles must differentiate: some converged early, some ran longer
assert counts.min() >= 4 * 2
spread = counts.max() / counts.min()
err = np.abs(img - ref).mean()
print(f"RESULT spread={spread:.2f} frac={frac:.3f} err={err:.4f}")
assert spread > 1.0, spread
assert err < 0.08, err
"""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=1200, env=env,
                       cwd=os.path.dirname(os.path.dirname(__file__)))
    assert r.returncode == 0, r.stdout + r.stderr
    assert "RESULT" in r.stdout


def test_adaptive_checkpoint_roundtrip(tmp_path):
    """save_state/load_state must persist the adaptive convergence state
    (tile mask, online moments, launch counts) so a resumed session
    CONTINUES convergence instead of restarting, and the SVGF variance
    plane survives (round-3 VERDICT Weak #4)."""
    from jax.experimental.pallas import tpu as pltpu

    amin = 3
    cfg = small_cfg(width=256, height=32, adaptive=True, adaptive_min=amin,
                    adaptive_tau=0.05, progressive_spp=1)
    app = Application(cfg)
    with pltpu.force_tpu_interpret_mode():
        rl = app.setup_default_layers()
        app.run(max_frames=2)  # mid-convergence: nlaunch=2 < amin
        pl = rl._pallas
        assert pl.active_fraction() == 1.0
        # freeze one tile by hand so the saved mask is non-trivial
        import jax.numpy as jnp

        pl._mask = jnp.asarray(
            np.array([1] * (pl._mask.shape[0] - 1) + [0], np.int32))
        var_before = np.asarray(pl.variance_plane())
        p = str(tmp_path / "ckpt_adaptive")
        rl.save_state(p)

        app2 = Application(small_cfg(width=256, height=32, adaptive=True,
                                     adaptive_min=amin, adaptive_tau=0.05,
                                     progressive_spp=1))
        rl2 = app2.setup_default_layers()
        rl2.load_state(p)
        pl2 = rl2._pallas
        assert pl2 is not None and pl2.adaptive
        np.testing.assert_array_equal(np.asarray(pl2._mask),
                                      np.asarray(pl._mask))
        np.testing.assert_array_equal(np.asarray(pl2._s1),
                                      np.asarray(pl._s1))
        np.testing.assert_array_equal(np.asarray(pl2._nlaunch),
                                      np.asarray(pl._nlaunch))
        # the SVGF variance plane is reproduced exactly from the moments
        np.testing.assert_allclose(np.asarray(pl2.variance_plane()),
                                   var_before, atol=0)
        frac0 = pl2.active_fraction()
        assert 0.0 < frac0 < 1.0  # partially-converged mask survived
        # resumed convergence CONTINUES: one more launch reaches amin and
        # the remaining active tiles freeze (interpret prng => converge
        # exactly at adaptive_min)
        app2.run(max_frames=1)
        assert pl2.active_fraction() == 0.0
        counts = np.asarray(rl2._counts)
        # active tiles accumulated 2 launches pre-save + 1 post-resume
        assert counts.max() == amin  # NOT amin + 2 (restart would give 5)
    app.close()
    app2.close()


@pytest.mark.slow
def test_adaptive_checkpoint_backcompat(tmp_path):
    """A checkpoint saved WITHOUT adaptive keys (pre-round-4 format, or a
    non-adaptive session) must load into an adaptive session with a clean
    reset instead of raising."""
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        app = Application(small_cfg(adaptive=False))
        rl = app.setup_default_layers()
        app.run(max_frames=2)
        p = str(tmp_path / "ckpt_plain")
        rl.save_state(p)
        app.close()

        app2 = Application(small_cfg(adaptive=True, adaptive_min=2,
                                     progressive_spp=1))
        rl2 = app2.setup_default_layers()
        app2.run(max_frames=3)
        assert rl2._pallas.active_fraction() == 0.0  # dirty state...
        rl2.load_state(p)
        assert rl2._pallas.active_fraction() == 1.0  # ...reset on load
        app2.run(max_frames=1)
        app2.close()


def test_viewer_adaptive_toggle_e2e():
    """HTTP surface: the adaptive checkbox posts {"adaptive": true}; the
    server must rebuild the pipeline in adaptive mode, report the active-
    tile fraction in /state, and toggle cleanly back off."""
    import json
    import urllib.request

    from jax.experimental.pallas import tpu as pltpu

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

    cfg = small_cfg(adaptive=False, adaptive_min=2, progressive_spp=1)
    app = Application(cfg)
    with pltpu.force_tpu_interpret_mode():
        rl = app.setup_default_layers()
        app.run(max_frames=1)
        server = ViewerServer(app, port=0)
        httpd = server.start()
        port = httpd.server_address[1]
        try:
            s = json.loads(get(port, "/state"))
            assert s["options"]["adaptive"] is False
            assert s["options"]["active_tiles"] is None
            post(port, "/options", {"adaptive": True})
            app.run(max_frames=4)  # resync + converge (interpret: at min)
            s = json.loads(get(port, "/state"))
            assert s["options"]["adaptive"] is True
            assert s["options"]["active_tiles"] == 0.0  # all converged
            assert rl._pallas is not None and rl._pallas.adaptive
            post(port, "/options", {"adaptive": False})
            app.run(max_frames=1)
            s = json.loads(get(port, "/state"))
            assert s["options"]["adaptive"] is False
            assert s["options"]["active_tiles"] is None
            assert not rl._pallas.adaptive
        finally:
            server.stop()
            app.close()
