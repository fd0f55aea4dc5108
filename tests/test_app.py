"""Application / layer / progressive-loop tests (Application.cpp:44-62,
LayerStack.cpp:14-40 semantics)."""

import numpy as np
import pytest

from cudaraytracer_tpu.config import RenderConfig
from cudaraytracer_tpu.viewer.app import Application, Layer, LayerStack, RenderLayer


def small_cfg(**kw):
    d = dict(width=32, height=24, spp=2, max_depth=3, scene="default",
             accel="brute", progressive=True)
    d.update(kw)
    return RenderConfig(**d)


def test_layer_stack_order():
    order = []

    class L(Layer):
        def __init__(self, tag):
            super().__init__(tag)
            self.tag = tag

        def on_update(self):
            order.append(self.tag)

    st = LayerStack()
    st.push_overlay(L("overlay"))
    st.push_layer(L("layer1"))
    st.push_layer(L("layer2"))
    for layer in st:
        layer.on_update()
    # layers run before overlays (LayerStack.cpp:14-27)
    assert order == ["layer1", "layer2", "overlay"]


def test_progressive_accumulation_and_reset():
    app = Application(small_cfg())
    rl = app.setup_default_layers()
    app.run(max_frames=3)
    assert rl._spp_done == 3
    img1 = rl.framebuffer_rgba8()
    assert img1.shape == (24, 32, 4) and img1.dtype == np.uint8
    # camera edit resets accumulation (reference re-renders per edit)
    rl.fly.process_keys(["w"])
    app.run(max_frames=1)
    assert rl._spp_done == 1
    # scene edit also resets
    rl.scene.add_sphere((0, 1, 0), 0.4)
    app.run(max_frames=2)
    assert rl._spp_done == 2
    app.close()


def test_pause_skips_updates():
    """The run loop must actually idle while paused (the P-key semantics,
    Window.h:24): frames stop advancing, and resume continues them."""
    import threading
    import time

    app = Application(small_cfg())
    rl = app.setup_default_layers()
    app.run(max_frames=1)  # compile + one frame
    app.paused = True
    t = threading.Thread(target=app.run, daemon=True)  # live loop, no cap
    t.start()
    time.sleep(0.6)
    assert rl._frame_index == 1  # the loop ran but rendered nothing
    app.toggle_pause()
    deadline = time.time() + 30
    while rl._frame_index == 1 and time.time() < deadline:
        time.sleep(0.05)
    assert rl._frame_index > 1  # resume renders again
    app.running = False
    t.join(timeout=10)
    assert not t.is_alive()
    app.close()


def test_non_progressive_full_spp():
    app = Application(small_cfg(progressive=False, spp=3))
    rl = app.setup_default_layers()
    app.run(max_frames=1)
    assert rl._spp_done == 3
    assert rl.metrics.rays_last_frame > 32 * 24  # bounces counted
    app.close()


def test_bvh_accel_app():
    app = Application(small_cfg(accel="bvh"))
    rl = app.setup_default_layers()
    app.run(max_frames=2)
    assert rl._bvh is not None
    img = rl.framebuffer_rgba8()
    assert img[..., :3].sum() > 0
    app.close()


def test_pallas_accel_app_interpret():
    from jax.experimental.pallas import tpu as pltpu

    app = Application(small_cfg(accel="pallas", width=128, height=16))
    with pltpu.force_tpu_interpret_mode():
        rl = app.setup_default_layers()
        app.run(max_frames=2)
    assert rl._pallas is not None
    img = rl.framebuffer_rgba8()
    assert img.shape == (16, 128, 4)
    assert img[..., :3].sum() > 0
    app.close()


def test_fly_camera_starts_at_registered_pose():
    """Every registered scene's viewer session must open at that scene's
    registered camera (previously only rtow* scenes got a pose and
    mirror_room opened BEHIND its area light)."""
    import math

    from cudaraytracer_tpu.models import scenes as scn
    from cudaraytracer_tpu.viewer.app import RenderLayer

    for name in ("cornell", "mirror_room", "rtow_final"):
        cfg = small_cfg(scene=name, camera_model="look_at")
        rl = RenderLayer(cfg)
        cam0 = scn.SCENES[name][1]()
        assert np.allclose(rl.fly.position, np.asarray(cam0.origin), atol=1e-5)
        assert abs(rl.fly.fov_deg - math.degrees(float(cam0.fov))) < 1e-3
        # orientation reproduces the registered forward vector
        f = np.asarray(cam0.forward, np.float64)
        f = f / np.linalg.norm(f)
        assert np.allclose(rl.fly.orientation, f, atol=1e-5)


def test_pallas_step_cached_across_edits():
    """Scene edits rebuild the pallas pipeline; the jitted step must be
    REUSED (same callable) across rebuilds with the same static config —
    a fresh jax.jit per edit re-traces the megakernel on every interactive
    drag (round-3 fix; n_super is a runtime argument read from SMEM)."""
    from jax.experimental.pallas import tpu as pltpu

    app = Application(small_cfg(accel="pallas", width=128, height=16))
    with pltpu.force_tpu_interpret_mode():
        rl = app.setup_default_layers()
        app.run(max_frames=1)
        step0 = rl._pallas._step
        rl.scene.add_sphere((0, 1, 0), 0.4)  # edit -> pipeline rebuild
        app.run(max_frames=1)
        assert rl._pallas._step is step0  # no re-trace
        rl.scene.update(int(rl.scene.active_indices()[0]),
                        albedo=(0.9, 0.1, 0.1))
        app.run(max_frames=1)
        assert rl._pallas._step is step0
    app.close()


def test_metrics_snapshot():
    app = Application(small_cfg())
    rl = app.setup_default_layers()
    app.run(max_frames=2)
    snap = rl.metrics.snapshot()
    assert snap["frames"] == 2
    assert snap["ms_per_frame"] > 0
    assert snap["fps"] > 0
    assert snap["accumulated_spp"] == 2
    app.close()


def test_console_receives_logs():
    app = Application(small_cfg())
    from cudaraytracer_tpu.utils import logging as rtlog

    rtlog.rt_info("hello from test %d", 42)
    lines = app.console.lines()
    assert any("hello from test 42" in ln for ln in lines)
    assert app.console.lines("nonexistent-filter") == []
    app.console.clear()
    assert app.console.lines() == []
    app.close()


@pytest.mark.slow
def test_wavefront_accel_app():
    app = Application(small_cfg(accel="wavefront", width=48, height=32))
    rl = app.setup_default_layers()
    rl._wavefront = None  # force rebuild below with interpret mode
    from cudaraytracer_tpu.models.wavefront import WavefrontRenderer

    rl._wavefront = WavefrontRenderer(
        rl.scene, 48, 32, camera_model=rl.cfg.camera_model, interpret=True
    )
    rl._scene_version = rl.scene.version  # keep our interpret renderer
    app.run(max_frames=2)
    assert rl._spp_done == 2
    img = rl.framebuffer_rgba8()
    assert img.shape == (32, 48, 4) and img[..., :3].sum() > 0
    app.close()


def test_checkpoint_resume(tmp_path):
    app = Application(small_cfg())
    rl = app.setup_default_layers()
    app.run(max_frames=3)
    rl.fly.process_keys(["w"])
    rl._cam_version = rl.fly.version  # keep accumulation for the checkpoint
    p = str(tmp_path / "ckpt")
    rl.save_state(p)
    img_before = rl.framebuffer_rgba8()

    app2 = Application(small_cfg())
    rl2 = app2.setup_default_layers()
    rl2.load_state(p)
    assert rl2._spp_done == 3
    assert rl2.fly.position == rl.fly.position
    np.testing.assert_array_equal(rl2.framebuffer_rgba8(), img_before)
    # resuming continues accumulation rather than restarting
    app2.run(max_frames=1)
    assert rl2._spp_done == 4
    app.close()
    app2.close()


def test_run_loop_survives_frame_failures():
    app = Application(small_cfg())

    class Bomb(Layer):
        def __init__(self):
            super().__init__("bomb")
            self.calls = 0

        def on_update(self):
            self.calls += 1
            raise RuntimeError("boom")

    bomb = Bomb()
    app.push_layer(bomb)
    app.run(max_frames=5)
    # three consecutive failures pause the app instead of crashing
    assert bomb.calls == 3
    assert app.paused
    app.close()


def test_late_fence_error_surfaces_next_frame():
    """A fence error that lands AFTER the join timeout (late completion
    carrying an async device error) must reach the 3-strikes watchdog on
    the next frame, not be silently dropped (round-2 advisor finding)."""
    app = Application(small_cfg())
    rl = app.setup_default_layers()
    app.run(max_frames=1)
    spp_before = rl._spp_done
    rl._fence_errs = [RuntimeError("late async device error")]
    app.run(max_frames=3)
    # the pending error was consumed and raised exactly once: one frame
    # lost to the strike, the remaining frames rendered normally
    assert rl._fence_errs == []
    assert not app.paused
    assert rl._spp_done == spp_before + 2
    # a thread holding the ORIGINAL list still surfaces a later error
    rl._fence_errs.append(RuntimeError("second late error"))
    app.run(max_frames=2)
    assert rl._fence_errs == [] and rl._spp_done == spp_before + 2 + 1
    app.close()


@pytest.mark.slow
def test_fence_compile_grace_lifecycle():
    """The FIRST fence behind a freshly-traced executable must wait
    compile_grace (XLA/Mosaic compiles take 1-2 min over a tunneled link);
    once a fence succeeds, steady-state fences enforce the tight
    fence_timeout; a resize (new shapes = new executable) re-arms the
    grace."""
    cfg = small_cfg(sync_every=1, fence_timeout=7.0, compile_grace=300.0)
    app = Application(cfg)
    rl = app.setup_default_layers()
    # fresh layer: no fence has succeeded yet -> grace applies
    assert not rl._fence_graced
    assert rl._fence_deadline() == 300.0
    app.run(max_frames=1)  # sync_every=1: frame 0 fences (CPU: instant)
    assert rl._fence_graced
    assert rl._fence_deadline() == 7.0
    # new shape = new executable on every accel path -> grace re-arms
    rl.resize(rl.cfg.width, rl.cfg.height + 16)
    assert not rl._fence_graced
    assert rl._fence_deadline() == 300.0
    app.run(max_frames=1)
    assert rl._fence_graced and rl._fence_deadline() == 7.0
    # grace never LOWERS the bar: a generous fence_timeout wins the max
    rl._fence_graced = False
    rl.cfg.fence_timeout = 900.0
    assert rl._fence_deadline() == 900.0
    app.close()


@pytest.mark.slow
def test_profiler_trace_hooks(tmp_path):
    app = Application(small_cfg())
    rl = app.setup_default_layers()
    logdir = str(tmp_path / "trace")
    rl.metrics.start_trace(logdir)
    app.run(max_frames=1)
    rl.metrics.stop_trace()
    import os

    assert any(os.scandir(logdir)), "profiler trace wrote nothing"
    app.close()


@pytest.mark.slow
def test_pallas_accel_image_texture_no_demotion():
    """A scene with an IMAGE texture must stay on the pallas megakernel
    (first-hit deferral, render_kernel.py) instead of demoting the whole
    pipeline to the slow bvh path (round-1 regression, VERDICT missing #2)."""
    from jax.experimental.pallas import tpu as pltpu

    app = Application(small_cfg(accel="pallas", width=128, height=16))
    with pltpu.force_tpu_interpret_mode():
        rl = app.setup_default_layers()
        tex = np.full((8, 8, 3), 180, np.uint8)
        slot = rl.scene.load_image_texture(tex)
        i = int(rl.scene.active_indices()[0])
        rl.scene.update(i, tex_type=2, tex_id=slot)
        app.run(max_frames=2)
    assert rl.cfg.accel == "pallas"  # no demotion
    assert rl._pallas is not None and rl._pallas.has_images
    # image mode batches samples like any other scene (lanes park at their
    # first image hit); 2 frames x progressive_spp nominal samples, and the
    # per-pixel completed-sample counts lie in [1, batch] per launch
    batch = rl.cfg.progressive_spp
    assert rl._spp_done == 2 * batch
    assert rl._counts is not None
    counts = np.asarray(rl._counts)
    assert counts.min() >= 2 and counts.max() <= 2 * batch
    img = rl.framebuffer_rgba8()
    assert img[..., :3].sum() > 0
    app.close()


def test_pallas_scene_growth():
    """Slab growth (the reference's alloc-copy-swap, CudaLayer.cpp:1131-1150)
    must carry the pallas pipeline through a capacity change: the packed
    tables change shape (one recompile), rendering continues on pallas."""
    from jax.experimental.pallas import tpu as pltpu

    from cudaraytracer_tpu.models.scene import LAMBERTIAN, Scene

    scene = Scene(capacity=4)
    scene.add_xz_rect((0, -0.5, 0), 50, 50, mat_type=LAMBERTIAN)
    app = Application(small_cfg(accel="pallas", width=128, height=16))
    with pltpu.force_tpu_interpret_mode():
        rl = app.setup_default_layers()
        rl.scene = scene
        rl._scene_version = -1
        app.run(max_frames=1)
        for i in range(6):  # exceeds capacity 4 -> growth
            rl.scene.add_sphere((i * 0.3, 0.6, -2.0), 0.2, mat_type=LAMBERTIAN)
        app.run(max_frames=1)
    assert rl.scene.capacity > 4 and rl.scene.num_active == 7
    assert rl.cfg.accel == "pallas"
    assert rl.framebuffer_rgba8()[..., :3].sum() > 0
    app.close()


def test_step_lowering_embeds_no_device_constants():
    """Regression: the pallas pipeline's jitted step must take every device
    array (scene tables, atlas) as an ARGUMENT, never a closure capture.
    A captured device array becomes an MLIR constant whose VALUE lowering
    fetches device->host — over a tunneled TPU link small-array fetches
    cost ~14 ms per element, turning cold start into minutes (measured;
    BASELINE.md protocol notes).  Guard: the lowered HLO text contains no
    large dense constants."""
    import re

    from jax.experimental.pallas import tpu as pltpu

    from cudaraytracer_tpu.viewer.app import Application

    app = Application(small_cfg(accel="pallas", width=128, height=16))
    with pltpu.force_tpu_interpret_mode():
        rl = app.setup_default_layers()
        tex = np.full((8, 8, 3), 120, np.uint8)
        slot = rl.scene.load_image_texture(tex)
        i = int(rl.scene.active_indices()[0])
        rl.scene.update(i, tex_type=2, tex_id=slot)
        app.run(max_frames=1)  # builds the image-mode pipeline
        pl_pipe = rl._pallas
        assert pl_pipe is not None and pl_pipe.has_images
        import jax.numpy as jnp

        from cudaraytracer_tpu.ops.pallas.render_kernel import pack_camera_np

        cam = rl.fly.params()
        cam_vec = pack_camera_np(
            cam, rl.scene.background_start, rl.scene.background_end,
            rl.cfg.width, rl.cfg.height, rl.cfg.t_min)
        lowered = pl_pipe._step.lower(
            *pl_pipe._tabs, jnp.int32(pl_pipe._n_super), cam_vec,
            jnp.int32(1), jnp.int32(2), jnp.int32(1), jnp.int32(0),
            rl._accum, rl._counts, *pl_pipe._atlas,
        )
        text = lowered.as_text()
    # dense constants with long payloads = embedded array values (MLIR
    # prints big ones as dense<"0x...">, small ones as dense<[...]>); allow
    # small ones (sky colors, iota tables) but nothing table/atlas-sized
    big = [m for m in re.finditer(
        r'dense<\[[^>]{2000,}|dense<"0x[0-9A-Fa-f]{2000,}', text)]
    assert not big, f"{len(big)} large dense constants embedded in lowering"
    app.close()


def test_non_progressive_image_scene_divisor():
    """Non-progressive renders go through the exact XLA path (spp samples
    per pixel, no parked lanes): the display divisor must be the scalar
    spp, not the never-accumulated counts plane (review r2 finding)."""
    from jax.experimental.pallas import tpu as pltpu

    app = Application(small_cfg(accel="pallas", width=64, height=16,
                                progressive=False, spp=4))
    with pltpu.force_tpu_interpret_mode():
        rl = app.setup_default_layers()
        tex = np.full((8, 8, 3), 90, np.uint8)
        slot = rl.scene.load_image_texture(tex)
        i = int(rl.scene.active_indices()[0])
        rl.scene.update(i, tex_type=2, tex_id=slot)
        app.run(max_frames=1)
    assert rl._counts is None  # XLA path: exactly spp samples everywhere
    assert rl._display_divisor() == 4
    img = rl.framebuffer_rgba8()
    # a sum-divided-by-1 bug clips most of the frame to white
    assert (img[..., :3] >= 250).mean() < 0.5
    app.close()


def test_checkpoint_without_counts_resumes_image_scene(tmp_path):
    """Image-scene checkpoints from before per-pixel counts existed load
    with a synthesized full(spp) counts plane and keep rendering."""
    from jax.experimental.pallas import tpu as pltpu

    def image_app():
        app = Application(small_cfg(accel="pallas", width=128, height=16))
        rl = app.setup_default_layers()
        tex = np.full((8, 8, 3), 150, np.uint8)
        slot = rl.scene.load_image_texture(tex)
        i = int(rl.scene.active_indices()[0])
        rl.scene.update(i, tex_type=2, tex_id=slot)
        return app, rl

    with pltpu.force_tpu_interpret_mode():
        app, rl = image_app()
        app.run(max_frames=2)
        p = str(tmp_path / "ckpt")
        rl.save_state(p)
        # simulate a pre-counts checkpoint: strip the counts array
        blob = dict(np.load(p + ".npz"))
        blob.pop("counts")
        np.savez_compressed(p + ".npz", **blob)

        app2, rl2 = image_app()
        rl2.load_state(p)
        assert rl2._counts is not None
        assert float(np.asarray(rl2._counts).min()) == rl2._spp_done
        app2.run(max_frames=1)  # must not crash on caccum=None
        assert rl2.framebuffer_rgba8()[..., :3].sum() > 0
    app.close()
    app2.close()


def test_checkpoint_records_estimator_flags(tmp_path):
    """A checkpoint rendered under NEE (a DIFFERENT transport than the
    parity estimator) must resume under NEE even in a process started
    without it — otherwise the accumulator silently mixes estimators.
    Round-5: save_state records nee/qmc; load_state adopts them."""
    app = Application(small_cfg(nee=True))
    rl = app.setup_default_layers()
    app.run(max_frames=2)
    p = str(tmp_path / "ckpt")
    rl.save_state(p)
    app.close()

    app2 = Application(small_cfg())  # process config: nee OFF
    rl2 = app2.setup_default_layers()
    assert rl2.renderer.nee is False
    rl2.load_state(p)
    assert rl2.cfg.nee is True and rl2.renderer.nee is True
    assert rl2._spp_done == 2
    app2.run(max_frames=1)  # continues the SAME transport
    assert rl2._spp_done == 3
    app2.close()


def test_checkpoint_without_flags_keeps_process_config(tmp_path):
    """BACK-COMPAT: a pre-round-5 checkpoint (no nee/qmc keys) resumes
    under whatever the process was started with."""
    app = Application(small_cfg())
    rl = app.setup_default_layers()
    app.run(max_frames=2)
    p = str(tmp_path / "ckpt")
    rl.save_state(p)
    app.close()
    # strip the new keys to simulate an old checkpoint
    blob = dict(np.load(p + ".npz"))
    blob.pop("nee"), blob.pop("qmc")
    np.savez_compressed(p + ".npz", **blob)

    app2 = Application(small_cfg(nee=True))
    rl2 = app2.setup_default_layers()
    rl2.load_state(p)
    assert rl2.cfg.nee is True and rl2.renderer.nee is True
    app2.close()
