"""Denoiser display-path cost on the real chip (slope protocol).

Measures, at 720p rtow_final on the production pallas path:
  * gbuffer_step  — the jitted primary-visibility pass (per camera/scene
    edit, cached between edits)
  * denoise_step  — the 4-iteration a-trous filter (per display fetch)
  * framebuffer_rgba8 end-to-end with denoise on vs off (includes the
    host transfer, so those two compare against each other)

Slope protocol (BASELINE.md "Measurement protocol"): the tunnel ack lies,
so time N chained dispatches + one sync at two N values and take the
difference — device execution is serial, so the slope is the per-call
device cost.

Run in a FRESH process with the TPU idle:
  timeout 1200 python tools/denoise_probe.py [--scene NAME]
(--scene terrain_big measures the round-4 megakernel G-buffer on the
20k-tri streamed scene where the XLA brute pass was never safe to run.)
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from cudaraytracer_tpu.config import RenderConfig
    from cudaraytracer_tpu.models import scenes as scene_lib
    from cudaraytracer_tpu.ops.denoise import denoise_step
    from cudaraytracer_tpu.viewer.app import Application

    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="rtow_final")
    args = ap.parse_args()

    out = {"scene": args.scene}
    cfg = RenderConfig(width=1280, height=720, max_depth=12,
                       scene=args.scene,
                       camera_model=scene_lib.camera_model_for(args.scene),
                       accel="pallas", progressive=True, progressive_spp=4,
                       sync_every=100000)
    app = Application(cfg)
    rl = app.setup_default_layers()
    assert rl._pallas is not None, "pallas accel required"
    app.run(max_frames=8)  # some accumulated signal to filter
    np.asarray(rl._accum)  # sync

    cam = rl.fly.params(aperture=cfg.aperture, focus_dist=cfg.focus_dist)

    def slope(fn, sync, n_hi=32, n_lo=2):
        # warm/compile
        fn()
        sync()
        times = {}
        for n in (n_lo, n_hi):
            t0 = time.perf_counter()
            for _ in range(n):
                fn()
            sync()
            times[n] = time.perf_counter() - t0
        return (times[n_hi] - times[n_lo]) / (n_hi - n_lo) * 1000.0

    # ---- G-buffer pass: the PRODUCTION path (round 4: the megakernel
    # pass over the pipeline's packed tables — resident or streamed;
    # tools/gbuffer_probe.py has the per-scene table)
    gb_box = {}

    def g_run():
        gb_box["gb"] = rl._pallas.gbuffer(cam)

    ms = slope(g_run, lambda: np.asarray(gb_box["gb"].depth))
    print(f"pallas gbuffer 720p {args.scene}: {ms:.2f} ms")
    out["gbuffer_ms"] = round(ms, 2)
    gb = gb_box["gb"]

    # ---- a-trous filter (4 iterations, no variance plane)
    mean = rl._accum / max(rl._spp_done, 1)
    dstep = denoise_step(cfg.height, cfg.width, 4)
    d_box = {}

    def d_run():
        d_box["o"] = dstep(mean, gb.normal, gb.albedo, gb.depth)

    ms = slope(d_run, lambda: np.asarray(d_box["o"]))
    print(f"denoise_step 720p x4 iters: {ms:.2f} ms")
    out["denoise_ms"] = round(ms, 2)

    # ---- display fetch end-to-end (includes PNG-side host transfer)
    for enabled in (False, True):
        rl.cfg.denoise = enabled
        rl.framebuffer_rgba8()  # warm
        t0 = time.perf_counter()
        for _ in range(5):
            rl.framebuffer_rgba8()
        ms = (time.perf_counter() - t0) / 5 * 1000.0
        key = "fetch_denoise_ms" if enabled else "fetch_raw_ms"
        print(f"framebuffer_rgba8 denoise={enabled}: {ms:.1f} ms")
        out[key] = round(ms, 1)

    # ---- viewer poll cost by FORMAT (round 5: /frame.jpg is the UI
    # default) — decompose device pull vs encode, and the bytes that
    # ride the browser link per poll
    import io

    from PIL import Image

    rl.cfg.denoise = False
    img = rl.framebuffer_rgba8()  # device pull timed above (fetch_raw_ms)

    def enc(fmt, arr, mode, reps=5, **kw):
        t0 = time.perf_counter()
        for _ in range(reps):
            buf = io.BytesIO()
            Image.fromarray(arr, mode).save(buf, fmt, **kw)
        return (time.perf_counter() - t0) / reps * 1000.0, len(
            buf.getvalue())

    png_ms, png_b = enc("PNG", img, "RGBA")
    jpg_ms, jpg_b = enc("JPEG", img[..., :3], "RGB", quality=85)
    print(f"encode PNG: {png_ms:.1f} ms / {png_b / 1e6:.2f} MB; "
          f"JPEG q85: {jpg_ms:.1f} ms / {jpg_b / 1e6:.2f} MB")
    print(f"poll total (pull+encode): png {out['fetch_raw_ms'] + png_ms:.1f}"
          f" ms vs jpg {out['fetch_raw_ms'] + jpg_ms:.1f} ms")
    out.update(png_encode_ms=round(png_ms, 1), png_bytes=png_b,
               jpg_encode_ms=round(jpg_ms, 1), jpg_bytes=jpg_b)

    app.close()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
