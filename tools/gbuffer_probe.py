"""G-buffer pass cost on the real chip (round-3 VERDICT Next #3).

Measures the megakernel G-buffer (ops/pallas/gbuffer_kernel.py) at 720p
across the scene-size story — resident (~500 prims), vattr mesh, the
20k-tri STREAMED terrain_big (where the XLA brute pass sits in the
TPU-crash size class) and the marble scene (proves the in-kernel noise
math lowers in Mosaic) — plus the XLA brute pass on rtow_final for the
comparison row (BASELINE.md measured it at 107 ms at ~500 prims).

Slope protocol (BASELINE.md "Measurement protocol"): the step is ONE
pass per (scene, camera) edit in production; here N dispatches chain on
the queue and one scalar-slice sync times the batch.

Run in a FRESH process with the TPU idle:
    timeout 1800 python tools/gbuffer_probe.py
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

W, H = 1280, 720


def slope_ms(fn, n=12, warm=2):
    for _ in range(warm):
        out = fn()
    np.asarray(out.depth[0, 0])  # drain the queue
    t0 = time.perf_counter()
    out = fn()
    np.asarray(out.depth[0, 0])
    t1 = (time.perf_counter() - t0) * 1000.0  # 1 dispatch (+1 RTT)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    np.asarray(out.depth[0, 0])
    tn = (time.perf_counter() - t0) * 1000.0  # n dispatches (+1 RTT)
    return (tn - t1) / (n - 1)


def main():
    import jax.numpy as jnp

    from cudaraytracer_tpu.config import RenderConfig
    from cudaraytracer_tpu.models import scenes as scene_lib
    from cudaraytracer_tpu.viewer.app import _PallasPipeline

    out = {}
    for name in ("rtow_final", "terrain", "marble", "terrain_big"):
        make_scene, make_cam = scene_lib.SCENES[name]
        scene = make_scene()
        cam = make_cam()
        cfg = RenderConfig(
            width=W, height=H, scene=name,
            camera_model=scene_lib.camera_model_for(name), accel="pallas")
        pipe = _PallasPipeline(scene, cfg)
        ms = slope_ms(lambda: pipe.gbuffer(cam))
        gb = pipe.gbuffer(cam)
        hit = float(np.asarray(gb.depth > 0).mean())
        fin = bool(np.isfinite(np.asarray(gb.albedo)).all()
                   and np.isfinite(np.asarray(gb.normal)).all())
        n_active = int(scene.num_active)
        row = {"scene": name, "prims": n_active,
               "streamed": bool(pipe.stream_b),
               "ms": round(ms, 2), "hit_frac": round(hit, 3),
               "finite": fin}
        out[name] = row
        print(json.dumps(row))

    # XLA brute comparison row (the 107 ms @ ~500 prims baseline)
    from cudaraytracer_tpu.ops.gbuffer import gbuffer_step

    scene = scene_lib.rtow_final_scene()
    sd = scene.device()
    cam = scene_lib.rtow_final_camera()
    step = gbuffer_step(W, H, "look_at")

    def run_xla():
        return step(sd, cam)

    ms = slope_ms(run_xla, n=6)
    out["xla_rtow_final"] = {"scene": "rtow_final (XLA brute)",
                             "ms": round(ms, 2)}
    print(json.dumps(out["xla_rtow_final"]))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
