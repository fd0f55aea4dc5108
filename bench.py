"""Headline benchmark: RTOW final scene, 1280x720, 1 spp progressive.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Metric is Mrays/sec (total rays traced: primary + bounces, measured by the
renderer's own ray counter) for a steady-state progressive 1-spp frame of
the RTOW final scene (~489 spheres) at 1280x720, max_depth 12 — the
workload named in BASELINE.json.  The reference publishes no numbers
(BASELINE.md), so vs_baseline is value / 100 Mrays/s, a nominal CUDA-class
rate for this workload on a midrange GPU.

Usage: python bench.py [--width W --height H --spp N --depth D --frames K]
                       [--accel brute|bvh|pallas] [--json-only]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

NOMINAL_BASELINE_MRAYS = 100.0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--width", type=int, default=1280)
    p.add_argument("--height", type=int, default=720)
    p.add_argument("--spp", type=int, default=1)
    p.add_argument("--depth", type=int, default=12)
    p.add_argument("--frames", type=int, default=8, help="timed frames")
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--accel", default="auto", choices=["auto", "brute", "bvh", "pallas"])
    p.add_argument("--scene", default="rtow_final")
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from cudaraytracer_tpu.models import scenes
    from cudaraytracer_tpu.models.renderer import render_radiance
    from cudaraytracer_tpu.utils import rng as rngu

    accel = args.accel
    if accel == "auto":
        accel = "brute"  # upgraded as faster paths land
    hit_fn_factory = None
    if accel == "bvh":
        from cudaraytracer_tpu.models.bvh import build_bvh, make_bvh_hit_fn

        # resolved below once the scene exists
        hit_fn_factory = "bvh"

    make_scene, make_cam = scenes.SCENES[args.scene]
    scene = make_scene()
    sd = scene.device()
    cam = make_cam() if args.scene != "rtow_final" else scenes.rtow_final_camera()
    camera_model = "look_at" if args.scene == "rtow_final" else "two_plane"

    hit_fn = None
    if hit_fn_factory == "bvh":
        from cudaraytracer_tpu.models.bvh import build_bvh, make_bvh_hit_fn

        bvh = build_bvh(scene)
        hit_fn = make_bvh_hit_fn(bvh, sd)

    @jax.jit
    def step(sd, cam, key):
        return render_radiance(
            sd, cam, key, args.spp, args.depth,
            width=args.width, height=args.height,
            camera_model=camera_model, hit_fn=hit_fn, with_stats=True,
        )

    key = rngu.base_key()
    # warmup / compile
    t0 = time.perf_counter()
    rad, nrays = step(sd, cam, key)
    rad.block_until_ready()
    compile_s = time.perf_counter() - t0
    for i in range(max(0, args.warmup - 1)):
        rad, nrays = step(sd, cam, jax.random.fold_in(key, i + 1))
        rad.block_until_ready()

    times = []
    total_rays = 0.0
    for f in range(args.frames):
        k = jax.random.fold_in(key, 100 + f)
        t0 = time.perf_counter()
        rad, nrays = step(sd, cam, k)
        rad.block_until_ready()
        times.append(time.perf_counter() - t0)
        total_rays += float(nrays)

    mean_s = sum(times) / len(times)
    ms_per_frame = mean_s * 1000.0
    mrays = (total_rays / len(times)) / mean_s / 1e6
    result = {
        "metric": f"Mrays/s RTOW final {args.width}x{args.height} "
                  f"{args.spp}spp depth{args.depth} ({accel}, {jax.default_backend()})",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / NOMINAL_BASELINE_MRAYS, 4),
        "ms_per_frame": round(ms_per_frame, 2),
        "fps": round(1000.0 / ms_per_frame, 2),
        "rays_per_frame": int(total_rays / len(times)),
        "compile_s": round(compile_s, 1),
        "accel": accel,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
