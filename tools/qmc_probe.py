"""QMC hardware payoff probe (round 5).

Measures, ON THE REAL CHIP, what the R2 low-discrepancy pixel sampler
(--qmc, ops/qmc.py) buys over the parity PRNG jitter: PER-PIXEL mean
abs error at equal spp (QMC's win is per-pixel screen-space
convergence, so block means would average it away), the has_qmc frame
cost premium, and the implied equal-quality time ratio (MC needs
spp*(e_mc/e_qmc)^2 samples to reach QMC's error, by its 1/sqrt(n)
decay).

Reference images are high-spp MC renders (unbiased for the true mean;
QMC is consistent for the same limit — tests/test_qmc.py pins that).

Usage: python tools/qmc_probe.py [--width 640 --height 360 --spps 16,64]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=352)
    p.add_argument("--depth", type=int, default=12)
    p.add_argument("--ref-spp", type=int, default=2048)
    p.add_argument("--spps", default="4,16,64")
    p.add_argument("--scenes", default="rtow_final,cornell")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from cudaraytracer_tpu.models import scenes
    from cudaraytracer_tpu.ops.pallas.render_kernel import (
        pack_camera_np, pack_scene_tables, pallas_render_sample)

    W, H, D = args.width, args.height, args.depth
    spps = [int(s) for s in args.spps.split(",")]

    def build(scene, cam, model, qmc):
        t = pack_scene_tables(scene)
        tabs = tuple(jnp.asarray(x) for x in
                     (t.S, t.P, t.clusters, t.supers))
        prim_t = scene.prim_type[scene.active_indices()]
        has_tris = bool((prim_t == 4).any())
        cam_vec = jnp.asarray(pack_camera_np(
            cam, scene.background_start, scene.background_end, W, H, 1e-3))

        @jax.jit
        def step(tabs, cam_vec, seed, spp):
            return pallas_render_sample(
                *tabs, t.n_super, cam_vec, seed, D, spp=spp,
                width=W, height=H, camera_model=model,
                tile_h=16, tile_w=256, has_rects=True, rr_start=2,
                cluster=t.cluster, super_=t.super_, has_tris=has_tris,
                has_qmc=qmc)

        return tabs, cam_vec, step

    def sync(x):
        return np.asarray(x[0, 0])

    def render(step, tabs, cam_vec, spp, seed):
        return np.asarray(
            step(tabs, cam_vec, jnp.int32(seed), jnp.int32(spp))
        )[:H, :W] / spp

    def frame_ms(step, tabs, cam_vec):
        sync(step(tabs, cam_vec, jnp.int32(1), jnp.int32(1)))  # compile
        sync(step(tabs, cam_vec, jnp.int32(2), jnp.int32(9)))

        def timed(spp, reps=5):
            ts = []
            for f in range(reps):
                t0 = time.perf_counter()
                sync(step(tabs, cam_vec, jnp.int32(100 + f),
                          jnp.int32(spp)))
                ts.append(time.perf_counter() - t0)
            ts.sort()
            return ts[len(ts) // 2]

        return (timed(9) - timed(1)) / 8.0 * 1000.0

    for name in args.scenes.split(","):
        make_scene, make_cam = scenes.SCENES[name]
        model = scenes.camera_model_for(name)
        scene, cam = make_scene(), make_cam()
        tabs_q, cv_q, step_q = build(scene, cam, model, qmc=True)
        tabs_m, cv_m, step_m = build(scene, cam, model, qmc=False)
        ms_q = frame_ms(step_q, tabs_q, cv_q)
        ms_m = frame_ms(step_m, tabs_m, cv_m)
        print(f"[{name}] frame ms/spp: qmc {ms_q:.2f}  prng {ms_m:.2f} "
              f"(premium {ms_q / ms_m:.3f}x)", flush=True)
        ref = render(step_m, tabs_m, cv_m, args.ref_spp, 9)
        for spp in spps:
            e_q = float(np.abs(
                render(step_q, tabs_q, cv_q, spp, 1) - ref).mean())
            e_m = float(np.abs(
                render(step_m, tabs_m, cv_m, spp, 1) - ref).mean())
            e_q = max(e_q, 1e-12)
            eq_ratio = (e_m / e_q) ** 2 * (ms_m / ms_q)
            print(f"[{name}] spp {spp}: per-pixel err qmc {e_q:.5f} "
                  f"prng {e_m:.5f} (x{e_m / e_q:.2f}); equal-quality "
                  f"TIME ratio prng/qmc ~ {eq_ratio:.1f}x", flush=True)


if __name__ == "__main__":
    main()
