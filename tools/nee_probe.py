"""NEE hardware payoff probe (round 5, VERDICT Next #1).

Measures, ON THE REAL CHIP, what the book-3 mixture estimator (--nee)
buys on light-driven scenes: equal-spp block error vs the cosine-only
estimator (both through the megakernel), the has_nee frame-cost premium,
and the resulting EQUAL-QUALITY TIME ratio — time for the cosine
estimator to reach the nee estimator's 16-spp error, by the measured
1/sqrt(n) error decay, over time for nee to get there.

Scenes: `small_light` (the tests' 0.4x0.4 @60 Cornell — the
variance-reduction showcase, tests/test_nee.py) and the registered
`cornell_mesh_light` (triangle emitters).

Protocol follows bench.py: slope-timed frames (tunnel-honest), block
means over 8x8 px, reference = 1024-spp nee render.

Usage: python tools/nee_probe.py [--width 512 --height 256 --depth 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def small_light_cornell():
    from cudaraytracer_tpu.models.scene import (DIFFUSE_LIGHT, LAMBERTIAN,
                                                Scene)

    s = 5.0
    sc = Scene(capacity=32, background_start=(0, 0, 0),
               background_end=(0, 0, 0))
    sc.add_yz_rect((-s / 2, s / 2, 0.0), s, s, mat_type=LAMBERTIAN,
                   albedo=(0.65, 0.05, 0.05))
    sc.add_yz_rect((s / 2, s / 2, 0.0), s, s, mat_type=LAMBERTIAN,
                   albedo=(0.12, 0.45, 0.15))
    sc.add_xz_rect((0, 0, 0), s, s, mat_type=LAMBERTIAN,
                   albedo=(0.73, 0.73, 0.73))
    sc.add_xz_rect((0, s, 0), s, s, mat_type=LAMBERTIAN,
                   albedo=(0.73, 0.73, 0.73))
    sc.add_xy_rect((0, s / 2, -s / 2), s, s, mat_type=LAMBERTIAN,
                   albedo=(0.73, 0.73, 0.73))
    sc.add_xz_rect((0, s - 0.01, 0), 0.4, 0.4, mat_type=DIFFUSE_LIGHT,
                   light=60.0)
    return sc


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--depth", type=int, default=8)
    p.add_argument("--ref-spp", type=int, default=1024)
    p.add_argument("--spps", default="16,64")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from cudaraytracer_tpu.models import scenes
    from cudaraytracer_tpu.ops.pallas.render_kernel import (
        pack_camera_np, pack_scene_tables, pallas_render_sample)
    from cudaraytracer_tpu.ops.sampling import pack_lights_np

    W, H, D = args.width, args.height, args.depth
    spps = [int(s) for s in args.spps.split(",")]

    def build(scene, cam, nee):
        t = pack_scene_tables(scene)
        tabs = tuple(jnp.asarray(x) for x in
                     (t.S, t.P, t.clusters, t.supers))
        prim_t = scene.prim_type[scene.active_indices()]
        has_tris = bool((prim_t == 4).any())
        cam_np = pack_camera_np(cam, scene.background_start,
                                scene.background_end, W, H, 1e-3)
        if nee:
            cam_np = np.concatenate([cam_np, pack_lights_np(scene)])
        cam_vec = jnp.asarray(cam_np)

        @jax.jit
        def step(tabs, cam_vec, seed, spp):
            return pallas_render_sample(
                *tabs, t.n_super, cam_vec, seed, D, spp=spp,
                width=W, height=H, camera_model="two_plane",
                tile_h=16, tile_w=128, has_rects=True, rr_start=2,
                cluster=t.cluster, super_=t.super_, has_tris=has_tris,
                has_nee=nee)

        return tabs, cam_vec, step

    def sync(x):
        return np.asarray(x[0, 0])

    def render(step, tabs, cam_vec, spp, seed):
        return np.asarray(
            step(tabs, cam_vec, jnp.int32(seed), jnp.int32(spp))
        )[:H, :W] / spp

    def blocks(a):
        return a.reshape(H // 8, 8, W // 8, 8, 3).mean((1, 3))

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

    for name, scene, cam in (
        ("small_light", small_light_cornell(),
         scenes.cornell_like_camera()),
        ("cornell_mesh_light", scenes.cornell_mesh_light_scene(),
         scenes.cornell_like_camera()),
    ):
        tabs_n, cv_n, step_n = build(scene, cam, nee=True)
        tabs_c, cv_c, step_c = build(scene, cam, nee=False)
        ms_n = frame_ms(step_n, tabs_n, cv_n)
        ms_c = frame_ms(step_c, tabs_c, cv_c)
        ref = blocks(render(step_n, tabs_n, cv_n, args.ref_spp, 9))
        print(f"[{name}] frame ms/spp: nee {ms_n:.2f}  cosine {ms_c:.2f} "
              f"(premium {ms_n / ms_c:.3f}x)", flush=True)
        for spp in spps:
            e_n = float(np.abs(
                blocks(render(step_n, tabs_n, cv_n, spp, 1)) - ref).mean())
            e_c = float(np.abs(
                blocks(render(step_c, tabs_c, cv_c, spp, 1)) - ref).mean())
            # 1/sqrt(n): cosine needs spp*(e_c/e_n)^2 to match e_n
            e_n = max(e_n, 1e-12)  # interpret-mode draws can degenerate
            eq_ratio = (e_c / e_n) ** 2 * (ms_c / ms_n)
            print(f"[{name}] spp {spp}: err nee {e_n:.5f} cosine {e_c:.5f}"
                  f" (x{e_c / e_n:.2f}); equal-quality TIME ratio "
                  f"cosine/nee ~ {eq_ratio:.1f}x", flush=True)


if __name__ == "__main__":
    sys.exit(main())
