"""Headline benchmark: RTOW final scene, 1280x720, 1 spp progressive.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Metric is Mrays/sec (total rays traced: primary + bounces, measured by the
renderer's own ray counter) for a steady-state progressive 1-spp frame of
the RTOW final scene (~489 spheres) at 1280x720, max_depth 12 — the
workload named in BASELINE.json.  The reference publishes no numbers
(BASELINE.md), so vs_baseline is value / 100 Mrays/s, a nominal CUDA-class
rate for this workload on a midrange GPU.

Usage: python bench.py [--width W --height H --spp N --depth D --frames K]
                       [--accel brute|bvh|pallas|wavefront]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

NOMINAL_BASELINE_MRAYS = 100.0


def await_backend(budget_s: float | None = None, probe_timeout_s: float = 90.0):
    """Wait (bounded) for the accelerator backend to answer, or die fast.

    The TPU here sits behind a tunnel whose backend init (`jax.devices()`)
    can HANG INDEFINITELY after a device fault or a SIGKILLed client
    (BASELINE.md measurement-protocol notes; wedges usually clear in
    1-10 min).  A benchmark that hangs forever is worse than one that
    fails: probe the backend in a bounded SUBPROCESS (a hung probe can be
    killed; a hung in-process init cannot), retry with backoff while the
    wedge clears, and exit(1) with a diagnostic if the budget runs out.
    Returns silently as soon as a probe sees a device.

    Budget from CRT_BENCH_PROBE_BUDGET_S (default 900 s: a killed probe is
    itself a killed TPU client, and the documented wedge protocol is to
    leave the device COMPLETELY idle afterwards — so idle gaps between
    probes back off 60 s -> 180 s -> 420 s instead of hammering).  Probes
    inherit the environment (the axon plugin arrives via PYTHONPATH)."""
    import os
    import subprocess

    if budget_s is None:
        budget_s = float(os.environ.get("CRT_BENCH_PROBE_BUDGET_S", "900"))
    deadline = time.monotonic() + budget_s
    attempt = 0
    idle = 60.0
    while True:
        attempt += 1
        left = deadline - time.monotonic()
        if left <= 0:
            print(
                f"bench: accelerator backend never answered within "
                f"{budget_s:.0f}s ({attempt - 1} probes): the tunnel/device "
                "is down or wedged (see BASELINE.md protocol notes). "
                "Re-run later or pass --cpu for an interpret-mode check.",
                file=sys.stderr,
            )
            raise SystemExit(1)
        t0 = time.monotonic()
        timed_out = False
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; d = jax.devices(); "
                 "print(d[0].platform, len(d))"],
                timeout=min(probe_timeout_s, max(left, 10.0)),
                capture_output=True, text=True,
            )
            if r.returncode == 0 and r.stdout.strip():
                return r.stdout.strip()
        except subprocess.TimeoutExpired:
            timed_out = True
        print(
            f"bench: backend probe {attempt} failed "
            f"({time.monotonic() - t0:.0f}s); retrying "
            f"({deadline - time.monotonic():.0f}s left in budget)",
            file=sys.stderr,
        )
        # leave the device alone between probes: stacked retries queue
        # behind a wedge and prolong it (BASELINE.md), and a TIMED-OUT
        # probe was itself a killed client — back off harder after those
        time.sleep(min(idle, max(deadline - time.monotonic(), 0.0)))
        if timed_out:
            idle = min(idle * 3.0, 420.0)


def bench_multichip(args):
    """Sharded-megakernel frame over an N-device (rows x samples) mesh.

    Hermetic by default: self-provisions a virtual CPU mesh (interpret-mode
    kernels) so the multi-chip measurement path exists before real
    multi-chip hardware does.  With --multichip-real the same code runs the
    COMPILED kernel over the real platform's devices — `--multichip 1
    --multichip-real` on a single-chip machine proves the shard_map→Mosaic
    product lowers and runs on hardware.  Prints one JSON line: slope-timed
    per-frame wall time, scaling efficiency vs the single-device kernel
    (vs_baseline = T_single / (N * T_multi); 1.0 = perfect scaling), and
    statistical agreement with the single-device render.
    """
    import os

    if args.multichip_real:
        os.environ["CRT_MULTICHIP_REAL"] = "1"

    from __graft_entry__ import _provision_devices

    n = args.multichip
    devices = _provision_devices(n)
    on_cpu = devices[0].platform == "cpu"

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cudaraytracer_tpu.models import scenes
    from cudaraytracer_tpu.ops.pallas.render_kernel import (
        pack_camera_np, pack_scene_tables, pallas_render_sample)
    from cudaraytracer_tpu.parallel import make_mesh, render_sharded_pallas

    n_samples = 2 if n % 2 == 0 and n >= 2 else 1
    n_rows = n // n_samples
    mesh = make_mesh(n_rows=n_rows, n_samples=n_samples, devices=devices)

    # interpret-mode CPU kernels are slow: shrink the workload accordingly;
    # on real hardware, round the height down to a band multiple
    W = 128 if on_cpu else args.width
    band = 16 * n_rows
    H = band if on_cpu else max(band, args.height // band * band)
    depth = 3 if on_cpu else args.depth
    tile_w = 128 if on_cpu else 256

    scene = scenes.rtow_final_scene()
    cam = scenes.rtow_final_camera()
    t = pack_scene_tables(scene)  # kernel geometry must match the packing:
    # t.cluster/t.super_ are threaded into render_sharded_pallas below
    # pin every array to the mesh's platform (replicated): with the
    # virtual-CPU fallback the default device is still the (tunneled) TPU,
    # and cross-backend fetches of small arrays are pathologically slow
    # (BASELINE.md notes)
    from jax.sharding import NamedSharding, PartitionSpec

    put = lambda x: jax.device_put(
        np.asarray(x), NamedSharding(mesh, PartitionSpec()))
    tables = tuple(put(x) for x in (t.S, t.P, t.clusters, t.supers))
    cam_vec = put(pack_camera_np(
        cam, scene.background_start, scene.background_end, W, H, 1e-3))

    # jit the sharded frame ONCE (an eager shard_map defined per call would
    # re-trace every frame); seeds are traced args, so no recompiles
    @jax.jit
    def frame(S, P, C, SC, cam_vec, seed):
        return render_sharded_pallas(
            (S, P, C, SC), t.n_super, cam_vec, seed, depth,
            width=W, height=H, mesh=mesh, camera_model="look_at",
            tile_h=16, tile_w=tile_w, cluster=t.cluster, super_=t.super_,
        )

    def run(seed):
        if on_cpu:
            from jax.experimental.pallas import tpu as pltpu

            with pltpu.force_tpu_interpret_mode():
                return frame(*tables, cam_vec, np.int32(seed))
        return frame(*tables, cam_vec, np.int32(seed))

    def sync(x):
        return np.asarray(x[0, 0])  # honest fence over the tunnel

    t0 = time.perf_counter()
    out = run(7)
    out.block_until_ready()
    compile_s = time.perf_counter() - t0
    ref = np.asarray(run(8)) / n_samples  # sample streams summed over mesh

    # slope timing (BASELINE.md protocol): issue K async frames, sync once;
    # T(K) - T(1) over K-1 cancels the per-call host/tunnel round trip
    def timed_with(run_fn, seed_base, nframes, reps):
        ts = []
        for r in range(reps):
            t0 = time.perf_counter()
            o = None
            for f in range(nframes):
                o = run_fn(seed_base + r * 64 + f)
            sync(o)
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    def timed(nframes, reps):
        return timed_with(run, 100, nframes, reps)

    # interpret-mode CPU timing is not a perf claim (tens of seconds per
    # frame): one timed frame suffices there; real hardware gets the full
    # slope protocol
    if on_cpu:
        t0 = time.perf_counter()
        sync(run(10))
        frame_s = time.perf_counter() - t0
    else:
        big, reps = 9, args.frames
        t_one = timed(1, reps)
        t_big = timed(big, reps)
        frame_s = max((t_big - t_one) / (big - 1), 1e-6)

    # single-device reference: agreement + the scaling-efficiency baseline;
    # re-pin the inputs to ONE device (mesh-replicated arrays cannot feed a
    # single-device computation: interpret-mode io_callbacks reject them)
    put1 = lambda x: jax.device_put(np.asarray(x), devices[0])
    tables1 = tuple(put1(x) for x in tables)
    cam_vec1 = put1(cam_vec)

    @jax.jit
    def single_frame(S, P, C, SC, cam_vec, seed):
        return pallas_render_sample(
            S, P, C, SC, t.n_super, cam_vec, seed, depth,
            width=W, height=H, camera_model="look_at",
            tile_h=16, tile_w=tile_w, cluster=t.cluster, super_=t.super_,
        )

    def run1(seed):
        if on_cpu:
            # plain interpret=True can't lower TPU prims (prng_seed); the
            # interpret MODE runs them on CPU (CLAUDE.md Mosaic notes)
            from jax.experimental.pallas import tpu as pltpu

            with pltpu.force_tpu_interpret_mode():
                return single_frame(*tables1, cam_vec1, np.int32(seed))
        return single_frame(*tables1, cam_vec1, np.int32(seed))

    single = run1(9)
    single.block_until_ready()

    def timed1(nframes, reps):
        return timed_with(run1, 200, nframes, reps)

    if on_cpu:
        t0 = time.perf_counter()
        sync(run1(10))
        single_s = time.perf_counter() - t0
    else:
        t1_one = timed1(1, reps)
        t1_big = timed1(big, reps)
        single_s = max((t1_big - t1_one) / (big - 1), 1e-6)

    single = np.asarray(single)[:H, :W]
    blocks = lambda a: a.reshape(H // 16, 16, W // 16, 16, 3).mean((1, 3))
    block_err = float(np.abs(blocks(ref) - blocks(single)).max())

    # scaling efficiency: perfect N-way scaling divides the single-device
    # frame time by N, so eff = T_single / (N * T_multi)
    efficiency = single_s / (n * frame_s)

    result = {
        "metric": f"multichip sharded megakernel {W}x{H} depth{depth} "
                  f"mesh {n_rows}x{n_samples} ({devices[0].platform}"
                  f"{', interpret' if on_cpu else ', compiled'})",
        "value": round(frame_s * 1000.0, 2),
        "unit": "ms/frame",
        "vs_baseline": round(efficiency, 4),
        "vs_baseline_meaning": "scaling efficiency T_single/(N*T_multi)",
        "single_device_ms": round(single_s * 1000.0, 2),
        "n_devices": n,
        "mesh": {"rows": n_rows, "samples": n_samples},
        "band_rows": H // n_rows,
        "block_err_vs_single": round(block_err, 4),
        "finite": bool(np.isfinite(ref).all()),
        "compile_s": round(compile_s, 1),
        "interpret": on_cpu,
    }
    print(json.dumps(result))
    return 0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--width", type=int, default=1280)
    p.add_argument("--height", type=int, default=720)
    p.add_argument("--spp", type=int, default=1)
    p.add_argument("--depth", type=int, default=12)
    p.add_argument("--frames", type=int, default=8, help="timed frames")
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--accel", default="auto", choices=["auto", "brute", "bvh", "pallas", "wavefront"])
    p.add_argument("--scene", default="rtow_final")
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    p.add_argument("--tile-h", dest="tile_h", type=int, default=16)
    p.add_argument("--tile-w", dest="tile_w", type=int, default=256)
    p.add_argument("--cluster", type=int, default=None,
                   help="primitives per cluster (default: adaptive "
                        "pick_cluster_super; 32 is a measured 30x cliff)")
    p.add_argument("--super", dest="super_", type=int, default=None,
                   help="clusters per supercluster (default: adaptive)")
    p.add_argument("--cull-stats", dest="cull_stats", action="store_true",
                   help="print the kernel's entered-cluster diagnostic "
                        "(prim-loop entries per launch) to stderr")
    p.add_argument("--octant-split", dest="octant_split", action="store_true",
                   help="probe: per-direction-bucket hierarchical search "
                        "(two masked searches with their own front-to-back "
                        "orders); bit-identical output, measured for perf")
    p.add_argument("--nee", action="store_true",
                   help="RTOW book-3 mixture estimator in the megakernel "
                        "(light table appended to the camera vector)")
    p.add_argument("--qmc", action="store_true",
                   help="R2 low-discrepancy pixel jitter (ops/qmc.py); "
                        "measures the has_qmc frame-cost premium")
    p.add_argument("--rr-start", dest="rr_start", type=int, default=2,
                   help="Russian-roulette start bounce for the pallas path "
                        "(unbiased; measured identical means at 16 spp); "
                        "0 disables for exact reference-estimator parity")
    p.add_argument("--multichip", type=int, default=0, metavar="N",
                   help="run the sharded megakernel over an N-device mesh "
                        "(virtual CPU mesh when the platform is smaller; "
                        "the measurement path for real multi-chip hardware)")
    p.add_argument("--multichip-real", dest="multichip_real",
                   action="store_true",
                   help="with --multichip: use the real platform's devices "
                        "(compiled kernels) instead of the hermetic virtual "
                        "CPU mesh; --multichip 1 --multichip-real proves the "
                        "shard_map+Mosaic product on a single real chip")
    args = p.parse_args()

    if args.multichip:
        if args.multichip_real:
            # the real-device path initializes the tunneled backend; the
            # hermetic virtual-CPU mesh never touches it
            await_backend()
        return bench_multichip(args)

    if not args.cpu:
        # bounded wait for the tunneled accelerator (hang -> fail fast)
        await_backend()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from cudaraytracer_tpu.models import scenes
    from cudaraytracer_tpu.models.renderer import render_radiance
    from cudaraytracer_tpu.utils import rng as rngu

    accel = args.accel
    if accel == "auto":
        # same resolution rule as the product (viewer/app.py on_attach)
        accel = "pallas" if jax.default_backend() == "tpu" else "bvh"

    make_scene, make_cam = scenes.SCENES[args.scene]
    scene = make_scene()
    sd = scene.device()
    cam = make_cam()
    camera_model = scenes.camera_model_for(args.scene)

    key = rngu.base_key()
    if accel == "wavefront":
        from cudaraytracer_tpu.models.wavefront import WavefrontRenderer

        wr = WavefrontRenderer(scene, args.width, args.height,
                               camera_model=camera_model)

        def run_frame(f, nframes):
            acc = None
            for s in range(nframes):
                r = wr.render(cam, jax.random.fold_in(key, 100 + f * 64 + s),
                              spp=args.spp, max_depth=args.depth)
                acc = r if acc is None else acc + r
            return acc

        # rays counted in-path by the wavefront loop (exact, not estimated)
        _, nprobe = wr.render(cam, jax.random.fold_in(key, 9),
                              spp=args.spp, max_depth=args.depth,
                              with_stats=True)
        rays_per_frame = float(nprobe)
    elif accel == "pallas":
        from cudaraytracer_tpu.ops.pallas.render_kernel import (
            pack_camera, pack_scene_tables, pallas_render_sample)

        import numpy as _np

        active = _np.asarray(sd.active)
        has_images = bool((_np.asarray(sd.tex_type)[active] == 2).any())
        t = pack_scene_tables(scene, with_uv=has_images,
                              cluster=args.cluster, super_=args.super_)
        n_super = t.n_super
        # beyond-SMEM scenes bench the HBM-streamed layout, exactly like
        # the product pipeline (viewer/app.py; BASELINE.md "Streamed
        # megakernel"); streamed tile default is the measured 16x128
        from cudaraytracer_tpu.ops.pallas.render_kernel import (
            fits_megakernel, pack_stream_tiles)

        stream_b = 0
        if not fits_megakernel(scene.num_active, t.vattrs, tables=t):
            st = pack_stream_tiles(t)
            stream_b = st.block_b
            n_super = st.n_blocks
            if args.tile_w == 256 and args.tile_h == 16:
                args.tile_w = 128
            S, P, C, SC = map(jnp.asarray, (st.tiles, st.block_boxes,
                                            st.clusters, st.supers))
        else:
            S, P, C, SC = map(jnp.asarray, (t.S, t.P, t.clusters, t.supers))
        atlas = jnp.asarray(scene.atlas) if has_images else None
        tex_hw = jnp.asarray(scene.tex_hw) if has_images else None
        tile_h, tile_w = args.tile_h, args.tile_w
        prim_t = _np.asarray(sd.prim_type)[active]
        has_tris = bool((prim_t == 4).any())
        has_rects = bool(((prim_t >= 1) & (prim_t <= 3)).any())
        has_noise = bool((_np.asarray(sd.tex_type)[active] == 3).any())
        has_media = bool((_np.asarray(sd.mat_type)[active] == 4).any())
        has_motion = bool((_np.asarray(sd.velocity)[active] != 0).any())
        has_boxm = bool((prim_t == 5).any())
        has_rotm = bool(
            (_np.asarray(sd.edge2)[active][prim_t == 5, 0] != 0).any())
        has_nee = bool(getattr(args, "nee", False))
        wpad = -(-args.width // tile_w) * tile_w
        hpad = -(-args.height // tile_h) * tile_h
        cam_vec = pack_camera(cam, sd, args.width, args.height, 1e-3)
        if has_nee:
            from cudaraytracer_tpu.ops.sampling import pack_lights_np

            cam_vec = jnp.concatenate([
                cam_vec, jnp.asarray(pack_lights_np(scene))])

        # device arrays enter jit as ARGUMENTS (atl), never closures: a
        # captured device array becomes an MLIR constant whose value is
        # fetched device->host at lowering — minutes over a tunneled link
        atl = (atlas, tex_hw) if has_images else ()

        @jax.jit
        def cull_probe(S, P, C, SC, cam_vec, seed, spp):
            # culling diagnostic (printed to stderr with --cull-stats):
            # total prim-loop cluster entries across all waves of a launch
            return pallas_render_sample(
                S, P, C, SC, n_super, cam_vec, seed, args.depth,
                width=args.width, height=args.height,
                pad_w=wpad, band_h=hpad, camera_model=camera_model,
                tile_h=tile_h, tile_w=tile_w, has_rects=has_rects,
                spp=spp, rr_start=args.rr_start, with_cull_stats=True,
                cluster=t.cluster, super_=t.super_,
                octant_split=args.octant_split, has_tris=has_tris,
                has_vattrs=t.vattrs, stream_b=stream_b,
                has_noise=has_noise, has_media=has_media,
                has_motion=has_motion, has_boxm=has_boxm,
                has_rotm=has_rotm, has_nee=has_nee,
                has_qmc=bool(getattr(args, "qmc", False)),
            )[-1]

        @jax.jit
        def step(S, P, C, SC, cam_vec, seed, spp, *atl):
            # one launch renders all spp samples: in-kernel path regeneration
            # keeps the bounce waves at full occupancy across samples (image
            # scenes park lanes at their first image hit and return per-pixel
            # counts — unused here, the ray counter is exact either way)
            out = pallas_render_sample(
                S, P, C, SC, n_super, cam_vec, seed, args.depth,
                width=args.width, height=args.height,
                pad_w=wpad, band_h=hpad, camera_model=camera_model,
                tile_h=tile_h, tile_w=tile_w, has_rects=has_rects,
                spp=spp, rr_start=args.rr_start, with_stats=True,
                atlas=atl[0] if has_images else None,
                tex_hw=atl[1] if has_images else None,
                cluster=t.cluster, super_=t.super_,
                octant_split=args.octant_split, has_tris=has_tris,
                has_vattrs=t.vattrs, stream_b=stream_b,
                has_noise=has_noise, has_media=has_media,
                has_motion=has_motion, has_boxm=has_boxm,
                has_rotm=has_rotm, has_nee=has_nee,
                has_qmc=bool(getattr(args, "qmc", False)),
            )
            if has_images:
                img, _counts, nrays = out
                return img, nrays
            return out

        def run_frame(f, nframes):
            return step(S, P, C, SC, cam_vec, 1000 + f,
                        nframes * args.spp, *atl)[0]

        # rays counted by the kernel itself; slope over batch sizes so the
        # marginal per-frame ray count matches the slope-timed frame cost
        _, n_one = step(S, P, C, SC, cam_vec, 999, args.spp, *atl)
        _, n_big = step(S, P, C, SC, cam_vec, 998, 9 * args.spp, *atl)
        rays_per_frame = (float(n_big) - float(n_one)) / 8.0
        if args.cull_stats and not has_images:
            ncl = float(cull_probe(S, P, C, SC, cam_vec, 997, args.spp))
            n_tiles = (hpad // tile_h) * (wpad // tile_w)
            n_clusters = t.clusters.shape[1]
            print(f"cull: {ncl:.0f} cluster entries / launch over {n_tiles} "
                  f"tiles x {n_clusters} clusters "
                  f"({ncl / max(rays_per_frame / (args.width * args.height * args.spp), 1e-9) / n_tiles / n_clusters:.3f} "
                  f"entered fraction per wave-equivalent)", file=sys.stderr)
    else:
        hit_fn = None
        if accel == "bvh":
            from cudaraytracer_tpu.models.bvh import build_bvh, make_bvh_hit_fn

            bvh = build_bvh(scene)
            hit_fn = make_bvh_hit_fn(bvh, sd)

        @jax.jit
        def step(sd, cam, key, nframes):
            rad, nrays = render_radiance(
                sd, cam, key, nframes * args.spp, args.depth,
                width=args.width, height=args.height,
                camera_model=camera_model, hit_fn=hit_fn, with_stats=True,
                nee=bool(getattr(args, "nee", False)),
                qmc=bool(getattr(args, "qmc", False)),
            )
            return rad, nrays

        def run_frame(f, nframes):
            rad, _ = step(sd, cam, jax.random.fold_in(key, 100 + f), nframes)
            return rad
        rays_per_frame = None

    def sync(x):
        # scalar-slice transfer: block_until_ready under-reports through the
        # axon tunnel (measured), a host transfer is the honest fence
        import numpy as np

        return np.asarray(x[0, 0])

    # warmup / compile (both batch sizes)
    big = 9
    t0 = time.perf_counter()
    sync(run_frame(0, 1))
    compile_s = time.perf_counter() - t0
    sync(run_frame(0, big))

    # slope timing: per-frame device cost = (T(big) - T(1)) / (big - 1),
    # which cancels the per-call host/tunnel round trip (block_until_ready
    # and single synced calls both mis-measure through the axon tunnel)
    def timed(nframes, f0):
        ts = []
        for f in range(args.frames):
            t0 = time.perf_counter()
            sync(run_frame(f0 + f, nframes))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    t_one = timed(1, 10)
    t_big = timed(big, 50)
    frame_s = max((t_big - t_one) / (big - 1), 1e-6)

    if rays_per_frame is None:
        _, nrays = step(sd, cam, jax.random.fold_in(key, 999), 1)
        rays_per_frame = float(nrays)

    ms_per_frame = frame_s * 1000.0
    mrays = rays_per_frame / frame_s / 1e6
    result = {
        "metric": f"Mrays/s {args.scene} {args.width}x{args.height} "
                  f"{args.spp}spp depth{args.depth} ({accel}, {jax.default_backend()})",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / NOMINAL_BASELINE_MRAYS, 4),
        "ms_per_frame": round(ms_per_frame, 2),
        "fps": round(1000.0 / ms_per_frame, 2),
        "rays_per_frame": int(rays_per_frame),
        "compile_s": round(compile_s, 1),
        "accel": accel,
        "rr_start": getattr(args, "rr_start", 0),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
