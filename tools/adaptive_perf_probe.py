"""Adaptive-sampling perf probe at 720p on the real chip.

Two measurements (slope protocol, BASELINE.md "Measurement protocol"):

A) KERNEL SCALING vs active-tile fraction: freeze hand-built tile masks
   (tau ~ 0 so nothing converges) at fractions 1.0 / 0.5 / 0.25 / 0.1 and
   slope-time chained adaptive launches at each.  This isolates the claim
   "frame time scales with the UNCONVERGED tile count" from the
   convergence schedule, and the 1.0 row vs the plain (non-adaptive) step
   quantifies the adaptive-stats overhead.

B) PRODUCT DECAY: a fresh app with default knobs (tau 0.016, q 0.95,
   min 8) runs the real convergence schedule in 25-frame bursts; each
   burst ends with one mask fetch (the only sync), so the per-burst
   ms/frame shows the frame time falling as tiles freeze.

Run in a FRESH process with the TPU idle (never two TPU processes at
once):  timeout 1200 python tools/adaptive_perf_probe.py [--scene NAME]
[--decay-only] — e.g. --scene terrain_big measures the adaptive x
streamed seam (round-3 VERDICT Next #2c: expect the 48 ms streamed frame
to fall with the active-tile fraction as sky tiles converge).
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax.numpy as jnp

    from cudaraytracer_tpu.config import RenderConfig
    from cudaraytracer_tpu.models import scenes as scene_lib
    from cudaraytracer_tpu.viewer.app import Application

    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="rtow_final")
    ap.add_argument("--decay-only", action="store_true",
                    help="skip the frozen-mask scaling section")
    ap.add_argument("--bursts", type=int, default=16)
    args = ap.parse_args()

    out = {"scene": args.scene}

    def make_app(adaptive):
        cfg = RenderConfig(width=1280, height=720, max_depth=12,
                           scene=args.scene,
                           camera_model=scene_lib.camera_model_for(args.scene),
                           accel="pallas", progressive=True,
                           progressive_spp=1, adaptive=adaptive,
                           sync_every=100000)  # probe syncs by hand
        app = Application(cfg)
        rl = app.setup_default_layers()
        assert rl._pallas is not None, "pallas accel required"
        return app, rl

    def sync(rl):
        np.asarray(rl._accum)  # big buffer: streams fine over the tunnel

    def burst(app, rl, k):
        t0 = time.perf_counter()
        app.run(max_frames=k)
        sync(rl)
        return (time.perf_counter() - t0) / k * 1000.0

    # ---------------- A) fixed-mask scaling + adaptive-stats overhead
    if not args.decay_only:
        print("== plain (non-adaptive) step, slope over 30 frames")
        app, rl = make_app(adaptive=False)
        burst(app, rl, 3)  # compile + warm
        plain_ms = burst(app, rl, 30)
        print(f"plain: {plain_ms:.2f} ms/frame")
        out["plain_ms"] = round(plain_ms, 2)
        app.close()

    if not args.decay_only:
        print("== adaptive step, frozen masks (tau ~ 0: nothing converges)")
        app, rl = make_app(adaptive=True)
        rl.cfg.adaptive_tau = 1e-12  # no pixel clears the bar -> mask frozen
        p = rl._pallas
        burst(app, rl, 3)  # compile + warm
        nt = int(np.asarray(p._mask).size)
        rng = np.random.default_rng(0)
        rows = []
        for frac in (1.0, 0.5, 0.25, 0.1):
            m = np.zeros(nt, np.int32)
            k = max(1, int(round(frac * nt)))
            m[rng.choice(nt, size=k, replace=False)] = 1
            p._mask = jnp.asarray(m)
            burst(app, rl, 2)  # settle the new mask
            ms = burst(app, rl, 30)
            rows.append({"active_frac": frac, "active_tiles": k,
                         "ms_per_frame": round(ms, 2)})
            print(f"active={frac:4.2f} ({k:3d}/{nt} tiles): {ms:.2f} ms/frame")
        out["frozen_mask_rows"] = rows
        out["adaptive_overhead_ms"] = round(
            rows[0]["ms_per_frame"] - plain_ms, 2)
        app.close()

    # ---------------- B) product decay with default knobs
    print("== product decay (defaults: tau=0.016 q=0.95 min=8)")
    app, rl = make_app(adaptive=True)
    p = rl._pallas
    burst(app, rl, 3)  # compile + warm (counts toward the schedule)
    decay = []
    for b in range(args.bursts):
        t0 = time.perf_counter()
        app.run(max_frames=25)
        frac = p.active_fraction()  # one small fetch = the burst's sync
        ms = (time.perf_counter() - t0) / 25 * 1000.0
        decay.append({"frames": 3 + 25 * (b + 1),
                      "ms_per_frame": round(ms, 2),
                      "active_pct": round(frac * 100.0, 1)})
        print(f"frames={decay[-1]['frames']:4d}: {ms:6.2f} ms/frame, "
              f"active={frac * 100.0:5.1f}%")
        if frac == 0.0:
            break
    counts = np.asarray(rl._counts)
    out["decay"] = decay
    out["counts_min_mean_max"] = [float(counts.min()),
                                  round(float(counts.mean()), 1),
                                  float(counts.max())]
    app.close()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
