"""SMEM ceiling probe: how many primitives fit the megakernel's tables?

The megakernel keeps S/P/cluster/super tables in SMEM (dynamic per-prim
scalar loads — render_kernel.py BlockSpecs), so primitive capacity is
bounded by scalar memory, not HBM.  This probe bisects the largest
synthetic scene (random spheres) whose compiled 128x16 launch Mosaic
accepts on the real chip, separately for the plain and the vattr table
layouts.  The answer sizes the round-4 scaling design (BASELINE.md
"Queued TPU measurements"): below-ceiling scenes keep the current layout;
beyond it needs VMEM->SMEM table tiles or a VMEM-resident prim test.

Usage: python tools/smem_probe.py [--lo 1024] [--hi 16384]
Each attempt runs in a SUBPROCESS so a Mosaic lowering failure (or an
SMEM overflow abort) cannot take down the bisection loop.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

_ATTEMPT = r"""
import os
import sys
import numpy as np
import jax

# CRT_SMEM_PROBE_INTERPRET=1: CPU smoke mode for testing the harness
# itself (interpret mode has no SMEM limit, so it can't measure anything)
_interp = bool(os.environ.get("CRT_SMEM_PROBE_INTERPRET"))
if _interp:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

n = int(sys.argv[1])
vattr = bool(int(sys.argv[2]))

from cudaraytracer_tpu.models.scene import Scene
from cudaraytracer_tpu.models.scenes import default_scene_camera
from cudaraytracer_tpu.ops.pallas.render_kernel import (
    pack_camera, pack_scene_tables, pallas_render_sample)
from cudaraytracer_tpu.utils import mesh

rng = np.random.RandomState(7)
sc = Scene(capacity=n)
if vattr:
    # image-textured triangle meshes with per-vertex attrs: the maximal
    # table layout (P_ROWS_UV + 3 vnorm + 6 uv rows = 18) + atlas args
    tex = np.full((8, 8, 3), 128, np.uint8)
    slot = sc.load_image_texture(tex)
    v, f = mesh.icosphere(1)
    uv = np.zeros((len(v), 2), np.float32)
    k = max(1, (n - 8) // len(f))
    for i in range(k):
        sc.add_mesh(mesh.transformed(v, scale=0.5,
                                     translate=(i * 2.0, 0.0, -3.0)),
                    f, uvs=uv, normals=v, tex_type=2, tex_id=slot)
else:
    for _ in range(n - 4):
        c = rng.uniform(-20, 20, 3)
        sc.add_sphere(c, 0.4)

t = pack_scene_tables(sc, with_uv=vattr)
tabs = tuple(jnp.asarray(x) for x in (t.S, t.P, t.clusters, t.supers))
sd = sc.device()
cam_vec = pack_camera(default_scene_camera(), sd, 128, 16, 1e-3)
atl = dict(atlas=jnp.asarray(sc.atlas),
           tex_hw=jnp.asarray(sc.tex_hw)) if vattr else {}


def run():
    return pallas_render_sample(
        *tabs, t.n_super, cam_vec, 7, 2, width=128, height=16,
        camera_model="two_plane", tile_h=16, tile_w=128,
        cluster=t.cluster, super_=t.super_, has_tris=vattr,
        has_vattrs=t.vattrs, **atl)


if _interp:
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        out = run()
else:
    out = run()
if isinstance(out, tuple):
    out = out[0]
out.block_until_ready()
print("OK", n, t.S.shape, t.P.shape)
"""


def attempt(n: int, vattr: bool, timeout: float = 300.0) -> bool:
    import time

    try:
        r = subprocess.run(
            [sys.executable, "-c", _ATTEMPT, str(n), str(int(vattr))],
            capture_output=True, text=True, timeout=timeout,
        )
        ok = r.returncode == 0 and "OK" in r.stdout
        tail = (r.stdout + r.stderr).strip().splitlines()
        why = "" if ok else f" ({tail[-1][:120] if tail else 'no output'})"
    except subprocess.TimeoutExpired:
        # the killed child was a mid-execution TPU client: per the wedge
        # protocol leave the device COMPLETELY idle before the next try
        ok, why = False, " (timeout; idling 10 min for the wedge to clear)"
        print(f"  n={n} vattr={vattr}: FAIL{why}", flush=True)
        time.sleep(600)
        return False
    print(f"  n={n} vattr={vattr}: {'OK' if ok else 'FAIL'}{why}", flush=True)
    if not ok:
        # an SMEM-overflow abort can FAULT the chip (recovers in ~1 min);
        # probing again immediately would fail spuriously and walk the
        # bisection below the true ceiling
        time.sleep(75)
    return ok


def bisect(lo: int, hi: int, vattr: bool) -> int:
    """Largest OK capacity in [lo, hi] (lo assumed OK, hi assumed beyond)."""
    if not attempt(lo, vattr):
        return 0
    if attempt(hi, vattr):
        return hi
    while hi - lo > max(lo // 16, 64):
        mid = (lo + hi) // 2
        if attempt(mid, vattr):
            lo = mid
        else:
            hi = mid
    return lo


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lo", type=int, default=1024)
    ap.add_argument("--hi", type=int, default=16384)
    args = ap.parse_args()

    results = {}
    for vattr in (False, True):
        print(f"bisecting {'vattr' if vattr else 'plain'} layout "
              f"[{args.lo}, {args.hi}] ...", flush=True)
        results["vattr" if vattr else "plain"] = bisect(
            args.lo, args.hi, vattr)
    print(json.dumps({"smem_prim_ceiling": results}))


if __name__ == "__main__":
    main()
