"""PRNG stream independence for the megakernel's multi-chip seeding.

The sharded path seeds each (band, sample-stream) device with
``pltpu.prng_seed(frame_seed, stream * 262144 + tile_id)``
(ops/pallas/render_kernel.py prng_seed call; stream assignment at
parallel/tiling.py ``stream=ri*n_samp+si``).  Two properties matter:

1. the (stream, tile) packing is injective over the production ranges —
   otherwise two devices could hand the hardware PRNG the same tuple and
   draw identical randomness (testable host-side, below);
2. distinct tuples actually produce decorrelated sample streams — this is
   a property of the TPU hardware PRNG and is untestable in interpret mode
   (interpret-mode prng is seed-insensitive, CLAUDE.md), so the
   decorrelation test runs the COMPILED kernel in a TPU subprocess, gated
   by CRT_TPU_TESTS=1.  Measured on v5e (round 3): stream0-vs-stream0
   maxdiff 0.0 (determinism), stream0-vs-stream1 99.8% of pixels differ,
   means 0.6444 vs 0.6424, noise-difference correlation 0.492 vs the 0.50
   expected for independent streams sharing a common term.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

STREAM_FACTOR = 262144  # 2^18, matches render_kernel.prng_seed packing


def test_stream_tile_packing_injective():
    """stream*2^18 + tile_id must be injective over the production ranges
    (tiles per band < 2^18, streams < 2^13) — and the production workloads
    actually fit those ranges."""
    # exhaustive over the corners + randomized interior
    rng = np.random.default_rng(0)
    streams = np.concatenate([[0, 1, 2, 8191], rng.integers(0, 8192, 200)])
    tiles = np.concatenate([[0, 1, 262143], rng.integers(0, 262144, 200)])
    s, t = np.meshgrid(streams, tiles)
    packed = (s.astype(np.int64) * STREAM_FACTOR + t.astype(np.int64)).ravel()
    pairs = set(zip(s.ravel().tolist(), t.ravel().tolist()))
    assert len(np.unique(packed)) == len(pairs)
    # int32 kernel arithmetic must not overflow: max packed value
    assert 8191 * STREAM_FACTOR + 262143 < 2**31
    # production tile counts fit: 1280x720 at 16x256 tiles = 45*5 = 225
    # tiles/band << 2^18; an 8-device mesh uses streams 0..7 << 2^13
    assert (720 // 16) * (1280 // 256) < STREAM_FACTOR


def test_distinct_devices_get_distinct_streams():
    """The mesh assigns stream = row_index * n_samples + sample_index —
    all-distinct over any rows x samples grid (tiling.py)."""
    for n_rows, n_samp in [(8, 1), (4, 2), (2, 4), (1, 8), (16, 16)]:
        streams = [ri * n_samp + si
                   for ri in range(n_rows) for si in range(n_samp)]
        assert len(set(streams)) == n_rows * n_samp
        assert max(streams) < 8192  # within the injective packing range


_TPU_DECOR_CODE = r"""
import numpy as np, jax, jax.numpy as jnp
from cudaraytracer_tpu.models import scenes
from cudaraytracer_tpu.ops.pallas.render_kernel import (
    pack_camera, pack_scene_tables, pallas_render_sample)

scene = scenes.default_scene()
sd = scene.device()
t = pack_scene_tables(scene)
W, H = 256, 64
cam_vec = pack_camera(scenes.default_scene_camera(), sd, W, H, 1e-3)
tables = tuple(jnp.asarray(x) for x in (t.S, t.P, t.clusters, t.supers))

@jax.jit
def frame(S, P, C, SC, cam_vec, seed, stream):
    return pallas_render_sample(
        S, P, C, SC, t.n_super, cam_vec, seed, 6,
        width=W, height=H, camera_model="two_plane",
        tile_h=16, tile_w=128, stream=stream)

a0 = np.asarray(frame(*tables, cam_vec, jnp.int32(7), jnp.int32(0)))
a0b = np.asarray(frame(*tables, cam_vec, jnp.int32(7), jnp.int32(0)))
a1 = np.asarray(frame(*tables, cam_vec, jnp.int32(7), jnp.int32(1)))
a2 = np.asarray(frame(*tables, cam_vec, jnp.int32(7), jnp.int32(9)))
assert np.abs(a0 - a0b).max() == 0.0, "same stream must be deterministic"
for b in (a1, a2):
    # a colliding stream would reproduce a0 exactly; independent streams
    # re-roll nearly every pixel while agreeing in the mean
    assert (np.abs(a0 - b).max(-1) > 1e-6).mean() > 0.9
    assert abs(a0.mean() - b.mean()) < 0.01
d01, d02 = a0 - a1, a0 - a2
c = (d01 * d02).sum() / np.sqrt((d01 * d01).sum() * (d02 * d02).sum())
# independent streams share only the a0 term -> corr(a0-a1, a0-a2) ~= 0.5
assert 0.3 < c < 0.7, f"noise-difference corr {c} outside independence band"
print("STREAMS OK", c)
"""


@pytest.mark.skipif(
    not os.environ.get("CRT_TPU_TESTS"),
    reason="compiled-TPU PRNG test (interpret-mode prng is seed-insensitive); "
           "set CRT_TPU_TESTS=1 on a machine with a healthy TPU",
)
def test_pallas_stream_decorrelation_compiled_tpu():
    """Distinct `stream` values fed to the compiled kernel must produce
    decorrelated samples with matching means — the test that would fail if
    two mesh devices drew identical randomness."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = [p for p in env.get("PYTHONPATH", "").split(os.pathsep) if p]
    if os.path.isdir("/root/.axon_site") and "/root/.axon_site" not in pp:
        pp.append("/root/.axon_site")
    env["PYTHONPATH"] = os.pathsep.join([repo] + pp)
    out = subprocess.run(
        [sys.executable, "-c", _TPU_DECOR_CODE], cwd=repo, env=env,
        capture_output=True, text=True, timeout=570,
    )
    assert out.returncode == 0, f"stdout={out.stdout}\nstderr={out.stderr}"
    assert "STREAMS OK" in out.stdout
