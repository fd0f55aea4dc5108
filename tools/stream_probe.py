"""Table-streaming feasibility probe: HBM -> SMEM DMA inside a kernel.

Sizes the round-4 beyond-ceiling design (BASELINE.md "Round-4 scaling
candidate"): the megakernel's prim tables are SMEM-resident, capping
scenes at 10,144/6,064 prims.  Streaming would keep the full table in
HBM and DMA per-supercluster tiles into a small SMEM scratch as the
wave visits them.  Two questions decide the design before any kernel
surgery:

  1. Does Mosaic LOWER ``pltpu.make_async_copy(hbm_ref.at[i], smem
     scratch, sem)`` on a real v5e at all?  (The guide documents
     HBM->VMEM; SMEM as a DMA destination is the unproven part.)
  2. What does one tile copy COST?  The megakernel enters ~85% of
     clusters per deep wave (BASELINE.md entered-cluster diagnostic), so
     per-wave streaming pays ~n_super copies; if a 2-4 KB copy costs
     more than the ~10 us a supercluster's prim loop takes, streaming
     loses to the resident layout everywhere under the ceiling and is
     purely a capacity feature.

Method: a minimal kernel loops over T tiles of an int32 table.  Variant
"stream" keeps the table in ANY/HBM and DMAs each [tile_len] row into
SMEM scratch before scalar-reading it; variant "resident" gets the whole
table as an SMEM input (the megakernel's current layout) and does the
identical reads.  Per-tile cost = slope of total kernel time over T
between two tile counts; stream minus resident = DMA overhead.

Usage: python tools/stream_probe.py [--interpret] [--tile-len 512]
Prints one JSON line; failures are reported per-variant in the JSON
(the Mosaic error IS the answer to question 1).

MEASURED ANSWER (v5e, round 3 — BASELINE.md "Table-streaming
feasibility"): HBM->SMEM copies lower and run, but only at tile_len
<= 128 int32 (512 B, one 128-lane row) per copy; 192+ crashes the
Mosaic compile helper while the resident control compiles at every
size.  Per-copy overhead is under tunnel noise (~0.05-0.35 us).
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np


def _build(variant: str, n_tiles: int, tile_len: int, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    reads = 32  # dynamic scalar reads per tile (megakernel: ~rows/prim)

    def kernel_stream(tab_ref, out_ref, smem, sem):
        def tile_body(i, acc):
            cp = pltpu.make_async_copy(tab_ref.at[i], smem, sem)
            cp.start()
            cp.wait()

            def rd(j, a):
                return a + smem[(i * 7 + j * 13) % tile_len]

            return jax.lax.fori_loop(0, reads, rd, acc)

        acc = jax.lax.fori_loop(0, n_tiles, tile_body, jnp.int32(0))
        out_ref[0, 0] = acc

    def kernel_resident(tab_ref, out_ref):
        def tile_body(i, acc):
            def rd(j, a):
                return a + tab_ref[i, (i * 7 + j * 13) % tile_len]

            return jax.lax.fori_loop(0, reads, rd, acc)

        acc = jax.lax.fori_loop(0, n_tiles, tile_body, jnp.int32(0))
        out_ref[0, 0] = acc

    tab = jnp.arange(n_tiles * tile_len, dtype=jnp.int32).reshape(
        n_tiles, tile_len)
    out_shape = jax.ShapeDtypeStruct((1, 1), jnp.int32)
    if variant == "stream":
        fn = pl.pallas_call(
            kernel_stream,
            out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[
                pltpu.SMEM((tile_len,), jnp.int32),
                pltpu.SemaphoreType.DMA(()),
            ],
            interpret=False if not interpret else True,
        )
    else:
        fn = pl.pallas_call(
            kernel_resident,
            out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            interpret=False if not interpret else True,
        )
    return functools.partial(jax.jit(fn), tab)


def _expected(n_tiles: int, tile_len: int) -> int:
    reads = 32
    i = np.arange(n_tiles)[:, None]
    j = np.arange(reads)[None, :]
    idx = (i * 7 + j * 13) % tile_len
    vals = (i * tile_len + idx).astype(np.int64)
    return int(np.int32(vals.sum() & 0xFFFFFFFF))  # int32 wraparound


def _time(fn, frames: int = 8) -> float:
    fn()[0, 0].block_until_ready()  # compile + first dispatch
    t0 = time.perf_counter()
    r = None
    for _ in range(frames):
        r = fn()
    np.asarray(r)  # one sync at the end: slope protocol
    return (time.perf_counter() - t0) / frames * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true",
                    help="CPU interpret-mode smoke (semantics only)")
    ap.add_argument("--tile-len", type=int, default=512,
                    help="int32s per tile (512 = 2 KB, ~a 15-prim "
                         "vattr supercluster table slice)")
    ap.add_argument("--lo", type=int, default=64)
    ap.add_argument("--hi", type=int, default=512,
                    help="tile counts for the slope (resident variant "
                         "holds hi*tile_len*4 B in SMEM — keep under "
                         "the ~1 MB ceiling)")
    args = ap.parse_args()

    if args.interpret:
        import jax

        jax.config.update("jax_platforms", "cpu")

    out: dict = {"tile_len": args.tile_len,
                 "mode": "interpret" if args.interpret else "compiled"}
    n_lo, n_hi = args.lo, args.hi
    for variant in ("resident", "stream"):
        try:
            f_lo = _build(variant, n_lo, args.tile_len, args.interpret)
            f_hi = _build(variant, n_hi, args.tile_len, args.interpret)
            got = int(np.asarray(f_lo())[0, 0])
            want = _expected(n_lo, args.tile_len)
            if got != want:
                raise AssertionError(f"wrong sum: {got} != {want}")
            ms_lo, ms_hi = _time(f_lo), _time(f_hi)
            per_tile_us = (ms_hi - ms_lo) / (n_hi - n_lo) * 1e3
            out[variant] = {"ms_64": round(ms_lo, 4),
                            "ms_512": round(ms_hi, 4),
                            "us_per_tile": round(per_tile_us, 3)}
        except Exception as e:  # noqa: BLE001 — the error IS the result
            out[variant] = {"error": f"{type(e).__name__}: {e}"[:300]}
    if ("us_per_tile" in out.get("stream", {})
            and "us_per_tile" in out.get("resident", {})):
        out["dma_overhead_us_per_tile"] = round(
            out["stream"]["us_per_tile"] - out["resident"]["us_per_tile"],
            3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
