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

``--rows R`` (R > 1) asks the follow-up question that decides the
streamed-megakernel design: a supercluster's table tile is 2-D
(f32[rows=16..34, cols<=112]), so is ONE 2-D copy legal (destination
rows*cols words > the 1-D 128-word cap but each row under it), or must
the kernel chain R per-row copies?  Adds variants:
  stream2d   — one make_async_copy of the whole [R, tile_len] tile
  streamrows — R per-row copies, all started back-to-back, then waited
               (the chained form the kernel would use if 2d fails)
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np


def _build(variant: str, n_tiles: int, tile_len: int, interpret: bool,
           rows: int = 1):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    reads = 32  # dynamic scalar reads per tile (megakernel: ~rows/prim)

    if rows > 1:
        return _build_2d(variant, n_tiles, tile_len, rows, reads, interpret)

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


def _build_2d(variant: str, n_tiles: int, tile_len: int, rows: int,
              reads: int, interpret: bool):
    """rows>1 variants: the table is f32-sized int32[n_tiles, rows,
    tile_len] — one supercluster-tile per leading index, exactly the
    streamed megakernel's layout."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def reads_body(i, acc, at):
        def rd(j, a):
            return a + at((i * 3 + j * 5) % rows,
                          (i * 7 + j * 13) % tile_len)

        return jax.lax.fori_loop(0, reads, rd, acc)

    def kernel_stream2d(tab_ref, out_ref, smem, sem):
        def tile_body(i, acc):
            cp = pltpu.make_async_copy(tab_ref.at[i], smem, sem)
            cp.start()
            cp.wait()
            return reads_body(i, acc, lambda r, c: smem[r, c])

        out_ref[0, 0] = jax.lax.fori_loop(0, n_tiles, tile_body,
                                          jnp.int32(0))

    def kernel_streamrows(tab_ref, out_ref, smem, sem):
        def tile_body(i, acc):
            # chained form: start every row copy back-to-back (the DMA
            # engine overlaps them), then wait them all — the issue cost
            # of this loop is the quantity the streamed kernel design
            # needs (rows starts per supercluster visit)
            cps = [pltpu.make_async_copy(tab_ref.at[i, r], smem.at[r], sem)
                   for r in range(rows)]
            for cp in cps:
                cp.start()
            for cp in cps:
                cp.wait()
            return reads_body(i, acc, lambda r, c: smem[r, c])

        out_ref[0, 0] = jax.lax.fori_loop(0, n_tiles, tile_body,
                                          jnp.int32(0))

    def kernel_resident(tab_ref, out_ref):
        def tile_body(i, acc):
            return reads_body(i, acc, lambda r, c: tab_ref[i, r, c])

        out_ref[0, 0] = jax.lax.fori_loop(0, n_tiles, tile_body,
                                          jnp.int32(0))

    tab = jnp.arange(n_tiles * rows * tile_len, dtype=jnp.int32).reshape(
        n_tiles, rows, tile_len)
    out_shape = jax.ShapeDtypeStruct((1, 1), jnp.int32)
    common = dict(out_shape=out_shape,
                  out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
                  interpret=bool(interpret))
    if variant == "resident":
        fn = pl.pallas_call(
            kernel_resident,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            **common,
        )
    else:
        fn = pl.pallas_call(
            kernel_stream2d if variant == "stream2d" else kernel_streamrows,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            scratch_shapes=[
                pltpu.SMEM((rows, tile_len), jnp.int32),
                pltpu.SemaphoreType.DMA(()),
            ],
            **common,
        )
    return functools.partial(jax.jit(fn), tab)


def _expected(n_tiles: int, tile_len: int, rows: int = 1) -> int:
    reads = 32
    i = np.arange(n_tiles)[:, None]
    j = np.arange(reads)[None, :]
    c = (i * 7 + j * 13) % tile_len
    r = (i * 3 + j * 5) % rows if rows > 1 else 0
    vals = ((i * rows + r) * tile_len + c).astype(np.int64)
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
    ap.add_argument("--rows", type=int, default=1,
                    help=">1: 2-D supercluster-tile variants (stream2d = "
                         "one [rows, tile_len] copy; streamrows = rows "
                         "chained per-row copies)")
    args = ap.parse_args()

    if args.interpret:
        import jax

        jax.config.update("jax_platforms", "cpu")

    out: dict = {"tile_len": args.tile_len, "rows": args.rows,
                 "mode": "interpret" if args.interpret else "compiled"}
    n_lo, n_hi = args.lo, args.hi
    variants = (("resident", "stream") if args.rows == 1
                else ("resident", "stream2d", "streamrows"))
    for variant in variants:
        try:
            f_lo = _build(variant, n_lo, args.tile_len, args.interpret,
                          rows=args.rows)
            f_hi = _build(variant, n_hi, args.tile_len, args.interpret,
                          rows=args.rows)
            got = int(np.asarray(f_lo())[0, 0])
            want = _expected(n_lo, args.tile_len, rows=args.rows)
            if got != want:
                raise AssertionError(f"wrong sum: {got} != {want}")
            ms_lo, ms_hi = _time(f_lo), _time(f_hi)
            per_tile_us = (ms_hi - ms_lo) / (n_hi - n_lo) * 1e3
            out[variant] = {"ms_lo": round(ms_lo, 4),
                            "ms_hi": round(ms_hi, 4),
                            "us_per_tile": round(per_tile_us, 3)}
        except Exception as e:  # noqa: BLE001 — the error IS the result
            out[variant] = {"error": f"{type(e).__name__}: {e}"[:300]}
    for variant in variants[1:]:
        if ("us_per_tile" in out.get(variant, {})
                and "us_per_tile" in out.get("resident", {})):
            out[f"dma_overhead_us_per_tile_{variant}"] = round(
                out[variant]["us_per_tile"]
                - out["resident"]["us_per_tile"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
