"""Pallas closest-hit kernel over a compacted, sorted ray wavefront.

The second half of the wavefront architecture (BASELINE.json north star:
"vectorized stackless traversal with masked while_loops and ray
sorting/compaction"): the XLA side keeps full per-ray state, sorts rays by
liveness + direction octant + origin cell between bounces, and calls this
kernel for the expensive closest-hit only.  Because rays arrive compacted
(dead ones at the tail) and coherence-sorted, two things happen that the
in-kernel megakernel can't do after the first bounce:

  * whole tiles whose rays are all dead are skipped by a scalar cond on
    ``tile_start < n_alive`` — work decays with the live-ray count;
  * tiles contain rays with similar direction/origin, so the hierarchical
    AABB culling (shared ``hierarchical_search``) keeps rejecting clusters
    even for secondary bounces.

Layout: rays come as six f32 planes reshaped to [R/128, 128]; each grid
step processes an (8, 128) block = 1024 rays.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .render_kernel import BIG, hierarchical_search

TILE_ROWS = 8
TILE = TILE_ROWS * 128


def _hit_kernel(
    cnt_ref,  # SMEM i32[2]: n_super, n_alive
    fparam_ref,  # SMEM f32[1]: t_min
    s_ref,  # SMEM f32[16, NP]
    clus_ref,  # SMEM f32[7, NC] (rows 0-5 AABB, row 6 kind)
    super_ref,  # SMEM f32[6, NSC]
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,  # VMEM (8,128) blocks
    t_ref, j_ref,  # VMEM (8,128) outputs
    *,
    has_rects: bool,
    has_tris: bool = False,
):
    i = pl.program_id(0)
    n_super = cnt_ref[0]
    n_alive = cnt_ref[1]
    t_min = fparam_ref[0]
    tile_start = i * TILE

    def dead(_):
        t_ref[...] = jnp.full((TILE_ROWS, 128), BIG, jnp.float32)
        j_ref[...] = jnp.full((TILE_ROWS, 128), -1.0, jnp.float32)

    def live(_):
        ox, oy, oz = ox_ref[...], oy_ref[...], oz_ref[...]
        dx, dy, dz = dx_ref[...], dy_ref[...], dz_ref[...]
        # lane liveness: rays are compacted, so ray_id < n_alive
        rr = lax.broadcasted_iota(jnp.int32, (TILE_ROWS, 128), 0)
        cc = lax.broadcasted_iota(jnp.int32, (TILE_ROWS, 128), 1)
        ray_id = tile_start + rr * 128 + cc
        alive = ray_id < n_alive
        best_t0 = jnp.where(alive, jnp.float32(BIG), t_min)
        bt, bj, _nclus = hierarchical_search(
            s_ref, clus_ref, super_ref, n_super,
            ox, oy, oz, dx, dy, dz, t_min, best_t0, has_rects,
            has_tris=has_tris,
        )
        t_ref[...] = bt
        j_ref[...] = bj

    lax.cond(tile_start < n_alive, live, dead, 0)


def pallas_closest_hit(
    s_tab: jnp.ndarray,  # f32[16, NP]
    clusters: jnp.ndarray,  # f32[7, NC]
    supers: jnp.ndarray,  # f32[6, NSC]
    n_super,  # i32 scalar
    n_alive,  # i32 scalar (rays must be compacted: live rays first)
    org: jnp.ndarray,  # f32[R, 3], R % 1024 == 0
    dirn: jnp.ndarray,  # f32[R, 3], unit directions
    t_min: float = 0.001,
    has_rects: bool = True,
    has_tris: bool = False,
    interpret: bool = False,
):
    """Closest hit for a compacted wavefront.

    Returns (hit bool[R], t f32[R], packed_col i32[R]) — packed_col indexes
    the Morton-sorted table order; map to scene slots with the prim_map
    from pack_scene_tables callers.
    """
    r = org.shape[0]
    assert r % TILE == 0, r
    rows = r // 128
    grid = (rows // TILE_ROWS,)

    cnt = jnp.stack([
        jnp.asarray(n_super, jnp.int32), jnp.asarray(n_alive, jnp.int32)
    ])
    fparam = jnp.asarray([t_min], jnp.float32)

    plane = lambda v: v.reshape(rows, 128)  # noqa: E731
    ray_spec = pl.BlockSpec((TILE_ROWS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)

    kern = functools.partial(_hit_kernel, has_rects=has_rects,
                             has_tris=has_tris)
    t, j = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            ray_spec, ray_spec, ray_spec, ray_spec, ray_spec, ray_spec,
        ],
        out_specs=(ray_spec, ray_spec),
        out_shape=(
            jax.ShapeDtypeStruct((rows, 128), jnp.float32),
            jax.ShapeDtypeStruct((rows, 128), jnp.float32),
        ),
        interpret=interpret,
    )(
        cnt, fparam, s_tab, clusters, supers,
        plane(org[:, 0]), plane(org[:, 1]), plane(org[:, 2]),
        plane(dirn[:, 0]), plane(dirn[:, 1]), plane(dirn[:, 2]),
    )
    t = t.reshape(r)
    j = j.reshape(r).astype(jnp.int32)
    return j >= 0, t, j
