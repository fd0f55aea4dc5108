"""Pallas TPU megakernel: full path trace of a pixel tile in VMEM.

This is the TPU-native answer to the reference's CUDA megakernel
(reference: CudaRayTracer/src/Cuda/Kernel.cu:102-158): one kernel does ray
generation, the bounce loop, intersection, shading, and sky — but instead
of one thread per pixel it processes a whole (TH x W) pixel tile per grid
step with every per-ray quantity living in VMEM for the kernel's lifetime.
The XLA wavefront path (models/renderer.py) round-trips ~20 [R,B] buffers
through HBM per bounce; this kernel's only HBM traffic is the final
radiance write, so it is compute- rather than bandwidth-bound.

Acceleration: primitives are Morton-sorted on the host and grouped into
fixed-size clusters with precomputed AABBs.  Each bounce tests the tile's
rays against every cluster AABB (a handful of VPU ops each) and skips the
whole cluster's primitive loop with a scalar `@pl.when` unless SOME live
ray hits it.  This is tile-coherent culling: the TPU-idiomatic replacement
for per-ray BVH descent (reference Hittable.cuh:387-439) — no per-lane
stacks and no gathers, just predicated straight-line code.  Primary rays
and sky tiles skip almost everything; the tile also exits the bounce loop
as soon as every one of its rays has terminated.

RNG is the hardware PRNG (pltpu.prng_*), seeded per (tile, sample); the
closed-form unit-sphere sampling matches utils/rng.py semantics.

Image textures (Texture.cuh:70-109) use TWO-RECORD DEFERRAL: per-lane atlas
gathers don't vectorize on the VPU, so the kernel records up to two image-
texture (u, v, slot) lookups per lane, splits radiance into three
accumulators (r + tex1*rp + tex2*[tex1 if chained]*rq), and two XLA gathers
per frame apply the texels — exact for up to two image-texture factors per
lane per launch (covering both a single path hitting two image prims, e.g.
facing image rects, and two consecutive samples with one image hit each);
third-and-later hits use the atlas mean color.  Samples still batch per
launch: lanes path-regenerate until both records are consumed, then park,
and the launch returns per-pixel sample counts (see pallas_render_sample).
"""

from __future__ import annotations

import functools
import math
import typing as _t

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import qmc as _qmc

# ----------------------------------------------------------------- tables
# Search table S: f32[16, NP] — one column per primitive (Morton-sorted).
# Rows 13-15 hold the triangle's second edge (spare for other types).
S_CX, S_CY, S_CZ, S_R2, S_PTYPE, S_KAX, S_CK, S_CA, S_CB, S_HA, S_HB, \
    S_AAX, S_BAX = range(13)
# Triangle columns (BEYOND-REFERENCE prim type 4) overlay the rect rows —
# type dispatch means no column ever reads both meanings.  The per-prim
# test is the Havel-Herout precomputed-plane form ("Yet Faster
# Ray-Triangle Intersection", IEEE TVCG 2010): the packers precompute
# (in f64, rounded once to f32)
#   N  = e1 x e2 (UNnormalized),  d_n = N.v0          (plane equation)
#   n1 = (e2 x N)/(N.N),          d1 = -v0.n1         (u barycentric plane)
#   m2 = (N x e1)/(N.N),          d2 = -v0.m2         (v barycentric plane)
# so in-kernel  t = (d_n - N.o)/(N.d);  p = o + t d;  u = p.n1 + d1;
# v = p.m2 + d2 — no cross product and a single inv-multiply per prim
# (~20% fewer VPU ops than triple-product Moller-Trumbore, which matters
# because the kernel is issue-bound).  Row map: KAX/AAX/BAX = N;
# CX/CY/CZ = n1; CK/CA/CB = m2; rows 13-15 = d_n, d1, d2.  R2/HA/HB stay
# -1 so the sphere/rect tests of a MIXED cluster can never hit a triangle
# column (Cauchy-Schwarz / extent<0).
S_NX, S_NY, S_NZ = S_KAX, S_AAX, S_BAX
S_N1X, S_N1Y, S_N1Z = S_CX, S_CY, S_CZ
S_M2X, S_M2Y, S_M2Z = S_CK, S_CA, S_CB
S_DN, S_D1, S_D2 = 13, 14, 15
# Constant-density MEDIA (prim SPHERE + mat ISOTROPIC, BEYOND-REFERENCE
# RTOW book-2 ConstantMedium) pack as ptype 5: sphere rows (center, R2)
# plus the DENSITY in the rect-only S_CK row (spheres never read it).
S_DENS = S_CK
# MOVING spheres (BEYOND-REFERENCE RTOW book-2 motion blur): the shutter
# velocity rides the rect-only S_CK/S_CA/S_CB rows of PLAIN sphere
# columns (zero for static spheres, so the motion test reduces exactly).
# Media cannot move (S_CK holds their density) — documented limit.
S_VX, S_VY, S_VZ = S_CK, S_CA, S_CB
# Payload table P: f32[P_ROWS, NP] — winning-primitive attributes, packed
# tight because payload reconstruction costs one masked select PER ROW per
# primitive of every entered cluster:
#   MPARAM = fuzz|ior|light (mutually exclusive by material type, exact)
#   PACKA/PACKB = albedo/albedo2 RGB as 8:8:8 in an exact-integer f32
#   PACKC = mat + 4*tex + 16*ptype + 128*neg_r + 256*(tex_id+1) (exact
#   small ints; ptype gets 3 bits for the triangle type; neg_r carries the
#   sphere-radius sign for the hollow-glass idiom — the normal is (p-c)/r
#   with SIGNED r, Hittable.cuh:96)
#   CX/CY/CZ double as the UNIT outward normal for triangle columns (the
#   kernel's sphere/rect normal reconstruction never reads them for type 4)
# No radius row: the sphere normal is normalize(p - c), identical to
# (p - c)/r at the hit point — one rsqrt per wave instead of a payload row
# (payload reconstruction costs one select PER ROW per prim of every
# entered cluster, measured at 34% of frame time at 8 rows).
# With image-texture support (pack_scene_tables(with_uv=True)) two extra
# rows carry the rect half-extents for in-kernel UV computation.
P_CX, P_CY, P_CZ, P_MPARAM, P_PACKA, P_PACKB, P_PACKC, \
    P_HA, P_HB = range(9)
P_ROWS = 7
P_ROWS_UV = 9

# Measured SMEM primitive ceilings on v5e (tools/smem_probe.py bisection;
# BASELINE.md "SMEM primitive ceiling"): the S/P/cluster/super tables are
# SMEM-resident (dynamic per-prim scalar loads), so megakernel capacity is
# scalar-memory-bound, not HBM-bound.  Scenes beyond the ceiling render on
# the HBM-streamed megakernel layout (pack_stream_tiles).
SMEM_PRIM_CEILING = {"plain": 10144, "vattr": 6064}
# Byte-denominated SMEM table budget for NON-probe layouts, anchored at
# the heaviest measured-OK point: the vattr bisection ceiling (6,064 prims
# = 6,076 padded cols x 34 rows + cluster/super/scratch = 834,172 B
# compiled and ran on v5e).  Prim COUNT is the wrong unit once feature
# flags add P rows and kind-segregated clusters pad columns: the round-5
# book2_final all-flags table (28 rows x 8,400 cols for 5,809 prims =
# 951,600 B) Mosaic-FAILED on v5e while the plain probe passed at
# 948,164 B — the compile budget is byte-bound with a branch-dependent
# compiler-scalar overhead, so non-probe layouts get the conservative
# vattr-anchored budget (its bisection FAIL bound was <= ~888 KB).
SMEM_TABLE_BUDGET = 834_172


def table_smem_bytes(tables: "SceneTables") -> int:
    """SMEM footprint of a packed resident-layout table set: S + P tables
    (4 B x rows x padded cols), cluster/super AABB tables, and the
    supercluster visit-order scratch (one f32 + one i32 per super)."""
    s_rows, cols = tables.S.shape
    p_rows = tables.P.shape[0]
    n_sup = tables.supers.shape[1]
    return 4 * ((s_rows + p_rows) * cols + tables.clusters.size
                + tables.supers.size + 2 * n_sup)


def fits_megakernel(n_active: int, has_vattrs: bool,
                    tables: "SceneTables | None" = None) -> bool:
    """Conservative pre-check (96% of the measured ceiling) that a scene's
    packed tables fit the resident megakernel's SMEM.  Used by
    accel='auto'/'pallas' routing so an oversized scene goes straight to
    the streamed layout instead of paying a failed (minutes-long, over a
    tunneled link) Mosaic compile; the reactive try/except fallback in
    viewer/app.py stays as backstop.

    With ``tables`` (the packed SceneTables) the check is BYTE-accurate:
    feature flags add P rows (motion +3, images +2..) and kind-segregated
    Morton clusters pad columns well past n_active (book2_final: 5,809
    prims -> 8,400 cols), so only the packed shapes know the footprint.
    The plain bisected probe layout keeps its measured prim ceiling;
    everything else (including the vattr probe layout, whose byte-budget
    cutoff lands within a few prims of its measured ceiling) is held to
    SMEM_TABLE_BUDGET.  Without ``tables``
    (legacy callers/tests) the prim-count rule applies unchanged."""
    if tables is not None:
        p_rows = tables.P.shape[0]
        if p_rows == P_ROWS and not has_vattrs:
            # the plain probe layout: measured to 10,144 prims directly
            return n_active <= int(SMEM_PRIM_CEILING["plain"] * 0.96)
        return table_smem_bytes(tables) <= int(SMEM_TABLE_BUDGET * 0.96)
    ceiling = SMEM_PRIM_CEILING["vattr" if has_vattrs else "plain"]
    return n_active <= int(ceiling * 0.96)
# Per-vertex mesh attributes (BEYOND-REFERENCE, scene.has_vertex_attrs)
# append rows AFTER the base layout (base = P_ROWS_UV if with_uv else
# P_ROWS):
#   +0..+2: per-vertex shading normals n0/n1/n2, each 8:8:8-quantized
#   (q = floor((n*0.5+0.5)*255+0.5), exact small ints; 0.0 = flat
#   sentinel — impossible for a real unit normal, which can't be
#   (-1,-1,-1)); the kernel dequantizes, barycentric-interpolates, and
#   renormalizes (~0.5 deg worst-case tilt).
#   with_uv only, +3..+8: uv0.u, uv0.v, duv1.u, duv1.v, duv2.u, duv2.v
#   at FULL precision — interpolated texcoords uv0 + u*duv1 + v*duv2
#   make image textures on meshes exact in the deferral path.
# The barycentric (u, v) at the winner is CARRIED through the search
# (hierarchical_search carry_uv: 2 selects per prim apply in tri/mixed
# clusters only), replacing the round-3 first cut that reconstructed it
# at payload time from the Havel-Herout planes (8 S-selects per winner's
# cluster prim + a per-lane plane evaluation).  Strictly fewer ops on
# vattr scenes; TPU delta pending (BASELINE.md vattr row has the
# plane-reconstruction numbers).


def p_rows_for(with_uv: bool, with_vattrs: bool,
               with_motion: bool = False) -> int:
    base = P_ROWS_UV if with_uv else P_ROWS
    if with_vattrs:
        base += 3
        if with_uv:
            base += 6
    if with_motion:
        base += 3  # sphere velocity (vx, vy, vz) — normal reconstruction
    return base



# Measured optimum on v5e RTOW 720p depth12 (Mrays/s): the parameters
# interact — coarser clusters cut box/cond overhead, finer tiles and
# finer superclusters keep culling selective.  CLUSTER sweep at tile
# 16x256: 8->89, 12->105, 16->111, 24->106, 32->89 (SUPER=8); tile sweep
# at CLUSTER=16: 8x256->81, 16x256->111, 32x256->98, 48x256->87,
# 16x128->86; SUPER sweep at CLUSTER=16/tile16: 2->107, 4->118, 8->114,
# 16->111; CLUSTER=20/SUPER=4: 112.
CLUSTER = 28  # primitives per cluster (default; see pick_cluster_super)
SUPER = 4  # clusters per supercluster (default)
DEF_TILE_H = 16
BIG = 3.0e38


def pick_cluster_super(n_prims: int) -> tuple[int, int]:
    """Scene-size-adaptive (CLUSTER, SUPER).

    The round-2 sweeps showed the optimum moves with primitive count
    (BASELINE.md): (28, 4) is the measured flat optimum for ~500-prim
    scenes; larger scenes were measured in round 3 on rtow_big (~1000
    prims, see BASELINE.md round-3 sweep).  NEVER return CLUSTER=32 — a
    measured 30x cliff on v5e.
    """
    del n_prims  # one optimum so far; re-measured in the round-3 sweep
    return CLUSTER, SUPER


def _morton3(x: np.ndarray) -> np.ndarray:
    """30-bit Morton code from normalized [0,1) centroid coords."""
    def spread(v):
        v = v.astype(np.uint64)
        v = (v | (v << 16)) & np.uint64(0x30000FF)
        v = (v | (v << 8)) & np.uint64(0x300F00F)
        v = (v | (v << 4)) & np.uint64(0x30C30C3)
        v = (v | (v << 2)) & np.uint64(0x9249249)
        return v

    q = np.clip((x * 1024).astype(np.int64), 0, 1023)
    return (spread(q[:, 0]) << 2) | (spread(q[:, 1]) << 1) | spread(q[:, 2])


class SceneTables(_t.NamedTuple):
    """Packed kernel tables (NumPy, Morton-ordered, padded)."""

    S: "np.ndarray"  # f32[16, NP] search table
    P: "np.ndarray"  # f32[P_ROWS(_UV), NP] payload table (packed, see P_* rows)
    clusters: "np.ndarray"  # f32[7, NC] cluster AABBs + kind row (0 sph, 1 rect, 2 mixed)
    supers: "np.ndarray"  # f32[6, NSC] supercluster AABBs
    n_super: int
    prim_map: "np.ndarray"  # i32[NP] packed column -> scene slot (-1 pad)
    cluster: int = CLUSTER  # prims/cluster these tables were packed with
    super_: int = SUPER  # clusters/supercluster (kernel must use the same)
    vattrs: bool = False  # P has per-vertex attr rows (pass has_vattrs=)
    motion: bool = False  # P has velocity rows (pass has_motion=)


def _npad_for(scene, cluster: int = CLUSTER, super_: int = SUPER) -> int:
    span = cluster * super_
    # + n_seg*(cluster-1): segment alignment padding in the worst case —
    # each segment (big, spheres, rects, triangles[, media]) pads to a
    # cluster multiple.  Media add a 5th segment; flipping a scene's
    # media-ness recompiles once, like the first triangle.
    idx = scene.active_indices()
    n_seg = 5 if bool((scene.mat_type[idx] == 4).any()) else 4
    cap = max(scene.capacity, span) + n_seg * (cluster - 1)
    return ((cap + span - 1) // span) * span


def _valid_tex_ids(scene, tex_id, tex_t=None):
    """Remap out-of-range or EMPTY atlas slots to -1 so the kernel's single
    has_data test covers them: the reference returns cyan for missing image
    data (Texture.cuh:88-89); without the remap an unloaded slot would
    defer and then sample a zeroed atlas (black) in the epilogue.

    Only IMAGE rows (tex_t == 2) are remapped: noise rows REPURPOSE tex_id
    as the marble scale (ops/textures.py) and must pack through verbatim."""
    tid = np.array(tex_id, np.int64)
    slots = scene.atlas.shape[0]
    bad = (tid < 0) | (tid >= slots)
    safe = np.clip(tid, 0, slots - 1)
    empty = (scene.tex_hw[safe, 0] <= 0) | (scene.tex_hw[safe, 1] <= 0)
    mask = bad | empty
    if tex_t is not None:
        mask = mask & (np.asarray(tex_t) == 2)
    tid[mask] = -1
    return tid


def _image_mean_albedo(scene, tex_t, tex_id, albedo):
    """Replace image-textured prims' albedo with the atlas slot's mean color
    (used for second-and-later image hits along a path, see _render_kernel).
    Shared by the NumPy and native packers so outputs stay bit-identical.
    The per-SLOT mean is memoized: a 20k-triangle mesh sharing one texture
    previously re-averaged the full atlas slice per primitive (measured 87 s
    of the terrain_big packing; now one pass per distinct slot)."""
    albedo = np.array(albedo, np.float32)
    slot_mean: dict = {}
    for row, (tt, tid) in enumerate(zip(tex_t, tex_id)):
        if tt == 2 and 0 <= tid < scene.atlas.shape[0]:
            h, w = scene.tex_hw[tid]
            if h > 0 and w > 0:
                if tid not in slot_mean:
                    slot_mean[tid] = (
                        scene.atlas[tid, :h, :w].astype(np.float32) / 255.0
                    ).mean((0, 1))
                albedo[row] = slot_mean[tid]
    return albedo


def pack_scene_tables(scene, with_uv: bool = False,
                      force_numpy: bool = False,
                      cluster: int | None = None,
                      super_: int | None = None,
                      with_vattrs: bool | None = None) -> SceneTables:
    """Host-side packing of the ACTIVE primitives into kernel tables.

    Morton-ordered and padded to a multiple of CLUSTER*SUPER.  Rebuild per
    scene edit — kilobytes of upload, no recompilation (NP is padded to the
    scene's fixed capacity).  ``with_uv=True`` adds the rect half-extent
    rows for in-kernel UV computation (image-texture scenes).

    Dispatches to the native C++ packer (native/table_packer.cpp) when
    built — this runs on every interactive edit, the reference's
    drag-edit -> BVH-rebuild hot path (CudaLayer.cpp:484-563) — with the
    NumPy implementation as a bit-identical fallback.
    """
    from ...native import pack_native

    if with_vattrs is None:
        # auto-detect: meshes with per-vertex uvs/normals get the attr rows
        with_vattrs = bool(getattr(scene, "has_vertex_attrs", False))

    if cluster is None or super_ is None:
        # keyed on CAPACITY, not num_active: edits must never change table
        # shapes (the no-recompile invariant, models/scene.py)
        c0, s0 = pick_cluster_super(int(scene.capacity))
        cluster = c0 if cluster is None else cluster
        super_ = s0 if super_ is None else super_

    idx0 = scene.active_indices()
    has_media = bool((scene.mat_type[idx0] == 4).any())  # ISOTROPIC
    has_motion = bool((scene.velocity[idx0] != 0).any())
    if (not force_numpy and pack_native.available()
            and not has_media and not has_motion):
        from ...models.bvh import primitive_aabbs

        idx = scene.active_indices()
        npad = _npad_for(scene, cluster, super_)
        p_rows = p_rows_for(with_uv, with_vattrs)
        n = len(idx)
        if n == 0:
            return _pack_scene_tables_numpy(scene, with_uv, cluster, super_,
                                            with_vattrs)
        bmin0, bmax0 = primitive_aabbs(scene, idx)
        mat = scene.mat_type[idx].astype(np.int64)
        mparam = np.choose(
            mat, [np.zeros(n), scene.fuzz[idx], scene.ior[idx],
                  scene.light[idx]],
        )
        tex_t = scene.tex_type[idx].astype(np.int64)
        tex_id = _valid_tex_ids(scene, scene.tex_id[idx], tex_t)
        albedo = scene.albedo[idx]
        if with_uv:
            albedo = _image_mean_albedo(scene, tex_t, tex_id, albedo)
        vattr_kw = {}
        if with_vattrs:
            vattr_kw = dict(
                uv0=scene.uv0[idx], uv1=scene.uv1[idx], uv2=scene.uv2[idx],
                vn0=scene.vnorm0[idx], vn1=scene.vnorm1[idx],
                vn2=scene.vnorm2[idx],
            )
        S, P, clusters, supers, n_super, prim_map = pack_native.pack(
            scene.center[idx], scene.size[idx],
            scene.edge1[idx], scene.edge2[idx], scene.prim_type[idx],
            scene.mat_type[idx], mparam, scene.tex_type[idx],
            tex_id, albedo, scene.albedo2[idx],
            bmin0, bmax0, idx, npad, cluster, super_, p_rows,
            with_uv=with_uv, with_vattrs=with_vattrs, **vattr_kw,
        )
        return SceneTables(S, P, clusters, supers, n_super, prim_map,
                           cluster, super_, vattrs=with_vattrs)

    return _pack_scene_tables_numpy(scene, with_uv, cluster, super_,
                                    with_vattrs)


class StreamTables(_t.NamedTuple):
    """Block-tiled tables for the HBM-streamed megakernel (beyond-SMEM
    scenes).  Built from SceneTables by pack_stream_tiles; shapes are
    keyed on capacity (the no-recompile invariant holds: edits rebuild
    values, never shapes)."""

    tiles: "np.ndarray"  # f32[n_blocks_cap, R8, block_b*128] (HBM-streamed)
    block_boxes: "np.ndarray"  # f32[6, n_blocks_cap] block AABBs (resident)
    clusters: "np.ndarray"  # f32[7, >=n_blocks_cap*block_b*super_] resident
    supers: "np.ndarray"  # f32[6, >=n_blocks_cap*block_b] resident
    n_blocks: int  # USED blocks this packing (even, >= 2; traced arg)
    prim_map: "np.ndarray"  # i32[NP] packed column -> scene slot (-1 pad)
    cluster: int
    super_: int
    block_b: int  # superclusters per streamed block
    vattrs: bool
    motion: bool = False


STREAM_BLOCK_B = 4  # superclusters per streamed block (512 f32 columns)


def pack_stream_tiles(t: SceneTables, block_b: int = STREAM_BLOCK_B
                      ) -> StreamTables:
    """Re-tile packed SceneTables for the streamed megakernel.

    Layout (measured Mosaic DMA alignment, tools/stream_probe.py: copied
    blocks need rows % 8 == 0 and columns % 128 == 0 — the round-3 "512 B
    ceiling" was this alignment rule in disguise): block bi holds supers
    bi*block_b + s, one per 128-column page; rows 0-15 are the S table,
    rows 16..16+p_rows the P table, padded up to a multiple of 8.  Pad
    pages/columns are zero (never read: prim loops scan only
    cluster*super_ <= 128 columns per page, and pad supers' point-at-+BIG
    AABBs fail every gate).  The resident cluster/super tables are padded
    to cover every probed index; block AABBs union only USED member
    supers.
    """
    span = t.cluster * t.super_
    assert span <= 128, (t.cluster, t.super_)
    p_rows = t.P.shape[0]
    rows = 16 + p_rows
    r8 = -(-rows // 8) * 8
    npd = t.S.shape[1]
    nsc_cap = npd // span
    n_blocks_cap = max(2, -(-nsc_cap // block_b))
    n_blocks_cap += n_blocks_cap % 2
    tiles = np.zeros((n_blocks_cap, r8, block_b * 128), np.float32)
    for k in range(nsc_cap):
        bi, s = divmod(k, block_b)
        tiles[bi, 0:16, s * 128:s * 128 + span] = t.S[:, k * span:(k + 1) * span]
        tiles[bi, 16:rows, s * 128:s * 128 + span] = (
            t.P[:, k * span:(k + 1) * span])
    # resident gate tables must cover every probed super/cluster index
    need_sc = n_blocks_cap * block_b
    supers = np.full((6, need_sc), BIG, np.float32)
    supers[:, :t.supers.shape[1]] = t.supers
    need_cl = need_sc * t.super_
    clusters = np.zeros((7, need_cl), np.float32)
    clusters[0:6, :] = BIG  # degenerate point box: _box_any rejects
    clusters[:, :t.clusters.shape[1]] = t.clusters
    # block AABB = union of USED member supers (pads would poison the max)
    block_boxes = np.full((6, n_blocks_cap), BIG, np.float32)
    n_used = int(t.n_super)
    for bi in range(n_blocks_cap):
        lo, hi = bi * block_b, min((bi + 1) * block_b, n_used)
        if lo < hi:
            block_boxes[0:3, bi] = t.supers[0:3, lo:hi].min(axis=1)
            block_boxes[3:6, bi] = t.supers[3:6, lo:hi].max(axis=1)
    n_blocks = min(n_blocks_cap, max(2, -(-n_used // block_b)))
    n_blocks += n_blocks % 2
    n_blocks = min(n_blocks, n_blocks_cap)
    return StreamTables(tiles, block_boxes, clusters, supers, n_blocks,
                        t.prim_map, t.cluster, t.super_, block_b,
                        t.vattrs, t.motion)


def _pack_scene_tables_numpy(scene, with_uv: bool = False,
                             cluster: int = CLUSTER,
                             super_: int = SUPER,
                             with_vattrs: bool = False) -> SceneTables:
    """Pure-NumPy packer (the reference implementation for the native one)."""
    from ...models.bvh import primitive_aabbs

    idx = scene.active_indices()
    span = cluster * super_
    npad = _npad_for(scene, cluster, super_)

    has_motion = bool((scene.velocity[scene.active_indices()] != 0).any())
    S = np.zeros((16, npad), np.float32)
    P = np.zeros((p_rows_for(with_uv, with_vattrs, has_motion), npad),
                 np.float32)
    # padding lanes can never hit: r^2 = -1 makes the sphere discriminant
    # strictly negative (Cauchy-Schwarz) and half-extents of -1 fail the
    # rect bounds test, so the kernel needs no per-primitive active test
    S[S_R2, :] = -1.0
    S[S_HA, :] = -1.0
    S[S_HB, :] = -1.0

    n = len(idx)
    clusters = np.zeros((7, max(1, npad // cluster)), np.float32)
    # degenerate point box at +BIG: _box_any's strict tfar > tnear rejects
    # it for every ray (an INVERTED box would be re-sorted by the slab
    # min/max and pass, running 16 wasted prim tests per wave)
    clusters[0:6, :] = BIG
    supers = np.zeros((6, max(1, npad // span)), np.float32)
    supers[0:6, :] = BIG
    prim_map = np.full(npad, -1, np.int32)
    n_super = 1

    if n:
        bmin0, bmax0 = primitive_aabbs(scene, idx)
        cent = 0.5 * (bmin0 + bmax0)
        extent = cent.max(0) - cent.min(0)
        norm = (cent - cent.min(0)) / np.where(extent > 0, extent, 1.0)
        order = np.argsort(_morton3(norm), kind="stable")
        # Segment the Morton order into: BIG primitives first (the search
        # clips every AABB test by the running best_t, so testing
        # high-hit-probability primitives like the ground collapses best_t
        # immediately), then spheres, then rects.  Sphere/rect segregation
        # keeps clusters HOMOGENEOUS: the kernel picks a sphere-only or
        # rect-only primitive loop per cluster (the `kind` row), so mixed
        # scenes don't pay the dual type test on every primitive.
        d = bmax0 - bmin0
        area = d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 2] * d[:, 0]
        big = area > 50.0 * np.median(area)
        t_all = scene.prim_type[idx].astype(np.int64)
        is_med = ((t_all == 0) | (t_all == 5)) \
            & (scene.mat_type[idx] == 4)  # ISOTROPIC (sphere or BOX)
        big = big & ~is_med  # media NEVER share clusters with surfaces:
        # the medium test replaces the whole prim loop for kind-4
        # clusters, and mixed (dual) clusters must stay media-free
        is_tri = (t_all == 4) & ~is_med
        is_rect = (t_all != 0) & ~is_tri & ~is_med
        segs = [
            order[big[order]],
            order[~big[order] & ~is_rect[order] & ~is_tri[order]
                  & ~is_med[order]],
            order[~big[order] & is_rect[order]],
            order[~big[order] & is_tri[order]],
            order[is_med[order]],
        ]
        cols: list[int] = []  # position in `idx`, or -1 for alignment padding
        for seg in segs:
            cols.extend(int(v) for v in seg)
            while len(cols) % cluster:
                cols.append(-1)
        ncols = len(cols)
        assert ncols <= npad, (ncols, npad)
        cols_arr = np.asarray(cols, np.int64)
        real = cols_arr >= 0
        rsel = cols_arr[real]  # positions in idx-space
        rdst = np.nonzero(real)[0]  # destination columns

        sidx = idx[rsel]  # scene slots, packed order
        t = scene.prim_type[sidx].astype(np.int64)
        med = ((t == 0) | (t == 5)) & (scene.mat_type[sidx] == 4)
        boxm = med & (t == 5)  # BOX-bounded media (half-extents in edge1)
        t = np.where(med, 5, t)  # media pack as ptype 5 (module comment)
        c = scene.center[sidx]
        sz = scene.size[sidx]
        k_ax = np.choose(t, [0, 2, 1, 0, 0, 0])
        a_ax = np.choose(t, [0, 0, 0, 1, 0, 0])
        b_ax = np.choose(t, [0, 1, 2, 2, 0, 0])
        ea = np.choose(t, [0, 0, 0, 1, 0, 0])
        rows = np.arange(len(sidx))
        S[S_CX, rdst], S[S_CY, rdst], S[S_CZ, rdst] = c[:, 0], c[:, 1], c[:, 2]
        S[S_R2, rdst] = sz[:, 0] * sz[:, 0]
        S[S_PTYPE, rdst] = t
        S[S_KAX, rdst] = k_ax
        S[S_AAX, rdst] = a_ax
        S[S_BAX, rdst] = b_ax
        S[S_CK, rdst] = c[rows, k_ax]
        S[S_CA, rdst] = c[rows, a_ax]
        S[S_CB, rdst] = c[rows, b_ax]
        S[S_HA, rdst] = 0.5 * np.where(ea == 0, sz[:, 0], sz[:, 1])
        S[S_HB, rdst] = 0.5 * np.where(ea == 0, sz[:, 1], sz[:, 0])
        if med.any():
            md = rdst[med]
            # medium columns: sphere center/R2 stay; density rides the
            # rect-only S_CK row; rect extents stay -1 (can't rect-hit)
            S[S_DENS, md] = scene.density[sidx][med]
            S[S_HA, md] = -1.0
            S[S_HB, md] = -1.0
        if boxm.any():
            # BOX-bounded medium columns: R2 = -1 (the sphere-chord
            # branch can never fire) and the half-extents ride S_HA /
            # S_HB / S_CA — S_HA > 0 is the in-kernel is_box flag
            # (sphere media and cluster padding both carry S_HA = -1)
            bd = rdst[boxm]
            he = np.abs(scene.edge1[sidx][boxm]).astype(np.float32)
            S[S_R2, bd] = -1.0
            S[S_HA, bd] = he[:, 0]
            S[S_HB, bd] = he[:, 1]
            S[S_CA, bd] = he[:, 2]
            yawv = np.asarray(scene.edge2[sidx][boxm][:, 0], np.float64)
            if (yawv != 0).any():
                # yaw-ROTATED box media (has_rot_media static gate):
                # cos/sin ride the triangle-only rows 13/14 (spare for
                # ptype-5 columns).  Scene-level gate: zero-yaw scenes
                # keep their byte-identical historical tables
                S[S_DN, bd] = np.cos(yawv)
                S[S_D1, bd] = np.sin(yawv)
        if has_motion:
            # plain-sphere columns carry the shutter velocity in the
            # rect-only rows (zero for static spheres — the motion test
            # reduces exactly); the payload velocity rows feed the
            # winner's normal reconstruction at the path's time
            sph = (t == 0)
            vel = np.asarray(scene.velocity[sidx], np.float32)
            sd_ = rdst[sph]
            S[S_VX, sd_] = vel[sph, 0]
            S[S_VY, sd_] = vel[sph, 1]
            S[S_VZ, sd_] = vel[sph, 2]
            vb_ = p_rows_for(with_uv, with_vattrs)
            P[vb_ + 0, rdst] = vel[:, 0] * (t == 0)
            P[vb_ + 1, rdst] = vel[:, 1] * (t == 0)
            P[vb_ + 2, rdst] = vel[:, 2] * (t == 0)

        mat = scene.mat_type[sidx].astype(np.int64)
        # one row for the material's single parameter (mutually exclusive:
        # fuzz for metal, ior for dielectric, light for diffuse_light,
        # density for isotropic media — though the SEARCH reads density
        # from S_DENS; the payload row is informational for media)
        P[P_MPARAM, rdst] = np.choose(
            mat, [np.zeros(len(sidx)), scene.fuzz[sidx],
                  scene.ior[sidx], scene.light[sidx],
                  scene.density[sidx]],
        )

        def pack_rgb(a):
            q = np.clip(np.rint(a * 255.0), 0, 255).astype(np.int64)
            return (q[:, 0] * 65536 + q[:, 1] * 256 + q[:, 2]).astype(np.float32)

        tex_t = scene.tex_type[sidx].astype(np.int64)
        tex_id = _valid_tex_ids(scene, scene.tex_id[sidx], tex_t)
        albedo = np.array(scene.albedo[sidx], np.float32)
        if with_uv:
            albedo = _image_mean_albedo(scene, tex_t, tex_id, albedo)
        P[P_PACKA, rdst] = pack_rgb(albedo)
        P[P_PACKB, rdst] = pack_rgb(scene.albedo2[sidx])
        neg_r = (sz[:, 0] < 0).astype(np.int64)
        mat_p = np.where(med, 0, mat)  # media: is_iso = ptype16 > 4.5
        P[P_PACKC, rdst] = (
            mat_p + 4 * tex_t + 16 * t + 128 * neg_r
            + 256 * (np.maximum(tex_id, -1) + 1)
        ).astype(np.float32)
        P[P_CX, rdst], P[P_CY, rdst], P[P_CZ, rdst] = c.T
        if with_uv:
            P[P_HA, rdst] = S[S_HA, rdst]
            P[P_HB, rdst] = S[S_HB, rdst]
        prim_map[rdst] = sidx

        # ---- triangle columns (type 4): overlay the rect rows ----
        tri = t == 4
        if tri.any():
            e1 = np.asarray(scene.edge1[sidx][tri], np.float32)
            e2 = np.asarray(scene.edge2[sidx][tri], np.float32)
            n2 = np.cross(e1, e2).astype(np.float32)
            td = rdst[tri]
            S[S_R2, td] = -1.0  # sphere/rect tests can never hit (mixed
            S[S_HA, td] = -1.0  # clusters): negative r^2 / extents
            S[S_HB, td] = -1.0
            # Havel-Herout plane precompute (module tables comment) in f64,
            # rounded once to f32 on store.  Op ordering mirrors the native
            # packer EXACTLY (bit-identity enforced by tests/test_mesh.py).
            nd = n2.astype(np.float64)
            e1d, e2d = e1.astype(np.float64), e2.astype(np.float64)
            v0d = np.asarray(c[tri], np.float64)
            den = nd[:, 0] * nd[:, 0] + nd[:, 1] * nd[:, 1] + nd[:, 2] * nd[:, 2]
            den = np.maximum(den, 1e-300)  # degenerate tri: |N.d|<=eps rejects
            n1 = np.cross(e2d, nd) / den[:, None]
            m2 = np.cross(nd, e1d) / den[:, None]
            d_n = nd[:, 0] * v0d[:, 0] + nd[:, 1] * v0d[:, 1] + nd[:, 2] * v0d[:, 2]
            d1 = -(v0d[:, 0] * n1[:, 0] + v0d[:, 1] * n1[:, 1] + v0d[:, 2] * n1[:, 2])
            d2 = -(v0d[:, 0] * m2[:, 0] + v0d[:, 1] * m2[:, 1] + v0d[:, 2] * m2[:, 2])
            S[S_NX, td], S[S_NY, td], S[S_NZ, td] = nd.T
            S[S_N1X, td], S[S_N1Y, td], S[S_N1Z, td] = n1.T
            S[S_M2X, td], S[S_M2Y, td], S[S_M2Z, td] = m2.T
            S[S_DN, td], S[S_D1, td], S[S_D2, td] = d_n, d1, d2
            # payload CX/CY/CZ = unit outward normal (two-sided shading
            # flips by sign(d . n) in-kernel, like make_hit_record)
            nh = n2 / np.maximum(
                np.linalg.norm(n2, axis=1, keepdims=True), np.float32(1e-20))
            P[P_CX, td], P[P_CY, td], P[P_CZ, td] = nh.astype(np.float32).T

            if with_vattrs:
                # per-vertex attr rows (module P-table comment): quantized
                # vertex normals (+uv rows with_uv).  All-f32 op order must
                # match the native packer when that learns these rows.
                vn_base = P_ROWS_UV if with_uv else P_ROWS

                def pack_vn(vn):
                    vn = np.asarray(vn, np.float32)
                    q = np.floor(
                        (vn * np.float32(0.5) + np.float32(0.5))
                        * np.float32(255.0) + np.float32(0.5)
                    ).astype(np.int64)
                    packed = (q[:, 0] * 65536 + q[:, 1] * 256
                              + q[:, 2]).astype(np.float32)
                    packed[(vn == 0).all(1)] = 0.0  # flat sentinel
                    return packed

                P[vn_base + 0, td] = pack_vn(scene.vnorm0[sidx][tri])
                P[vn_base + 1, td] = pack_vn(scene.vnorm1[sidx][tri])
                P[vn_base + 2, td] = pack_vn(scene.vnorm2[sidx][tri])
                if with_uv:
                    ub_ = vn_base + 3
                    u0 = np.asarray(scene.uv0[sidx][tri], np.float32)
                    u1 = np.asarray(scene.uv1[sidx][tri], np.float32)
                    u2 = np.asarray(scene.uv2[sidx][tri], np.float32)
                    P[ub_ + 0, td], P[ub_ + 1, td] = u0.T
                    P[ub_ + 2, td], P[ub_ + 3, td] = (u1 - u0).T
                    P[ub_ + 4, td], P[ub_ + 5, td] = (u2 - u0).T

        bmin = bmin0[rsel]
        bmax = bmax0[rsel]
        col_of = np.full(ncols, -1, np.int64)
        col_of[rdst] = np.arange(len(rdst))
        nc_used = ncols // cluster
        n_super = max(1, (ncols + span - 1) // span)
        for ci in range(nc_used):
            members = [col_of[k] for k in range(ci * cluster, (ci + 1) * cluster)
                       if col_of[k] >= 0]
            if not members:
                continue
            clusters[0:3, ci] = bmin[members].min(0)
            clusters[3:6, ci] = bmax[members].max(0)
            # kind row: 0 all spheres, 1 all rects, 3 all triangles,
            # 4 all MEDIA (segment-segregated, never mixed), 2 mixed
            kinds = set(
                0 if int(v) == 0 else (
                    3 if int(v) == 4 else (4 if int(v) == 5 else 1))
                for v in t[members]
            )
            clusters[6, ci] = float(kinds.pop()) if len(kinds) == 1 else 2.0
        for si in range(n_super):
            members = [col_of[k] for k in range(si * span, min(ncols, (si + 1) * span))
                       if col_of[k] >= 0]
            if not members:
                continue
            supers[0:3, si] = bmin[members].min(0)
            supers[3:6, si] = bmax[members].max(0)

    return SceneTables(S, P, clusters, supers, n_super, prim_map,
                       cluster, super_, vattrs=with_vattrs,
                       motion=has_motion)


def pack_camera(cam, scene_data, width: int, height: int, t_min: float) -> jnp.ndarray:
    """Flatten CameraParams + sky into the f32[38] uniform vector the kernel
    reads from SMEM (the analog of InputStruct, SharedStructs.h:3-24).  The
    look_at frustum comes from the SAME helper the XLA raygen uses
    (models/camera.py::look_at_frame), so the paths cannot drift."""
    from ...models.camera import look_at_frame
    from ...utils.vec import cross, normalize

    u_axis, v_axis, lower_left, horizontal, vertical = look_at_frame(
        cam, width / height)

    # two-plane model vectors (reference Kernel.cu:130-148)
    right_tp = normalize(cross(cam.up, cam.forward))

    vec = jnp.concatenate([
        cam.origin,  # 0:3
        lower_left,  # 3:6
        horizontal,  # 6:9
        vertical,  # 9:12
        u_axis,  # 12:15
        v_axis,  # 15:18
        jnp.stack([cam.aperture / 2.0, cam.near, cam.far, cam.fov]),  # 18:22
        right_tp,  # 22:25
        cam.up,  # 25:28 (two-plane up)
        jnp.stack([jnp.float32(t_min)]),  # 28
        cam.forward,  # 29:32
    ])
    sky = jnp.concatenate([scene_data.background_start, scene_data.background_end])
    return jnp.concatenate([vec, sky]).astype(jnp.float32)  # [38]


def pack_camera_np(cam, background_start, background_end,
                   width: int, height: int, t_min: float):
    """Host-side NumPy mirror of pack_camera -> np.float32[38].

    The render loop repacks the camera EVERY frame; doing it in NumPy and
    passing the vector as a jit argument keeps the Mosaic SMEM operand a
    plain executable parameter (the proven path) and costs one small
    host->device transfer instead of eager device ops or in-jit packing.
    Guarded against drift from pack_camera by tests/test_camera.py.
    """
    import math as _m

    import numpy as np

    def nrm(v):
        return v / max(float(np.linalg.norm(v)), 1e-12)

    origin = np.asarray(cam.origin, np.float32)
    fwd = np.asarray(cam.forward, np.float32)
    up = np.asarray(cam.up, np.float32)
    fov = float(cam.fov)
    focus = float(cam.focus_dist)
    # look_at frustum (models/camera.py::look_at_frame, numpy form)
    half_h = _m.tan(fov / 2.0)
    half_w = (width / height) * half_h
    w = nrm(-fwd)
    world_up = np.array([0.0, 1.0, 0.0], np.float32)
    u_axis = nrm(np.cross(world_up, w))
    v_axis = np.cross(w, u_axis)
    lower_left = (origin - half_w * focus * u_axis
                  - half_h * focus * v_axis - focus * w)
    horizontal = 2.0 * half_w * focus * u_axis
    vertical = 2.0 * half_h * focus * v_axis
    right_tp = nrm(np.cross(up, fwd))
    return np.concatenate([
        origin, lower_left, horizontal, vertical, u_axis, v_axis,
        np.array([float(cam.aperture) / 2.0, float(cam.near),
                  float(cam.far), fov], np.float32),
        right_tp, up,
        np.array([t_min], np.float32),
        fwd,
        np.asarray(background_start, np.float32).reshape(3),
        np.asarray(background_end, np.float32).reshape(3),
    ]).astype(np.float32)


# ----------------------------------------------------------------- kernel

def _make_search_parts(
    sread, ox, oy, oz, dx, dy, dz,
    t_min, has_tris: bool, carry_uv: bool, cluster: int,
    with_rec: bool = False,
    u_med=None,
    time=None,
    has_boxm: bool = False,
    has_rotm: bool = False,
):
    """Build the per-primitive test closures shared by the resident and the
    streamed search.  ``sread(row, j)`` abstracts the S-table access: the
    resident search reads the global SMEM table, the streamed search reads
    the current block's SMEM scratch at block-local columns.  ``with_rec``
    threads a scalar record-offset through the prim-loop carry so the
    streamed search can record GLOBAL primitive ids while reading LOCAL
    columns (resident callers trace exactly the historical code).

    ``u_med`` (f32 tile, media scenes): one uniform per lane per wave for
    the constant-medium scatter-distance sampling; decorrelated per PRIM
    by hashing the medium's CENTER (prim-intrinsic, so the resident and
    streamed layouts — whose column indices differ — stay bit-identical).

    Returns (box_any, run_sphere, run_rect, run_dual, run_tri, run_med)
    where box_any(ref, ci, best_t) gates on resident AABB tables and the
    run_* prim loops consume the search carry (see _prim_loop below).
    """
    inv_dx = 1.0 / jnp.where(dx == 0.0, 1e-30, dx)
    inv_dy = 1.0 / jnp.where(dy == 0.0, 1e-30, dy)
    inv_dz = 1.0 / jnp.where(dz == 0.0, 1e-30, dz)

    def _box_any(ref, ci, best_t):
        """Does ANY lane hit box `ci` of `ref` closer than its best_t?"""
        cx0, cy0, cz0 = ref[0, ci], ref[1, ci], ref[2, ci]
        cx1, cy1, cz1 = ref[3, ci], ref[4, ci], ref[5, ci]
        tx0 = (cx0 - ox) * inv_dx
        tx1 = (cx1 - ox) * inv_dx
        ty0 = (cy0 - oy) * inv_dy
        ty1 = (cy1 - oy) * inv_dy
        tz0 = (cz0 - oz) * inv_dz
        tz1 = (cz1 - oz) * inv_dz
        tnear = jnp.maximum(
            jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
            jnp.maximum(jnp.minimum(tz0, tz1), t_min),
        )
        tfar = jnp.minimum(
            jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
            jnp.minimum(jnp.maximum(tz0, tz1), best_t),
        )
        return jnp.any(tfar > tnear)

    def _sphere_test(j, best_t):
        # sphere quadratic (Hittable.cuh:80-110) with a == 1; the direct
        # o-c form is f32-stable at any distance from the world origin
        # (the expanded o.o - 2 c.o + |c|^2 form cancels catastrophically
        # for far-away geometry, and measured no faster)
        cxj, cyj, czj = sread(S_CX, j), sread(S_CY, j), sread(S_CZ, j)
        if time is not None:
            # motion blur: center at the path's shutter time (velocity
            # rows are zero for static spheres — adds exact zeros)
            cxj = cxj + time * sread(S_VX, j)
            cyj = cyj + time * sread(S_VY, j)
            czj = czj + time * sread(S_VZ, j)
        ocx, ocy, ocz = ox - cxj, oy - cyj, oz - czj
        bq = ocx * dx + ocy * dy + ocz * dz
        cq = ocx * ocx + ocy * ocy + ocz * ocz - sread(S_R2, j)
        disc = bq * bq - cq
        # x*rsqrt(x) measured ~3% faster than sqrt(x) on v5e (same math
        # to 1 ulp; hardware rsqrt outpaces hardware sqrt)
        dpos = jnp.maximum(disc, 1e-30)
        sq = dpos * lax.rsqrt(dpos)
        nb = -bq
        t0 = nb - sq
        # root selection, exact reference semantics in fewer ops:
        # t1 >= t0 always, so "t0 if t0 in window else t1" reduces to
        # "t0 if t0 > t_min else t1" with a single window test after
        t_s = jnp.where(t0 > t_min, t0, nb + sq)
        hit_s = (disc > 0.0) & (t_s > t_min) & (t_s < best_t)
        return hit_s, t_s

    def _rect_test(j, best_t):
        # rect (Hittable.cuh:128-294) with precomputed plane consts
        kax = sread(S_KAX, j)
        o_k = jnp.where(kax < 0.5, ox, jnp.where(kax < 1.5, oy, oz))
        d_k = jnp.where(kax < 0.5, dx, jnp.where(kax < 1.5, dy, dz))
        t_r = (sread(S_CK, j) - o_k) / jnp.where(d_k == 0.0, 1e-30, d_k)
        aax = sread(S_AAX, j)
        bax = sread(S_BAX, j)
        o_a = jnp.where(aax < 0.5, ox, jnp.where(aax < 1.5, oy, oz))
        d_a = jnp.where(aax < 0.5, dx, jnp.where(aax < 1.5, dy, dz))
        o_b = jnp.where(bax < 0.5, ox, jnp.where(bax < 1.5, oy, oz))
        d_b = jnp.where(bax < 0.5, dx, jnp.where(bax < 1.5, dy, dz))
        p_a = o_a + t_r * d_a
        p_b = o_b + t_r * d_b
        hit_r = (
            (t_r > t_min) & (t_r < best_t)
            & (jnp.abs(p_a - sread(S_CA, j)) <= sread(S_HA, j))
            & (jnp.abs(p_b - sread(S_CB, j)) <= sread(S_HB, j))
        )
        return hit_r, t_r

    def _tri_test(j, best_t):
        # Havel-Herout precomputed-plane test (module tables comment):
        #   t = (d_n - N.o)/(N.d);  p = o + t d;  u = p.n1 + d1;
        #   v = p.m2 + d2 — no cross product, one inv-multiply.
        nx, ny, nz = sread(S_NX, j), sread(S_NY, j), sread(S_NZ, j)
        denom = dx * nx + dy * ny + dz * nz
        ok = jnp.abs(denom) > 1e-9
        inv = 1.0 / jnp.where(ok, denom, 1.0)
        t_t = (sread(S_DN, j) - (ox * nx + oy * ny + oz * nz)) * inv
        px = ox + t_t * dx
        py = oy + t_t * dy
        pz = oz + t_t * dz
        u = (px * sread(S_N1X, j) + py * sread(S_N1Y, j)
             + pz * sread(S_N1Z, j) + sread(S_D1, j))
        v = (px * sread(S_M2X, j) + py * sread(S_M2Y, j)
             + pz * sread(S_M2Z, j) + sread(S_D2, j))
        hit_t = (
            ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
            & (t_t > t_min) & (t_t < best_t)
        )
        return hit_t, t_t, u, v

    def _med_test(j, best_t):
        # constant-density medium (RTOW ConstantMedium::Hit, closed form):
        # the boundary chord (entry, exit) comes from the sphere quadratic
        # OR (has_boxm scenes, a STATIC flag) the box slab test — S_HA > 0
        # flags a BOX column; sphere media and padding both carry
        # S_HA = -1.  Scatter at entry + -log(u)/density (dirs are unit,
        # so t IS world distance).  Sphere-medium columns select exactly
        # the historical operands, and sphere-only media scenes skip the
        # slab math entirely (bit-identical graph, test_media_box.py).
        cxj, cyj, czj = sread(S_CX, j), sread(S_CY, j), sread(S_CZ, j)
        ocx, ocy, ocz = ox - cxj, oy - cyj, oz - czj
        bq = ocx * dx + ocy * dy + ocz * dz
        cq = ocx * ocx + ocy * ocy + ocz * ocz - sread(S_R2, j)
        disc = bq * bq - cq
        dpos = jnp.maximum(disc, 1e-30)
        sq = dpos * lax.rsqrt(dpos)
        t0 = -bq - sq
        t1 = -bq + sq
        if has_boxm:
            # box chord (slab test on center +/- half-extents)
            haj = sread(S_HA, j)
            hbj = sread(S_HB, j)
            hcj = sread(S_CA, j)
            if has_rotm:
                # yaw-ROTATED box media (RTOW rotate_y; STATIC flag —
                # axis-aligned scenes trace the historical branch).
                # cos/sin ride the triangle-only rows 13/14; the ray is
                # rotated INTO object space (x_o = c*x - s*z ;
                # z_o = s*x + c*z) and rotation preserves lengths, so
                # the object-space t values apply to the world ray.
                # Unrotated boxes pack cos=1/sin=0 (exact same chord).
                cyr = sread(S_DN, j)
                syr = sread(S_D1, j)
                rox = cyr * (ox - cxj) - syr * (oz - czj)
                roy = oy - cyj
                roz = syr * (ox - cxj) + cyr * (oz - czj)
                rdx = cyr * dx - syr * dz
                rdz = syr * dx + cyr * dz
                ivx = 1.0 / jnp.where(rdx == 0.0, 1e-30, rdx)
                ivz = 1.0 / jnp.where(rdz == 0.0, 1e-30, rdz)
                bx0 = (-haj - rox) * ivx
                bx1 = (haj - rox) * ivx
                by0 = (-hbj - roy) * inv_dy
                by1 = (hbj - roy) * inv_dy
                bz0 = (-hcj - roz) * ivz
                bz1 = (hcj - roz) * ivz
            else:
                bx0 = (cxj - haj - ox) * inv_dx
                bx1 = (cxj + haj - ox) * inv_dx
                by0 = (cyj - hbj - oy) * inv_dy
                by1 = (cyj + hbj - oy) * inv_dy
                bz0 = (czj - hcj - oz) * inv_dz
                bz1 = (czj + hcj - oz) * inv_dz
            tn = jnp.maximum(jnp.maximum(jnp.minimum(bx0, bx1),
                                         jnp.minimum(by0, by1)),
                             jnp.minimum(bz0, bz1))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(bx0, bx1),
                                         jnp.maximum(by0, by1)),
                             jnp.maximum(bz0, bz1))
            is_box = haj > 0.0
            te = jnp.maximum(jnp.where(is_box, tn, t0), t_min)
            tex = jnp.where(is_box, tf, t1)
            valid = (is_box & (tf > te)) \
                | (~is_box & (disc > 0.0) & (t1 > te))
        else:
            te = jnp.maximum(t0, t_min)
            tex = t1
            valid = (disc > 0.0) & (t1 > te)
        # per-prim uniform: golden-ratio-ish center hash rotation of the
        # wave's lane uniform (prim-INTRINSIC: identical across table
        # layouts, unlike a column index)
        uj = u_med + (cxj * 0.7548777 + cyj * 0.5698403 + czj * 0.3287281)
        uj = uj - jnp.floor(uj)
        hd = -jnp.log(jnp.maximum(uj, 1e-12)) / sread(S_DENS, j)
        t_c = te + hd
        hit_m = valid & (t_c < tex) & (t_c < best_t)
        return hit_m, t_c

    def _dual_test(j, best_t):
        ptype = sread(S_PTYPE, j)
        is_sphere = ptype < 0.5
        # rect ptypes are 1-3 only: the explicit upper gate keeps ptype-5
        # MEDIUM columns inert here even if a media cluster is ever
        # mis-dispatched (packing segregates media into kind-4 clusters,
        # but BOX media carry positive S_HA/S_HB half-extents that would
        # otherwise fake a rect hit; sphere media were inert by extent<0)
        is_rect = ~is_sphere & (ptype < 3.5)
        hit_s, t_s = _sphere_test(j, best_t)
        hit_r, t_r = _rect_test(j, best_t)
        t_j = jnp.where(is_sphere, t_s, t_r)
        # boolean select via logic ops (Mosaic can't select i1 vectors)
        hit_j = (is_sphere & hit_s) | (is_rect & hit_r)
        if has_tris:
            is_tri = ptype > 3.5
            hit_t, t_t, u_t, v_t = _tri_test(j, best_t)
            t_j = jnp.where(is_tri, t_t, t_j)
            hit_j = (is_tri & hit_t) | (~is_tri & hit_j)
            if carry_uv:
                return hit_j, t_j, u_t, v_t  # non-tri winners: uv is junk,
                # exactly like the plane-reconstruction path (masked by
                # is_tri_p at use)
        return hit_j, t_j

    def _prim_loop(test, test_uv: bool = False):
        """``test_uv``: the test emits candidate (u, v) and the loop
        carries the winner's pair (only meaningful when carry_uv)."""
        def prim_quad(i, carry):
            """Four primitives per step: all tested against the SAME stale
            best_t (independent -> instruction-level parallelism, breaking
            the serial best_t dependency chain), then applied in order with
            an exact (t < running best) re-check — the stale window is a
            superset, so the winner is exact."""
            if with_rec:
                rec = carry[-1]
                carry = carry[:-1]
            if carry_uv:
                best_t, best_j, best_u, best_v, base = carry
            else:
                best_t, best_j, base = carry
            j0 = base + 4 * i
            res = [test(j0 + k, best_t) for k in range(4)]
            for k, r in enumerate(res):
                hitk, tk = r[0], r[1]
                if k:
                    hitk = hitk & (tk < best_t)
                best_t = jnp.where(hitk, tk, best_t)
                rec_jk = (jnp.float32(j0 + k) + rec if with_rec
                          else jnp.float32(j0 + k))
                best_j = jnp.where(hitk, rec_jk, best_j)
                if carry_uv and test_uv:
                    best_u = jnp.where(hitk, r[2], best_u)
                    best_v = jnp.where(hitk, r[3], best_v)
            if carry_uv:
                out = (best_t, best_j, best_u, best_v, base)
            else:
                out = (best_t, best_j, base)
            if with_rec:
                out = out + (rec,)
            return out

        def run(carry):
            out = lax.fori_loop(0, cluster // 4, prim_quad, carry)
            return out[:-1] + (carry[-1],)

        return run

    run_sphere = _prim_loop(_sphere_test)
    run_rect = _prim_loop(_rect_test)
    run_dual = _prim_loop(_dual_test, test_uv=True)
    run_tri = _prim_loop(_tri_test, test_uv=True)
    run_med = _prim_loop(_med_test) if u_med is not None else None
    return _box_any, run_sphere, run_rect, run_dual, run_tri, run_med


def hierarchical_search(
    s_ref, clus_ref, super_ref, n_super,
    ox, oy, oz, dx, dy, dz,
    t_min, best_t0, has_rects: bool,
    order_ref=None,
    cluster: int = CLUSTER,
    super_: int = SUPER,
    has_tris: bool = False,
    carry_uv: bool = False,
    has_media: bool = False,
    u_med=None,
    time=None,
    has_boxm: bool = False,
    has_rotm: bool = False,
):
    """Closest-hit search over the packed scene tables for one ray tile.

    Two-level hierarchical culling: superclusters gate clusters gate
    primitives, all via scalar `lax.cond`s on whole-tile any() — the
    gather-free, tile-coherent analog of BVH descent (reference
    Hittable.cuh:387-439).  Directions must be unit length (a == 1 in the
    sphere quadratic).  ``best_t0`` encodes liveness: dead lanes enter with
    best_t == t_min and can never record a hit.  Returns (best_t, best_j,
    n_entered_clusters) with best_j = packed primitive column as f32, -1
    for miss; the scalar cluster count is a culling diagnostic.

    ``carry_uv`` (vattr scenes): also return the winner's triangle
    barycentrics, carried stale-best through the search — (best_t, best_j,
    best_u, best_v, n_entered).  The Havel-Herout test computes (u, v) for
    every candidate anyway, so this costs 2 selects per prim apply in
    triangle/mixed clusters ONLY (sphere/rect loops thread the values
    through untouched) and replaces the payload loop's 8 plane selects per
    prim + per-wave plane evaluation — strictly fewer ops.
    Bit-identical to the plane reconstruction: u = p.n1+d1
    at p = o + t_win d is evaluated with the same ops either way.

    ``order_ref`` (optional SMEM i32[NSC]) remaps supercluster visit order —
    front-to-back visiting tightens best_t early so later box gates cull
    more.  Closest-hit is visit-order independent (every accept re-checks
    t < best_t), so any permutation returns identical results.  (Ordering
    clusters within supers too was measured SLOWER: the per-super sort
    costs more scalar work than 4-element segments can prune.)
    """
    _box_any, run_sphere, run_rect, run_dual, run_tri, run_med = \
        _make_search_parts(
            lambda r, j: s_ref[r, j], ox, oy, oz, dx, dy, dz,
            t_min, has_tris, carry_uv, cluster, u_med=u_med, time=time,
            has_boxm=has_boxm, has_rotm=has_rotm,
        )

    def cluster_scan(ci, carry):
        best_t, nclus = carry[0], carry[-1]
        any_hit = _box_any(clus_ref, ci, best_t)

        def run(carry3):
            if not (has_rects or has_tris or has_media):
                return run_sphere(carry3)
            # homogeneous clusters (pack_scene_tables segregates types):
            # pick the cheapest primitive loop for this cluster's kind
            # (0 spheres, 1 rects, 2 mixed, 3 triangles, 4 media —
            # media are segment-segregated so kind 2 is never media).
            # u_med None on a media scene (the G-buffer's deterministic
            # pass) SKIPS medium clusters: fog has no feature surface.
            kind = clus_ref[6, ci]

            def tail(c2):
                if has_media:
                    last = run_med if run_med is not None else (
                        lambda c: c)
                    if has_tris:
                        return lax.cond(
                            kind < 2.5, run_dual,
                            lambda c3: lax.cond(kind < 3.5, run_tri,
                                                last, c3),
                            c2)
                    return lax.cond(kind < 3.5, run_dual, last, c2)
                if has_tris:
                    return lax.cond(kind < 2.5, run_dual, run_tri, c2)
                return run_dual(c2)

            return lax.cond(
                kind < 0.5, run_sphere,
                lambda c: lax.cond(kind < 1.5, run_rect, tail, c),
                carry3,
            )

        out = lax.cond(
            any_hit, run, lambda c: c, carry[:-1] + (ci * cluster,)
        )
        # culling diagnostic: count clusters whose prim loop actually ran
        # (one scalar add, hidden under the vector work)
        return out[:-1] + (nclus + jnp.where(any_hit, 1.0, 0.0),)

    def super_scan(k, carry):
        si = k if order_ref is None else order_ref[k]
        best_t = carry[0]
        any_hit = _box_any(super_ref, si, best_t)

        def run(carry):
            return lax.fori_loop(si * super_, (si + 1) * super_, cluster_scan, carry)

        return lax.cond(any_hit, run, lambda c: c, carry)

    init = (best_t0, jnp.full_like(best_t0, -1.0))
    if carry_uv:
        init = init + (jnp.zeros_like(best_t0), jnp.zeros_like(best_t0))
    return lax.fori_loop(0, n_super, super_scan, init + (jnp.float32(0.0),))


def _streamed_search_payload(
    tiles_ref, buf0, buf1, sem0, sem1,
    clus_ref, super_ref, n_blocks,
    ox, oy, oz, dx, dy, dz,
    t_min, best_t0, has_rects: bool,
    order_ref,
    cluster: int,
    super_: int,
    block_b: int,
    p_rows: int,
    has_tris: bool = False,
    carry_uv: bool = False,
    has_media: bool = False,
    u_med=None,
    time=None,
    has_boxm: bool = False,
    has_rotm: bool = False,
):
    """Closest-hit search + FUSED payload over HBM-streamed block tiles.

    The beyond-SMEM capacity path (BASELINE.md "Table-streaming
    feasibility"): S+P tables live in HBM as per-block tiles
    f32[n_blocks, R8, block_b*128] (one supercluster per 128-column page,
    rows 0-15 = S, 16.. = P; R8/columns padded to the measured Mosaic DMA
    alignment — 8 sublanes x 128 lanes).  Each wave double-buffers whole
    blocks through two SMEM scratch tiles: visit block ord[k] from slot
    k%2 while slot (k+1)%2 receives block ord[k+1].  Copies are
    UNCONDITIONAL (semaphore bookkeeping stays statically balanced — every
    start is waited exactly once, including two wrap-around prefetches
    drained after the loop); compute still culls via the resident
    super/cluster AABB gates, so skipped boxes cost a copy but no vector
    work.

    Payload reconstruction is fused into the visit: right after a
    cluster's prim loop, if any lane's RUNNING best lies in that cluster,
    its payload rows are masked-selected from the resident tile — later
    winners simply overwrite, so the final registers hold the true
    winner's payload without re-fetching any tile (the resident kernel's
    separate payload pass would re-DMA).  Requires n_blocks EVEN and >= 2
    (pack_stream_tiles pads with inert blocks whose point-at-+BIG boxes
    never pass a gate).

    Returns (best_t, best_j, [best_u, best_v,] *pay[p_rows], n_entered)
    with best_j the GLOBAL packed primitive column as f32 (-1 = miss) —
    identical semantics to hierarchical_search + the payload stage.
    """
    span = cluster * super_
    zeros = jnp.zeros_like(best_t0)

    def make_visitor(buf):
        parts = _make_search_parts(
            lambda r, j: buf[r, j], ox, oy, oz, dx, dy, dz,
            t_min, has_tris, carry_uv, cluster, with_rec=True,
            u_med=u_med, time=time, has_boxm=has_boxm, has_rotm=has_rotm,
        )
        box_any, run_sphere, run_rect, run_dual, run_tri, run_med = parts

        def kind_run(ci, carry3):
            if not (has_rects or has_tris or has_media):
                return run_sphere(carry3)
            kind = clus_ref[6, ci]

            def tail(c2):
                if has_media:
                    last = run_med if run_med is not None else (
                        lambda c: c)
                    if has_tris:
                        return lax.cond(
                            kind < 2.5, run_dual,
                            lambda c3: lax.cond(kind < 3.5, run_tri,
                                                last, c3),
                            c2)
                    return lax.cond(kind < 3.5, run_dual, last, c2)
                if has_tris:
                    return lax.cond(kind < 2.5, run_dual, run_tri, c2)
                return run_dual(c2)

            return lax.cond(
                kind < 0.5, run_sphere,
                lambda c: lax.cond(kind < 1.5, run_rect, tail, c),
                carry3,
            )

        def visit_super(si, s, carry):
            """One supercluster resident at page ``s`` of the tile."""
            best_t = carry[0]
            any_hit = box_any(super_ref, si, best_t)
            # record offset: global prim id = local column + rec
            rec = (si * span - s * 128).astype(jnp.float32)

            def run(carry):
                def cluster_scan(c, carry):
                    best_t, nclus = carry[0], carry[-1]
                    ci = si * super_ + c  # global (resident clus_ref)
                    any_c = box_any(clus_ref, ci, best_t)
                    base_l = s * 128 + c * cluster  # block-local column

                    def run_c(carry):
                        nhit = carry[-1]
                        pay = carry[-1 - p_rows:-1]
                        head = carry[:-1 - p_rows]
                        sc = head + (base_l, rec)
                        out = kind_run(ci, sc)
                        best_t2, best_j2 = out[0], out[1]
                        head2 = out[:-2]
                        # ---- fused payload: the cluster's prims are
                        # resident NOW; select rows for lanes whose
                        # RUNNING winner lies in this cluster (later
                        # clusters overwrite their own winners)
                        jg0 = jnp.float32(si * span + c * cluster)
                        in_cl = jnp.any(
                            (best_j2 >= jg0) & (best_j2 < jg0 + cluster)
                        )

                        def pay_run(pay):
                            def prim_pay(m, pay):
                                # m is the block-local column; global
                                # prim id = m + rec (same mapping the
                                # prim loop records)
                                mask = best_j2 == (jnp.float32(m) + rec)
                                return tuple(
                                    jnp.where(mask, buf[16 + k, m], pay[k])
                                    for k in range(p_rows)
                                )

                            return lax.fori_loop(
                                base_l, base_l + cluster, prim_pay, pay)

                        pay = lax.cond(in_cl, pay_run, lambda p: p, pay)
                        return head2 + pay + (nhit,)

                    out = lax.cond(any_c, run_c, lambda cr: cr, carry[:-1]
                                   + (nclus + jnp.where(any_c, 1.0, 0.0),))
                    return out

                return lax.fori_loop(0, super_, cluster_scan, carry)

            return lax.cond(any_hit, run, lambda c: c, carry)

        def visit_block(bi, carry):
            for s in range(block_b):  # static unroll: pages of the tile
                carry = visit_super(bi * block_b + s, s, carry)
            return carry

        return visit_block

    visit0 = make_visitor(buf0)
    visit1 = make_visitor(buf1)

    def start(bi, buf, sem):
        pltpu.make_async_copy(tiles_ref.at[bi], buf, sem).start()

    def wait(buf, sem):
        pltpu.make_async_copy(tiles_ref.at[0], buf, sem).wait()

    # prologue: both slots in flight (n_blocks >= 2 guaranteed)
    start(order_ref[0], buf0, sem0)
    start(order_ref[1], buf1, sem1)

    def pair_body(m, carry):
        k0 = 2 * m
        wait(buf0, sem0)
        carry = visit0(order_ref[k0], carry)
        # wrap-around prefetch keeps every start unconditionally waited;
        # the final pair's wrapped copies are drained after the loop
        start(order_ref[lax.rem(k0 + 2, n_blocks)], buf0, sem0)
        wait(buf1, sem1)
        carry = visit1(order_ref[k0 + 1], carry)
        start(order_ref[lax.rem(k0 + 3, n_blocks)], buf1, sem1)
        return carry

    init = (best_t0, jnp.full_like(best_t0, -1.0))
    if carry_uv:
        init = init + (zeros, zeros)
    init = init + (zeros,) * p_rows + (jnp.float32(0.0),)
    out = lax.fori_loop(0, n_blocks // 2, pair_body, init)
    wait(buf0, sem0)
    wait(buf1, sem1)
    return out


def _u01(shape):
    """Uniform [0,1) floats from the hardware PRNG (mantissa trick)."""
    bits = pltpu.prng_random_bits(shape)
    mant = jax.lax.shift_right_logical(pltpu.bitcast(bits, jnp.uint32), jnp.uint32(9))
    one = jnp.uint32(0x3F800000)
    return pltpu.bitcast(mant | one, jnp.float32) - 1.0


def _atan2(y, x):
    """Polynomial atan2 (Mosaic has no atan2 lowering): octant reduction +
    Hastings minimax for atan on [0,1], |err| < 1.5e-4 rad — at a 512px
    texture that is < 0.02 texel of UV error."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    mx = jnp.maximum(ax, ay)
    t = jnp.minimum(ax, ay) / jnp.maximum(mx, 1e-30)
    s = t * t
    r = t * (0.999866 + s * (-0.3302995 + s * (0.180141
             + s * (-0.085133 + s * 0.0208351))))
    r = jnp.where(ay > ax, (math.pi / 2.0) - r, r)
    r = jnp.where(x < 0.0, math.pi - r, r)
    return jnp.where(y < 0.0, -r, r)


def _acos(x):
    """Polynomial acos (Abramowitz-Stegun 4.4.45), |err| < 7e-5 rad."""
    ax = jnp.abs(x)
    r = jnp.sqrt(jnp.maximum(1.0 - ax, 0.0)) * (
        1.5707288 + ax * (-0.2121144 + ax * (0.074261 - 0.0187293 * ax)))
    return jnp.where(x < 0.0, math.pi - r, r)


def _render_kernel(
    cnt_ref,  # SMEM i32[7]: n_super, max_depth, y0, seed, stream, spp,
    #           sample_base (QMC global sample index — read at [6] even
    #           when has_qmc=False; append new scalars at [7]+)
    cam_ref,  # SMEM f32[38]
    s_ref,  # SMEM f32[16, NP]   (SMEM: dynamic per-prim scalar loads)
    p_ref,  # SMEM f32[P_ROWS(_UV), NP] payload table
    clus_ref,  # SMEM f32[7, NC] (rows 0-5 AABB, row 6 kind)
    super_ref,  # SMEM f32[6, NSC]
    out_ref,  # VMEM f32[3, TH, TW] block
    cnt_out_ref,  # VMEM f32[8, 128] block: [0,0] = rays traced by this tile
    key_ref,  # SMEM f32[NSC] scratch: per-super front-to-back sort keys
    ord_ref,  # SMEM i32[NSC] scratch: supercluster visit order
    *,
    mask_ref=None,  # SMEM i32[NT] (adaptive only): 1 = render tile, 0 = skip
    # ---- streamed mode (stream_b > 0): beyond-SMEM scene tables.
    # s_ref is then the HBM tiles ref f32[n_blocks_cap, R8, stream_b*128]
    # (pl.ANY), p_ref the resident block-AABB table f32[6, n_blocks_cap],
    # cnt_ref[0] the USED block count, and key/ord scratch are block-
    # indexed; buf0/buf1/sem0/sem1 are the double-buffer scratch.
    stream_b: int = 0,
    buf0=None,
    buf1=None,
    sem0=None,
    sem1=None,
    tile_h: int,
    tile_w: int,
    width: int,
    height: int,
    camera_model: str,
    has_rects: bool,
    has_images: bool,
    rr_start: int,
    cluster: int = CLUSTER,
    super_: int = SUPER,
    octant_split: bool = False,
    has_tris: bool = False,
    has_vattrs: bool = False,
    has_noise: bool = False,
    has_media: bool = False,
    has_motion: bool = False,
    has_boxm: bool = False,
    has_rotm: bool = False,
    has_nee: bool = False,
    nee_p: float = 0.5,
    has_qmc: bool = False,
):
    pi = pl.program_id(0)
    pj = pl.program_id(1)
    pid = pi * pl.num_programs(1) + pj
    # tuple-mixed seeding: the hardware PRNG hashes (frame seed, stream) so
    # no (frame, band, tile) combination can collide the way additive
    # prime-multiplier schemes could.  Mosaic allows at most 2 seed values,
    # so band/sample stream and tile id pack injectively into one scalar
    # (tiles < 2^18 per band, streams < 2^13).
    pltpu.prng_seed(cnt_ref[3], cnt_ref[4] * 262144 + pid)

    n_super = cnt_ref[0]
    max_depth = cnt_ref[1]
    y0 = cnt_ref[2]  # first image row of this band (multi-chip row sharding)
    spp_f = cnt_ref[5].astype(jnp.float32)
    max_depth_f = max_depth.astype(jnp.float32)
    t_min = cam_ref[28]

    # 2D pixel tiles: spatially compact tiles keep a tile's rays coherent,
    # which is what makes per-tile cluster culling and whole-tile bounce
    # early-exit effective (a full-width strip would intersect most of the
    # scene's clusters and cull nothing)
    shape = (tile_h, tile_w)
    xs = lax.broadcasted_iota(jnp.int32, shape, 1).astype(jnp.float32) + (
        pj * tile_w
    ).astype(jnp.float32)
    ys = lax.broadcasted_iota(jnp.int32, shape, 0).astype(jnp.float32) + (
        y0 + pi * tile_h
    ).astype(jnp.float32)

    def cam3(i):
        return cam_ref[i], cam_ref[i + 1], cam_ref[i + 2]

    if has_qmc:
        # deterministic per-pixel Cranley-Patterson rotation (constant per
        # lane across the whole launch — and across launches, so the R2
        # sequence indexed by cnt_ref[6] + done keeps extending)
        qrotx, qroty = _qmc.pixel_rotation(xs, ys)

    def gen_ray(jx, jy):
        """Fresh primary ray for every lane's pixel (the per-sample raygen
        of Kernel.cu:130-148); called in-loop so finished lanes can start
        their next sample immediately (path regeneration).  ``jx``/``jy``
        are the pixel jitters — PRNG uniforms normally, R2 low-discrepancy
        offsets under ``has_qmc`` (ops/qmc.py; computed by the caller
        because the QMC index is the lane's done-count)."""
        if camera_model == "look_at":
            s = (xs + jx) * (1.0 / width)
            t = (height - 1.0 - ys + jy) * (1.0 / height)
            lens_r = cam_ref[18]
            u1 = _u01(shape)
            u2 = _u01(shape)
            rr = lens_r * jnp.sqrt(u1)
            th = 2.0 * math.pi * u2
            lx = rr * jnp.cos(th)
            ly = rr * jnp.sin(th)
            uax = cam3(12)
            vax = cam3(15)
            origin = cam3(0)
            ll = cam3(3)
            ho = cam3(6)
            ve = cam3(9)
            ox = origin[0] + lx * uax[0] + ly * vax[0]
            oy = origin[1] + lx * uax[1] + ly * vax[1]
            oz = origin[2] + lx * uax[2] + ly * vax[2]
            dx = ll[0] + s * ho[0] + t * ve[0] - ox
            dy = ll[1] + s * ho[1] + t * ve[1] - oy
            dz = ll[2] + s * ho[2] + t * ve[2] - oz
        else:  # two_plane (reference Kernel.cu:130-148)
            u = ((xs - width / 2.0) + jx) * (1.0 / width)
            v = ((height / 2.0 - ys) + jy) * (1.0 / width)
            right = cam3(22)
            up = cam3(25)
            fwd = cam3(29)
            origin = cam3(0)
            near, far, fov = cam_ref[19], cam_ref[20], cam_ref[21]
            distx = u * right[0] + v * up[0]
            disty = u * right[1] + v * up[1]
            distz = u * right[2] + v * up[2]
            ox = near * distx + origin[0] + fov * fwd[0]
            oy = near * disty + origin[1] + fov * fwd[1]
            oz = near * distz + origin[2] + fov * fwd[2]
            k2 = 1.0 / fov * 10.0
            dx = far * distx + k2 * fwd[0] + origin[0] - ox
            dy = far * disty + k2 * fwd[1] + origin[1] - oy
            dz = far * distz + k2 * fwd[2] + origin[2] - oz
        dn = lax.rsqrt(jnp.maximum(dx * dx + dy * dy + dz * dz, 1e-12))
        return ox, oy, oz, dx * dn, dy * dn, dz * dn

    bg0 = cam3(32)
    bg1 = cam3(35)

    zeros = jnp.zeros(shape, jnp.float32)
    ones = jnp.ones(shape, jnp.float32)
    # tile-alignment pad pixels (x >= width or y >= height) never get
    # samples: they are cropped by the caller, trace no rays, don't count
    done0 = jnp.where(
        (xs < jnp.float32(width)) & (ys < jnp.float32(height)), 0.0, spp_f
    )
    if mask_ref is not None:
        # adaptive tile skip: a converged tile (mask 0) marks every lane
        # done, so the bounce loop's vector condition is false at it=0 —
        # the whole wave loop is skipped and the tile writes its init
        # zeros (radiance 0, rays 0).  Cost for skipped tiles ~= raygen-
        # free zero stores; throughput scales with the ACTIVE tile count.
        # (done_f lands at spp for skipped lanes; adaptive callers mask
        # the counts plane by tile activity, pallas_render_sample below.)
        actf = mask_ref[pid].astype(jnp.float32)  # 1.0 render / 0.0 skip
        done0 = done0 + (1.0 - actf) * spp_f

    # payload rows in P (the winner's barycentrics ride the SEARCH carry
    # in vattr scenes — hierarchical_search carry_uv — not the payload).
    # Attr-less triangle scenes with image textures ALSO carry (u, v):
    # the raw barycentrics are the uv map the XLA record samples with
    # (ops/intersect.py), so image-textured plain meshes defer exactly
    # instead of shading with the atlas mean (round-3 VERDICT Next #7).
    p_rows = p_rows_for(has_images, has_vattrs, has_motion)
    carry_uv = has_vattrs or (has_tris and has_images)

    def bounce_body(state):
        (it, nrays, ox, oy, oz, dx, dy, dz, tpx, tpy, tpz,
         rx, ry, rz, alive_f, done_f, depth_f, *img_state) = state
        nclus = img_state[-1]  # appended last: entered-cluster diagnostic
        img_state = img_state[:-1]
        if has_motion:
            # per-PATH shutter time (motion blur): carried so every wave
            # of a path sees the world frozen at the same instant
            time_f = img_state[-1]
            img_state = img_state[:-1]
        if has_images:
            # two-record image-texture deferral state.  Each lane carries
            # TWO single-use (u, v, slot) records; the XLA epilogue applies
            # radiance = r + tex1*rp + tex2*(chain ? tex1 : 1)*rq.  Per-path
            # ``stage_f`` routes radiance: 0 -> r (no pending texel),
            # 1 -> rp (x texel1), 2 -> rq (x texel2, and x texel1 too when
            # ``chain_f`` marks record 2 as the SAME path's second image
            # hit).  used1/used2 are lane-persistent record consumption
            # flags; a lane parks (stops regenerating) only after BOTH
            # records are used, and the launch returns per-pixel completed-
            # sample counts for the sum/count display (pallas_render_sample).
            (used1_f, stage_f, used2_f, chain_f, iu, iv, iid,
             iu2, iv2, iid2, rpx, rpy, rpz, rqx, rqy, rqz) = img_state
        # ---- path regeneration: a finished lane starts its next sample
        # immediately, so deep waves stay at full occupancy instead of
        # paying whole-tile vector cost for a few straggler paths ----
        if has_qmc:
            # R2 low-discrepancy jitter: global sample index = launch
            # base + this lane's completed-sample count (ops/qmc.py;
            # same formula as the XLA raygen, so the two paths trace
            # IDENTICAL primary rays for identical indices)
            m_idx = cnt_ref[6] + done_f.astype(jnp.int32)
            fqx, fqy = _qmc.r2_frac(m_idx)
            jx = qrotx + fqx
            jx = jx - jnp.floor(jx)
            jy = qroty + fqy
            jy = jy - jnp.floor(jy)
        else:
            jx = _u01(shape)
            jy = _u01(shape)
        nox, noy, noz, ndx, ndy, ndz = gen_ray(jx, jy)
        need = (alive_f < 0.5) & (done_f < spp_f)
        if has_images:
            # the deferral records are single-use: a lane parks (stops
            # regenerating) once BOTH are consumed.  The launch returns
            # per-pixel sample COUNTS; the caller accumulates sums and
            # counts and divides at display — a ratio estimator that is
            # consistent by Wald's identity (the park rule is a stopping
            # time over iid samples), so progressive accumulation
            # converges to the exact mean.
            need = need & ~(used2_f > 0.5)
            # a fresh path starts with no pending texel factor
            stage_f = jnp.where(need, 0.0, stage_f)
        if has_motion:
            time_f = jnp.where(need, _u01(shape), time_f)
        ox = jnp.where(need, nox, ox)
        oy = jnp.where(need, noy, oy)
        oz = jnp.where(need, noz, oz)
        dx = jnp.where(need, ndx, dx)
        dy = jnp.where(need, ndy, dy)
        dz = jnp.where(need, ndz, dz)
        tpx = jnp.where(need, 1.0, tpx)
        tpy = jnp.where(need, 1.0, tpy)
        tpz = jnp.where(need, 1.0, tpz)
        depth_f = jnp.where(need, 0.0, depth_f)
        alive_f = jnp.where(need, 1.0, alive_f)
        # alive carried as f32 (Mosaic can't carry i1 vectors across scf loops)
        alive = alive_f > 0.5
        nrays = nrays + jnp.sum(alive_f)

        # ray directions are kept unit length (raygen + scatter both
        # normalize), so the quadratic's a coefficient is 1: the two
        # divisions per sphere test and the |d| terms in the dielectric
        # fold away.  Same directions, same hit points as the reference's
        # unnormalized rays — t is just measured in world units.

        # constant-density media: one uniform per lane per wave drives the
        # stochastic scatter-distance sampling (decorrelated per prim by a
        # center hash inside _med_test)
        u_med = _u01(shape) if has_media else None
        sh_time = time_f if has_motion else None

        # -------- front-to-back supercluster order for this wave --------
        # Sort superclusters by clamped squared distance from the mean live
        # ray origin to their AABB (0 when the origin is inside).  Visiting
        # near boxes first tightens best_t early, so the any() gates cull
        # far clusters that an arbitrary (Morton) visit order would enter.
        # Pure perf: closest-hit is visit-order independent.  All scalar
        # SMEM work: ~n_super^2 ops per wave, negligible vs the prim loops.
        def front_to_back_order(sel_f):
            """Fill ord_ref with superclusters (streamed mode: BLOCKS)
            sorted by clamped squared distance from the mean origin of the
            ``sel_f``-selected lanes (0 inside the box).  A direction-aware
            key (mean-ray slab entry t) was measured SLOWER: more scalar
            work, no extra pruning."""
            box_ref = p_ref if stream_b else super_ref
            na = 1.0 / jnp.maximum(jnp.sum(sel_f), 1.0)
            mox = jnp.sum(ox * sel_f) * na
            moy = jnp.sum(oy * sel_f) * na
            moz = jnp.sum(oz * sel_f) * na

            def fill_key(si, carry):
                ax = jnp.maximum(jnp.maximum(box_ref[0, si] - mox,
                                             mox - box_ref[3, si]), 0.0)
                ay = jnp.maximum(jnp.maximum(box_ref[1, si] - moy,
                                             moy - box_ref[4, si]), 0.0)
                az = jnp.maximum(jnp.maximum(box_ref[2, si] - moz,
                                             moz - box_ref[5, si]), 0.0)
                key_ref[si] = ax * ax + ay * ay + az * az
                ord_ref[si] = si
                return carry

            lax.fori_loop(0, n_super, fill_key, 0)

            def sort_outer(i, carry):
                def sort_inner(j, carry2):
                    ki = key_ref[i]
                    kj = key_ref[j]
                    oi = ord_ref[i]
                    oj = ord_ref[j]
                    sw = kj < ki
                    key_ref[i] = jnp.where(sw, kj, ki)
                    key_ref[j] = jnp.where(sw, ki, kj)
                    ord_ref[i] = jnp.where(sw, oj, oi)
                    ord_ref[j] = jnp.where(sw, oi, oj)
                    return carry2

                return lax.fori_loop(i + 1, n_super, sort_inner, carry)

            lax.fori_loop(0, n_super - 1, sort_outer, 0)

        # -------- closest hit (shared hierarchical search) --------
        ub = vb = None  # winner barycentrics (vattr scenes, carried)
        pay = None  # streamed mode: payload is fused into the search
        if stream_b:
            # beyond-SMEM scenes: search + payload over HBM block tiles
            # (double-buffered DMA; n_super here is the USED block count)
            front_to_back_order(alive_f)
            found = _streamed_search_payload(
                s_ref, buf0, buf1, sem0, sem1, clus_ref, super_ref,
                n_super, ox, oy, oz, dx, dy, dz,
                t_min, jnp.where(alive, BIG, t_min), has_rects,
                order_ref=ord_ref, cluster=cluster, super_=super_,
                block_b=stream_b, p_rows=p_rows,
                has_tris=has_tris, carry_uv=carry_uv,
                has_media=has_media, u_med=u_med, time=sh_time,
                has_boxm=has_boxm, has_rotm=has_rotm,
            )
            best_t, best_j, nc_wave = found[0], found[1], found[-1]
            k0 = 2
            if carry_uv:
                ub, vb = found[2], found[3]
                k0 = 4
            pay = found[k0:k0 + p_rows]
        elif not octant_split:
            front_to_back_order(alive_f)
            found = hierarchical_search(
                s_ref, clus_ref, super_ref, n_super,
                ox, oy, oz, dx, dy, dz,
                t_min, jnp.where(alive, BIG, t_min), has_rects,
                order_ref=ord_ref, cluster=cluster, super_=super_,
                has_tris=has_tris, carry_uv=carry_uv,
                has_media=has_media, u_med=u_med, time=sh_time,
                has_boxm=has_boxm, has_rotm=has_rotm,
            )
            best_t, best_j, nc_wave = found[0], found[1], found[-1]
            if carry_uv:
                ub, vb = found[2], found[3]
        else:
            # MEASURED PROBE (round-3 verdict Next #8): partition live
            # lanes into two direction buckets (sign of dz) and search per
            # bucket with its own front-to-back order, hoping per-bucket
            # coherence tightens the any() gates.  Structural caveat: a
            # cluster entered by BOTH buckets pays its full-tile prim loop
            # twice (sum over buckets >= union), so this can only win if
            # per-bucket culling prunes far more than the single search.
            fwd_f = jnp.where(alive & (dz >= 0.0), 1.0, 0.0)
            bwd_f = alive_f - fwd_f
            front_to_back_order(fwd_f)
            found_a = hierarchical_search(
                s_ref, clus_ref, super_ref, n_super,
                ox, oy, oz, dx, dy, dz,
                t_min, jnp.where(fwd_f > 0.5, BIG, t_min), has_rects,
                order_ref=ord_ref, cluster=cluster, super_=super_,
                has_tris=has_tris, carry_uv=carry_uv,
                has_media=has_media, u_med=u_med, time=sh_time,
                has_boxm=has_boxm, has_rotm=has_rotm,
            )
            front_to_back_order(bwd_f)
            found_b = hierarchical_search(
                s_ref, clus_ref, super_ref, n_super,
                ox, oy, oz, dx, dy, dz,
                t_min, jnp.where(bwd_f > 0.5, BIG, t_min), has_rects,
                order_ref=ord_ref, cluster=cluster, super_=super_,
                has_tris=has_tris, carry_uv=carry_uv,
                has_media=has_media, u_med=u_med, time=sh_time,
                has_boxm=has_boxm, has_rotm=has_rotm,
            )
            is_fwd = fwd_f > 0.5
            best_t = jnp.where(is_fwd, found_a[0], found_b[0])
            best_j = jnp.where(is_fwd, found_a[1], found_b[1])
            if carry_uv:
                ub = jnp.where(is_fwd, found_a[2], found_b[2])
                vb = jnp.where(is_fwd, found_a[3], found_b[3])
            nc_wave = found_a[-1] + found_b[-1]
        hit = best_j >= 0.0
        nclus = nclus + nc_wave

        # -------- payload reconstruction (winner attributes) --------
        # (streamed mode arrives here with `pay` already fused into the
        # search — the tiles are no longer resident to re-scan)
        def payload_cluster(ci, pay):
            in_cluster = jnp.any(
                hit & (best_j >= ci * cluster) & (best_j < (ci + 1) * cluster)
            )

            def prim_pay(j, pay):
                m = best_j == jnp.float32(j)
                return tuple(
                    jnp.where(m, p_ref[k, j], pay[k]) for k in range(p_rows)
                )

            def run(pay):
                return lax.fori_loop(ci * cluster, (ci + 1) * cluster, prim_pay, pay)

            return lax.cond(in_cluster, run, lambda p: p, pay)

        def payload_super(si, pay):
            span = super_ * cluster
            in_super = jnp.any(hit & (best_j >= si * span) & (best_j < (si + 1) * span))

            def run(pay):
                return lax.fori_loop(si * super_, (si + 1) * super_, payload_cluster, pay)

            return lax.cond(in_super, run, lambda p: p, pay)

        if pay is None:
            pay = lax.fori_loop(0, n_super, payload_super, (zeros,) * p_rows)

        # -------- unpack the packed payload rows (once per wave) --------
        packc = pay[P_PACKC]
        tidp1 = jnp.floor(packc * (1.0 / 256.0))  # tex_id + 1 (0 = no image)
        rem256 = packc - tidp1 * 256.0
        neg_r = jnp.floor(rem256 * (1.0 / 128.0))  # 1 = negative radius
        rem128 = rem256 - neg_r * 128.0
        ptype16 = jnp.floor(rem128 * (1.0 / 16.0))  # prim type, 0-4
        rem_c = rem128 - ptype16 * 16.0
        tex = jnp.floor(rem_c * 0.25)
        mat = rem_c - tex * 4.0
        is_lamb = mat < 0.5
        is_metal = (mat >= 0.5) & (mat < 1.5)
        is_diel = (mat >= 1.5) & (mat < 2.5)
        is_light = mat >= 2.5

        def unpack_rgb(v):
            r = jnp.floor(v * (1.0 / 65536.0))
            rem = v - r * 65536.0
            g = jnp.floor(rem * (1.0 / 256.0))
            b = rem - g * 256.0
            k = 1.0 / 255.0
            return r * k, g * k, b * k

        alr, alg, alb = unpack_rgb(pay[P_PACKA])
        a2r, a2g, a2b = unpack_rgb(pay[P_PACKB])
        mparam = pay[P_MPARAM]

        # -------- hit point, normal --------
        px = ox + best_t * dx
        py = oy + best_t * dy
        pz = oz + best_t * dz
        # (vattr scenes: ub/vb — the winner's barycentrics — were carried
        # through the search above; garbage for non-triangle winners,
        # masked by is_tri_p below)
        # unit normal = normalize(p - c) * sign(r) == (p - c)/r at the hit
        # (negative radii flip the normal inward: the hollow-glass idiom,
        # Hittable.cuh:96 divides by the SIGNED radius)
        if has_motion:
            # the winner's center at the path's time: velocity payload
            # rows (zero for static spheres and every non-sphere type)
            vb_m = p_rows - 3
            ncx = px - (pay[P_CX] + time_f * pay[vb_m + 0])
            ncy = py - (pay[P_CY] + time_f * pay[vb_m + 1])
            ncz = pz - (pay[P_CZ] + time_f * pay[vb_m + 2])
        else:
            ncx = px - pay[P_CX]
            ncy = py - pay[P_CY]
            ncz = pz - pay[P_CZ]
        rinv = lax.rsqrt(jnp.maximum(ncx * ncx + ncy * ncy + ncz * ncz, 1e-20))
        rinv = rinv * (1.0 - 2.0 * neg_r)
        snx = ncx * rinv
        sny = ncy * rinv
        snz = ncz * rinv
        if has_rects or has_tris:
            is_sphere = ptype16 < 0.5
            # rect outward normal = one-hot(k axis); SetFaceNormal flip
            kax = jnp.where(
                ptype16 < 1.5, 2.0, jnp.where(ptype16 < 2.5, 1.0, 0.0)
            )
            rnx = jnp.where(kax == 0.0, ones, zeros)
            rny = jnp.where(kax == 1.0, ones, zeros)
            rnz = jnp.where(kax == 2.0, ones, zeros)
            if has_tris:
                # triangle payload CX/CY/CZ IS the unit outward normal;
                # two-sided flip below (shared with rects)
                is_tri_p = ptype16 > 3.5
                rnx = jnp.where(is_tri_p, pay[P_CX], rnx)
                rny = jnp.where(is_tri_p, pay[P_CY], rny)
                rnz = jnp.where(is_tri_p, pay[P_CZ], rnz)
            d_dot_out = dx * rnx + dy * rny + dz * rnz
            if has_vattrs:
                # smooth (Phong) shading normal: dequantize the vertex
                # normals (8:8:8, P-table comment), barycentric-
                # interpolate, renormalize.  front_face/flip stay GEOMETRIC
                # (d_dot_out above uses the face normal) so dielectric sign
                # logic is unchanged; the smooth normal is flipped to the
                # same side.  0.0-packed rows = flat triangles keep the
                # face normal (matches ops/intersect.py::make_hit_record).
                vn_base = P_ROWS_UV if has_images else P_ROWS

                def unq(v):
                    r, g, b = unpack_rgb(v)
                    return 2.0 * r - 1.0, 2.0 * g - 1.0, 2.0 * b - 1.0

                n0x, n0y, n0z = unq(pay[vn_base + 0])
                n1x_, n1y_, n1z_ = unq(pay[vn_base + 1])
                n2x_, n2y_, n2z_ = unq(pay[vn_base + 2])
                ix_ = n0x + ub * (n1x_ - n0x) + vb * (n2x_ - n0x)
                iy_ = n0y + ub * (n1y_ - n0y) + vb * (n2y_ - n0y)
                iz_ = n0z + ub * (n1z_ - n0z) + vb * (n2z_ - n0z)
                irl = lax.rsqrt(
                    jnp.maximum(ix_ * ix_ + iy_ * iy_ + iz_ * iz_, 1e-20))
                sm = is_tri_p & (pay[vn_base + 0] > 0.5)
                rnx = jnp.where(sm, ix_ * irl, rnx)
                rny = jnp.where(sm, iy_ * irl, rny)
                rnz = jnp.where(sm, iz_ * irl, rnz)
            flip = jnp.where(d_dot_out < 0.0, 1.0, -1.0)
            nx = jnp.where(is_sphere, snx, rnx * flip)
            ny = jnp.where(is_sphere, sny, rny * flip)
            nz = jnp.where(is_sphere, snz, rnz * flip)
        else:
            nx, ny, nz = snx, sny, snz

        # -------- sky on miss (Kernel.cu:40-45): dirs are already unit --------
        sky_t = 0.5 * (dy + 1.0)
        miss = alive & ~hit
        skyr = (1.0 - sky_t) * bg0[0] + sky_t * bg1[0]
        skyg = (1.0 - sky_t) * bg0[1] + sky_t * bg1[1]
        skyb = (1.0 - sky_t) * bg0[2] + sky_t * bg1[2]
        addx = jnp.where(miss, tpx * skyr, 0.0)
        addy = jnp.where(miss, tpy * skyg, 0.0)
        addz = jnp.where(miss, tpz * skyb, 0.0)
        if has_images:
            # a missing lane cannot be this wave's image hit, so the
            # carried per-path stage routes its sky term correctly
            in1 = (stage_f > 0.5) & (stage_f < 1.5)
            in2 = stage_f > 1.5
            rx = rx + jnp.where(in1 | in2, 0.0, addx)
            ry = ry + jnp.where(in1 | in2, 0.0, addy)
            rz = rz + jnp.where(in1 | in2, 0.0, addz)
            rpx = rpx + jnp.where(in1, addx, 0.0)
            rpy = rpy + jnp.where(in1, addy, 0.0)
            rpz = rpz + jnp.where(in1, addz, 0.0)
            rqx = rqx + jnp.where(in2, addx, 0.0)
            rqy = rqy + jnp.where(in2, addy, 0.0)
            rqz = rqz + jnp.where(in2, addz, 0.0)
        else:
            rx = rx + addx
            ry = ry + addy
            rz = rz + addz

        # -------- texture (constant/checker, Texture.cuh:32-68) --------
        sines = jnp.sin(10.0 * px) * jnp.sin(10.0 * py) * jnp.sin(10.0 * pz)
        odd = sines < 0.0
        is_checker = (tex > 0.5) & (tex < 1.5)
        texr = jnp.where(is_checker & ~odd, a2r, alr)
        texg = jnp.where(is_checker & ~odd, a2g, alg)
        texb = jnp.where(is_checker & ~odd, a2b, alb)

        if has_noise:
            # -------- noise/marble (tex 3, BEYOND-REFERENCE) --------
            # lerp(albedo2, albedo, marble_factor) with the packed tex_id
            # row REPURPOSED as the integer scale (ops/textures.py).  Pure
            # sin/floor/abs VPU math (ops/noise.py is xp-generic and
            # Mosaic-lowerable); compiled in only when the scene uses it.
            from ..noise import marble_factor
            is_noise = tex > 2.5
            nscale = jnp.maximum(tidp1 - 1.0, 1.0)
            fac = marble_factor(px, py, pz, nscale, xp=jnp)
            texr = jnp.where(is_noise, a2r + fac * (alr - a2r), texr)
            texg = jnp.where(is_noise, a2g + fac * (alg - a2g), texg)
            texb = jnp.where(is_noise, a2b + fac * (alb - a2b), texb)

        if has_images:
            # -------- image texture (Texture.cuh:70-109), deferred --------
            # The atlas cannot be gathered per-lane in-kernel; instead each
            # image-texture factor is deferred into one of TWO per-lane
            # (u, v, slot) records: the kernel treats the albedo as white,
            # bumps the path's stage so later radiance routes through
            # rp*/rq*, and the XLA epilogue multiplies by the gathered
            # texels.  Exact for up to two image records per lane per
            # launch; hits beyond that use the atlas mean color packed into
            # PACKA (dielectrics ignore textures, Material.cuh:97-146).
            lit_i = alive & hit
            has_data = tidp1 > 0.5
            is_img = (tex > 1.5) & (tex < 2.5) & lit_i
            eligible = is_img & has_data & ~is_diel
            if has_media:
                # image textures on MEDIA shade with the atlas mean (a
                # medium hit has no meaningful uv — RTOW leaves it unset)
                eligible = eligible & (ptype16 < 4.5)
            first = eligible & ~(used1_f > 0.5)
            second = eligible & (used1_f > 0.5) & ~(used2_f > 0.5)
            # sphere UV (GetSphereUV, Hittable.cuh:119-125) from the
            # outward unit normal (pre face-flip)
            phi = _atan2(-snz, snx) + math.pi
            sph_u = phi * (1.0 / (2.0 * math.pi))
            sph_v = _acos(jnp.clip(-sny, -1.0, 1.0)) * (1.0 / math.pi)
            if has_rects:
                # rect UV = offset within extents along the a/b axes
                # (Hittable.cuh:128-294); axis choice from the prim type:
                # XY(1): a=x,b=y; XZ(2): a=x,b=z; YZ(3): a=y,b=z
                ha = pay[P_HA]
                hb = pay[P_HB]
                p_a = jnp.where(ptype16 < 2.5, px, py)
                p_b = jnp.where(ptype16 < 1.5, py, pz)
                c_a = jnp.where(ptype16 < 2.5, pay[P_CX], pay[P_CY])
                c_b = jnp.where(ptype16 < 1.5, pay[P_CY], pay[P_CZ])
                rect_u = (p_a - c_a + ha) / jnp.maximum(2.0 * ha, 1e-12)
                rect_v = (p_b - c_b + hb) / jnp.maximum(2.0 * hb, 1e-12)
                is_sph_uv = ptype16 < 0.5
                uu = jnp.where(is_sph_uv, sph_u, rect_u)
                vv = jnp.where(is_sph_uv, sph_v, rect_v)
            else:
                uu, vv = sph_u, sph_v
            if has_vattrs:
                # triangle texcoords: uv0 + u*duv1 + v*duv2 at FULL
                # precision from the payload uv rows — image textures on
                # meshes defer exactly like spheres/rects (the default
                # rows make this the raw barycentrics, matching the XLA
                # paths' sampling)
                uvb = (P_ROWS_UV if has_images else P_ROWS) + 3
                uu = jnp.where(
                    is_tri_p,
                    pay[uvb + 0] + ub * pay[uvb + 2] + vb * pay[uvb + 4],
                    uu)
                vv = jnp.where(
                    is_tri_p,
                    pay[uvb + 1] + ub * pay[uvb + 3] + vb * pay[uvb + 5],
                    vv)
            elif has_tris:
                # ATTR-LESS triangles: the raw barycentrics carried
                # through the search ARE the uv map the XLA record
                # samples with (ops/intersect.py::make_hit_record), so
                # image textures on plain meshes defer exactly too
                # (previously the atlas-mean approximation; round-3
                # VERDICT Next #7)
                uu = jnp.where(is_tri_p, ub, uu)
                vv = jnp.where(is_tri_p, vb, vv)
            iu = jnp.where(first, uu, iu)
            iv = jnp.where(first, vv, iv)
            iid = jnp.where(first, tidp1 - 1.0, iid)
            iu2 = jnp.where(second, uu, iu2)
            iv2 = jnp.where(second, vv, iv2)
            iid2 = jnp.where(second, tidp1 - 1.0, iid2)
            # record 2 on a stage-1 path is the SAME path's second image
            # hit: the epilogue must apply texel1 * texel2 to rq
            chain_f = jnp.where(second & (stage_f > 0.5), 1.0, chain_f)
            used1_f = jnp.where(first, 1.0, used1_f)
            used2_f = jnp.where(second, 1.0, used2_f)
            stage_f = jnp.where(first, 1.0, jnp.where(second, 2.0, stage_f))
            deferred = first | second
            # image albedo: white at a deferred hit, atlas mean color when
            # both records are spent; cyan when the slot is empty
            # (Texture.cuh:88-89)
            imr = jnp.where(deferred, 1.0, alr)
            img_g = jnp.where(deferred, 1.0, alg)
            imb = jnp.where(deferred, 1.0, alb)
            imr = jnp.where(has_data, imr, 0.0)
            img_g = jnp.where(has_data, img_g, 1.0)
            imb = jnp.where(has_data, imb, 1.0)
            texr = jnp.where(is_img, imr, texr)
            texg = jnp.where(is_img, img_g, texg)
            texb = jnp.where(is_img, imb, texb)

        # -------- scatter (Material.cuh:34-177) --------
        u_sel = _u01(shape)
        su1 = _u01(shape)
        su2 = _u01(shape)
        su3 = _u01(shape)
        zs = 1.0 - 2.0 * su1
        rs = jnp.sqrt(jnp.maximum(0.0, 1.0 - zs * zs))
        phs = (2.0 * math.pi) * su2
        # cbrt(u) for uniform-volume radius; Mosaic lacks cbrt -> exp(log/3)
        scale = jnp.exp(jnp.log(jnp.maximum(su3, 1e-30)) * (1.0 / 3.0))
        sx = rs * jnp.cos(phs) * scale
        sy = rs * jnp.sin(phs) * scale
        sz_ = zs * scale

        # lambertian: n + s
        ldx, ldy, ldz = nx + sx, ny + sy, nz + sz_

        # metal: reflect(d, n) + fuzz*s (d already unit)
        udx, udy, udz = dx, dy, dz
        ddn_u = udx * nx + udy * ny + udz * nz
        fz = mparam  # metal fuzz (mparam is fuzz when mat == metal)
        mdx = udx - 2.0 * ddn_u * nx + fz * sx
        mdy = udy - 2.0 * ddn_u * ny + fz * sy
        mdz = udz - 2.0 * ddn_u * nz + fz * sz_
        metal_ok = (mdx * nx + mdy * ny + mdz * nz) > 0.0

        # dielectric (Material.cuh:104-136); mparam is ior when dielectric
        # (for other materials these lanes compute masked-out garbage,
        # selected away below — infs stay confined to unselected branches)
        ior = mparam
        ddn = dx * nx + dy * ny + dz * nz
        exiting = ddn > 0.0
        onx = jnp.where(exiting, -nx, nx)
        ony = jnp.where(exiting, -ny, ny)
        onz = jnp.where(exiting, -nz, nz)
        ni = jnp.where(exiting, ior, 1.0 / ior)
        cos_in = ddn
        cos_exit = jnp.sqrt(jnp.maximum(0.0, 1.0 - ior * ior * (1.0 - cos_in * cos_in)))
        cosine = jnp.where(exiting, cos_exit, -cos_in)
        # refract unit(d) about outward normal
        udon = udx * onx + udy * ony + udz * onz
        disc_r = 1.0 - ni * ni * (1.0 - udon * udon)
        can = disc_r > 0.0
        sqd = jnp.sqrt(jnp.maximum(disc_r, 0.0))
        rfx = ni * (udx - onx * udon) - onx * sqd
        rfy = ni * (udy - ony * udon) - ony * sqd
        rfz = ni * (udz - onz * udon) - onz * sqd
        r0 = (1.0 - ior) / (1.0 + ior)
        r0 = r0 * r0
        one_m = 1.0 - cosine
        schlick = r0 + (1.0 - r0) * one_m * one_m * one_m * one_m * one_m
        reflect_prob = jnp.where(can, schlick, 1.0)
        # reflect RAW d about n (Material.cuh:106)
        rwx = dx - 2.0 * ddn * nx
        rwy = dy - 2.0 * ddn * ny
        rwz = dz - 2.0 * ddn * nz
        take_refl = u_sel < reflect_prob
        gdx = jnp.where(take_refl, rwx, rfx)
        gdy = jnp.where(take_refl, rwy, rfy)
        gdz = jnp.where(take_refl, rwz, rfz)

        # light emission (mparam is light intensity when diffuse_light)
        li = mparam
        lit = alive & hit
        emit = lit & is_light
        emx = jnp.where(emit, tpx * li * texr, 0.0)
        emy = jnp.where(emit, tpy * li * texg, 0.0)
        emz = jnp.where(emit, tpz * li * texb, 0.0)
        if has_images:
            # stage updated above: emission AT a deferred image hit is
            # itself scaled by that hit's texel, so it routes by the
            # POST-bump stage (1 -> rp x texel1, 2 -> rq x texel2[,1])
            em1 = (stage_f > 0.5) & (stage_f < 1.5)
            em2 = stage_f > 1.5
            rx = rx + jnp.where(em1 | em2, 0.0, emx)
            ry = ry + jnp.where(em1 | em2, 0.0, emy)
            rz = rz + jnp.where(em1 | em2, 0.0, emz)
            rpx = rpx + jnp.where(em1, emx, 0.0)
            rpy = rpy + jnp.where(em1, emy, 0.0)
            rpz = rpz + jnp.where(em1, emz, 0.0)
            rqx = rqx + jnp.where(em2, emx, 0.0)
            rqy = rqy + jnp.where(em2, emy, 0.0)
            rqz = rqz + jnp.where(em2, emz, 0.0)
        else:
            rx = rx + emx
            ry = ry + emy
            rz = rz + emz

        ndx = jnp.where(is_lamb, ldx, jnp.where(is_metal, mdx, gdx))
        ndy = jnp.where(is_lamb, ldy, jnp.where(is_metal, mdy, gdy))
        ndz = jnp.where(is_lamb, ldz, jnp.where(is_metal, mdz, gdz))
        scat_ok = is_lamb | is_diel | (is_metal & metal_ok)
        if has_media:
            # isotropic phase (ptype 5 columns pack mat 0; the PRIM type
            # is the medium marker): scatter in a uniform random
            # direction — the sphere sample (sx, sy, sz_) is exactly
            # RTOW's Isotropic::Scatter draw; attenuation stays texr
            is_iso = ptype16 > 4.5
            ndx = jnp.where(is_iso, sx, ndx)
            ndy = jnp.where(is_iso, sy, ndy)
            ndz = jnp.where(is_iso, sz_, ndz)
            scat_ok = scat_ok | is_iso
        ninv = lax.rsqrt(jnp.maximum(ndx * ndx + ndy * ndy + ndz * ndz, 1e-20))
        ndx, ndy, ndz = ndx * ninv, ndy * ninv, ndz * ninv
        att_r = jnp.where(is_diel, ones, texr)
        att_g = jnp.where(is_diel, ones, texg)
        att_b = jnp.where(is_diel, ones, texb)

        if has_nee:
            # -------- RTOW book-3 mixture estimator (BEYOND-REFERENCE;
            # exact in-kernel mirror of ops/sampling.py — the XLA NEE
            # render is the cross-check contract, test_nee_kernel.py).
            # Lambertian lanes redraw their direction from a mixture of
            # the TRUE-cosine density and the lights' solid-angle density
            # (8-slot SMEM table appended to cam_ref at offset 38), then
            # weight throughput by scattering_pdf / mixture_pdf.  Slot
            # params are SMEM scalars (no per-lane gathers on TPU): the
            # per-lane slot pick is an 8-way unrolled select chain, the
            # pdf an 8-slot accumulation — a few hundred VPU ops, only
            # for nee scenes (static flag).
            L0 = 38
            n_l = cam_ref[L0]
            p_eff = jnp.where(n_l > 0.5, jnp.float32(nee_p), 0.0)
            u_mix = _u01(shape)
            u_pick = _u01(shape)
            u_la = _u01(shape)
            u_lb = _u01(shape)
            # true-cosine dir: n + the UNIT vector underlying the in-ball
            # scatter draw (same direction, radius 1 — cos/pi exactly)
            ucx = rs * jnp.cos(phs)
            ucy = rs * jnp.sin(phs)
            ucz = zs
            cdx = nx + ucx
            cdy = ny + ucy
            cdz = nz + ucz
            cninv = lax.rsqrt(jnp.maximum(
                cdx * cdx + cdy * cdy + cdz * cdz, 1e-20))
            cdx, cdy, cdz = cdx * cninv, cdy * cninv, cdz * cninv

            slot_f = jnp.floor(u_pick * jnp.maximum(n_l, 1.0))
            slot_f = jnp.minimum(slot_f, jnp.float32(7.0))
            ldx = jnp.zeros_like(px)
            ldy = jnp.zeros_like(px)
            ldz = jnp.ones_like(px)
            # triangle barycentrics (sqrt map) — slot-independent, hoisted
            su_t = jnp.sqrt(u_la)
            tb1 = su_t * (1.0 - u_lb)
            tb2 = su_t * u_lb
            for si in range(8):
                sb = L0 + 2 + 14 * si
                v_i = cam_ref[sb + 13]
                isph = cam_ref[sb]  # geom type: 0 rect, 1 sphere, 2 tri
                lcx, lcy, lcz = (cam_ref[sb + 1], cam_ref[sb + 2],
                                 cam_ref[sb + 3])
                ha_i = cam_ref[sb + 7]
                hb_i = cam_ref[sb + 8]
                rad_i = cam_ref[sb + 9]
                aax_i = cam_ref[sb + 11]
                bax_i = cam_ref[sb + 12]
                # triangle slots overlay edge1 at +4..6, edge2 at +7..9
                e1x_, e1y_, e1z_ = (cam_ref[sb + 4], cam_ref[sb + 5],
                                    cam_ref[sb + 6])
                e2x_, e2y_, e2z_ = (cam_ref[sb + 7], cam_ref[sb + 8],
                                    cam_ref[sb + 9])
                # rect: uniform area point -> direction
                da = (u_la - 0.5) * (2.0 * ha_i)
                db = (u_lb - 0.5) * (2.0 * hb_i)
                offx = (jnp.where(aax_i < 0.5, da, 0.0)
                        + jnp.where(bax_i < 0.5, db, 0.0))
                offy = (jnp.where((aax_i >= 0.5) & (aax_i < 1.5), da, 0.0)
                        + jnp.where((bax_i >= 0.5) & (bax_i < 1.5), db,
                                    0.0))
                offz = (jnp.where(aax_i >= 1.5, da, 0.0)
                        + jnp.where(bax_i >= 1.5, db, 0.0))
                tvx = lcx + offx - px
                tvy = lcy + offy - py
                tvz = lcz + offz - pz
                tin = lax.rsqrt(jnp.maximum(
                    tvx * tvx + tvy * tvy + tvz * tvz, 1e-20))
                rdx_, rdy_, rdz_ = tvx * tin, tvy * tin, tvz * tin
                # sphere: uniform direction in the subtended cone (inside
                # the light the cone degrades to the full 4pi sphere —
                # identical rule in the pdf below and in ops/sampling.py)
                wx = lcx - px
                wy = lcy - py
                wz = lcz - pz
                dd = jnp.maximum(wx * wx + wy * wy + wz * wz, 1e-20)
                dinv = lax.rsqrt(dd)
                wux, wuy, wuz = wx * dinv, wy * dinv, wz * dinv
                outside = dd > rad_i * rad_i * (1.0 + 1e-6)
                cmax = jnp.where(
                    outside,
                    jnp.sqrt(jnp.maximum(
                        1.0 - rad_i * rad_i / dd, 0.0)),
                    -1.0)
                zz = 1.0 + u_lb * (cmax - 1.0)
                ss = jnp.sqrt(jnp.maximum(1.0 - zz * zz, 0.0))
                ph2 = (2.0 * math.pi) * u_la
                # branch-free ONB about w (sampling.py _onb)
                bigx = jnp.abs(wux) > 0.9
                ax_ = jnp.where(bigx, 0.0, 1.0)
                ay_ = jnp.where(bigx, 1.0, 0.0)
                # v = normalize(cross(w, a)) with a = (ax_, ay_, 0)
                vx_ = -wuz * ay_
                vy_ = wuz * ax_
                vz_ = wux * ay_ - wuy * ax_
                vninv = lax.rsqrt(jnp.maximum(
                    vx_ * vx_ + vy_ * vy_ + vz_ * vz_, 1e-20))
                vx_, vy_, vz_ = vx_ * vninv, vy_ * vninv, vz_ * vninv
                # u = cross(w, v)
                ux_ = wuy * vz_ - wuz * vy_
                uy_ = wuz * vx_ - wux * vz_
                uz_ = wux * vy_ - wuy * vx_
                cs_, sn_ = jnp.cos(ph2) * ss, jnp.sin(ph2) * ss
                sdx = ux_ * cs_ + vx_ * sn_ + wux * zz
                sdy = uy_ * cs_ + vy_ * sn_ + wuy * zz
                sdz = uz_ * cs_ + vz_ * sn_ + wuz * zz
                # triangle: uniform area point -> direction
                ttx = lcx + e1x_ * tb1 + e2x_ * tb2 - px
                tty = lcy + e1y_ * tb1 + e2y_ * tb2 - py
                ttz = lcz + e1z_ * tb1 + e2z_ * tb2 - pz
                ttin = lax.rsqrt(jnp.maximum(
                    ttx * ttx + tty * tty + ttz * ttz, 1e-20))
                tdx_, tdy_, tdz_ = ttx * ttin, tty * ttin, ttz * ttin
                dix = jnp.where(isph > 1.5, tdx_,
                                jnp.where(isph > 0.5, sdx, rdx_))
                diy = jnp.where(isph > 1.5, tdy_,
                                jnp.where(isph > 0.5, sdy, rdy_))
                diz = jnp.where(isph > 1.5, tdz_,
                                jnp.where(isph > 0.5, sdz, rdz_))
                take = ((slot_f > si - 0.5) & (slot_f < si + 0.5)
                        & (v_i > 0.5))
                ldx = jnp.where(take, dix, ldx)
                ldy = jnp.where(take, diy, ldy)
                ldz = jnp.where(take, diz, ldz)

            take_l = u_mix < p_eff
            dmx = jnp.where(take_l, ldx, cdx)
            dmy = jnp.where(take_l, ldy, cdy)
            dmz = jnp.where(take_l, ldz, cdz)
            cosd = dmx * nx + dmy * ny + dmz * nz
            scat_pdf = jnp.maximum(cosd, 0.0) * jnp.float32(
                0.3183098861837907)
            # mixture density at the FINAL direction: average of the
            # per-slot solid-angle pdfs (rect plane test / sphere cone)
            lsum = jnp.zeros_like(px)
            for si in range(8):
                sb = L0 + 2 + 14 * si
                v_i = cam_ref[sb + 13]
                isph = cam_ref[sb]  # geom type: 0 rect, 1 sphere, 2 tri
                lcx, lcy, lcz = (cam_ref[sb + 1], cam_ref[sb + 2],
                                 cam_ref[sb + 3])
                ck_i = cam_ref[sb + 4]
                ca_i = cam_ref[sb + 5]
                cb_i = cam_ref[sb + 6]
                ha_i = cam_ref[sb + 7]
                hb_i = cam_ref[sb + 8]
                rad_i = cam_ref[sb + 9]
                kax_i = cam_ref[sb + 10]
                aax_i = cam_ref[sb + 11]
                bax_i = cam_ref[sb + 12]
                # triangle slots overlay edge1 at +4..6, edge2 at +7..9;
                # normal/area from the SCALAR cross product (SMEM math)
                e1x_, e1y_, e1z_ = ck_i, ca_i, cb_i
                e2x_, e2y_, e2z_ = ha_i, hb_i, rad_i
                tnx_ = e1y_ * e2z_ - e1z_ * e2y_
                tny_ = e1z_ * e2x_ - e1x_ * e2z_
                tnz_ = e1x_ * e2y_ - e1y_ * e2x_
                tn2_ = tnx_ * tnx_ + tny_ * tny_ + tnz_ * tnz_
                area_t = 0.5 * jnp.sqrt(jnp.maximum(tn2_, 0.0))
                tninv_ = lax.rsqrt(jnp.maximum(tn2_, 1e-20))
                o_k = jnp.where(kax_i < 0.5, px,
                                jnp.where(kax_i < 1.5, py, pz))
                d_k = jnp.where(kax_i < 0.5, dmx,
                                jnp.where(kax_i < 1.5, dmy, dmz))
                t_r = (ck_i - o_k) / jnp.where(d_k == 0.0, 1e-30, d_k)
                o_a = jnp.where(aax_i < 0.5, px,
                                jnp.where(aax_i < 1.5, py, pz))
                d_a = jnp.where(aax_i < 0.5, dmx,
                                jnp.where(aax_i < 1.5, dmy, dmz))
                o_b = jnp.where(bax_i < 0.5, px,
                                jnp.where(bax_i < 1.5, py, pz))
                d_b = jnp.where(bax_i < 0.5, dmx,
                                jnp.where(bax_i < 1.5, dmy, dmz))
                hit_r = ((t_r > t_min)
                         & (jnp.abs(o_a + t_r * d_a - ca_i) <= ha_i)
                         & (jnp.abs(o_b + t_r * d_b - cb_i) <= hb_i))
                area = 4.0 * ha_i * hb_i
                rpdf_ = jnp.where(
                    hit_r,
                    (t_r * t_r) / jnp.maximum(jnp.abs(d_k)
                                              * area, 1e-12),
                    0.0)
                wx = lcx - px
                wy = lcy - py
                wz = lcz - pz
                dd = jnp.maximum(wx * wx + wy * wy + wz * wz, 1e-20)
                outside = dd > rad_i * rad_i * (1.0 + 1e-6)
                cmax = jnp.where(
                    outside,
                    jnp.sqrt(jnp.maximum(
                        1.0 - rad_i * rad_i / dd, 0.0)),
                    -1.0)
                cdir = (dmx * wx + dmy * wy + dmz * wz) * lax.rsqrt(dd)
                solid = (2.0 * math.pi) * (1.0 - cmax)
                spdf_ = jnp.where((cdir >= cmax) & (solid > 1e-12),
                                  1.0 / jnp.maximum(solid, 1e-12), 0.0)
                # triangle pdf: dist^2 / (|cos| * area) behind a
                # Moller-Trumbore hit test (mirrors sampling.lights_pdf)
                hx_ = dmy * e2z_ - dmz * e2y_
                hy_ = dmz * e2x_ - dmx * e2z_
                hz_ = dmx * e2y_ - dmy * e2x_
                deta = e1x_ * hx_ + e1y_ * hy_ + e1z_ * hz_
                detok = jnp.abs(deta) > 1e-9
                invd = 1.0 / jnp.where(detok, deta, 1.0)
                sx_ = px - lcx
                sy_ = py - lcy
                sz_ = pz - lcz
                bu_ = invd * (sx_ * hx_ + sy_ * hy_ + sz_ * hz_)
                qx_ = sy_ * e1z_ - sz_ * e1y_
                qy_ = sz_ * e1x_ - sx_ * e1z_
                qz_ = sx_ * e1y_ - sy_ * e1x_
                bv_ = invd * (dmx * qx_ + dmy * qy_ + dmz * qz_)
                tt_ = invd * (e2x_ * qx_ + e2y_ * qy_ + e2z_ * qz_)
                hit_t = (detok & (bu_ >= 0.0) & (bv_ >= 0.0)
                         & (bu_ + bv_ <= 1.0) & (tt_ > t_min))
                cost_ = jnp.abs(dmx * tnx_ + dmy * tny_
                                + dmz * tnz_) * tninv_
                tpdf_ = jnp.where(
                    hit_t,
                    (tt_ * tt_) / jnp.maximum(cost_ * area_t, 1e-12),
                    0.0)
                lsum = lsum + jnp.where(
                    isph > 1.5, tpdf_,
                    jnp.where(isph > 0.5, spdf_, rpdf_)) * v_i
            lpdf = lsum / jnp.maximum(n_l, 1.0)
            pdf = (1.0 - p_eff) * scat_pdf + p_eff * lpdf
            okp = pdf > 1e-9
            wgt = scat_pdf / jnp.maximum(pdf, 1e-9)
            sel = is_lamb
            if has_media:
                # medium lanes pack mat 0 (lambertian) — keep their
                # isotropic phase sampler (ptype 5 is the medium marker)
                sel = sel & (ptype16 < 4.5)
            ndx = jnp.where(sel, dmx, ndx)
            ndy = jnp.where(sel, dmy, ndy)
            ndz = jnp.where(sel, dmz, ndz)
            att_r = jnp.where(sel, texr * wgt, att_r)
            att_g = jnp.where(sel, texg * wgt, att_g)
            att_b = jnp.where(sel, texb * wgt, att_b)
            scat_ok = (scat_ok & ~sel) | (sel & okp)

        # a path may scatter again only while its NEXT trace index stays
        # below max_depth (exact reference termination: color() returns
        # black when the loop exhausts, Kernel.cu:79)
        cont = lit & scat_ok & (depth_f + 1.0 < max_depth_f)
        if rr_start > 0:
            # Russian roulette (optional; the reference has no equivalent):
            # from bounce rr_start on, kill paths with probability 1 - p
            # where p = max throughput component, compensating the survivors
            # by 1/p — unbiased, and it drains the straggler waves that
            # dominate deep-depth cost.
            p_surv = jnp.clip(
                jnp.maximum(tpx * att_r, jnp.maximum(tpy * att_g, tpz * att_b)),
                0.05, 1.0,
            )
            u_rr = _u01(shape)
            do_rr = depth_f >= jnp.float32(rr_start)
            # logic ops, not select: Mosaic can't select i1 vectors
            survive = ~do_rr | (u_rr < p_surv)
            inv_p = jnp.where(do_rr, 1.0 / p_surv, 1.0)
            att_r = att_r * inv_p
            att_g = att_g * inv_p
            att_b = att_b * inv_p
            cont = cont & survive
        ox = jnp.where(cont, px, ox)
        oy = jnp.where(cont, py, oy)
        oz = jnp.where(cont, pz, oz)
        dx = jnp.where(cont, ndx, dx)
        dy = jnp.where(cont, ndy, dy)
        dz = jnp.where(cont, ndz, dz)
        tpx = jnp.where(cont, tpx * att_r, tpx)
        tpy = jnp.where(cont, tpy * att_g, tpy)
        tpz = jnp.where(cont, tpz * att_b, tpz)
        # sample bookkeeping: a path that was traced and did not continue is
        # complete — its lane regenerates at the top of the next iteration
        ended = alive & ~cont
        done_f = done_f + jnp.where(ended, 1.0, 0.0)
        depth_f = jnp.where(cont, depth_f + 1.0, depth_f)

        out = (it + 1, nrays, ox, oy, oz, dx, dy, dz, tpx, tpy, tpz,
               rx, ry, rz, jnp.where(cont, 1.0, 0.0), done_f, depth_f)
        if has_images:
            out = out + (used1_f, stage_f, used2_f, chain_f, iu, iv, iid,
                         iu2, iv2, iid2, rpx, rpy, rpz, rqx, rqy, rqz)
        if has_motion:
            out = out + (time_f,)
        return out + (nclus,)

    def bounce_cond(state):
        it = state[0]
        alive_f, done_f = state[14], state[15]
        if has_images:
            # parked lanes (both deferral records used) count as finished
            done_f = jnp.where(state[19] > 0.5, spp_f, done_f)
        # every unfinished lane traces exactly one ray per iteration, so
        # spp*max_depth bounds the loop; the vector exit fires much earlier
        return (it < cnt_ref[5] * max_depth) & (
            (jnp.max(alive_f) > 0.5) | (jnp.min(done_f) < spp_f)
        )

    init = (jnp.int32(0), jnp.float32(0.0),
            zeros, zeros, zeros, zeros, zeros, ones,
            ones, ones, ones, zeros, zeros, zeros, zeros, done0, zeros)
    if has_images:
        neg1 = jnp.full(shape, -1.0)
        # used1, stage, used2, chain, iu, iv, iid, iu2, iv2, iid2, rp*, rq*
        init = init + (zeros, zeros, zeros, zeros, zeros, zeros, neg1,
                       zeros, zeros, neg1, zeros, zeros, zeros,
                       zeros, zeros, zeros)
    if has_motion:
        init = init + (zeros,)  # per-path shutter time
    init = init + (jnp.float32(0.0),)  # entered-cluster diagnostic (last)
    final = lax.while_loop(bounce_cond, bounce_body, init)
    out_ref[0] = final[11]
    out_ref[1] = final[12]
    out_ref[2] = final[13]
    if has_images:
        out_ref[3] = final[27]  # rpx (x texel1 in the epilogue)
        out_ref[4] = final[28]
        out_ref[5] = final[29]
        out_ref[6] = final[30]  # rqx (x texel2 [x texel1 if chained])
        out_ref[7] = final[31]
        out_ref[8] = final[32]
        out_ref[9] = final[21]  # iu
        out_ref[10] = final[22]  # iv
        out_ref[11] = final[23]  # iid
        out_ref[12] = final[24]  # iu2
        out_ref[13] = final[25]  # iv2
        out_ref[14] = final[26]  # iid2
        out_ref[15] = final[20]  # chain flag
        out_ref[16] = final[15]  # per-pixel completed-sample counts
    # mask write instead of .at[].set (Mosaic has no scatter):
    # (0,0) = rays traced by this tile, (0,1) = entered clusters
    rr_i = lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    cc_i = lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    cnt_out_ref[...] = jnp.where(
        (rr_i == 0) & (cc_i == 0), final[1],
        jnp.where((rr_i == 0) & (cc_i == 1), final[-1], 0.0))


# ----------------------------------------------------------------- wrapper
def tile_activity_plane(tile_mask, grid, tile_h: int, tile_w: int):
    """Broadcast a per-tile activity mask i32[gi*gj] to a per-pixel
    f32[gi*tile_h, gj*tile_w] plane (1.0 on active tiles).  XLA-side helper
    for adaptive-sampling callers; tile (i, j) covers pixel rows
    [i*tile_h, (i+1)*tile_h) and cols [j*tile_w, (j+1)*tile_w), matching
    the kernel's pid = i * num_programs(1) + j layout."""
    m2 = tile_mask.reshape(grid).astype(jnp.float32)
    return jnp.repeat(jnp.repeat(m2, tile_h, axis=0), tile_w, axis=1)


def pallas_render_sample(
    s_tab: jnp.ndarray,  # f32[16, NP]
    p_tab: jnp.ndarray,  # f32[P_ROWS(_UV), NP]
    clusters: jnp.ndarray,  # f32[7, NC] (rows 0-5 AABB, row 6 kind)
    supers: jnp.ndarray,  # f32[6, NSC]
    n_super,  # i32 scalar
    cam_vec: jnp.ndarray,  # f32[38]
    seed,  # i32 scalar
    max_depth,  # i32 scalar
    *,
    width: int,
    height: int,
    camera_model: str = "look_at",
    tile_h: int = DEF_TILE_H,
    tile_w: int = 256,
    has_rects: bool = True,
    interpret: bool = False,
    y0=0,
    band_h: int | None = None,
    pad_w: int | None = None,
    stream=0,
    spp=1,
    rr_start: int = 0,
    atlas: jnp.ndarray | None = None,  # uint8[S,AH,AW,3] (image textures)
    tex_hw: jnp.ndarray | None = None,  # i32[S,2]
    with_stats: bool = False,
    with_cull_stats: bool = False,
    cluster: int = CLUSTER,
    super_: int = SUPER,
    octant_split: bool = False,
    has_tris: bool = False,
    has_vattrs: bool = False,
    tile_mask: jnp.ndarray | None = None,  # i32[n_tiles]: adaptive sampling
    stream_b: int = 0,  # >0: HBM-streamed tables (see docstring)
    has_noise: bool = False,  # compile in the noise/marble texture branch
    has_media: bool = False,  # compile in the constant-medium branch
    has_motion: bool = False,  # compile in the moving-sphere branch
    has_boxm: bool = False,  # compile in the BOX-bounded medium chord
    has_rotm: bool = False,  # compile in the yaw-ROTATED box chord
    #                          (RTOW rotate_y; cos/sin in S rows 13/14)
    has_nee: bool = False,  # RTOW book-3 mixture estimator for lambertian
    #                         lanes; cam_vec must then be the 38-float
    #                         camera vector with sampling.pack_lights_np
    #                         appended (SMEM light table)
    nee_p: float = 0.5,  # mixture weight toward light sampling
    has_qmc: bool = False,  # R2 low-discrepancy pixel jitter (ops/qmc.py);
    #                         pass sample_base = samples already accumulated
    #                         so progressive launches extend the sequence
    sample_base=0,  # i32 scalar: global sample index of this launch's
    #                 first sample (traced; only read when has_qmc)
):
    """``spp`` samples per pixel via the megakernel -> f32[band_h, pad_w, 3]
    (the SUM over samples; divide by spp to display).

    When ``atlas``/``tex_hw`` are given (p_tab packed with
    ``pack_scene_tables(with_uv=True)``) image textures are sampled via
    two-record deferral: the kernel records up to TWO image-texture
    (u, v, slot) lookups per lane and splits radiance into three
    accumulators; the XLA epilogue computes
    ``r + tex1*rp + tex2*(tex1 if chained else 1)*rq`` — the exact
    nearest-neighbor semantics of Texture.cuh:70-109 for up to two image
    factors per lane per launch (one path with two image hits, or two
    samples with one each); third-and-later hits use the texture's mean
    color.  The records are single-use, so in image mode a lane
    path-regenerates across samples until both are consumed, then parks;
    the call returns ``(img, counts)`` (plus the ray total with
    ``with_stats``) where ``counts`` is the per-pixel number of completed
    samples in [1, spp].  Callers must accumulate radiance sums AND counts
    and divide sum/count at display: that ratio estimator is consistent
    (Wald's identity — the park rule is a stopping time over iid samples),
    so progressive accumulation converges to the exact mean.

    Samples are path-regenerated in-kernel: a lane whose path terminates
    immediately starts its next sample, so the bounce waves stay at full
    vector occupancy — per-sample marginal cost is ~E[path length] full
    waves instead of max_depth straggler-bound waves.  ``spp`` is a traced
    scalar (no recompile).

    ``width``/``height`` are the TRUE image dimensions and drive the camera
    math; ``pad_w``/``band_h`` are the physical (tile-aligned) output
    dimensions — pad pixels map to s/t outside [0,1] and are cropped by the
    caller, so framing matches the XLA paths at any resolution.
    ``has_rects=False`` compiles the rect intersection/normal paths away for
    all-sphere scenes (the RTOW benchmark) — about half the per-primitive
    vector ops.  ``has_tris=True`` compiles in the triangle branch
    (BEYOND-REFERENCE prim type 4); triangle-free scenes trace the
    identical kernel they always did.  ``y0``/``band_h`` render a horizontal band of the full
    image (multi-chip row sharding); ``stream`` is an extra seed component
    for band/sample streams (hash-mixed, collision-free).

    ``tile_mask`` (optional i32[n_tiles], ADAPTIVE SAMPLING): per-tile
    activity flags, row-major over the (band_h/tile_h, pad_w/tile_w) grid.
    A 0 tile skips its entire wave loop (zero radiance, zero rays, and —
    in image mode — zero counts); per-tile PRNG seeding is mask-independent,
    so active tiles render BIT-IDENTICALLY to an unmasked launch with the
    same (seed, stream).  This is the mechanism behind adaptive sampling:
    converged tiles cost ~nothing, so progressive frame time scales with
    the unconverged tile count (beyond-reference; the CUDA reference
    re-renders every pixel every frame, Kernel.cu:130-148).

    ``stream_b > 0`` selects the HBM-STREAMED table layout for beyond-SMEM
    scenes (pack_stream_tiles): ``s_tab`` is then the block-tile array
    f32[n_blocks_cap, R8, stream_b*128] (kept in HBM, double-buffer-DMA'd
    per supercluster block), ``p_tab`` the resident block-AABB table
    f32[6, n_blocks_cap], ``clusters``/``supers`` the padded resident gate
    tables, and ``n_super`` the USED block count (StreamTables.n_blocks).
    Same radiance semantics as the resident layout; capacity is bounded by
    HBM instead of scalar memory.
    """
    if band_h is None:
        band_h = -(-height // tile_h) * tile_h
    if pad_w is None:
        pad_w = -(-width // tile_w) * tile_w
    assert tile_w % 128 == 0, tile_w
    assert pad_w % tile_w == 0 and pad_w >= width, (width, pad_w, tile_w)
    assert band_h % tile_h == 0, (band_h, tile_h)
    has_images = atlas is not None
    assert not has_vattrs or has_tris, "has_vattrs requires has_tris"
    expect_rows = p_rows_for(has_images, has_vattrs, has_motion)
    if stream_b:
        assert not octant_split, "octant_split is resident-only"
        r8 = -(-(16 + expect_rows) // 8) * 8
        assert s_tab.ndim == 3 and s_tab.shape[1] == r8 \
            and s_tab.shape[2] == stream_b * 128, (s_tab.shape, r8, stream_b)
        assert p_tab.shape[0] == 6, p_tab.shape
    else:
        assert p_tab.shape[0] == expect_rows, (
            p_tab.shape, has_images, has_vattrs)
    nchan = 17 if has_images else 3
    grid = (band_h // tile_h, pad_w // tile_w)
    cnt = jnp.stack([
        jnp.asarray(n_super, jnp.int32),
        jnp.asarray(max_depth, jnp.int32),
        jnp.asarray(y0, jnp.int32),
        jnp.asarray(seed, jnp.int32),
        jnp.asarray(stream, jnp.int32),
        jnp.asarray(spp, jnp.int32),
        jnp.asarray(sample_base, jnp.int32),
    ])
    statics = dict(
        tile_h=tile_h, tile_w=tile_w, width=width, height=height,
        camera_model=camera_model, has_rects=has_rects,
        has_images=has_images, rr_start=rr_start,
        cluster=cluster, super_=super_, octant_split=octant_split,
        has_tris=has_tris, has_vattrs=has_vattrs, stream_b=stream_b,
        has_noise=has_noise, has_media=has_media, has_motion=has_motion,
        has_boxm=has_boxm, has_rotm=has_rotm, has_nee=has_nee, nee_p=nee_p,
        has_qmc=has_qmc,
    )
    if tile_mask is not None:
        # adaptive sampling: a per-tile activity mask rides in SMEM; the
        # kernel reads ONE scalar (mask_ref[pid]) and skips the whole wave
        # loop for converged tiles (see _render_kernel).  The mask is a
        # device-resident jit argument — it never crosses the host link.
        assert tile_mask.shape == (grid[0] * grid[1],), (
            tile_mask.shape, grid)

        if stream_b:
            def kern(cnt, cam, s, p, c, sc, mask, out, cnt_out, key, ordr,
                     b0, b1, q0, q1):
                _render_kernel(cnt, cam, s, p, c, sc, out, cnt_out, key,
                               ordr, mask_ref=mask, buf0=b0, buf1=b1,
                               sem0=q0, sem1=q1, **statics)
        else:
            def kern(cnt, cam, s, p, c, sc, mask, out, cnt_out, key, ordr):
                _render_kernel(cnt, cam, s, p, c, sc, out, cnt_out, key,
                               ordr, mask_ref=mask, **statics)

        extra_in = (tile_mask.astype(jnp.int32),)
        extra_spec = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    else:
        if stream_b:
            def kern(cnt, cam, s, p, c, sc, out, cnt_out, key, ordr,
                     b0, b1, q0, q1):
                _render_kernel(cnt, cam, s, p, c, sc, out, cnt_out, key,
                               ordr, buf0=b0, buf1=b1, sem0=q0, sem1=q1,
                               **statics)
        else:
            kern = functools.partial(_render_kernel, **statics)
        extra_in = ()
        extra_spec = []
    # streamed mode: the tile table stays in HBM (pl.ANY) and the kernel
    # DMAs blocks through the double-buffer scratch; p_tab is then the
    # small resident block-AABB table
    s_space = pl.ANY if stream_b else pltpu.SMEM
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            # scene tables live in SMEM: the per-primitive loop reads them
            # as dynamically-indexed scalars, which VMEM cannot serve
            pl.BlockSpec(memory_space=s_space),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ] + extra_spec,
        out_specs=(
            pl.BlockSpec(
                (nchan, tile_h, tile_w), lambda i, j: (0, i, j),
                memory_space=pltpu.VMEM,
            ),
            # per-tile scalar padded to the minimum (8,128) VMEM block
            pl.BlockSpec((8, 128), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nchan, band_h, pad_w), jnp.float32),
            jax.ShapeDtypeStruct(
                (band_h // tile_h * 8, pad_w // tile_w * 128), jnp.float32
            ),
        ),
        scratch_shapes=[
            pltpu.SMEM((s_tab.shape[0] if stream_b else supers.shape[1],),
                       jnp.float32),
            pltpu.SMEM((s_tab.shape[0] if stream_b else supers.shape[1],),
                       jnp.int32),
        ] + ([
            pltpu.SMEM(s_tab.shape[1:], jnp.float32),
            pltpu.SMEM(s_tab.shape[1:], jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ] if stream_b else []),
        interpret=interpret,
    )(cnt, cam_vec, s_tab, p_tab, clusters, supers, *extra_in)
    if has_images:
        # XLA epilogue: apply the deferred texels (nearest-neighbor lookup
        # of Texture.cuh:83-105, matching ops/textures.py).  Two records
        # per lane: radiance = pre + tex1*rp + tex2*(chain ? tex1 : 1)*rq
        # — exact for up to two image-texture factors per lane per launch.
        #
        # FLAT-1D PACKED GATHER (measured v5e, tools + BASELINE.md "image
        # epilogue"): the naive atlas[slot, tj, ti] 4D uint8 gather costs
        # 32 ms/launch at 720p — dominating the per-launch cost of image
        # scenes on the interactive path (bench's N-frames-per-launch
        # slope amortizes it, the viewer pays it every frame).  Packing
        # RGB into one uint32 plane (in-jit, ~4 MB elementwise, ~0.1 ms)
        # and gathering ONE u32 per record from a FLAT 1D table lowers to
        # a 1.9x faster gather (16.9 ms) — bit-identical texels.
        ah, aw = atlas.shape[1], atlas.shape[2]
        a32 = atlas.astype(jnp.uint32)
        flat_atlas = ((a32[..., 0] << 16) | (a32[..., 1] << 8)
                      | a32[..., 2]).reshape(-1)

        def texel_at(iu, iv, iid):
            slot = jnp.maximum(iid.astype(jnp.int32), 0)
            hw = tex_hw[slot]  # [band_h, pad_w, 2]
            th = hw[..., 0]
            tw = hw[..., 1]
            uu = jnp.clip(iu, 0.0, 1.0)
            vv = 1.0 - jnp.clip(iv, 0.0, 1.0)
            ti = jnp.clip((uu * tw.astype(jnp.float32)).astype(jnp.int32),
                          0, jnp.maximum(tw - 1, 0))
            tj = jnp.clip((vv * th.astype(jnp.float32)).astype(jnp.int32),
                          0, jnp.maximum(th - 1, 0))
            v = flat_atlas[(slot * ah + tj) * aw + ti]
            r = (v >> 16).astype(jnp.float32)
            g = ((v >> 8) & 0xFF).astype(jnp.float32)
            b = (v & 0xFF).astype(jnp.float32)
            return jnp.stack([r, g, b]) * (1.0 / 255.0)  # [3, bh, pw]

        pre = out[0][0:3]
        post = out[0][3:6]
        postq = out[0][6:9]
        tex1 = texel_at(out[0][9], out[0][10], out[0][11])
        tex2 = texel_at(out[0][12], out[0][13], out[0][14])
        chain = out[0][15][None] > 0.5
        rad = pre + tex1 * post + tex2 * jnp.where(chain, tex1, 1.0) * postq
        img = jnp.transpose(rad, (1, 2, 0))
        counts = out[0][16]
        if tile_mask is not None:
            # skipped tiles run a zero-iteration loop whose done_f lands at
            # spp; their true completed-sample count is 0
            counts = counts * tile_activity_plane(
                tile_mask, grid, tile_h, tile_w)
        if with_stats:
            ret = (img, counts, jnp.sum(out[1][0::8, 0::128]))
            if with_cull_stats:
                ret = ret + (jnp.sum(out[1][0::8, 1::128]),)
            return ret
        if with_cull_stats:
            return img, counts, jnp.sum(out[1][0::8, 1::128])
        return img, counts
    img = jnp.transpose(out[0], (1, 2, 0))
    if with_stats:
        ret = (img, jnp.sum(out[1][0::8, 0::128]))
        if with_cull_stats:
            ret = ret + (jnp.sum(out[1][0::8, 1::128]),)
        return ret
    if with_cull_stats:
        return img, jnp.sum(out[1][0::8, 1::128])
    return img
