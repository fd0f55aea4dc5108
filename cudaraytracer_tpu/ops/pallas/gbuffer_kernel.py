"""Pallas TPU G-buffer kernel: one deterministic primary-visibility pass.

Scales the denoiser/AOV feature buffers (ops/gbuffer.py) to the same scene
sizes the production megakernel renders: the XLA `primary_features` pass is
a brute per-primitive scan (O(W*H*N) — measured 107 ms at ~500 prims and in
the TPU-crash size class at 20k, BASELINE.md "XLA BVH path"), while this
kernel reuses the megakernel's two-level culled search over the SAME packed
scene tables, in both the SMEM-resident and the HBM-streamed layouts.

Semantics match `ops.gbuffer.primary_features` ray for ray: pixel-CENTER
pinhole primary rays (raygen key=None — 0.5 sub-pixel offsets, no lens
offset), so the buffers are a pure function of (scene, camera):

  * normal f32[H,W,3] — front-facing unit normal (smooth shading normals
    on vertex-attr meshes); zeros on miss.
  * albedo f32[H,W,3] — first-hit texture color (constant/checker/image,
    Texture.cuh:32-109 semantics); sky gradient on miss.  Image textures
    defer ONE (u, v, slot) record per lane — at depth 1 a lane has at most
    one hit, so the XLA texel epilogue makes image albedo EXACT (including
    raw-barycentric uvs on attr-less triangles, exactly like the radiance
    kernel's deferral).
  * depth  f32[H,W]  — WORLD distance to the first hit (the kernel traces
    unit directions); 0 on miss.

Beyond-reference subsystem: the CUDA reference has no denoiser or AOVs
(its kernel writes only the beauty image, Kernel.cu:102-158).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .render_kernel import (
    BIG,
    CLUSTER,
    P_CX,
    P_CY,
    P_CZ,
    P_HA,
    P_HB,
    P_PACKA,
    P_PACKB,
    P_PACKC,
    P_ROWS,
    P_ROWS_UV,
    SUPER,
    _acos,
    _atan2,
    _streamed_search_payload,
    hierarchical_search,
    p_rows_for,
)


def _gbuffer_kernel(
    cnt_ref,  # SMEM i32[1]: n_super (streamed: USED block count)
    cam_ref,  # SMEM f32[38] (pack_camera layout)
    s_ref,  # SMEM f32[16, NP] search table (streamed: HBM tiles, pl.ANY)
    p_ref,  # SMEM f32[P_ROWS, NP] payload (streamed: block AABBs f32[6, NB])
    clus_ref,  # SMEM f32[7, NC]
    super_ref,  # SMEM f32[6, NSC]
    out_ref,  # VMEM f32[nchan, TH, TW]
    key_ref,  # SMEM f32[NSC] scratch: front-to-back sort keys
    ord_ref,  # SMEM i32[NSC] scratch: visit order
    *,
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
    cluster: int = CLUSTER,
    super_: int = SUPER,
    has_tris: bool = False,
    has_vattrs: bool = False,
    has_noise: bool = False,
    has_media: bool = False,
    has_motion: bool = False,  # P-row layout only: features render the
    # world at shutter-open (time 0), so the motion branch never compiles
):
    pi = pl.program_id(0)
    pj = pl.program_id(1)
    n_super = cnt_ref[0]
    t_min = cam_ref[28]
    shape = (tile_h, tile_w)
    xs = lax.broadcasted_iota(jnp.int32, shape, 1).astype(jnp.float32) + (
        pj * tile_w
    ).astype(jnp.float32)
    ys = lax.broadcasted_iota(jnp.int32, shape, 0).astype(jnp.float32) + (
        pi * tile_h
    ).astype(jnp.float32)

    def cam3(i):
        return cam_ref[i], cam_ref[i + 1], cam_ref[i + 2]

    # ---- pixel-CENTER pinhole rays: the deterministic raygen of
    # generate_rays_* with key=None (0.5 jitter, zero lens offset) ----
    if camera_model == "look_at":
        s = (xs + 0.5) * (1.0 / width)
        t = (height - 1.0 - ys + 0.5) * (1.0 / height)
        origin = cam3(0)
        ll = cam3(3)
        ho = cam3(6)
        ve = cam3(9)
        ox, oy, oz = origin  # scalars: every lane shares the pinhole origin
        dx = ll[0] + s * ho[0] + t * ve[0] - ox
        dy = ll[1] + s * ho[1] + t * ve[1] - oy
        dz = ll[2] + s * ho[2] + t * ve[2] - oz
    else:  # two_plane (reference Kernel.cu:130-148)
        u = ((xs - width / 2.0) + 0.5) * (1.0 / width)
        v = ((height / 2.0 - ys) + 0.5) * (1.0 / width)
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
    dx, dy, dz = dx * dn, dy * dn, dz * dn  # unit: best_t = world distance

    zeros = jnp.zeros(shape, jnp.float32)
    ones = jnp.ones(shape, jnp.float32)
    inb = (xs < jnp.float32(width)) & (ys < jnp.float32(height))
    best_t0 = jnp.where(inb, BIG, t_min)  # pad lanes can't record hits

    # ---- front-to-back visit order from the CAMERA position (all primary
    # rays share it): fewer entered clusters, identical closest hit ----
    box_ref = p_ref if stream_b else super_ref
    cx_, cy_, cz_ = cam_ref[0], cam_ref[1], cam_ref[2]

    def fill_key(si, carry):
        ax = jnp.maximum(jnp.maximum(box_ref[0, si] - cx_,
                                     cx_ - box_ref[3, si]), 0.0)
        ay = jnp.maximum(jnp.maximum(box_ref[1, si] - cy_,
                                     cy_ - box_ref[4, si]), 0.0)
        az = jnp.maximum(jnp.maximum(box_ref[2, si] - cz_,
                                     cz_ - box_ref[5, si]), 0.0)
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

    # carry the winner's barycentrics whenever triangles exist: smooth
    # normals need them on vattr scenes, and image uvs on ATTR-LESS
    # triangles are the raw barycentrics (exactly what the XLA record's
    # rec.u/rec.v hold, ops/intersect.py::make_hit_record)
    carry_uv = has_tris
    p_rows = p_rows_for(has_images, has_vattrs, has_motion)
    ub = vb = None

    # ---- closest hit + payload (shared megakernel machinery) ----
    if stream_b:
        found = _streamed_search_payload(
            s_ref, buf0, buf1, sem0, sem1, clus_ref, super_ref,
            n_super, ox, oy, oz, dx, dy, dz,
            t_min, best_t0, has_rects,
            order_ref=ord_ref, cluster=cluster, super_=super_,
            block_b=stream_b, p_rows=p_rows,
            has_tris=has_tris, carry_uv=carry_uv,
            # media have no feature surface: u_med stays None, so medium
            # clusters are SKIPPED (fog never poisons the edge stopping)
            has_media=has_media,
        )
        best_t, best_j = found[0], found[1]
        k0 = 2
        if carry_uv:
            ub, vb = found[2], found[3]
            k0 = 4
        pay = found[k0:k0 + p_rows]
    else:
        found = hierarchical_search(
            s_ref, clus_ref, super_ref, n_super,
            ox, oy, oz, dx, dy, dz,
            t_min, best_t0, has_rects,
            order_ref=ord_ref, cluster=cluster, super_=super_,
            has_tris=has_tris, carry_uv=carry_uv, has_media=has_media,
        )
        best_t, best_j = found[0], found[1]
        if carry_uv:
            ub, vb = found[2], found[3]
        hit0 = best_j >= 0.0

        def payload_cluster(ci, pay):
            in_cluster = jnp.any(
                hit0 & (best_j >= ci * cluster) & (best_j < (ci + 1) * cluster)
            )

            def prim_pay(j, pay):
                m = best_j == jnp.float32(j)
                return tuple(
                    jnp.where(m, p_ref[k, j], pay[k]) for k in range(p_rows)
                )

            def run(pay):
                return lax.fori_loop(
                    ci * cluster, (ci + 1) * cluster, prim_pay, pay)

            return lax.cond(in_cluster, run, lambda p: p, pay)

        def payload_super(si, pay):
            span = super_ * cluster
            in_super = jnp.any(
                hit0 & (best_j >= si * span) & (best_j < (si + 1) * span))

            def run(pay):
                return lax.fori_loop(
                    si * super_, (si + 1) * super_, payload_cluster, pay)

            return lax.cond(in_super, run, lambda p: p, pay)

        pay = lax.fori_loop(0, n_super, payload_super, (zeros,) * p_rows)

    hit = best_j >= 0.0

    # ---- unpack packed payload rows (render_kernel P-table layout) ----
    packc = pay[P_PACKC]
    tidp1 = jnp.floor(packc * (1.0 / 256.0))
    rem256 = packc - tidp1 * 256.0
    neg_r = jnp.floor(rem256 * (1.0 / 128.0))
    rem128 = rem256 - neg_r * 128.0
    ptype16 = jnp.floor(rem128 * (1.0 / 16.0))
    rem_c = rem128 - ptype16 * 16.0
    tex = jnp.floor(rem_c * 0.25)

    def unpack_rgb(v):
        r = jnp.floor(v * (1.0 / 65536.0))
        rem = v - r * 65536.0
        g = jnp.floor(rem * (1.0 / 256.0))
        b = rem - g * 256.0
        k = 1.0 / 255.0
        return r * k, g * k, b * k

    alr, alg, alb = unpack_rgb(pay[P_PACKA])
    a2r, a2g, a2b = unpack_rgb(pay[P_PACKB])

    # ---- hit point + normal (render_kernel conventions) ----
    px = ox + best_t * dx
    py = oy + best_t * dy
    pz = oz + best_t * dz
    ncx = px - pay[P_CX]
    ncy = py - pay[P_CY]
    ncz = pz - pay[P_CZ]
    rinv = lax.rsqrt(jnp.maximum(ncx * ncx + ncy * ncy + ncz * ncz, 1e-20))
    rinv = rinv * (1.0 - 2.0 * neg_r)
    snx = ncx * rinv
    sny = ncy * rinv
    snz = ncz * rinv
    is_tri_p = zeros > 1.0  # static False placeholder
    if has_rects or has_tris:
        is_sphere = ptype16 < 0.5
        kax = jnp.where(ptype16 < 1.5, 2.0, jnp.where(ptype16 < 2.5, 1.0, 0.0))
        rnx = jnp.where(kax == 0.0, ones, zeros)
        rny = jnp.where(kax == 1.0, ones, zeros)
        rnz = jnp.where(kax == 2.0, ones, zeros)
        if has_tris:
            is_tri_p = ptype16 > 3.5
            rnx = jnp.where(is_tri_p, pay[P_CX], rnx)
            rny = jnp.where(is_tri_p, pay[P_CY], rny)
            rnz = jnp.where(is_tri_p, pay[P_CZ], rnz)
        d_dot_out = dx * rnx + dy * rny + dz * rnz
        if has_vattrs:
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
    # FRONT-FACING feature normal (ops/gbuffer.py: both faces of a surface
    # are one edge-stopping region) — also flips hollow-glass inner shells
    # and sphere back-faces exactly like the XLA pass
    nd = dx * nx + dy * ny + dz * nz
    face = jnp.where(nd > 0.0, -1.0, 1.0)
    nx, ny, nz = nx * face, ny * face, nz * face

    # ---- first-hit texture color (Texture.cuh:32-109) ----
    sines = jnp.sin(10.0 * px) * jnp.sin(10.0 * py) * jnp.sin(10.0 * pz)
    odd = sines < 0.0
    is_checker = (tex > 0.5) & (tex < 1.5)
    texr = jnp.where(is_checker & ~odd, a2r, alr)
    texg = jnp.where(is_checker & ~odd, a2g, alg)
    texb = jnp.where(is_checker & ~odd, a2b, alb)

    if has_noise:
        # noise/marble albedo (tex 3): same branch as the radiance kernel
        from ..noise import marble_factor
        is_noise = tex > 2.5
        nscale = jnp.maximum(tidp1 - 1.0, 1.0)
        fac = marble_factor(px, py, pz, nscale, xp=jnp)
        texr = jnp.where(is_noise, a2r + fac * (alr - a2r), texr)
        texg = jnp.where(is_noise, a2g + fac * (alg - a2g), texg)
        texb = jnp.where(is_noise, a2b + fac * (alb - a2b), texb)

    iu = iv = None
    iid = jnp.full(shape, -1.0)
    if has_images:
        has_data = tidp1 > 0.5
        is_img = (tex > 1.5) & (tex < 2.5) & hit & inb
        deferred = is_img & has_data
        phi = _atan2(-snz, snx) + math.pi
        sph_u = phi * (1.0 / (2.0 * math.pi))
        sph_v = _acos(jnp.clip(-sny, -1.0, 1.0)) * (1.0 / math.pi)
        if has_rects:
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
        if has_tris:
            if has_vattrs:
                # interpolated texcoords uv0 + u*duv1 + v*duv2 (payload rows)
                uvb = (P_ROWS_UV if has_images else P_ROWS) + 3
                tu = pay[uvb + 0] + ub * pay[uvb + 2] + vb * pay[uvb + 4]
                tv = pay[uvb + 1] + ub * pay[uvb + 3] + vb * pay[uvb + 5]
            else:
                # attr-less triangles: raw barycentrics, the exact uvs the
                # XLA record carries (intersect.py) — the G-buffer pass is
                # exact where the radiance kernel uses the atlas mean
                tu, tv = ub, vb
            uu = jnp.where(is_tri_p, tu, uu)
            vv = jnp.where(is_tri_p, tv, vv)
        iu = jnp.where(deferred, uu, 0.0)
        iv = jnp.where(deferred, vv, 0.0)
        iid = jnp.where(deferred, tidp1 - 1.0, -1.0)
        # empty image slot: cyan, Texture.cuh:88-89 (albedo for deferred
        # lanes is overwritten by the texel epilogue)
        texr = jnp.where(is_img & ~has_data, 0.0, texr)
        texg = jnp.where(is_img & ~has_data, 1.0, texg)
        texb = jnp.where(is_img & ~has_data, 1.0, texb)

    # ---- sky on miss (Kernel.cu:40-45; dirs already unit) ----
    bg0 = cam3(32)
    bg1 = cam3(35)
    sky_t = 0.5 * (dy + 1.0)
    skyr = (1.0 - sky_t) * bg0[0] + sky_t * bg1[0]
    skyg = (1.0 - sky_t) * bg0[1] + sky_t * bg1[1]
    skyb = (1.0 - sky_t) * bg0[2] + sky_t * bg1[2]

    hf = jnp.where(hit, 1.0, 0.0)
    out_ref[0] = nx * hf
    out_ref[1] = ny * hf
    out_ref[2] = nz * hf
    out_ref[3] = jnp.where(hit, texr, skyr)
    out_ref[4] = jnp.where(hit, texg, skyg)
    out_ref[5] = jnp.where(hit, texb, skyb)
    out_ref[6] = best_t * hf  # unit dirs: world-space distance
    if has_images:
        out_ref[7] = iu
        out_ref[8] = iv
        out_ref[9] = iid


def pallas_gbuffer(
    s_tab: jnp.ndarray,
    p_tab: jnp.ndarray,
    clusters: jnp.ndarray,
    supers: jnp.ndarray,
    n_super,
    cam_vec: jnp.ndarray,  # f32[38] (pack_camera/pack_camera_np layout)
    *,
    width: int,
    height: int,
    camera_model: str = "look_at",
    tile_h: int = 16,
    tile_w: int = 256,
    has_rects: bool = True,
    interpret: bool = False,
    atlas: jnp.ndarray | None = None,
    tex_hw: jnp.ndarray | None = None,
    cluster: int = CLUSTER,
    super_: int = SUPER,
    has_tris: bool = False,
    has_vattrs: bool = False,
    stream_b: int = 0,
    has_noise: bool = False,
    has_media: bool = False,
    has_motion: bool = False,
):
    """One megakernel primary-visibility pass -> (normal, albedo, depth).

    Table arguments and the ``stream_b`` layout switch are exactly those of
    ``pallas_render_sample`` (resident: S/P/cluster/super SMEM tables;
    streamed: HBM block tiles + resident block AABBs).  Returns image-shaped
    device arrays ``(normal f32[H,W,3], albedo f32[H,W,3], depth f32[H,W])``
    with the semantics of ``ops.gbuffer.primary_features``.
    """
    pad_w = -(-width // tile_w) * tile_w
    band_h = -(-height // tile_h) * tile_h
    assert tile_w % 128 == 0, tile_w
    has_images = atlas is not None
    expect_rows = p_rows_for(has_images, has_vattrs, has_motion)
    if stream_b:
        r8 = -(-(16 + expect_rows) // 8) * 8
        assert s_tab.ndim == 3 and s_tab.shape[1] == r8 \
            and s_tab.shape[2] == stream_b * 128, (s_tab.shape, r8, stream_b)
        assert p_tab.shape[0] == 6, p_tab.shape
    else:
        assert p_tab.shape[0] == expect_rows, (
            p_tab.shape, has_images, has_vattrs)
    nchan = 10 if has_images else 7
    grid = (band_h // tile_h, pad_w // tile_w)
    cnt = jnp.asarray(n_super, jnp.int32).reshape(1)
    statics = dict(
        tile_h=tile_h, tile_w=tile_w, width=width, height=height,
        camera_model=camera_model, has_rects=has_rects,
        has_images=has_images, cluster=cluster, super_=super_,
        has_tris=has_tris, has_vattrs=has_vattrs, stream_b=stream_b,
        has_noise=has_noise, has_media=has_media, has_motion=has_motion,
    )
    if stream_b:
        def kern(cnt, cam, s, p, c, sc, out, key, ordr, b0, b1, q0, q1):
            _gbuffer_kernel(cnt, cam, s, p, c, sc, out, key, ordr,
                            buf0=b0, buf1=b1, sem0=q0, sem1=q1, **statics)
    else:
        kern = functools.partial(_gbuffer_kernel, **statics)
    s_space = pl.ANY if stream_b else pltpu.SMEM
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=s_space),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (nchan, tile_h, tile_w), lambda i, j: (0, i, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((nchan, band_h, pad_w), jnp.float32),
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
    )(cnt, cam_vec, s_tab, p_tab, clusters, supers)

    normal = jnp.transpose(out[0:3], (1, 2, 0))
    albedo = jnp.transpose(out[3:6], (1, 2, 0))
    depth = out[6]
    if has_images:
        # XLA texel epilogue: ONE record per lane — exact at depth 1
        # (nearest-neighbor of Texture.cuh:83-105, like pallas_render_sample;
        # same FLAT-1D packed-u32 gather — the naive 4D uint8 gather was
        # measured 1.9x slower per launch at 720p, render_kernel.py)
        ah, aw = atlas.shape[1], atlas.shape[2]
        a32 = atlas.astype(jnp.uint32)
        flat_atlas = ((a32[..., 0] << 16) | (a32[..., 1] << 8)
                      | a32[..., 2]).reshape(-1)
        iid = out[9]
        slot = jnp.maximum(iid.astype(jnp.int32), 0)
        hw = tex_hw[slot]
        th = hw[..., 0]
        tw = hw[..., 1]
        uu = jnp.clip(out[7], 0.0, 1.0)
        vv = 1.0 - jnp.clip(out[8], 0.0, 1.0)
        ti = jnp.clip((uu * tw.astype(jnp.float32)).astype(jnp.int32),
                      0, jnp.maximum(tw - 1, 0))
        tj = jnp.clip((vv * th.astype(jnp.float32)).astype(jnp.int32),
                      0, jnp.maximum(th - 1, 0))
        v = flat_atlas[(slot * ah + tj) * aw + ti]
        texel = jnp.stack([(v >> 16).astype(jnp.float32),
                           ((v >> 8) & 0xFF).astype(jnp.float32),
                           (v & 0xFF).astype(jnp.float32)],
                          axis=-1) * (1.0 / 255.0)
        albedo = jnp.where((iid >= 0.0)[..., None], texel, albedo)
    return (normal[:height, :width], albedo[:height, :width],
            depth[:height, :width])


@functools.lru_cache(maxsize=16)
def pallas_gbuffer_step(width, height, camera_model, tile_h, tile_w,
                        has_rects, has_images, cluster, super_,
                        interpret_ctx, has_tris=False, has_vattrs=False,
                        stream_b=0, has_noise=False, has_media=False,
                        has_motion=False):
    """Jitted G-buffer step cached by STATIC config (same contract as
    viewer.app._pallas_step: tables/camera are runtime ARGUMENTS, so scene
    edits and camera motion never re-trace; ``interpret_ctx`` is key-only —
    a step traced under force_tpu_interpret_mode is never reused outside
    it)."""
    del interpret_ctx
    from ..gbuffer import GBuffer

    @jax.jit
    def _step(S, P, C, SC, n_super, cam_vec, *atl):
        normal, albedo, depth = pallas_gbuffer(
            S, P, C, SC, n_super, cam_vec,
            width=width, height=height, camera_model=camera_model,
            tile_h=tile_h, tile_w=tile_w, has_rects=has_rects,
            atlas=atl[0] if has_images else None,
            tex_hw=atl[1] if has_images else None,
            cluster=cluster, super_=super_, has_tris=has_tris,
            has_vattrs=has_vattrs, stream_b=stream_b, has_noise=has_noise,
            has_media=has_media, has_motion=has_motion,
        )
        return GBuffer(normal=normal, albedo=albedo, depth=depth)

    return _step
