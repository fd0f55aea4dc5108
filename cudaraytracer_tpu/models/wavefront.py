"""Sorted-wavefront renderer: XLA shading + Pallas closest-hit + ray sorting.

The architecture named by the BASELINE.json north star: "wavefront Pallas
kernels over a flat SoA scene ... with masked while_loops and ray
sorting/compaction".  Between bounces the full ray population is reordered
by (liveness, direction octant, origin cell):

  * compaction: dead rays sink to the tail, and the Pallas hit kernel
    (ops/pallas/hit_kernel.py) skips whole 1024-ray tiles past the live
    count — per-wave cost decays with the live-ray population, unlike the
    megakernel whose tiles stay resident until their last straggler dies;
  * coherence: live rays with similar direction/origin land in the same
    tile, so hierarchical AABB culling keeps working for secondary bounces
    (the megakernel's measured weakness: waves 2+ degrade to brute force);
  * shading runs in XLA where per-ray gathers are cheap, so this path
    supports EVERYTHING including image textures — it is both the fast and
    the fully-featured TPU pipeline.

Rays carry their pixel id through the permutations; radiance is scattered
back to pixel order once per sample.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops import materials, textures
from ..ops.pallas.hit_kernel import TILE, pallas_closest_hit
from ..ops.pallas.render_kernel import pack_scene_tables
from ..ops.sky import sky_color
from ..ops import intersect
from ..utils import rng as rngu
from ..utils.vec import normalize
from .camera import RAY_GENERATORS


class WavefrontTables(NamedTuple):
    S: jax.Array  # f32[16, NP]
    clusters: jax.Array  # f32[7, NC] (rows 0-5 AABB, row 6 kind)
    supers: jax.Array  # f32[6, NSC]
    prim_map: jax.Array  # i32[NP] packed column -> scene slot
    bbox_lo: jax.Array  # f32[3] scene bounds (for origin-cell sort keys)
    bbox_inv: jax.Array  # f32[3] 1/extent


def pack_wavefront_tables(scene) -> tuple[WavefrontTables, int, bool, bool]:
    """Pack host Scene -> (device tables, n_super, has_rects, has_tris)."""
    from ..ops.pallas.render_kernel import CLUSTER, SUPER

    # pinned to the module defaults: hit_kernel's hierarchical_search call
    # uses them, and tables must be packed with the same cluster geometry
    t = pack_scene_tables(scene, cluster=CLUSTER, super_=SUPER)
    idx = scene.active_indices()
    prim_t = scene.prim_type[idx]
    has_tris = bool((prim_t == 4).any()) if len(idx) else False
    has_rects = (
        bool(((prim_t >= 1) & (prim_t <= 3)).any()) if len(idx) else False
    )
    if len(idx):
        from .bvh import primitive_aabbs

        bmin, bmax = primitive_aabbs(scene, idx)
        lo = bmin.min(0)
        ext = np.maximum(bmax.max(0) - lo, 1e-6)
    else:
        lo = np.zeros(3, np.float32)
        ext = np.ones(3, np.float32)
    tables = WavefrontTables(
        S=jnp.asarray(t.S),
        clusters=jnp.asarray(t.clusters),
        supers=jnp.asarray(t.supers),
        prim_map=jnp.asarray(t.prim_map),
        bbox_lo=jnp.asarray(lo, jnp.float32),
        bbox_inv=jnp.asarray(1.0 / ext, jnp.float32),
    )
    return tables, t.n_super, has_rects, has_tris


def _sort_keys(org, dirn, alive, tables, cells: int = 4):
    """i32[R] sort key: dead rays last; live rays grouped by origin cell
    (cells^3 grid over the scene bbox) then direction octant."""
    q = jnp.clip(
        ((org - tables.bbox_lo) * tables.bbox_inv * cells).astype(jnp.int32),
        0, cells - 1,
    )
    cell = (q[:, 0] * cells + q[:, 1]) * cells + q[:, 2]
    octant = (
        (dirn[:, 0] > 0).astype(jnp.int32)
        + 2 * (dirn[:, 1] > 0).astype(jnp.int32)
        + 4 * (dirn[:, 2] > 0).astype(jnp.int32)
    )
    key = cell * 8 + octant
    return jnp.where(alive, key, cells * cells * cells * 8)


def render_wavefront_sample(
    scene,  # SceneData (for shading: materials/textures incl. image atlas)
    tables: WavefrontTables,
    n_super: int,
    cam,
    key: jax.Array,
    max_depth,
    *,
    width: int,
    height: int,
    camera_model: str = "look_at",
    t_min: float = 0.001,
    has_rects: bool = True,
    has_tris: bool = False,
    sort: bool = True,
    interpret: bool = False,
    with_stats: bool = False,
) -> jnp.ndarray:
    """One 1-spp radiance sample, f32[H,W,3] (with ``with_stats``, also the
    exact number of live rays traced — counted in-path, not estimated)."""
    npix = width * height
    r = -(-npix // TILE) * TILE  # pad the wavefront to whole tiles
    max_depth = jnp.asarray(max_depth, jnp.int32)

    k_pix, k_trace = jax.random.split(key)
    org, dirn = RAY_GENERATORS[camera_model](cam, width, height, k_pix)
    dirn = normalize(dirn)
    pad = r - npix
    org = jnp.pad(org, ((0, pad), (0, 0)))
    dirn = jnp.pad(dirn, ((0, pad), (0, 0)), constant_values=1.0)

    pix = jnp.arange(r, dtype=jnp.int32)
    alive = pix < npix

    def cond(st):
        return (st[0] < max_depth) & (st[7] > 0)

    def body(st):
        bounce, org, dirn, tp, rad, alive, pix, _, rays_total = st
        rays_total = rays_total + jnp.sum(alive, dtype=jnp.float32)

        if sort:
            order = jnp.argsort(_sort_keys(org, dirn, alive, tables))
            org = org[order]
            dirn = dirn[order]
            tp = tp[order]
            rad = rad[order]
            alive = alive[order]
            pix = pix[order]

        # the kernel's tile skipping assumes live-first compaction, which
        # only holds when sorting; unsorted wavefronts must run every tile
        n_alive = jnp.sum(alive, dtype=jnp.int32) if sort else jnp.int32(r)
        hit, t, col = pallas_closest_hit(
            tables.S, tables.clusters, tables.supers, n_super, n_alive,
            org, dirn, t_min=t_min, has_rects=has_rects, has_tris=has_tris,
            interpret=interpret,
        )
        hit = hit & alive
        slot = tables.prim_map[jnp.maximum(col, 0)]
        idx = jnp.where(hit, slot, -1)

        rec_kw = dict(edge1=scene.edge1, edge2=scene.edge2) if has_tris else {}
        if has_tris and scene.has_vertex_attrs:
            rec_kw.update(
                uv0=scene.uv0, uv1=scene.uv1, uv2=scene.uv2,
                vnorm0=scene.vnorm0, vnorm1=scene.vnorm1,
                vnorm2=scene.vnorm2,
            )
        rec = intersect.make_hit_record(
            org, dirn, hit, t, idx, scene.prim_type, scene.center, scene.size,
            **rec_kw,
        )

        # miss -> sky (Kernel.cu:40-45)
        sky = sky_color(dirn, scene.background_start, scene.background_end)
        miss = alive & ~hit
        rad = rad + jnp.where(miss[:, None], tp * sky, 0.0)

        # shade in XLA: full texture set incl. image atlas gathers
        safe = jnp.maximum(idx, 0)
        bkey = rngu.bounce_key(k_trace, bounce)
        k_sphere, k_uniform = jax.random.split(bkey)
        tex = textures.sample_texture(
            scene.tex_type[safe], scene.albedo[safe], scene.albedo2[safe],
            scene.tex_id[safe], rec.u, rec.v, rec.point,
            scene.atlas, scene.tex_hw,
        )
        sc = materials.scatter(
            dirn, rec.point, rec.normal,
            scene.mat_type[safe], scene.fuzz[safe], scene.ior[safe],
            scene.light[safe], tex,
            rngu.in_unit_sphere(k_sphere, (r,)),
            jax.random.uniform(k_uniform, (r,)),
        )
        lit = alive & hit
        rad = rad + jnp.where(lit[:, None], tp * sc.emitted, 0.0)
        cont = lit & sc.scattered
        org = jnp.where(cont[:, None], rec.point, org)
        dirn = jnp.where(cont[:, None], normalize(sc.direction), dirn)
        tp = jnp.where(cont[:, None], tp * sc.attenuation, tp)

        return (bounce + 1, org, dirn, tp, rad, cont, pix,
                jnp.sum(cont, dtype=jnp.int32), rays_total)

    init = (
        jnp.int32(0), org, dirn,
        jnp.ones((r, 3), jnp.float32), jnp.zeros((r, 3), jnp.float32),
        alive, pix, jnp.sum(alive, dtype=jnp.int32), jnp.float32(0.0),
    )
    _, _, _, _, rad, _, pix, _, rays_total = lax.while_loop(cond, body, init)

    # un-permute: scatter per-ray radiance back to pixel order
    img = jnp.zeros((npix, 3), jnp.float32).at[jnp.clip(pix, 0, npix - 1)].add(
        jnp.where((pix < npix)[:, None], rad, 0.0)
    )
    img = img.reshape(height, width, 3)
    if with_stats:
        return img, rays_total
    return img


class WavefrontRenderer:
    """Jit-compiled sorted-wavefront frame renderer (accel='wavefront')."""

    def __init__(
        self,
        scene,  # host Scene (packed once; repack per edit via update_scene)
        width: int,
        height: int,
        camera_model: str = "look_at",
        t_min: float = 0.001,
        sort: bool = True,
        interpret: bool = False,
    ):
        self.width = int(width)
        self.height = int(height)
        self.camera_model = camera_model
        self.t_min = t_min
        self.sort = sort
        self.interpret = interpret
        if bool((scene.mat_type[scene.active_indices()] == 4).any()):
            # ISOTROPIC media need stochastic intersection; this demoted
            # cross-check path's hit kernel is deterministic — use
            # accel='brute'/'bvh'/'pallas' for smoke scenes instead
            raise ValueError(
                "WavefrontRenderer does not support constant-density "
                "media (isotropic material)")
        self.update_scene(scene)

        @functools.partial(
            jax.jit, static_argnames=("n_super", "has_rects", "has_tris"))
        def _sample(scene_data, tables, cam, key, max_depth, n_super,
                    has_rects, has_tris):
            return render_wavefront_sample(
                scene_data, tables, n_super, cam, key, max_depth,
                width=self.width, height=self.height,
                camera_model=self.camera_model, t_min=self.t_min,
                has_rects=has_rects, has_tris=has_tris, sort=self.sort,
                interpret=self.interpret, with_stats=True,
            )

        self._sample = _sample

    def update_scene(self, scene):
        (self.tables, self.n_super, self.has_rects,
         self.has_tris) = pack_wavefront_tables(scene)
        self.scene_data = scene.device()

    def render(self, cam, key, spp=1, max_depth=12, with_stats: bool = False):
        """Radiance SUM over spp samples, f32[H,W,3]; with ``with_stats``
        also the exact ray count (in-path, not estimated)."""
        acc = jnp.zeros((self.height, self.width, 3), jnp.float32)
        rays = jnp.float32(0.0)
        for s in range(int(spp)):
            img, n = self._sample(
                self.scene_data, self.tables, cam, rngu.frame_key(key, s),
                max_depth, n_super=self.n_super, has_rects=self.has_rects,
                has_tris=self.has_tris,
            )
            acc = acc + img
            rays = rays + n
        if with_stats:
            return acc, rays
        return acc
