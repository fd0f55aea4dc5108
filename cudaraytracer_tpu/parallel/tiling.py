"""Multi-chip rendering: shard the pixel grid and sample stream over a mesh.

The reference is strictly single-GPU — its only parallelism is one CUDA
thread per pixel (reference: CudaRayTracer/src/Cuda/Kernel.cu:102-158,
183-184) and it has no distributed communication at all (SURVEY.md §2.7).
This module is the TPU-native scaling story that takes its place:

  * a 2D ``jax.sharding.Mesh`` with axes ``("rows", "samples")``;
  * the image is split into horizontal bands over the ``rows`` axis (data
    parallelism over pixels — each chip traces its own wavefront, zero
    communication during the bounce loop);
  * samples-per-pixel are split over the ``samples`` axis (sample
    parallelism — independent Monte-Carlo streams), combined with a single
    ``psum`` over ICI at frame assembly;
  * the scene and camera are tiny and replicated on every chip.

Communication cost per frame is exactly one psum of the local framebuffer
band over the ``samples`` axis — everything else rides on-chip.  With a
``samples`` axis of size 1 it degrades to pure row-banding with no
collectives, which is the ideal layout when HBM per chip allows it.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.renderer import render_radiance


def _as_i32(x):
    """int32-ify a scalar WITHOUT an eager default-device dispatch.

    An eager ``jnp.asarray(python_int)`` runs convert_element_type on the
    DEFAULT device — which may be a broken/unwanted accelerator the mesh
    doesn't even use (the round-2 driver crash, MULTICHIP_r02.json).  Plain
    python/numpy scalars become numpy (zero device work; shard_map moves
    them to the mesh at execution); traced or committed jax values convert
    in-trace / on their own device.
    """
    import numpy as np

    if isinstance(x, (int, float, np.integer, np.floating, np.ndarray)):
        return np.asarray(x, np.int32)
    return jnp.asarray(x, jnp.int32)


def make_mesh(n_rows: int | None = None, n_samples: int = 1, devices=None) -> Mesh:
    """Build a ("rows", "samples") mesh over the available devices."""
    import numpy as np

    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n_rows is None:
        n_rows = n // n_samples
    if n_rows * n_samples != n:
        raise ValueError(f"{n_rows}x{n_samples} mesh != {n} devices")
    arr = np.asarray(devices).reshape(n_rows, n_samples)
    return Mesh(arr, ("rows", "samples"))


def render_sharded(
    scene,
    cam,
    key,
    spp,
    max_depth,
    *,
    width: int,
    height: int,
    mesh: Mesh,
    camera_model: str = "two_plane",
    t_min: float = 0.001,
    block: int = 64,
    hit_fn=None,
) -> jnp.ndarray:
    """Render one frame over the mesh; returns replicated f32[H,W,3] radiance.

    ``spp`` must be divisible by the samples axis; ``height`` by the rows
    axis.  The result is the SUM over spp samples (divide to display), same
    contract as models.renderer.render_radiance.
    """
    n_rows = mesh.shape["rows"]
    n_samp = mesh.shape["samples"]
    if height % n_rows:
        raise ValueError(f"height {height} not divisible by rows axis {n_rows}")
    tile_h = height // n_rows

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P()),
        out_specs=P("rows", None, None),
        # loop carries inside trace() mix replicated inits with axis_index-
        # varying ray data; the computation is correct (scene replicated,
        # rays per-device), so skip the varying-manual-axes bookkeeping
        check_vma=False,
    )
    def _local(scene, cam, key, spp, max_depth):
        ri = lax.axis_index("rows")
        si = lax.axis_index("samples")
        local_spp = spp // n_samp
        rad = render_radiance(
            scene, cam, key, local_spp, max_depth,
            width=width, height=height, camera_model=camera_model,
            t_min=t_min, block=block, hit_fn=hit_fn,
            y0=ri * tile_h, tile_h=tile_h,
            sample_offset=si * local_spp,
        )
        # one collective per frame: combine the sample-parallel streams
        rad = lax.psum(rad, "samples")
        return rad

    return _local(scene, cam, key, _as_i32(spp), _as_i32(max_depth))


def render_sharded_pallas(
    tables,
    n_super: int,
    cam_vec,
    seed,
    max_depth,
    *,
    width: int,
    height: int,
    mesh: Mesh,
    camera_model: str = "look_at",
    has_rects: bool = True,
    tile_h: int = 16,
    tile_w: int = 256,
    spp=1,
    rr_start: int = 0,
    atlas=None,
    tex_hw=None,
    cluster: int | None = None,
    super_: int | None = None,
    has_tris: bool = False,
    has_vattrs: bool = False,
    stream_b: int = 0,
    has_noise: bool = False,
    has_media: bool = False,
    has_motion: bool = False,
    has_boxm: bool = False,
    has_rotm: bool = False,
    has_nee: bool = False,
    nee_p: float = 0.5,
    has_qmc: bool = False,
    sample_base=0,
):
    """Multi-chip megakernel frame: each chip renders its image band with
    the Pallas megakernel (ops/pallas/render_kernel.py), sample-parallel
    streams psum over ICI.  Same mesh/communication layout as the XLA path.

    ``tables`` is (S, P, clusters, supers) as device arrays (with
    ``stream_b`` > 0: the HBM-streamed layout (tiles, block_boxes,
    clusters, supers) from pack_stream_tiles, and ``n_super`` is the used
    BLOCK count — beyond-SMEM scenes shard over chips exactly like
    resident ones, the block DMA being chip-local); returns the
    SUM over the samples axis of spp-per-chip radiance, f32[H,W,3] sharded
    by rows.  With ``atlas``/``tex_hw`` (image-texture scenes) returns
    (radiance_sum, counts_sum): per-pixel completed-sample counts, summed
    over the samples axis with the same single psum — callers display
    sum/count (the Wald-consistent ratio, see pallas_render_sample).
    """
    from ..ops.pallas.render_kernel import CLUSTER, SUPER, pallas_render_sample

    if cluster is None:
        cluster = CLUSTER
    if super_ is None:
        super_ = SUPER

    n_rows = mesh.shape["rows"]
    n_samp = mesh.shape["samples"]
    if height % (n_rows * tile_h):
        raise ValueError(f"height {height} not divisible by rows*tile_h")
    if width % tile_w:
        raise ValueError(f"width {width} not divisible by tile_w {tile_w}")
    band_h = height // n_rows
    has_images = atlas is not None

    # device arrays (incl. the atlas) are passed as shard_map ARGUMENTS,
    # never closures: a captured device array becomes an MLIR constant
    # whose value is fetched device->host at lowering — minutes over a
    # tunneled link
    atl = (atlas, tex_hw) if has_images else ()

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(),) * (7 + len(atl)),
        out_specs=(P("rows", None, None), P("rows", None))
        if has_images else P("rows", None, None),
        check_vma=False,
    )
    def _local(S, Ptab, C, SC, cam_vec, seed, max_depth, *atl):
        ri = lax.axis_index("rows")
        si = lax.axis_index("samples")
        out = pallas_render_sample(
            S, Ptab, C, SC, n_super, cam_vec, seed, max_depth,
            width=width, height=height, camera_model=camera_model,
            tile_h=tile_h, tile_w=tile_w, has_rects=has_rects,
            y0=ri * band_h, band_h=band_h, spp=spp, rr_start=rr_start,
            atlas=atl[0] if has_images else None,
            tex_hw=atl[1] if has_images else None,
            cluster=cluster, super_=super_, has_tris=has_tris,
            has_vattrs=has_vattrs, stream_b=stream_b,
            has_noise=has_noise, has_media=has_media,
            has_motion=has_motion, has_boxm=has_boxm, has_rotm=has_rotm,
            has_nee=has_nee, nee_p=nee_p, has_qmc=has_qmc,
            # under QMC each sample-stream chip draws a DISJOINT slice of
            # the R2 sequence (base + si*spp); progressive callers advance
            # sample_base by spp * n_samples per frame
            sample_base=sample_base + si * spp,
            # distinct PRNG stream per (band, sample-stream) device, mixed
            # with the frame seed and tile id in-kernel (collision-free)
            stream=ri * n_samp + si,
        )
        if has_images:
            rad, counts = out
            # one psum per frame still: radiance and counts ride together
            rad, counts = lax.psum((rad, counts), "samples")
            return rad, counts
        return lax.psum(out, "samples")

    S, Ptab, C, SC = tables
    return _local(S, Ptab, C, SC, cam_vec,
                  _as_i32(seed), _as_i32(max_depth), *atl)


class ShardedRenderer:
    """Jit-compiled multi-chip frame renderer (the scaling analog of
    models.renderer.Renderer)."""

    def __init__(
        self,
        width: int,
        height: int,
        mesh: Mesh | None = None,
        n_samples_axis: int = 1,
        camera_model: str = "two_plane",
        t_min: float = 0.001,
        block: int = 64,
    ):
        self.width = int(width)
        self.height = int(height)
        self.mesh = mesh if mesh is not None else make_mesh(n_samples=n_samples_axis)
        self.camera_model = camera_model

        @jax.jit
        def _render(scene, cam, key, spp, max_depth):
            return render_sharded(
                scene, cam, key, spp, max_depth,
                width=self.width, height=self.height, mesh=self.mesh,
                camera_model=self.camera_model, t_min=t_min, block=block,
            )

        self._render = _render

    def render(self, scene, cam, key, spp=36, max_depth=12):
        return self._render(scene, cam, key, spp, max_depth)

    def replicate(self, tree):
        """Place a host pytree on the mesh fully replicated."""
        sharding = NamedSharding(self.mesh, P())
        return jax.device_put(tree, sharding)
