"""Multi-chip sharding tests on the 8-virtual-CPU-device mesh."""

import jax
import numpy as np
import pytest

from cudaraytracer_tpu.models import scenes
from cudaraytracer_tpu.models.renderer import render_radiance
from cudaraytracer_tpu.parallel import ShardedRenderer, make_mesh, render_sharded
from cudaraytracer_tpu.utils import rng as rngu


@pytest.fixture(scope="module")
def setup():
    scene = scenes.default_scene()
    return scene.device(), scenes.default_scene_camera()


def test_mesh_shapes():
    m = make_mesh()
    assert m.shape == {"rows": 8, "samples": 1}
    m = make_mesh(n_samples=2)
    assert m.shape == {"rows": 4, "samples": 2}
    with pytest.raises(ValueError):
        make_mesh(n_rows=3, n_samples=3)


@pytest.mark.slow
@pytest.mark.parametrize("n_samples", [1, 2])
def test_sharded_render_matches_statistics(setup, n_samples):
    sd, cam = setup
    mesh = make_mesh(n_samples=n_samples)
    w, h, spp, depth = 32, 32, 4, 4
    rad_sh = render_sharded(
        sd, cam, rngu.base_key(), spp, depth, width=w, height=h, mesh=mesh
    )
    assert rad_sh.shape == (h, w, 3)
    rad_sh = np.asarray(rad_sh) / spp
    rad_1 = np.asarray(
        render_radiance(sd, cam, rngu.base_key(), spp, depth, width=w, height=h)
    ) / spp
    assert np.isfinite(rad_sh).all()
    # different RNG streams -> only statistical agreement expected
    assert abs(rad_sh.mean() - rad_1.mean()) < 0.08
    # no empty bands: every row band produced content
    band = h // mesh.shape["rows"]
    for b in range(mesh.shape["rows"]):
        assert rad_sh[b * band : (b + 1) * band].sum() > 0


@pytest.mark.slow
def test_sharded_renderer_class(setup):
    sd, cam = setup
    r = ShardedRenderer(32, 32, n_samples_axis=2)
    sd_rep = r.replicate(sd)
    out = r.render(sd_rep, cam, rngu.base_key(), spp=2, max_depth=3)
    assert out.shape == (32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_height_not_divisible_raises(setup):
    sd, cam = setup
    mesh = make_mesh()
    with pytest.raises(ValueError):
        render_sharded(sd, cam, rngu.base_key(), 1, 2, width=16, height=17, mesh=mesh)


@pytest.mark.slow
def test_sharded_pallas_render():
    """Multi-chip megakernel path on the virtual mesh (interpret mode)."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from cudaraytracer_tpu.models import scenes as scn
    from cudaraytracer_tpu.ops.pallas.render_kernel import (
        pack_camera, pack_scene_tables)
    from cudaraytracer_tpu.parallel import render_sharded_pallas

    scene = scn.default_scene()
    sd = scene.device()
    t = pack_scene_tables(scene)
    mesh = make_mesh(n_rows=4, n_samples=2)
    W, H = 128, 64
    cam_vec = pack_camera(scn.default_scene_camera(), sd, W, H, 1e-3)
    tables = tuple(jnp.asarray(x) for x in (t.S, t.P, t.clusters, t.supers))
    with pltpu.force_tpu_interpret_mode():
        out = render_sharded_pallas(
            tables, t.n_super, cam_vec, 7, 4,
            width=W, height=H, mesh=mesh, camera_model="two_plane",
            tile_h=16, tile_w=128,
        )
        out = np.asarray(out) / 2  # two sample streams summed
    assert out.shape == (H, W, 3)
    assert np.isfinite(out).all()
    # bands must all contain content and the horizon must look continuous
    for b in range(4):
        assert out[b * 16 : (b + 1) * 16].mean() > 0.2


@pytest.mark.slow
def test_sharded_pallas_image_mode():
    """Image-texture scenes on the multi-chip megakernel path: each chip
    returns (radiance, counts) for its band, both psum'd over the samples
    axis in one collective; sum/count must reproduce the image colors
    (the same Wald-consistent ratio the single-chip viewer displays).

    2x2 mesh, not 4x2: the interpret simulator requires every device's
    kernel callback to run CONCURRENTLY (it synchronizes them on a
    threading.Barrier), and with image mode's XLA texel-gather epilogue
    competing for the same host thread pool an 8-device run starves the
    barrier and deadlocks.  Simulator artifact only — the compiled path
    has no such constraint, and non-image 8-device tests still run."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from cudaraytracer_tpu.models.camera import make_camera_params
    from cudaraytracer_tpu.models.scene import IMAGE, LAMBERTIAN, Scene
    from cudaraytracer_tpu.ops.pallas.render_kernel import (
        pack_camera, pack_scene_tables)
    from cudaraytracer_tpu.parallel import render_sharded_pallas

    scene = Scene(capacity=8, background_start=(0.1, 0.1, 0.1),
                  background_end=(0.1, 0.1, 0.1))
    tex = np.zeros((16, 32, 3), np.uint8)
    tex[:, :16] = (40, 220, 40)   # left green
    tex[:, 16:] = (220, 40, 220)  # right magenta
    slot = scene.load_image_texture(tex)
    scene.add_xy_rect((0, 1, -4), 6, 4, mat_type=LAMBERTIAN,
                      tex_type=IMAGE, tex_id=slot)
    sd = scene.device()
    t = pack_scene_tables(scene, with_uv=True)
    mesh = make_mesh(n_rows=2, n_samples=2, devices=jax.devices()[:4])
    W, H = 128, 32
    cam = make_camera_params(origin=(0.0, 1.0, 0.0), forward=(0.0, 0.0, -1.0))
    cam_vec = pack_camera(cam, sd, W, H, 1e-3)
    tables = tuple(jnp.asarray(x) for x in (t.S, t.P, t.clusters, t.supers))
    with pltpu.force_tpu_interpret_mode():
        rad, counts = render_sharded_pallas(
            tables, t.n_super, cam_vec, 7, 3,
            width=W, height=H, mesh=mesh, camera_model="look_at",
            tile_h=16, tile_w=128, spp=2,
            atlas=sd.atlas, tex_hw=sd.tex_hw,
        )
        rad = np.asarray(rad)
        counts = np.asarray(counts)
    assert rad.shape == (H, W, 3) and counts.shape == (H, W)
    # every pixel completed between 1 and spp samples on each of the two
    # sample-stream devices
    assert counts.min() >= 2 and counts.max() <= 2 * 2
    img = rad / np.maximum(counts, 1.0)[..., None]
    assert np.isfinite(img).all()
    # the rect fills the view center: left half green, right half magenta
    lp, rp = img[12:20, 20:50], img[12:20, 78:108]
    assert lp[..., 1].mean() > lp[..., 0].mean()
    assert rp[..., 0].mean() > rp[..., 1].mean()


@pytest.mark.slow
def test_sharded_pallas_vattr_mesh_exact_interior():
    """Triangle mesh with per-vertex UVs (round-3 vattr path) over the
    device mesh: an emissive UV-mapped quad (two triangles) with a
    quadrant texture renders deterministically (emission-terminated
    paths), so interior pixels of the sharded megakernel must match the
    single-device XLA renderer EXACTLY — this drives carry_uv barycentrics
    + interpolated texcoords + the image-deferral epilogue through
    shard_map.  2x2 mesh for the same interpret-simulator reason as
    test_sharded_pallas_image_mode."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from cudaraytracer_tpu.models.camera import make_camera_params
    from cudaraytracer_tpu.models.scene import DIFFUSE_LIGHT, Scene
    from cudaraytracer_tpu.ops.pallas.render_kernel import (
        pack_camera, pack_scene_tables)
    from cudaraytracer_tpu.parallel import render_sharded_pallas

    img_tex = np.zeros((64, 64, 3), np.uint8)
    img_tex[:32, :32] = (255, 40, 40)
    img_tex[:32, 32:] = (40, 255, 40)
    img_tex[32:, :32] = (40, 40, 255)
    img_tex[32:, 32:] = (250, 250, 60)

    scene = Scene(capacity=16, background_start=(0, 0, 0),
                  background_end=(0, 0, 0))
    slot = scene.load_image_texture(img_tex)
    v = np.array([(-1, -1, 0), (1, -1, 0), (1, 1, 0), (-1, 1, 0)], np.float32)
    uv = np.array([(0, 0), (1, 0), (1, 1), (0, 1)], np.float32)
    f = np.array([(0, 1, 2), (0, 2, 3)], np.int64)
    scene.add_mesh(v, f, uvs=uv, mat_type=DIFFUSE_LIGHT, light=2.0,
                   tex_type=2, tex_id=slot)
    sd = scene.device()
    assert scene.has_vertex_attrs

    W, H, DEPTH = 128, 32, 3
    cam = make_camera_params(origin=(0, 0, 1.6), forward=(0, 0, -1))
    cam_vec = pack_camera(cam, sd, W, H, 1e-3)
    t = pack_scene_tables(scene, with_uv=True)
    assert t.vattrs
    tables = tuple(jnp.asarray(x) for x in (t.S, t.P, t.clusters, t.supers))
    mesh = make_mesh(n_rows=2, n_samples=2, devices=jax.devices()[:4])
    with pltpu.force_tpu_interpret_mode():
        rad, counts = render_sharded_pallas(
            tables, t.n_super, cam_vec, 5, DEPTH,
            width=W, height=H, mesh=mesh, camera_model="look_at",
            tile_h=16, tile_w=128, spp=1, has_rects=False,
            has_tris=True, has_vattrs=True,
            atlas=sd.atlas, tex_hw=sd.tex_hw,
        )
        pal = np.asarray(rad) / np.maximum(
            np.asarray(counts), 1.0)[..., None]
    assert pal.shape == (H, W, 3) and np.isfinite(pal).all()

    xla = np.asarray(
        render_radiance(sd, cam, rngu.base_key(2), 1, DEPTH,
                        width=W, height=H, camera_model="look_at"))
    # interior mask: pixels whose 3x3 XLA neighborhood is constant
    const = np.ones((H, W), bool)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            shifted = np.roll(np.roll(xla, dy, 0), dx, 1)
            const &= (np.abs(shifted - xla) < 1e-6).all(-1)
    const[[0, -1], :] = False
    const[:, [0, -1]] = False
    assert const.sum() > H * W * 0.25
    assert np.abs(pal[const] - xla[const]).max() < 1e-5
    # all four quadrant colors appear (the UVs really interpolate)
    assert len({tuple(np.round(c, 3)) for c in pal[const]}) >= 4


@pytest.mark.slow
def test_sharded_pallas_feature_branches():
    """Round-4/5 static branches through the multi-chip shard (the
    round-4 VERDICT's blind spot): ONE sharded megakernel compiled with
    has_nee (light table riding the camera vector) + has_noise +
    has_media + has_motion + has_boxm + has_rotm renders finite and lit
    on the 8-device mesh."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from cudaraytracer_tpu.models import scenes as scn
    from cudaraytracer_tpu.ops.pallas.render_kernel import (
        pack_camera_np, pack_scene_tables)
    from cudaraytracer_tpu.ops.sampling import pack_lights_np
    from cudaraytracer_tpu.parallel import render_sharded_pallas

    # the SHARED all-static-flags probe (also the driver's feature shard
    # and the streamed bit-identity scene) — one scene to extend, not 3
    sc = scn.all_feature_probe_scene()
    t = pack_scene_tables(sc)
    mesh = make_mesh(n_rows=4, n_samples=2)
    W, H = 128, 64
    cam_np = np.concatenate([
        pack_camera_np(scn.cornell_like_camera(), sc.background_start,
                       sc.background_end, W, H, 1e-3),
        pack_lights_np(sc)])
    tables = tuple(jnp.asarray(x) for x in (t.S, t.P, t.clusters, t.supers))
    with pltpu.force_tpu_interpret_mode():
        out = render_sharded_pallas(
            tables, t.n_super, jnp.asarray(cam_np), 7, 4,
            width=W, height=H, mesh=mesh, camera_model="two_plane",
            tile_h=16, tile_w=128, cluster=t.cluster, super_=t.super_,
            **scn.ALL_FEATURE_FLAGS,
        )
        out = np.asarray(out) / 2
    assert out.shape == (H, W, 3)
    assert np.isfinite(out).all()
    assert out.mean() > 0.001  # lit through the NEE table


@pytest.mark.slow
def test_dryrun_multichip_is_hermetic():
    """dryrun_multichip must be green even when the machine's TPU is broken.

    The round-1/2 driver failures (MULTICHIP_r0{1,2}.json) were eager ops
    dispatched to a tunneled TPU backend the dry run never needed (libtpu
    client/terminal mismatch aborted them).  Run the dry run the way the
    driver does — a FRESH subprocess with the TPU plugin importable — and
    assert (a) it succeeds, (b) the TPU backend is never initialized, i.e.
    the run cannot depend on accelerator health.
    """
    import os
    import subprocess
    import sys

    code = (
        "from __graft_entry__ import dryrun_multichip\n"
        "dryrun_multichip(8)\n"
        "from jax._src import xla_bridge as xb\n"
        "inited = sorted(xb._backends.keys())\n"
        "assert inited == ['cpu'], f'non-hermetic backends: {inited}'\n"
        "print('HERMETIC OK')\n"
    )
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # the driver does not force a platform
    env.pop("CRT_MULTICHIP_REAL", None)
    # replicate the driver environment: the TPU plugin is importable
    pp = [p for p in env.get("PYTHONPATH", "").split(os.pathsep) if p]
    if os.path.isdir("/root/.axon_site") and "/root/.axon_site" not in pp:
        pp.append("/root/.axon_site")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = os.pathsep.join([repo] + pp)
    out = subprocess.run(
        [sys.executable, "-c", code], cwd=repo, env=env,
        capture_output=True, text=True, timeout=570,
    )
    assert out.returncode == 0, f"stdout={out.stdout}\nstderr={out.stderr}"
    assert "HERMETIC OK" in out.stdout
    assert "dryrun_multichip OK" in out.stdout
