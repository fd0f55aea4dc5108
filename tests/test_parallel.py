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
