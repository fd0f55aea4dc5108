"""Scene CRUD tests (semantics of AddHittable/DeleteHittable/ClearScene,
CudaLayer.cpp:918-1387, 1565-1572, and the inactive free-list CudaLayer.h:110)."""

import numpy as np
import pytest

from cudaraytracer_tpu.models.scene import (
    CHECKER, DIELECTRIC, LAMBERTIAN, METAL, Scene,
)


def test_add_and_device_roundtrip():
    s = Scene(capacity=8)
    i = s.add_sphere((1, 2, 3), 0.5, mat_type=METAL, albedo=(0.1, 0.2, 0.3), fuzz=0.4)
    sd = s.device()
    assert sd.capacity == 8
    assert bool(sd.active[i])
    np.testing.assert_allclose(sd.center[i], [1, 2, 3])
    assert float(sd.size[i, 0]) == 0.5
    assert int(sd.mat_type[i]) == METAL


def test_fuzz_clamped():
    s = Scene(capacity=4)
    i = s.add_sphere((0, 0, 0), 1.0, mat_type=METAL, fuzz=7.0)
    assert s.fuzz[i] == 1.0  # reference clamps to <=1 (Material.cuh:71)


def test_delete_recycles_slot():
    s = Scene(capacity=4)
    a = s.add_sphere((0, 0, 0), 1.0)
    b = s.add_sphere((1, 0, 0), 1.0)
    v0 = s.version
    s.delete(a)
    assert s.version > v0
    assert not s.active[a]
    c = s.add_sphere((2, 0, 0), 1.0)
    assert c == a  # free-list reuse
    assert s.num_active == 2
    with pytest.raises(ValueError):
        s.delete(a + 100 if a + 100 < 4 else 3 if not s.active[3] else b + 1)


def test_clear_keeps_ground():
    s = Scene(capacity=8)
    g = s.add_xz_rect((0, -0.5, 0), 1000, 1000)
    s.add_sphere((0, 0, 0), 1.0)
    s.add_sphere((1, 0, 0), 1.0)
    s.clear(keep=[g])
    assert s.num_active == 1 and s.active[g]


def test_grow_capacity():
    s = Scene(capacity=2)
    s.add_sphere((0, 0, 0), 1.0)
    s.add_sphere((1, 0, 0), 1.0)
    i = s.add_sphere((2, 0, 0), 1.0)  # triggers growth
    assert s.capacity == 4
    assert s.num_active == 3
    assert s.active[i]
    # earlier data preserved
    np.testing.assert_allclose(s.center[0], [0, 0, 0])


def test_update_bumps_version():
    s = Scene(capacity=4)
    i = s.add_sphere((0, 0, 0), 1.0)
    v = s.version
    s.update(i, center=(5, 5, 5), fuzz=0.25)
    assert s.version > v
    np.testing.assert_allclose(s.center[i], [5, 5, 5])
    with pytest.raises(KeyError):
        s.update(i, nonsense=1)


def test_texture_atlas_alloc_free():
    s = Scene(capacity=4, atlas_slots=2, atlas_size=8)
    img = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    slot = s.load_image_texture(img)
    assert slot == 0
    assert tuple(s.tex_hw[0]) == (4, 4)
    slot2 = s.load_image_texture(img)
    assert slot2 == 1
    with pytest.raises(RuntimeError):
        s.load_image_texture(img)
    s.free_image_texture(0)
    assert s.load_image_texture(img) == 0


def test_image_downscaled_to_atlas():
    s = Scene(capacity=4, atlas_slots=1, atlas_size=8)
    img = np.zeros((32, 16, 3), np.uint8)
    s.load_image_texture(img)
    h, w = s.tex_hw[0]
    assert h <= 8 and w <= 8 and h > 0 and w > 0


def test_save_load_roundtrip(tmp_path):
    s = Scene(capacity=8)
    s.add_xz_rect((0, -0.5, 0), 1000, 1000, tex_type=CHECKER,
                  albedo=(0.2, 0.3, 0.1), albedo2=(0.9, 0.9, 0.9))
    s.add_sphere((1, 2, 3), 0.5, mat_type=DIELECTRIC, ior=1.7)
    p = str(tmp_path / "scene.json")
    s.save(p)
    s2 = Scene.load(p)
    assert s2.num_active == 2
    idx = s2.active_indices()
    np.testing.assert_allclose(sorted(s2.ior[idx].tolist()), [1.5, 1.7])
    assert (s2.tex_type[idx] == CHECKER).any()


@pytest.mark.slow
def test_save_load_render_bit_identical(tmp_path):
    """End-to-end serialization: a feature-maximal scene (smooth uv-mapped
    mesh + image texture + all materials + hollow glass) renders
    BIT-IDENTICALLY after save+load and after a to_doc/from_doc
    (embedded-atlas) round trip — any dropped or re-quantized field shows
    up as a pixel diff."""
    import jax

    from cudaraytracer_tpu.models.camera import make_camera_params
    from cudaraytracer_tpu.models.renderer import render_radiance
    from cudaraytracer_tpu.utils import mesh, rng as rngu

    sc = Scene(capacity=128)
    sc.add_xz_rect((0, -0.5, 0), 30.0, 30.0, tex_type=CHECKER,
                   albedo=(0.2, 0.3, 0.1), albedo2=(0.9, 0.9, 0.9))
    tex = np.zeros((16, 16, 3), np.uint8)
    tex[:8] = (250, 60, 60)
    tex[8:] = (60, 60, 250)
    slot = sc.load_image_texture(tex)
    v, f = mesh.icosphere(1)
    theta = np.arccos(np.clip(-v[:, 1], -1, 1))
    phi = np.arctan2(-v[:, 2], v[:, 0]) + np.pi
    uvs = np.stack([phi / (2 * np.pi), theta / np.pi], 1).astype(np.float32)
    sc.add_mesh(mesh.transformed(v, scale=0.6, translate=(-0.7, 0.1, -2)),
                f, uvs=uvs, normals=v, tex_type=2, tex_id=slot)
    sc.add_sphere((0.6, 0.0, -1.6), 0.45, mat_type=DIELECTRIC, ior=1.5)
    sc.add_sphere((0.6, 0.0, -1.6), -0.35, mat_type=DIELECTRIC, ior=1.5)
    sc.add_sphere((1.5, 0.0, -2.4), 0.4, mat_type=METAL,
                  albedo=(0.8, 0.8, 0.7), fuzz=0.2)
    sc.add_xy_rect((0, 2.0, -3), 2.0, 1.0, mat_type=3, light=3.0)

    cam = make_camera_params(origin=(0, 0.6, 1.2), forward=(0, -0.2, -1))
    key = rngu.base_key(11)

    def render(s):
        return np.asarray(render_radiance(
            s.device(), cam, key, 2, 5, width=48, height=32,
            camera_model="look_at"))

    ref = render(sc)
    p = str(tmp_path / "full.json")
    sc.save(p)
    np.testing.assert_array_equal(render(Scene.load(p)), ref)
    np.testing.assert_array_equal(
        render(Scene.from_doc(sc.to_doc(embed_atlas=True))), ref)
