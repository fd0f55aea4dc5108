"""Native C++ scene-table packer must be BIT-IDENTICAL to the NumPy packer
(table_packer.cpp mirrors _pack_scene_tables_numpy; both feed the Pallas
megakernel, so any divergence is silent image corruption)."""

import numpy as np
import pytest

from cudaraytracer_tpu.models import scenes as scn
from cudaraytracer_tpu.models.scene import DIELECTRIC, IMAGE, LAMBERTIAN, Scene
from cudaraytracer_tpu.native import pack_native
from cudaraytracer_tpu.ops.pallas.render_kernel import pack_scene_tables

pytestmark = pytest.mark.skipif(
    not pack_native.available(),
    reason="native lib not built (python -m cudaraytracer_tpu.native.build)",
)


def _assert_identical(scene, with_uv):
    a = pack_scene_tables(scene, with_uv=with_uv)
    b = pack_scene_tables(scene, with_uv=with_uv, force_numpy=True)
    for name in ("S", "P", "clusters", "supers", "prim_map"):
        np.testing.assert_array_equal(
            getattr(a, name), getattr(b, name), err_msg=name)
    assert a.n_super == b.n_super


@pytest.mark.parametrize("scene_name", ["default", "rtow_final", "cornell"])
def test_native_pack_matches_numpy(scene_name):
    _assert_identical(scn.SCENES[scene_name][0](), with_uv=False)


def test_native_pack_with_uv_and_edge_cases():
    """Image textures (atlas mean albedo), negative radius (hollow glass),
    and the with_uv payload rows all round-trip identically."""
    s = Scene(capacity=8)
    s.add_xz_rect((0, -0.5, 0), 100, 100, mat_type=LAMBERTIAN)
    tex = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    slot = s.load_image_texture(tex)
    s.add_sphere((0, 1, -3), 1.2, mat_type=LAMBERTIAN,
                 tex_type=IMAGE, tex_id=slot)
    s.add_sphere((0, 1, -3), -0.9, mat_type=DIELECTRIC, ior=1.5)
    _assert_identical(s, with_uv=True)
    _assert_identical(s, with_uv=False)


def test_native_pack_after_edits():
    """The packer runs on every interactive edit: delete + grow + update
    must stay identical through the free-list and slab-growth paths."""
    s = scn.default_scene()
    s.delete(int(s.active_indices()[3]))
    s.update(int(s.active_indices()[1]), center=(5.0, 2.0, -1.0))
    for i in range(s.capacity):  # force at least one slab growth
        s.add_sphere((i * 0.5, 0.2, -4.0), 0.2, mat_type=LAMBERTIAN)
    _assert_identical(s, with_uv=False)
