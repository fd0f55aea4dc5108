"""Viewer server tests: drive the HTTP surface end-to-end (the Scene /
Metrics / Options / Console panel behaviors, CudaLayer.cpp:389-687)."""

import json
import urllib.request

import numpy as np
import pytest

from cudaraytracer_tpu.config import RenderConfig
from cudaraytracer_tpu.viewer.app import Application
from cudaraytracer_tpu.viewer.server import ViewerServer


@pytest.fixture()
def served():
    app = Application(RenderConfig(width=32, height=24, max_depth=3, scene="default"))
    app.setup_default_layers()
    app.run(max_frames=1)
    server = ViewerServer(app, port=0)
    httpd = server.start()
    port = httpd.server_address[1]
    yield app, server, port
    server.stop()
    app.close()


def get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as r:
        return r.read()


def post(port, path, body):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=json.dumps(body).encode(), method="POST"
    )
    with urllib.request.urlopen(req) as r:
        return r.read()


def test_index_and_frame(served):
    app, server, port = served
    page = get(port, "/")
    assert b"cudaraytracer-tpu" in page
    png = get(port, "/frame.png")
    assert png[:8] == b"\x89PNG\r\n\x1a\n"


def test_state_endpoint(served):
    app, server, port = served
    s = json.loads(get(port, "/state"))
    assert s["metrics"]["frames"] == 1
    assert len(s["scene"]) == app.render_layer.scene.num_active
    assert s["options"]["max_depth"] == 3
    assert s["scene"][0]["prim"] == "xz_rect"  # the ground


def test_input_moves_camera(served):
    app, server, port = served
    z0 = app.render_layer.fly.position[2]
    post(port, "/input", {"keys": ["w"], "shift": True})
    assert app.render_layer.fly.position[2] < z0
    post(port, "/input", {"mouse_dx": 100, "mouse_dy": 0, "scroll": 2})
    assert app.render_layer.fly.yaw != 270.0
    assert app.render_layer.fly.fov_deg < 45.0


def test_edit_crud(served):
    app, server, port = served
    scene = app.render_layer.scene
    n0 = scene.num_active
    post(port, "/edit", {"op": "add", "prim": "sphere", "mat": "metal",
                         "center": [1, 2, 3], "radius": 0.7})
    assert scene.num_active == n0 + 1
    new_id = int(scene.active_indices()[-1])
    post(port, "/edit", {"op": "update", "id": new_id, "field": "center",
                         "value": [9, 9, 9]})
    np.testing.assert_allclose(scene.center[new_id], [9, 9, 9])
    post(port, "/edit", {"op": "delete", "id": new_id})
    assert scene.num_active == n0
    post(port, "/edit", {"op": "clear"})
    assert scene.num_active == 1  # ground kept (ClearScene semantics)


def test_options_endpoint(served, tmp_path):
    app, server, port = served
    rl = app.render_layer
    post(port, "/options", {"max_depth": 99})
    assert rl.cfg.max_depth == 50  # UI cap, CudaLayer.cpp:681
    post(port, "/options", {"background_start": [0, 0, 0], "background_end": [0, 0, 0]})
    assert rl.scene.background_start.sum() == 0
    post(port, "/options", {"pause": True})
    assert app.paused
    post(port, "/options", {"pause": True})
    # save/load paths are confined to data_dir (relative names only)
    server.data_dir = str(tmp_path)
    post(port, "/options", {"save": "s.json"})
    assert (tmp_path / "s.json").exists()
    post(port, "/options", {"load": "s.json"})
    assert rl.scene.num_active >= 1
    # path traversal / absolute paths are rejected (500), nothing written
    import os
    import urllib.error

    for bad in ("../evil.json", "/tmp/evil_abs.json"):
        with pytest.raises(urllib.error.HTTPError):
            post(port, "/options", {"save": bad})
    assert not (tmp_path.parent / "evil.json").exists()
    assert not os.path.exists("/tmp/evil_abs.json")


def test_lens_options(served):
    """Aperture/focus (thin-lens defocus) are runtime options: they update
    the config, bump the camera version (accumulator restart) and appear
    in /state for the panel inputs."""
    app, server, port = served
    rl = app.render_layer
    v0 = rl.fly.version
    post(port, "/options", {"aperture": 0.3, "focus_dist": 4.0})
    assert rl.cfg.aperture == 0.3 and rl.cfg.focus_dist == 4.0
    assert rl.fly.version > v0
    s = json.loads(get(port, "/state"))
    assert s["options"]["aperture"] == 0.3
    assert s["options"]["focus_dist"] == 4.0
    # re-posting identical values is a no-op (no accumulator restart)
    v1 = rl.fly.version
    post(port, "/options", {"aperture": 0.3, "focus_dist": 4.0})
    assert rl.fly.version == v1
    # a non-positive focus (empty panel input posts 0) is ignored
    post(port, "/options", {"focus_dist": 0})
    assert rl.cfg.focus_dist == 4.0
    post(port, "/options", {"aperture": -1.0})  # clamped to pinhole
    assert rl.cfg.aperture == 0.0


def test_radiance_pfm_download(served):
    """GET /radiance.pfm serves the accumulator as linear HDR that
    tonemaps to the served PNG frame."""
    import os
    import tempfile

    from cudaraytracer_tpu.utils.image import load_pfm

    app, server, port = served
    app.run(max_frames=2)
    body = get(port, "/radiance.pfm")
    # parse via the file loader (shared format code)
    with tempfile.NamedTemporaryFile(suffix=".pfm", delete=False) as tf:
        tf.write(body)
        name = tf.name
    hdr = load_pfm(name)
    os.remove(name)
    rl = app.render_layer
    assert hdr.shape == (rl.cfg.height, rl.cfg.width, 3)
    assert np.isfinite(hdr).all() and hdr.sum() > 0
    disp = rl.display_float()
    np.testing.assert_allclose(np.sqrt(np.clip(hdr, 0, 1)), disp, atol=1e-5)


def test_scene_json_download_import_roundtrip(served):
    """Portable scenes: GET /scene.json returns ONE document (atlas
    embedded base64), POST /scene.json restores it — browser-side
    persistence with no server data-dir involved."""
    app, server, port = served
    rl = app.render_layer
    scene = rl.scene
    tex = np.zeros((8, 8, 3), np.uint8)
    tex[:, :4] = (255, 0, 0)
    slot = scene.load_image_texture(tex)
    i = scene.add_sphere((0, 1, -2), 0.4, tex_type=2, tex_id=slot)
    n0 = scene.num_active
    atlas0 = scene.atlas.copy()

    doc = json.loads(get(port, "/scene.json"))
    assert "atlas_b64" in doc
    assert len(doc["primitives"]) == n0

    scene.delete(i)
    assert rl.scene.num_active == n0 - 1
    post(port, "/scene.json", doc)
    s2 = app.render_layer.scene  # import swaps the scene object
    assert s2.num_active == n0
    np.testing.assert_array_equal(s2.atlas, atlas0)
    assert (s2.tex_type[s2.active_indices()] == 2).sum() >= 1
    # the restored scene renders (device tables rebuild cleanly)
    s = json.loads(get(port, "/state"))
    assert len(s["scene"]) >= 1


def test_bad_requests_keep_viewer_alive(served):
    """Malformed edits/uploads return 500 without mutating the scene or
    killing the server (the reference's checkCudaErrors would abort; the
    web viewer must survive bad input)."""
    import urllib.error
    import urllib.request

    app, server, port = served
    scene = app.render_layer.scene
    n0, ver0 = scene.num_active, scene.version

    def post_raw(path, body: bytes):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}", data=body, method="POST")
        with urllib.request.urlopen(req) as r:
            return r.read()

    # garbage OBJ upload: rejected, nothing added
    with pytest.raises(urllib.error.HTTPError):
        post_raw("/mesh?mat=metal", b"this is not an obj file\n")
    # unknown mesh group / out-of-range prim id / bad field
    for body in (
        {"op": "update", "id": "m999", "field": "mat", "value": "metal"},
        {"op": "update", "id": "m999", "field": "scale", "value": 2.0},
        {"op": "delete", "id": 10 ** 6},
    ):
        try:
            post(port, "/edit", body)
        except urllib.error.HTTPError:
            pass  # 500 is acceptable; silent success must not mutate
    # non-finite numerics are rejected BEFORE touching the scene (a NaN
    # center/radius would poison the packed tables for every later frame)
    r0 = float(scene.size[0][0])
    for body in (
        {"op": "update", "id": 0, "field": "radius", "value": float("nan")},
        {"op": "update", "id": 0, "field": "center",
         "value": [0.0, float("inf"), 0.0]},
    ):
        with pytest.raises(urllib.error.HTTPError):
            post(port, "/edit", body)
    assert float(scene.size[0][0]) == r0
    assert np.isfinite(scene.center[scene.active]).all()
    # /options numerics are guarded too (NaN focus/camera/bg would poison
    # the camera vector or scene tables)
    fd0 = app.render_layer.cfg.focus_dist
    for body in (
        {"focus_dist": float("nan")},
        {"camera": {"yaw": float("nan")}},
        {"background_start": [0.1, float("inf"), 0.1]},
    ):
        with pytest.raises(urllib.error.HTTPError):
            post(port, "/options", body)
    assert app.render_layer.cfg.focus_dist == fd0
    assert np.isfinite(scene.background_start).all()
    # /scene.json import bounds capacity before allocating (a malformed
    # document must not OOM the render server)
    with pytest.raises(urllib.error.HTTPError):
        post(port, "/scene.json",
             {"capacity": 10 ** 9, "background_start": [0, 0, 0],
              "background_end": [0, 0, 0], "primitives": []})
    # unknown scene name
    with pytest.raises(urllib.error.HTTPError):
        post(port, "/options", {"scene": "no_such_scene"})

    assert scene.num_active == n0
    # server still fully alive and consistent
    s = json.loads(get(port, "/state"))
    assert len(s["scene"]) >= 1


def test_accumulation_reset_on_edit(served):
    app, server, port = served
    rl = app.render_layer
    app.run(max_frames=3)
    assert rl._spp_done >= 3
    post(port, "/edit", {"op": "add", "prim": "sphere", "mat": "lambertian",
                         "center": [0, 1, 0], "radius": 0.3})
    app.run(max_frames=1)
    assert rl._spp_done == 1  # reset fired


def test_resize(served):
    app, server, port = served
    post(port, "/options", {"resize": [40, 32]})
    app.run(max_frames=1)
    img = app.render_layer.framebuffer_rgba8()
    assert img.shape == (32, 40, 4)
    s = json.loads(get(port, "/state"))
    assert s["metrics"]["width"] == 40 and s["metrics"]["height"] == 32


def test_texture_upload(served):
    import io
    from PIL import Image

    app, server, port = served
    scene = app.render_layer.scene
    pid = int(scene.active_indices()[0])
    buf = io.BytesIO()
    Image.fromarray(np.full((8, 8, 3), 200, np.uint8)).save(buf, "PNG")
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/texture?id={pid}", data=buf.getvalue(), method="POST"
    )
    with urllib.request.urlopen(req) as r:
        r.read()
    assert int(scene.tex_type[pid]) == 2  # IMAGE
    assert int(scene.tex_id[pid]) >= 0
    # switch back to checker via the texture combo (TextureNode analog)
    post(port, "/edit", {"op": "update", "id": pid, "field": "tex", "value": "checker"})
    assert int(scene.tex_type[pid]) == 1


def test_numeric_camera_edit(served):
    app, server, port = served
    post(port, "/options", {"camera": {"position": [1, 2, 3], "yaw": 180.0,
                                       "pitch": 95.0, "fov": 30.0}})
    fly = app.render_layer.fly
    assert fly.position == [1.0, 2.0, 3.0]
    assert fly.pitch == 89.0  # clamped like the reference
    assert fly.fov_deg == 30.0
    s = json.loads(get(port, "/state"))
    assert s["camera"]["position"] == [1.0, 2.0, 3.0]
    # camera edit resets accumulation
    app.run(max_frames=1)
    assert app.render_layer._spp_done == 1


def test_widget_ui_page(served):
    """The page must carry real widget editors (the reference's drag
    editors, combos, color pickers, sliders — CudaLayer.cpp:470-686,
    719-872) instead of prompt() dialogs."""
    app, server, port = served
    page = get(port, "/").decode()
    assert "prompt(" not in page
    for marker in ("type=color", "type=range", "primPanel", "cyaw", "cpitch",
                   "addtype", "addmat", "upd("):
        assert marker in page, marker


def test_widget_edit_fields(served):
    """Per-field editing the widget panels post: width/height components,
    fuzz clamp (Material.cuh:70), material/texture combos, albedo picker."""
    app, server, port = served
    rl = app.render_layer
    scene = rl.scene
    i = int(scene.active_indices()[0])
    post(port, "/edit", {"op": "update", "id": i, "field": "width", "value": 7.5})
    post(port, "/edit", {"op": "update", "id": i, "field": "height", "value": 2.5})
    assert tuple(scene.size[i][:2]) == (7.5, 2.5)
    post(port, "/edit", {"op": "update", "id": i, "field": "fuzz", "value": 3.0})
    assert scene.fuzz[i] == 1.0  # clamped like the reference Metal ctor
    post(port, "/edit", {"op": "update", "id": i, "field": "mat", "value": "metal"})
    post(port, "/edit", {"op": "update", "id": i, "field": "albedo",
                         "value": [0.25, 0.5, 0.75]})
    assert np.allclose(scene.albedo[i], [0.25, 0.5, 0.75])
    s = json.loads(get(port, "/state"))
    me = [p for p in s["scene"] if p["id"] == i][0]
    assert me["mat"] == "metal" and me["albedo"] == [0.25, 0.5, 0.75]
    assert "albedo2" in me


def test_camera_yaw_pitch_fields(served):
    app, server, port = served
    rl = app.render_layer
    post(port, "/options", {"camera": {"yaw": 45.0, "pitch": 95.0, "fov": 30.0}})
    assert rl.fly.yaw == 45.0
    assert rl.fly.pitch == 89.0  # clamped (Camera.cpp pitch clamp)
    assert rl.fly.fov_deg == 30.0


def test_frame_scale_and_cache(served):
    app, server, port = served
    full = get(port, "/frame.png")
    small = get(port, "/frame.png?scale=2")
    from PIL import Image
    import io as _io

    wf, hf = Image.open(_io.BytesIO(full)).size
    ws, hs = Image.open(_io.BytesIO(small)).size
    assert (ws, hs) == (-(-wf // 2), -(-hf // 2))
    # identical request between frames is served from the cache
    assert get(port, "/frame.png?scale=2") == small


def test_frame_jpeg_endpoint(served):
    """/frame.jpg (round 5, the UI's default poll): valid JPEG at the
    PNG's dimensions, visually the same frame (mean within a couple of
    8-bit levels), cached between frames, and the q knob trades bytes."""
    import io as _io

    import numpy as np
    from PIL import Image

    app, server, port = served
    png = get(port, "/frame.png")
    jpg = get(port, "/frame.jpg")
    assert jpg[:2] == b"\xff\xd8"  # JPEG SOI
    ip = Image.open(_io.BytesIO(png)).convert("RGB")
    ij = Image.open(_io.BytesIO(jpg))
    assert ij.format == "JPEG" and ij.size == ip.size
    a, b = np.asarray(ip, np.float32), np.asarray(ij, np.float32)
    assert abs(a.mean() - b.mean()) < 3.0
    assert get(port, "/frame.jpg") == jpg  # cache hit between frames
    q30 = get(port, "/frame.jpg?q=30")
    assert len(q30) < len(jpg)


def test_console_filter_clear_copy(served):
    """Console panel parity (Console.h:41-82): server-side text filter on
    /state, a Clear action, and a /console.txt copy source — plus the page
    carries the filter box and both buttons."""
    import cudaraytracer_tpu.utils.logging as rtlog

    app, server, port = served
    rtlog.rt_info("needle-alpha hello")
    rtlog.rt_info("needle-beta world")
    # filter: only matching lines come back
    s = json.loads(get(port, "/state?filter=needle-alpha"))
    assert any("needle-alpha" in ln for ln in s["console"])
    assert not any("needle-beta" in ln for ln in s["console"])
    # copy: full filtered buffer as text
    txt = get(port, "/console.txt?filter=needle-").decode()
    assert "needle-alpha hello" in txt and "needle-beta world" in txt
    # clear: buffer empties
    post(port, "/options", {"console_clear": True})
    assert get(port, "/console.txt").decode() == ""
    page = get(port, "/").decode()
    for marker in ("cfilter", "console_clear", "copyConsole"):
        assert marker in page, marker


def test_scene_load_and_checkpoint_buttons(served, tmp_path):
    """The save/load/checkpoint/resume endpoints have UI affordances and
    round-trip through them (round-2 verdict Missing #5)."""
    app, server, port = served
    server.data_dir = str(tmp_path)
    rl = app.render_layer
    n0 = rl.scene.num_active
    post(port, "/options", {"save": "s.json"})
    rl.scene.add_sphere((0, 1, 0), 0.3)
    assert rl.scene.num_active == n0 + 1
    post(port, "/options", {"load": "s.json"})
    assert app.render_layer.scene.num_active == n0
    # checkpoint + resume round-trips the accumulator state
    post(port, "/options", {"checkpoint": "ck"})
    app.run(max_frames=2)
    post(port, "/options", {"resume": "ck"})
    assert app.render_layer._spp_done >= 0
    page = get(port, "/").decode()
    for marker in ("load scene", "checkpoint", "resume", "fname", "ckname"):
        assert marker in page, marker


@pytest.mark.slow
def test_mesh_rows_grouped_and_editable():
    """A mesh appears in the Scene panel as ONE object (id "m<gid>"), and
    panel edits on it fan out: material, translate, delete (round 3)."""
    from cudaraytracer_tpu.models.scene import METAL

    app = Application(RenderConfig(width=32, height=24, max_depth=3,
                                   scene="mesh_demo", camera_model="look_at"))
    app.setup_default_layers()
    app.run(max_frames=1)
    server = ViewerServer(app, port=0)
    httpd = server.start()
    port = httpd.server_address[1]
    try:
        scene = app.render_layer.scene
        s = json.loads(get(port, "/state"))
        meshes = [p for p in s["scene"] if p["prim"] == "mesh"]
        plain = [p for p in s["scene"] if p["prim"] != "mesh"]
        assert len(meshes) == 3 and len(plain) == 2  # ground rect + sphere
        assert sum(m["tris"] for m in meshes) == scene.num_triangles
        ico = next(m for m in meshes if m["tris"] == 320)
        assert str(ico["id"]).startswith("m")

        # material edit fans out to every triangle of that mesh only
        post(port, "/edit", {"op": "update", "id": ico["id"],
                             "field": "mat", "value": "metal"})
        mid = int(str(ico["id"])[1:])
        idx = scene.mesh_indices(mid)
        assert (scene.mat_type[idx] == METAL).all()

        # translating the mesh moves its centroid to the requested point
        target = [c + 1.0 for c in ico["center"]]
        post(port, "/edit", {"op": "update", "id": ico["id"],
                             "field": "center", "value": target})
        np.testing.assert_allclose(scene.center[idx].mean(0), target,
                                   atol=1e-4)

        # xform widgets: scale doubles the extent about a fixed centroid,
        # rotate keeps centroid and extent (round 3)
        def span(ix):
            v0 = scene.center[ix]
            pts = np.concatenate([v0, v0 + scene.edge1[ix],
                                  v0 + scene.edge2[ix]])
            return pts.max(0) - pts.min(0), pts.mean(0)

        d0, c0 = span(idx)
        post(port, "/edit", {"op": "update", "id": ico["id"],
                             "field": "scale", "value": 2.0})
        d1, c1 = span(idx)
        np.testing.assert_allclose(d1, d0 * 2.0, rtol=1e-4)
        np.testing.assert_allclose(c1, c0, atol=1e-4)
        post(port, "/edit", {"op": "update", "id": ico["id"],
                             "field": "rotate_y", "value": 90.0})
        d2, c2 = span(idx)
        np.testing.assert_allclose(c2, c1, atol=1e-4)
        np.testing.assert_allclose(sorted(d2), sorted(d1), rtol=1e-3)

        # deleting the mesh removes all and only its triangles
        n0 = scene.num_active
        post(port, "/edit", {"op": "delete", "id": ico["id"]})
        assert scene.num_active == n0 - 320
        s2 = json.loads(get(port, "/state"))
        assert len([p for p in s2["scene"] if p["prim"] == "mesh"]) == 2
    finally:
        server.stop()
        app.close()


def test_add_mesh_and_obj_upload(served):
    """The panel's add-mesh shapes and the /mesh OBJ-upload endpoint add
    whole mesh groups (round 3)."""
    app, server, port = served
    scene = app.render_layer.scene
    n0 = scene.num_active
    post(port, "/edit", {"op": "add_mesh", "shape": "box",
                         "mat": "metal", "center": [0, 1, 0], "scale": 0.5})
    assert scene.num_active == n0 + 12  # a box is 12 triangles
    assert len(scene.mesh_group_ids()) == 1

    # OBJ upload: a unit quad (2 triangles), fit+rescaled server-side
    obj = "v 0 0 0\nv 4 0 0\nv 4 4 0\nv 0 4 0\nf 1 2 3 4\n"
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/mesh?mat=lambertian&scale=2.0",
        data=obj.encode(), method="POST")
    with urllib.request.urlopen(req) as r:
        out = json.loads(r.read())
    assert out["tris"] == 2
    mid = int(out["id"][1:])
    idx = scene.mesh_indices(mid)
    assert idx.size == 2
    # normalized to a unit box then scaled by 2: vertex extent == 2
    v0s = scene.center[idx]
    e1s, e2s = scene.edge1[idx], scene.edge2[idx]
    pts = np.concatenate([v0s, v0s + e1s, v0s + e2s])
    assert np.isclose(pts[:, 0].max() - pts[:, 0].min(), 2.0, atol=1e-5)
    # spawn point (0, 1, 0) is the bbox center
    assert np.isclose((pts[:, 1].max() + pts[:, 1].min()) / 2, 1.0, atol=1e-5)
    page = get(port, "/").decode()
    for marker in ("icosphere", "torus", "load OBJ", "objfile"):
        assert marker in page, marker


def test_scene_switch_endpoint(served):
    """/options {"scene": name} swaps the world at runtime, re-poses the
    fly camera at the scene's registered pose, and switches the camera
    model to the authored projection (round 3)."""
    from cudaraytracer_tpu.models import scenes as scenes_mod

    app, server, port = served
    s = json.loads(get(port, "/state"))
    assert s["options"]["scene"] == "default"
    assert set(s["options"]["scenes"]) == set(scenes_mod.SCENES)

    post(port, "/options", {"scene": "cornell"})
    rl = app.render_layer
    assert rl.cfg.scene == "cornell" and rl.scene.num_active == 8
    cam0 = scenes_mod.cornell_like_camera()
    np.testing.assert_allclose(rl.fly.position, np.asarray(cam0.origin),
                               atol=1e-5)

    post(port, "/options", {"scene": "rtow_final"})
    assert rl.cfg.camera_model == "look_at"  # authored projection followed
    app.run(max_frames=1)  # renders through the rebuilt pipeline
    s2 = json.loads(get(port, "/state"))
    assert s2["options"]["scene"] == "rtow_final"
    assert len(s2["scene"]) == rl.scene.num_active
    assert "sceneSel" in get(port, "/").decode()

    # unknown names are rejected without changing anything
    try:
        post(port, "/options", {"scene": "nope"})
        raised = False
    except Exception:
        raised = True
    assert raised and rl.cfg.scene == "rtow_final"


def test_status_line_shows_pause_and_spp(served):
    app, server, port = served
    page = get(port, "/").decode()
    assert "id=status" in page and "accumulated" in page
    s = json.loads(get(port, "/state"))
    assert "accumulated_spp" in s["options"] and "paused" in s["options"]


def test_medium_box_add_edit_guard(served):
    """Medium-BOX viewer surface: the smoke-box add path creates a BOX
    prim (always ISOTROPIC), state JSON exposes its half-extents, the
    half_ext edit updates edge1 AND the mirrored size rows, and the
    material is pinned (a surface material on a box would pack a junk
    ptype-5 column — rejected, viewer stays alive)."""
    from cudaraytracer_tpu.models.scene import BOX, ISOTROPIC

    app, server, port = served
    scene = app.render_layer.scene
    n0 = scene.num_active
    post(port, "/edit", {"op": "add", "prim": "box", "mat": "isotropic",
                         "center": [0, 1, 0]})
    assert scene.num_active == n0 + 1
    i = [int(k) for k in scene.active_indices()
         if scene.prim_type[k] == BOX]
    assert len(i) == 1
    i = i[0]
    assert int(scene.mat_type[i]) == ISOTROPIC
    np.testing.assert_allclose(scene.edge1[i], (0.75, 0.75, 0.75))

    s = json.loads(get(port, "/state"))
    box_row = [p for p in s["scene"] if p["prim"] == "box"]
    assert len(box_row) == 1 and box_row[0]["half_ext"] == [0.75] * 3

    post(port, "/edit", {"op": "update", "id": i, "field": "half_ext",
                         "value": [1.0, 0.5, 2.0]})
    np.testing.assert_allclose(scene.edge1[i], (1.0, 0.5, 2.0))
    np.testing.assert_allclose(scene.size[i], (1.0, 0.5))

    # the material combo is pinned server-side: the request errors but
    # the viewer keeps serving (per-request error isolation)
    import urllib.error
    with pytest.raises(urllib.error.HTTPError):
        post(port, "/edit", {"op": "update", "id": i, "field": "mat",
                             "value": "metal"})
    assert int(scene.mat_type[i]) == ISOTROPIC
    assert json.loads(get(port, "/state"))["metrics"]["frames"] >= 1


def test_nee_qmc_toggles_rebuild_xla_renderer(served):
    """REGRESSION (round-5 review): on the XLA accel paths (bvh/brute —
    the CPU default) the NEE/QMC checkboxes must rebuild the Renderer,
    which captures both flags at construction.  Before the fix the
    handlers only forced a scene resync (a pallas-pipeline lever), so
    /state reported the new flag while frames kept the old estimator."""
    app, server, port = served
    rl = app.render_layer
    assert rl.cfg.accel in ("bvh", "brute")  # auto resolves to bvh on CPU
    assert rl.renderer.nee is False and rl.renderer.qmc is False

    post(port, "/options", {"nee": True, "qmc": True})
    assert rl.renderer.nee is True and rl.renderer.qmc is True
    s = json.loads(get(port, "/state"))
    assert s["options"]["nee"] is True and s["options"]["qmc"] is True
    app.run(max_frames=2)  # the rebuilt graph renders finite, lit frames
    img = rl.framebuffer_rgba8()
    assert np.isfinite(img[..., :3]).all() and img[..., :3].sum() > 0

    post(port, "/options", {"nee": False, "qmc": False})
    assert rl.renderer.nee is False and rl.renderer.qmc is False
    app.run(max_frames=1)
