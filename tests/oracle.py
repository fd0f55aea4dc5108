"""Scalar NumPy oracle path tracer.

A direct, slow transliteration of the reference's radiance algorithm
(reference: CudaRayTracer/src/Cuda/Kernel.cu:30-158 + Material.cuh +
Texture.cuh), used as the golden model for statistical comparison with the
vectorized JAX renderer (SURVEY.md §4 test plan item b).  Python loops,
NumPy RNG — intentionally nothing shared with the production code paths.

Beyond-reference coverage mirrored here so the golden model spans the
framework's own additions: scalar Möller–Trumbore triangles with two-sided
face normals and smooth per-vertex-normal shading, the RTOW look_at
thin-lens camera (row 0 = top), and nearest-texel image textures with
per-primitive (u, v) (sphere GetSphereUV / rect in-plane fractions /
triangle barycentrics, optionally through per-vertex uv rows).
"""

from __future__ import annotations

import numpy as np


def _sphere_hit(o, d, c, r, t_min, t_max):
    oc = o - c
    a = d @ d
    b = oc @ d
    cc = oc @ oc - r * r
    disc = b * b - a * cc
    if disc <= 0:
        return None
    for sgn in (-1.0, 1.0):
        t = (-b + sgn * np.sqrt(disc)) / a
        if t_min < t < t_max:
            return t
    return None


def _rect_hit(o, d, ptype, center, size, t_min, t_max):
    k_ax = {1: 2, 2: 1, 3: 0}[ptype]
    a_ax = {1: 0, 2: 0, 3: 1}[ptype]
    b_ax = {1: 1, 2: 2, 3: 2}[ptype]
    ext_a = size[0] if ptype in (1, 2) else size[1]
    ext_b = size[1] if ptype in (1, 2) else size[0]
    if d[k_ax] == 0:
        return None
    t = (center[k_ax] - o[k_ax]) / d[k_ax]
    if not (t_min < t < t_max):
        return None
    pa = o[a_ax] + t * d[a_ax]
    pb = o[b_ax] + t * d[b_ax]
    if abs(pa - center[a_ax]) > ext_a / 2 or abs(pb - center[b_ax]) > ext_b / 2:
        return None
    return t


def _tri_hit(o, d, v0, e1, e2, t_min, t_max):
    """Möller–Trumbore, scalar; returns (t, u, v) or None."""
    pv = np.cross(d, e2)
    det = e1 @ pv
    if abs(det) < 1e-9:
        return None
    inv = 1.0 / det
    tv = o - v0
    u = (tv @ pv) * inv
    if u < 0.0 or u > 1.0:
        return None
    qv = np.cross(tv, e1)
    v = (d @ qv) * inv
    if v < 0.0 or u + v > 1.0:
        return None
    t = (e2 @ qv) * inv
    if not (t_min < t < t_max):
        return None
    return t, u, v


def _medium_hit(o, d, c, r, density, rng, t_min, t_max):
    """RTOW ConstantMedium::Hit transliterated for a sphere boundary:
    both quadratic roots bound the chord, entry clamps to t_min, scatter
    at -log(u)/density world units from entry."""
    oc = o - c
    a = d @ d
    b = oc @ d
    cc = oc @ oc - r * r
    disc = b * b - a * cc
    if disc <= 0:
        return None
    sq = np.sqrt(disc)
    t0 = (-b - sq) / a
    t1 = (-b + sq) / a
    te = max(t0, t_min)
    if t1 <= te:
        return None
    dlen = np.sqrt(a)
    hit_dist = -np.log(max(rng.random_sample(), 1e-12)) / density
    t = te + hit_dist / dlen
    if t >= t1 or t >= t_max:
        return None
    return t


def _medium_box_hit(o, d, c, he, density, rng, t_min, t_max, yaw=0.0):
    """Constant-density medium bounded by a BOX (RTOW book-2
    ConstantMedium with a box boundary): the slab chord bounds the
    interior; scatter at entry + exp-sampled distance.  ``yaw`` rotates
    the box about world Y through its center (RTOW rotate_y): the ray is
    rotated into object space; rotation preserves lengths so the
    object-space t applies to the world ray unchanged."""
    if yaw:
        cy, sy = np.cos(yaw), np.sin(yaw)
        oc = o - c
        o = np.array([cy * oc[0] - sy * oc[2], oc[1],
                      sy * oc[0] + cy * oc[2]])
        d = np.array([cy * d[0] - sy * d[2], d[1],
                      sy * d[0] + cy * d[2]])
        c = np.zeros(3)
    inv = 1.0 / np.where(d == 0.0, 1e-30, d)
    t0 = (c - he - o) * inv
    t1 = (c + he - o) * inv
    tn = np.minimum(t0, t1).max()
    tf = np.maximum(t0, t1).min()
    te = max(tn, t_min)
    if tf <= te:
        return None
    dlen = np.linalg.norm(d)
    hit_dist = -np.log(max(rng.random_sample(), 1e-12)) / density
    t = te + hit_dist / dlen
    if t >= tf or t >= t_max:
        return None
    return t


def _center_at(scene, i, time):
    """Sphere center at the path's shutter time (motion blur; static
    prims have zero velocity)."""
    return scene.center[i] + time * scene.velocity[i]


def _closest_hit(scene, o, d, t_min=1e-3, rng=None, time=0.0):
    best_t, best_i, best_uv = 3.4e38, -1, (0.0, 0.0)
    for i in scene.active_indices():
        pt = int(scene.prim_type[i])
        if pt == 0 and int(scene.mat_type[i]) == 4:  # isotropic medium
            t = _medium_hit(o, d, scene.center[i], scene.size[i][0],
                            float(scene.density[i]), rng, t_min, best_t)
        elif pt == 5:  # box-bounded isotropic medium
            t = _medium_box_hit(o, d, scene.center[i].astype(float),
                                np.abs(scene.edge1[i]).astype(float),
                                float(scene.density[i]), rng, t_min,
                                best_t, yaw=float(scene.edge2[i, 0]))
        elif pt == 0:
            t = _sphere_hit(o, d, _center_at(scene, i, time),
                            scene.size[i][0], t_min, best_t)
        elif pt == 4:
            r = _tri_hit(o, d, scene.center[i].astype(float),
                         scene.edge1[i].astype(float),
                         scene.edge2[i].astype(float), t_min, best_t)
            if r is not None:
                best_t, best_i, best_uv = r[0], i, (r[1], r[2])
            continue
        else:
            t = _rect_hit(o, d, pt, scene.center[i], scene.size[i], t_min, best_t)
        if t is not None:
            best_t, best_i = t, i
    return (best_i, best_t, best_uv) if best_i >= 0 else (None, None, None)


def _rand_in_sphere(rng):
    while True:  # true rejection sampling like the reference (Math.cuh:252-260)
        p = 2.0 * rng.random_sample(3) - 1.0
        if p @ p < 1.0:
            return p


def _hit_uv(scene, i, p, buv):
    """(u, v) of the hit — sphere GetSphereUV (Hittable.cuh:117-125), rect
    in-plane fractions (Hittable.cuh:139-277), triangle barycentrics
    (optionally interpolated through per-vertex uv rows)."""
    pt = int(scene.prim_type[i])
    if pt == 0:
        n = (p - scene.center[i]) / scene.size[i][0]
        theta = np.arccos(np.clip(-n[1], -1.0, 1.0))
        phi = np.arctan2(-n[2], n[0]) + np.pi
        return phi / (2 * np.pi), theta / np.pi
    if pt == 4:
        u, v = buv
        uv0, uv1, uv2 = scene.uv0[i], scene.uv1[i], scene.uv2[i]
        out = uv0 + u * (uv1 - uv0) + v * (uv2 - uv0)
        return float(out[0]), float(out[1])
    k_ax = {1: 2, 2: 1, 3: 0}[pt]
    a_ax = {1: 0, 2: 0, 3: 1}[pt]
    b_ax = {1: 1, 2: 2, 3: 2}[pt]
    ext_a = scene.size[i][0] if pt in (1, 2) else scene.size[i][1]
    ext_b = scene.size[i][1] if pt in (1, 2) else scene.size[i][0]
    u = (p[a_ax] - (scene.center[i][a_ax] - 0.5 * ext_a)) / max(ext_a, 1e-12)
    v = (p[b_ax] - (scene.center[i][b_ax] - 0.5 * ext_b)) / max(ext_b, 1e-12)
    return u, v


def _texture(scene, i, p, buv=(0.0, 0.0)):
    tt = int(scene.tex_type[i])
    if tt == 0:
        return scene.albedo[i].astype(np.float64)
    if tt == 1:
        sines = np.sin(10 * p[0]) * np.sin(10 * p[1]) * np.sin(10 * p[2])
        return (scene.albedo[i] if sines < 0 else scene.albedo2[i]).astype(np.float64)
    if tt == 3:
        # noise/marble (BEYOND-REFERENCE): lerp(albedo2, albedo, factor)
        # with tex_id repurposed as the integer marble scale.  Uses the
        # shared xp-generic math (ops/noise.py) with NumPy in f32 — the
        # hash amplifies rounding, so the oracle must evaluate the same
        # f32 op sequence the renderers do (noise.py "Numerical note").
        from cudaraytracer_tpu.ops.noise import marble_factor
        scale = np.float32(max(int(scene.tex_id[i]), 1))
        fac = float(marble_factor(np.float32(p[0]), np.float32(p[1]),
                                  np.float32(p[2]), scale, xp=np))
        a = scene.albedo[i].astype(np.float64)
        b = scene.albedo2[i].astype(np.float64)
        return b + fac * (a - b)
    # image: clamp u, flip v, nearest texel (Texture.cuh:81-105 /
    # ops/textures.py) — missing/empty slots return the reference's cyan
    tid = int(scene.tex_id[i])
    if tid < 0 or tid >= scene.atlas.shape[0]:
        return np.array([0.0, 1.0, 1.0])
    h, w = int(scene.tex_hw[tid][0]), int(scene.tex_hw[tid][1])
    if h <= 0 or w <= 0:
        return np.array([0.0, 1.0, 1.0])
    u, v = _hit_uv(scene, i, p, buv)
    uu = min(max(u, 0.0), 1.0)
    vv = 1.0 - min(max(v, 0.0), 1.0)
    col = min(int(uu * w), w - 1)
    row = min(int(vv * h), h - 1)
    return scene.atlas[tid, row, col].astype(np.float64) / 255.0


def _reflect(v, n):
    return v - 2 * (v @ n) * n


def trace_ray(scene, o, d, max_depth, rng, t_min=1e-3):
    """color() (Kernel.cu:30-80) transliterated."""
    throughput = np.ones(3)
    # one shutter time per path (RTOW book-2 camera::get_ray); only drawn
    # for scenes with motion, so static scenes keep their exact
    # historical rng streams
    time = (rng.random_sample()
            if (scene.velocity[scene.active_indices()] != 0).any() else 0.0)
    for _ in range(max_depth):
        i, t, buv = _closest_hit(scene, o, d, t_min, rng=rng, time=time)
        if i is None:
            unit = d / np.linalg.norm(d)
            s = 0.5 * (unit[1] + 1.0)
            sky = (1 - s) * scene.background_start + s * scene.background_end
            return throughput * sky
        p = o + t * d
        mat = int(scene.mat_type[i])
        pt = int(scene.prim_type[i])
        if pt == 0:
            normal = (p - _center_at(scene, i, time)) / scene.size[i][0]
        elif pt == 4:
            # triangle: two-sided face normal; smooth shading interpolates
            # per-vertex normals and flips them to the geometric front side
            # (intersect.make_hit_record semantics)
            e1 = scene.edge1[i].astype(float)
            e2 = scene.edge2[i].astype(float)
            n = np.cross(e1, e2)
            n /= max(np.linalg.norm(n), 1e-20)
            front = d @ n < 0
            normal = n if front else -n
            vn0 = scene.vnorm0[i].astype(float)
            if (np.abs(vn0) > 0).any():
                u, v = buv
                ni = (vn0 + u * (scene.vnorm1[i] - scene.vnorm0[i])
                      + v * (scene.vnorm2[i] - scene.vnorm0[i]))
                ln = np.linalg.norm(ni)
                if ln > 1e-8:
                    ni = ni / ln
                    normal = ni if front else -ni
        elif pt == 5:
            # box medium boundary is invisible: arbitrary unit normal,
            # never used (mat is always ISOTROPIC — isotropic phase)
            normal = np.array([1.0, 0.0, 0.0])
        else:
            k_ax = {1: 2, 2: 1, 3: 0}[pt]
            outward = np.zeros(3)
            outward[k_ax] = 1.0
            normal = outward if d @ outward < 0 else -outward
        if mat == 3:  # diffuse light
            return throughput * scene.light[i] * _texture(scene, i, p, buv)
        if mat == 4:  # isotropic medium (RTOW book-2 Isotropic::Scatter)
            nd = _rand_in_sphere(rng)
            throughput = throughput * _texture(scene, i, p, buv)
        elif mat == 0:  # lambertian
            nd = normal + _rand_in_sphere(rng)
            throughput = throughput * _texture(scene, i, p, buv)
        elif mat == 1:  # metal
            refl = _reflect(d / np.linalg.norm(d), normal)
            nd = refl + scene.fuzz[i] * _rand_in_sphere(rng)
            if nd @ normal <= 0:
                return np.zeros(3)
            throughput = throughput * _texture(scene, i, p, buv)
        else:  # dielectric (Material.cuh:104-136)
            ir = float(scene.ior[i])
            ddn = d @ normal
            dlen = np.linalg.norm(d)
            if ddn > 0:
                outward, ni = -normal, ir
                cosine = np.sqrt(max(0.0, 1 - ir * ir * (1 - (ddn / dlen) ** 2)))
            else:
                outward, ni = normal, 1.0 / ir
                cosine = -ddn / dlen
            uv = d / dlen
            dt = uv @ outward
            disc = 1.0 - ni * ni * (1 - dt * dt)
            if disc > 0:
                r0 = ((1 - ir) / (1 + ir)) ** 2
                reflect_prob = r0 + (1 - r0) * (1 - cosine) ** 5
            else:
                reflect_prob = 1.0
            if rng.random_sample() < reflect_prob:
                nd = _reflect(d, normal)
            else:
                nd = ni * (uv - outward * dt) - outward * np.sqrt(disc)
        o, d = p, nd
    return np.zeros(3)


def render_look_at(scene, cam_origin, forward, width, height, spp, max_depth,
                   seed, fov_deg=45.0, focus_dist=10.0):
    """RTOW thin-lens look_at render, aperture 0 (camera.look_at_frame /
    generate_rays_look_at transliterated).  Row 0 = image TOP, matching the
    production look_at raygen; directions unnormalized like production."""
    rng = np.random.RandomState(seed)
    origin = np.asarray(cam_origin, float)
    fwd = np.asarray(forward, float)
    w = -fwd / np.linalg.norm(fwd)
    world_up = np.array([0.0, 1.0, 0.0])
    u_axis = np.cross(world_up, w)
    u_axis /= np.linalg.norm(u_axis)
    v_axis = np.cross(w, u_axis)
    half_h = np.tan(np.radians(fov_deg) / 2.0)
    half_w = (width / height) * half_h
    lower_left = (origin - half_w * focus_dist * u_axis
                  - half_h * focus_dist * v_axis - focus_dist * w)
    horizontal = 2.0 * half_w * focus_dist * u_axis
    vertical = 2.0 * half_h * focus_dist * v_axis

    img = np.zeros((height, width, 3))
    for y in range(height):
        for x in range(width):
            col = np.zeros(3)
            for _ in range(spp):
                s = (x + rng.random_sample()) / width
                t = (height - 1.0 - y + rng.random_sample()) / height
                d = lower_left + s * horizontal + t * vertical - origin
                col += trace_ray(scene, origin, d, max_depth, rng)
            img[y, x] = col / spp
    return img.astype(np.float32)


def render(scene, cam_origin, forward, width, height, spp, max_depth, seed,
           fov_deg=45.0, near=0.1, far=10.0):
    """Two-plane camera render (Kernel.cu:130-148 transliterated).
    Returns mean radiance f32[H,W,3] (framebuffer order: row 0 = v>0 side).
    """
    rng = np.random.RandomState(seed)
    origin = np.asarray(cam_origin, float)
    fwd = np.asarray(forward, float)
    fwd = fwd / np.linalg.norm(fwd)
    wup = np.array([0.0, 1.0, 0.0])
    right0 = np.cross(fwd, wup)
    right0 /= np.linalg.norm(right0)
    up = np.cross(fwd, right0)
    up /= np.linalg.norm(up)
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    fov = np.radians(fov_deg)

    img = np.zeros((height, width, 3))
    for y in range(height):
        for x in range(width):
            col = np.zeros(3)
            for _ in range(spp):
                u = ((x - width / 2.0) + rng.random_sample()) / width
                v = ((height / 2.0 - y) + rng.random_sample()) / width
                dist = u * right + v * up
                start = near * dist + origin + fov * fwd
                second = far * dist + (1.0 / fov * 10.0) * fwd + origin
                d = second - start
                d /= np.linalg.norm(d)
                col += trace_ray(scene, start, d, max_depth, rng)
            img[y, x] = col / spp
    return img.astype(np.float32)
