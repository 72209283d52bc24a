"""Independent scalar NumPy port of the reference CPU renderer's semantics.

This is a TEST FIXTURE, not production code: a deliberately naive, recursive,
per-ray transcription of renderer.hpp:129-319 (tracePath,
calculateDirectLighting, randomHemisphereDirection, randomInUnitSphere) used
to statistically validate the JAX engines (SURVEY.md §4 "Golden/statistical
integration"). It shares NO code with path_tracer_ai_tpu.engine — divergence
between the two implementations is exactly what the parity tests detect.
"""

from __future__ import annotations

import dataclasses

import numpy as np

PI = np.pi
DIFFUSE, SPECULAR, DIELECTRIC = 0, 1, 2


@dataclasses.dataclass
class RefScene:
    v0: np.ndarray
    v1: np.ndarray
    v2: np.ndarray
    n0: np.ndarray
    n1: np.ndarray
    n2: np.ndarray
    mat_id: np.ndarray
    # materials
    mtype: np.ndarray
    albedo: np.ndarray
    roughness: np.ndarray
    ior: np.ndarray
    # lights
    light_pos: np.ndarray
    light_color: np.ndarray
    light_intensity: np.ndarray


def scene_from_jax(scene) -> RefScene:
    t, m, l = scene.triangles, scene.materials, scene.lights
    f = lambda a: np.asarray(a)
    return RefScene(
        v0=f(t.v0), v1=f(t.v1), v2=f(t.v2),
        n0=f(t.n0), n1=f(t.n1), n2=f(t.n2),
        mat_id=f(t.mat_id),
        mtype=f(m.mtype), albedo=f(m.albedo), roughness=f(m.roughness), ior=f(m.ior),
        light_pos=f(l.position), light_color=f(l.color), light_intensity=f(l.intensity),
    )


def normalize(v):
    return v / np.linalg.norm(v)


def intersect_all(s: RefScene, o, d, t_min, t_max):
    """Brute-force nearest hit; returns (hit, t, tri_idx, u, v) scalars."""
    eps = 1e-7
    e1 = s.v1 - s.v0
    e2 = s.v2 - s.v0
    h = np.cross(np.broadcast_to(d, e2.shape), e2)
    a = np.sum(e1 * h, axis=1)
    ok = np.abs(a) > eps
    f = np.where(ok, 1.0 / np.where(ok, a, 1.0), 0.0)
    sv = o - s.v0
    u = f * np.sum(sv * h, axis=1)
    q = np.cross(sv, e1)
    v = f * np.sum(np.broadcast_to(d, q.shape) * q, axis=1)
    t = f * np.sum(e2 * q, axis=1)
    ok &= (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) & (t >= t_min) & (t <= t_max)
    t = np.where(ok, t, np.inf)
    i = int(np.argmin(t))
    if not np.isfinite(t[i]):
        return False, np.inf, -1, 0.0, 0.0
    return True, float(t[i]), i, float(u[i]), float(v[i])


def any_hit(s: RefScene, o, d, t_min, t_max) -> bool:
    hit, *_ = intersect_all(s, o, d, t_min, t_max)
    return hit


def random_in_unit_sphere(rng):
    """Exact rejection sampler of renderer.hpp:308-319."""
    while True:
        p = 2.0 * rng.random(3) - 1.0
        if p @ p < 1.0:
            return normalize(p)


def random_hemisphere(rng, n):
    d = random_in_unit_sphere(rng)
    return -d if d @ n < 0.0 else d


def schlick(cos_t, f0):
    x = 1.0 - cos_t
    return f0 + (1.0 - f0) * x**5


def ggx_d(ndh, rough):
    r = min(max(rough, 0.0), 1.0)
    a2 = (r * r) ** 2
    denom = ndh * ndh * (a2 - 1.0) + 1.0
    if denom <= 0.0:
        return 0.0
    return a2 / (PI * denom * denom)


def reflect(i, n):
    return i - 2.0 * (n @ i) * n


def refract(i, n, eta):
    ndi = n @ i
    k = 1.0 - eta * eta * (1.0 - ndi * ndi)
    if k < 0.0:
        return np.zeros(3)
    return eta * i - (eta * ndi + np.sqrt(k)) * n


def direct_lighting(s: RefScene, pos, n, view_dir, mat_idx):
    total = np.zeros(3)
    mtype = s.mtype[mat_idx]
    for li in range(s.light_pos.shape[0]):
        lvec = s.light_pos[li] - pos
        dist = np.linalg.norm(lvec)
        if dist < 1e-4:
            continue
        ldir = lvec / dist
        if any_hit(s, pos + n * 1e-3, ldir, 1e-3, dist - 1e-3):
            continue
        cos_t = max(n @ ldir, 0.0)
        atten = s.light_intensity[li] / (dist * dist)
        if mtype == DIFFUSE:
            brdf = s.albedo[mat_idx] / PI
        elif mtype == SPECULAR:
            half = normalize(ldir + view_dir)
            brdf = s.albedo[mat_idx] * ggx_d(max(n @ half, 0.0), s.roughness[mat_idx])
        else:
            brdf = np.zeros(3)
        contrib = s.light_color[li] * brdf * cos_t * atten
        if np.all(np.isfinite(contrib)):
            total += contrib
    return total


def trace_path(s: RefScene, o, d, depth, max_bounces, rng):
    if depth >= max_bounces:
        return np.zeros(3)
    hit, t, i, u, v = intersect_all(s, o, d, 1e-3, np.inf)
    if not hit:
        return np.zeros(3)
    w = 1.0 - u - v
    n = normalize(w * s.n0[i] + u * s.n1[i] + v * s.n2[i])
    pos = o + t * d
    mi = s.mat_id[i]
    mtype = s.mtype[mi]
    direct = direct_lighting(s, pos, n, -d, mi)

    if mtype == DIFFUSE:
        nd = random_hemisphere(rng, n)
        cos_t = nd @ n
        brdf = s.albedo[mi] / PI
        ind = trace_path(s, pos + n * 1e-3, nd, depth + 1, max_bounces, rng)
        return direct + brdf * ind * cos_t * 2.0 * PI
    if mtype == SPECULAR:
        r = reflect(d, n)
        if s.roughness[mi] > 0.0:
            r = normalize(r + s.roughness[mi] * random_in_unit_sphere(rng))
        cos_t = r @ n
        ind = trace_path(s, pos + n * 1e-3, r, depth + 1, max_bounces, rng)
        return direct + s.albedo[mi] * ind * cos_t
    # DIELECTRIC
    cos_t = (-d) @ n
    etai, etat = 1.0, s.ior[mi]
    nn = n
    if cos_t < 0.0:
        cos_t = -cos_t
        etai, etat = etat, etai
        nn = -n
    sin_t = np.sqrt(max(1.0 - cos_t * cos_t, 0.0))
    ratio = etai / etat
    if ratio * sin_t > 1.0 or rng.random() < schlick(cos_t, (etai - etat) / (etai + etat)):
        nd = reflect(d, nn)
    else:
        nd = refract(d, nn, ratio)
    return trace_path(s, pos + nn * 1e-3, nd, depth + 1, max_bounces, rng)


def render(s: RefScene, cam_pos, cam_forward, cam_right, cam_up, fov_deg,
           width, height, spp, max_bounces, rng, aspect=16.0 / 9.0):
    """Scalar port of Renderer::render (renderer.hpp:40-102)."""
    theta = np.radians(fov_deg)
    vh = 2.0 * np.tan(theta / 2.0)
    vw = vh * aspect
    horizontal = vw * cam_right
    vertical = vh * cam_up
    llc = cam_pos - horizontal / 2 - vertical / 2 + cam_forward

    img = np.zeros((height, width, 3), np.float32)
    for y in range(height):
        for x in range(width):
            color = np.zeros(3)
            valid = 0
            for _ in range(spp):
                u = (x + rng.random()) / (width - 1)
                v = (y + rng.random()) / (height - 1)
                d = normalize(llc + u * horizontal + v * vertical - cam_pos)
                sample = trace_path(s, cam_pos.astype(np.float64), d, 0, max_bounces, rng)
                if np.all(np.isfinite(sample)):
                    color += sample
                    valid += 1
            img[y, x] = color / valid if valid else (1.0, 0.0, 1.0)
    return img
