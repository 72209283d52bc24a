"""Shading semantics shared by the oracle and wavefront engines.

This module is the exact radiance semantics of the reference CPU renderer
(the ground truth — renderer.hpp:129-301), recast from recursion into
throughput-carrying batch form (SURVEY.md §7 "Recursion -> iteration"):

    recursive:  L(depth) = direct + f * L(depth+1)        (per material f)
    iterative:  L += beta * direct;  beta *= f

with per-material factors f:
    DIFFUSE    f = (albedo/pi) * cos * 2pi = 2 * albedo * cos   (renderer.hpp:187)
    SPECULAR   f = albedo * cos                                  (renderer.hpp:211)
    DIELECTRIC f = 1, and the direct term is NOT added           (renderer.hpp:245)

All functions are branchless masked-lane computations over [N] ray batches.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax.numpy as jnp

from path_tracer_ai_tpu.core import materials as mat_utils
from path_tracer_ai_tpu.core import vec
from path_tracer_ai_tpu.core.types import (
    LIGHT_MIN_DIST,
    MATERIAL_DIELECTRIC,
    MATERIAL_DIFFUSE,
    MATERIAL_SPECULAR,
    RAY_EPS,
    Lights,
    MaterialTable,
)

PI = mat_utils.PI

# occlude_fn(origins [K,3], directions [K,3], t_max [K]) -> occluded [K] bool
OccludeFn = Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray]


class MaterialLanes(NamedTuple):
    """Per-lane gathered material columns."""

    mtype: jnp.ndarray      # [N] i32
    albedo: jnp.ndarray     # [N,3]
    roughness: jnp.ndarray  # [N]
    ior: jnp.ndarray        # [N]


def gather_materials(table: MaterialTable, mat_id: jnp.ndarray) -> MaterialLanes:
    return MaterialLanes(
        mtype=table.mtype[mat_id],
        albedo=table.albedo[mat_id],
        roughness=table.roughness[mat_id],
        ior=table.ior[mat_id],
    )


def direct_lighting(
    lights: Lights,
    occlude_fn: OccludeFn,
    position: jnp.ndarray,   # [N,3] hit points
    normal: jnp.ndarray,     # [N,3] shading normals (normalized)
    view_dir: jnp.ndarray,   # [N,3] -ray.direction
    mats: MaterialLanes,
    active: jnp.ndarray,     # [N] lanes that actually hit something
) -> jnp.ndarray:
    """calculateDirectLighting (renderer.hpp:252-301) over a lane batch.

    All L lights' shadow rays are batched into ONE occlusion query of size
    L*N so the traversal backend sees a single big wave.

    Per light: shadow ray from position + normal*eps toward the light with
    t_max = dist - eps; unoccluded contribution
    color * brdf * max(dot(n, l), 0) * intensity / dist^2, where brdf is
    albedo/pi (diffuse) or albedo * GGX_D(NdotH) (specular), 0 (dielectric —
    the reference computes an uninitialized brdf there and then discards the
    whole direct term, renderer.hpp:214-246).

    Contributions with non-finite components are dropped per light, mirroring
    isValidColor on each light contribution (renderer.hpp:295-297).
    """
    n_lanes = position.shape[0]
    n_lights = lights.position.shape[0]

    # Inactive lanes (missed rays) carry position = inf, which would turn
    # into NaN shadow directions and poison the traversal's sort/cull (a NaN
    # block conservatively matches EVERY cluster). Pin them to a degenerate
    # no-op query: origin 0, +x direction, t_max < t_min.
    position = jnp.where(active[..., None], position, 0.0)
    normal = jnp.where(active[..., None], normal, 0.0)

    lp = lights.position[:, None, :]                      # [L,1,3]
    lvec = lp - position[None, :, :]                      # [L,N,3]
    dist = vec.length(lvec)                               # [L,N]
    too_close = dist < LIGHT_MIN_DIST                     # (renderer.hpp:263)
    unit_x = jnp.asarray([1.0, 0.0, 0.0], jnp.float32)
    ldir = jnp.where(
        active[None, :, None], lvec / jnp.maximum(dist, 1e-30)[..., None], unit_x
    )

    shadow_origin = position + normal * RAY_EPS           # [N,3]
    so = jnp.broadcast_to(shadow_origin[None], (n_lights, n_lanes, 3))

    cos_theta = jnp.maximum(vec.dot(normal[None], ldir), 0.0)   # [L,N]
    attenuation = lights.intensity[:, None] / (dist * dist)

    # Trace shadow rays only where the contribution can be nonzero: the
    # reference traces unconditionally (renderer.hpp:274-278), but pairs
    # with cos <= 0 (light below the surface horizon) and dielectric lanes
    # (direct term discarded, renderer.hpp:214-246) contribute exactly 0
    # either way, so skipping them is radiance-identical.
    contributes = (
        active[None]
        & (cos_theta > 0.0)
        & (mats.mtype != MATERIAL_DIELECTRIC)[None]
    )
    t_max = jnp.where(contributes, dist - RAY_EPS, -1.0)  # (renderer.hpp:275)

    if getattr(occlude_fn, "lane_major", False):
        # Lane-major layout: each lane's L same-origin shadow rays are
        # CONSECUTIVE, so a backend that groups blocks of L rays culls the
        # lane's shared-origin union once (the per-lane shadow reuse the
        # light-major layout cannot express). Occlusion is exact, so the
        # result is bit-identical to the light-major path.
        occluded = occlude_fn(
            jnp.swapaxes(so, 0, 1).reshape(-1, 3),
            jnp.swapaxes(ldir, 0, 1).reshape(-1, 3),
            jnp.swapaxes(t_max, 0, 1).reshape(-1),
        ).reshape(n_lanes, n_lights).T
    else:
        occluded = occlude_fn(
            so.reshape(-1, 3), ldir.reshape(-1, 3), t_max.reshape(-1)
        ).reshape(n_lights, n_lanes)

    # BRDF per material type (renderer.hpp:283-291).
    brdf_diffuse = mats.albedo / PI                              # [N,3]
    half = vec.normalize(ldir + view_dir[None])                  # [L,N,3]
    n_dot_h = jnp.maximum(vec.dot(normal[None], half), 0.0)      # [L,N]
    d_term = mat_utils.ggx_distribution(n_dot_h, mats.roughness[None])
    brdf_specular = mats.albedo[None] * d_term[..., None]        # [L,N,3]

    is_diffuse = mats.mtype == MATERIAL_DIFFUSE
    is_specular = mats.mtype == MATERIAL_SPECULAR
    brdf = jnp.where(
        is_diffuse[None, :, None],
        brdf_diffuse[None],
        jnp.where(is_specular[None, :, None], brdf_specular, 0.0),
    )

    contrib = lights.color[:, None, :] * brdf * (cos_theta * attenuation)[..., None]
    lit = active[None] & ~occluded & ~too_close
    finite = jnp.all(jnp.isfinite(contrib), axis=-1)      # isValidColor per light
    contrib = jnp.where((lit & finite)[..., None], contrib, 0.0)
    return jnp.sum(contrib, axis=0)                       # [N,3]


class BsdfSample(NamedTuple):
    direction: jnp.ndarray    # [N,3] next ray direction
    origin: jnp.ndarray       # [N,3] next ray origin (offset off the surface)
    throughput: jnp.ndarray   # [N,3] multiplicative factor f
    adds_direct: jnp.ndarray  # [N] bool: direct light added at this vertex?


def sample_bsdf(
    ray_dir: jnp.ndarray,       # [N,3] incident direction (toward surface)
    position: jnp.ndarray,      # [N,3]
    normal: jnp.ndarray,        # [N,3] normalized shading normal
    mats: MaterialLanes,
    sphere_sample: jnp.ndarray,  # [N,3] uniform unit-sphere directions
    fresnel_u: jnp.ndarray,      # [N] uniform [0,1)
) -> BsdfSample:
    """The material switch of tracePath (renderer.hpp:166-247), branchless.

    One unit-sphere draw serves both the diffuse hemisphere flip and the
    specular roughness perturbation (a lane is exactly one material type, so
    the streams never overlap); `fresnel_u` drives the dielectric
    reflect/refract choice.
    """
    # --- DIFFUSE (renderer.hpp:167-188): uniform hemisphere, f = 2*albedo*cos.
    hemi = jnp.where(
        (vec.dot(sphere_sample, normal) < 0.0)[..., None], -sphere_sample, sphere_sample
    )
    cos_d = vec.dot(hemi, normal)
    f_diffuse = 2.0 * mats.albedo * cos_d[..., None]

    # --- SPECULAR (renderer.hpp:190-212): perturbed mirror, f = albedo*cos.
    refl = vec.reflect(ray_dir, normal)
    perturbed = vec.normalize(refl + mats.roughness[..., None] * sphere_sample)
    spec_dir = jnp.where((mats.roughness > 0.0)[..., None], perturbed, refl)
    cos_s = vec.dot(spec_dir, normal)  # may be negative; reference keeps it
    f_specular = mats.albedo * cos_s[..., None]

    # --- DIELECTRIC (renderer.hpp:214-246): Schlick/TIR reflect-or-refract.
    cos_i = vec.dot(-ray_dir, normal)
    entering = cos_i >= 0.0
    n_or = jnp.where(entering[..., None], normal, -normal)
    cos_abs = jnp.abs(cos_i)
    etai = jnp.where(entering, 1.0, mats.ior)
    etat = jnp.where(entering, mats.ior, 1.0)
    ratio = etai / etat
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_abs * cos_abs, 0.0))
    tir = ratio * sin_theta > 1.0
    # Reference passes F0 = (etai-etat)/(etai+etat) UNSQUARED (renderer.hpp:230).
    f0 = (etai - etat) / (etai + etat)
    fresnel = mat_utils.schlick_fresnel(cos_abs, f0)
    choose_reflect = tir | (fresnel_u < fresnel)
    diel_dir = jnp.where(
        choose_reflect[..., None],
        vec.reflect(ray_dir, n_or),
        vec.refract(ray_dir, n_or, ratio),
    )

    # --- select by material type -------------------------------------------
    is_diffuse = (mats.mtype == MATERIAL_DIFFUSE)[..., None]
    is_specular = (mats.mtype == MATERIAL_SPECULAR)[..., None]
    is_dielectric = (mats.mtype == MATERIAL_DIELECTRIC)[..., None]

    direction = jnp.where(
        is_diffuse, hemi, jnp.where(is_specular, spec_dir, diel_dir)
    )
    throughput = jnp.where(
        is_diffuse, f_diffuse, jnp.where(is_specular, f_specular, 1.0)
    )
    # Bounce origins: +normal*eps for diffuse/specular (renderer.hpp:169,195),
    # +oriented_normal*eps for dielectric (renderer.hpp:244).
    offset_n = jnp.where(is_dielectric, n_or, normal)
    origin = position + offset_n * RAY_EPS

    return BsdfSample(
        direction=direction,
        origin=origin,
        throughput=throughput,
        adds_direct=~is_dielectric[..., 0],
    )
