"""Oracle engine: analytic direct-lighting checks + render plumbing.

Deterministic cases: with max_bounces=1 the radiance is pure direct lighting
(depth-0 shade; the bounce ray dies at the depth cutoff), which has a closed
form for point lights. These pin the estimator to hand-computed values.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from path_tracer_ai_tpu.config import RenderSettings
from path_tracer_ai_tpu.core.types import Lights, MATERIAL_DIFFUSE, MATERIAL_SPECULAR
from path_tracer_ai_tpu.engine import oracle
from path_tracer_ai_tpu.scene.camera import default_camera
from path_tracer_ai_tpu.scene.scene import HostMaterial, build_scene_from_arrays


def one_light(pos, color=(1, 1, 1), intensity=4.0):
    return Lights(
        position=jnp.asarray([pos], jnp.float32),
        color=jnp.asarray([color], jnp.float32),
        intensity=jnp.asarray([intensity], jnp.float32),
    )


def floor_scene(lights, mtype=MATERIAL_DIFFUSE, albedo=(0.9, 0.9, 0.9), rough=0.0):
    """Two large floor triangles at y=0 with a single material (id 0)."""
    mats = [HostMaterial(mtype=mtype, albedo=albedo, roughness=rough)]
    n = [[0, 1, 0]] * 2
    uv = [[0, 0]] * 2
    return build_scene_from_arrays(
        [[-50, 0, -50], [-50, 0, -50]],
        [[50, 0, -50], [50, 0, 50]],
        [[50, 0, 50], [-50, 0, 50]],
        n, n, n, uv, uv, uv, [0, 0],
        materials=mats, lights=lights,
    )


def trace_one(scene, origin, direction, max_bounces=1, seed=0):
    keys = jax.random.split(jax.random.key(seed), 1)
    L, valid = oracle.trace_paths(
        scene,
        jnp.asarray([origin], jnp.float32),
        jnp.asarray([direction], jnp.float32),
        keys,
        max_bounces,
    )
    return np.asarray(L[0]), bool(valid[0])


def test_diffuse_direct_analytic():
    # Light straight above the hit point: cos=1, dist=2 -> atten = 4/4 = 1
    scene = floor_scene(one_light((0, 2, 0), intensity=4.0))
    L, valid = trace_one(scene, (0, 1, 0), (0, -1, 0), max_bounces=1)
    assert valid
    expected = np.asarray([0.9, 0.9, 0.9]) / np.pi  # albedo/pi * cos * atten
    np.testing.assert_allclose(L, expected, rtol=1e-5)


def test_diffuse_direct_oblique_light():
    # Light at 45°: dist = sqrt(2), cos = 1/sqrt(2), atten = I/2
    scene = floor_scene(one_light((1, 1, 0), intensity=4.0))
    L, valid = trace_one(scene, (0, 1, 0), (0, -1, 0), max_bounces=1)
    expected = (np.asarray([0.9, 0.9, 0.9]) / np.pi) * (1 / np.sqrt(2)) * (4.0 / 2.0)
    np.testing.assert_allclose(L, expected, rtol=1e-5)


def test_shadowed_direct_is_black():
    # Blocker triangle between the hit point (0,0,0) and the light (0,2,0)
    lights = one_light((0, 2, 0))
    mats = [HostMaterial(mtype=MATERIAL_DIFFUSE, albedo=(0.9, 0.9, 0.9))]
    n = [[0, 1, 0]] * 3
    uv = [[0, 0]] * 3
    scene = build_scene_from_arrays(
        [[-50, 0, -50], [-50, 0, -50], [-1, 1, -1]],
        [[50, 0, -50], [50, 0, 50], [1, 1, -1]],
        [[50, 0, 50], [-50, 0, 50], [0, 1, 1]],
        n, n, n, uv, uv, uv, [0, 0, 0],
        materials=mats, lights=lights,
    )
    L, valid = trace_one(scene, (0.0, 0.5, 0.0), (0, -1, 0), max_bounces=1)
    assert valid
    np.testing.assert_allclose(L, [0, 0, 0], atol=1e-7)


def test_specular_direct_uses_ggx_d():
    # Smooth-ish specular floor, light overhead, view straight down:
    # half = normalize(l + v) = (0,1,0); NdotH = 1
    from path_tracer_ai_tpu.core.materials import ggx_distribution

    rough = 0.3
    scene = floor_scene(
        one_light((0, 2, 0), intensity=4.0),
        mtype=MATERIAL_SPECULAR, albedo=(1.0, 0.8, 0.0), rough=rough,
    )
    L, valid = trace_one(scene, (0, 1, 0), (0, -1, 0), max_bounces=1)
    d = float(ggx_distribution(1.0, rough))
    expected = np.asarray([1.0, 0.8, 0.0]) * d  # * cos(1) * atten(1)
    np.testing.assert_allclose(L, expected, rtol=1e-4)


def test_miss_is_black_background():
    scene = floor_scene(one_light((0, 2, 0)))
    L, valid = trace_one(scene, (0, 1, 0), (0, 1, 0), max_bounces=5)  # upward: miss
    assert valid
    np.testing.assert_allclose(L, [0, 0, 0], atol=1e-7)


def test_max_bounces_zero_is_black():
    scene = floor_scene(one_light((0, 2, 0)))
    keys = jax.random.split(jax.random.key(0), 1)
    L, _ = oracle.trace_paths(
        scene, jnp.asarray([[0.0, 1, 0]]), jnp.asarray([[0.0, -1, 0]]), keys, 0
    )
    np.testing.assert_allclose(np.asarray(L[0]), [0, 0, 0])


def test_diffuse_bounce_adds_energy():
    """With bounces, radiance > direct-only (diffuse factors nonnegative and
    bounce rays can hit a lit wall)."""
    lights = one_light((0, 2, 0))
    mats = [HostMaterial(mtype=MATERIAL_DIFFUSE, albedo=(0.9, 0.9, 0.9))]
    n_f, n_w = [[0, 1, 0]], [[0, 0, 1]]
    uv = [[0, 0]] * 3
    scene = build_scene_from_arrays(
        # floor y=0 (2 tris) + big wall at z=-3 facing +z
        [[-50, 0, -50], [-50, 0, -50], [-50, -50, -3]],
        [[50, 0, -50], [50, 0, 50], [50, -50, -3]],
        [[50, 0, 50], [-50, 0, 50], [0, 50, -3]],
        n_f * 2 + n_w, n_f * 2 + n_w, n_f * 2 + n_w,
        uv, uv, uv, [0, 0, 0],
        materials=mats, lights=lights,
    )
    keys = jax.random.split(jax.random.key(3), 256)
    o = jnp.broadcast_to(jnp.asarray([0.0, 1, 0]), (256, 3))
    d = jnp.broadcast_to(jnp.asarray([0.0, -1, 0]), (256, 3))
    L1, _ = oracle.trace_paths(scene, o, d, keys, 1)
    L3, _ = oracle.trace_paths(scene, o, d, keys, 3)
    assert float(jnp.mean(L3)) > float(jnp.mean(L1))


def test_render_shapes_and_determinism():
    scene = floor_scene(one_light((0, 2, 0)))
    cam = default_camera()
    s = RenderSettings(width=16, height=9, samples_per_pixel=2, max_bounces=2, seed=7)
    img1 = oracle.render(scene, cam, s, chunk_pixels=64)
    img2 = oracle.render(scene, cam, s, chunk_pixels=144)
    assert img1.shape == (9, 16, 3)
    assert np.isfinite(img1).all()
    # same seed, different chunking -> identical image (counter-based RNG)
    np.testing.assert_allclose(img1, img2, atol=1e-6)


def test_render_spp_chunk_matches_whole_loop():
    """spp_chunk bounds device executions (axon watchdog); per-sample math
    is identical, only f32 accumulation grouping changes."""
    scene = floor_scene(one_light((0, 2, 0)))
    cam = default_camera()
    s = RenderSettings(width=12, height=7, samples_per_pixel=9, max_bounces=2, seed=3)
    whole = oracle.render(scene, cam, s)
    for sc in (1, 4, 9, 100):
        chunked = oracle.render(scene, cam, s, spp_chunk=sc)
        np.testing.assert_allclose(chunked, whole, atol=1e-5)


def test_render_seed_changes_noise():
    scene = floor_scene(one_light((0, 2, 0)))
    cam = default_camera()
    s1 = RenderSettings(width=8, height=5, samples_per_pixel=2, max_bounces=2, seed=1)
    s2 = s1.replace(seed=2)
    img1 = oracle.render(scene, cam, s1)
    img2 = oracle.render(scene, cam, s2)
    assert not np.allclose(img1, img2)


def test_invalid_material_id_returns_magenta():
    """materialId >= materials.size() -> magenta from that vertex and the
    path terminates (renderer.hpp:142-157)."""
    lights = one_light((0, 2, 0))
    mats = [HostMaterial(mtype=MATERIAL_DIFFUSE, albedo=(0.5, 0.5, 0.5))]
    n = [[0, 1, 0]] * 2
    uv = [[0, 0]] * 2
    scene = build_scene_from_arrays(
        [[-50, 0, -50], [-50, 0, -50]],
        [[50, 0, -50], [50, 0, 50]],
        [[50, 0, 50], [-50, 0, 50]],
        n, n, n, uv, uv, uv, [7, 7],  # out of range: table has 1 entry
        materials=mats, lights=lights,
    )
    L, valid = trace_one(scene, (0, 1, 0), (0, -1, 0), max_bounces=3)
    assert valid
    np.testing.assert_allclose(L, [1.0, 0.0, 1.0])


def test_direct_light_sum_overflow_returns_black():
    """Per-light contributions that are each finite but whose SUM overflows
    to inf trip the whole-sum isValidColor(directLight) early return: black
    from this vertex, path terminated (renderer.hpp:161-163)."""
    huge = Lights(
        # 1 unit above the hit point at the origin: attenuation = I/1.
        position=jnp.asarray([[0, 1, 0], [0, 1, 0]], jnp.float32),
        color=jnp.asarray([[1, 1, 1], [1, 1, 1]], jnp.float32),
        # each contribution = (albedo/pi) * I ~ 3.2e38 (finite);
        # the two-light sum overflows f32 to inf.
        intensity=jnp.asarray([3.4e38, 3.4e38], jnp.float32),
    )
    scene = floor_scene(huge, albedo=(3.0, 3.0, 3.0))
    L, valid = trace_one(scene, (0, 1, 0), (0, -1, 0), max_bounces=4)
    assert valid
    # nothing added at the overflowing vertex; deeper bounces cancelled
    np.testing.assert_allclose(L, [0.0, 0.0, 0.0])
