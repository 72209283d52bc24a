"""Camera tests: basis construction + ray generation vs closed form."""

import numpy as np
import jax.numpy as jnp

from path_tracer_ai_tpu.scene.camera import default_camera, get_rays, make_camera


def test_default_camera_basis():
    cam = default_camera()
    fwd = np.asarray(cam.forward)
    # position (0,2,5) -> target (0,1.8,0): forward mostly -z, slightly down
    expected = np.array([0.0, -0.2, -5.0])
    expected /= np.linalg.norm(expected)
    np.testing.assert_allclose(fwd, expected, atol=1e-6)
    # orthonormal-ish basis (up is NOT renormalized in the reference, but
    # right x forward with unit inputs keeps it unit here)
    np.testing.assert_allclose(np.dot(fwd, np.asarray(cam.right)), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.dot(fwd, np.asarray(cam.up)), 0.0, atol=1e-6)


def test_center_ray_is_forward():
    cam = default_camera()
    o, d = get_rays(cam, jnp.asarray([0.5]), jnp.asarray([0.5]), 16.0 / 9.0)
    np.testing.assert_allclose(np.asarray(d[0]), np.asarray(cam.forward), atol=1e-6)
    np.testing.assert_allclose(np.asarray(o[0]), np.asarray(cam.position), atol=1e-6)


def test_ray_matches_closed_form():
    cam = make_camera((1, 2, 3), (4, 5, 6), (0, 1, 0), 60.0)
    u, v = 0.2, 0.7
    aspect = 16.0 / 9.0
    h = np.tan(np.radians(60.0) / 2)
    vh, vw = 2 * h, 2 * h * aspect
    horiz = vw * np.asarray(cam.right)
    vert = vh * np.asarray(cam.up)
    llc = -horiz / 2 - vert / 2 + np.asarray(cam.forward)
    expected = llc + u * horiz + v * vert
    expected /= np.linalg.norm(expected)
    _, d = get_rays(cam, jnp.asarray([u]), jnp.asarray([v]), aspect)
    np.testing.assert_allclose(np.asarray(d[0]), expected, atol=1e-6)


def test_hardcoded_aspect_quirk():
    """The reference CPU camera uses 16:9 even for square frames
    (camera.hpp:22) — fixed mode must ignore resolution."""
    cam = default_camera()
    _, d_169 = get_rays(cam, jnp.asarray([0.0]), jnp.asarray([0.5]), 16.0 / 9.0)
    _, d_sq = get_rays(cam, jnp.asarray([0.0]), jnp.asarray([0.5]), 1.0)
    assert not np.allclose(np.asarray(d_169), np.asarray(d_sq))


def test_v_increases_upward():
    cam = default_camera()
    _, d = get_rays(cam, jnp.asarray([0.5, 0.5]), jnp.asarray([0.0, 1.0]), 16.0 / 9.0)
    up = np.asarray(cam.up)
    assert float(np.dot(np.asarray(d[1]) - np.asarray(d[0]), up)) > 0
