import jax.numpy as jnp
import numpy as np

from topo4d_tpu.core.camera import (
    full_projection_matrix,
    make_camera,
    ndc_to_pixel,
    project_points,
    world_to_view,
)
from topo4d_tpu.testing import make_synthetic_camera


def torch_style_full_proj(fx, fy, cx, cy, w, h, w2c, near=0.01, far=100.0):
    """Independent NumPy transcription of reference helpers.py:63-72."""
    p = np.array(
        [
            [2 * fx / w, 0.0, -(w - 2 * cx) / w, 0.0],
            [0.0, 2 * fy / h, -(h - 2 * cy) / h, 0.0],
            [0.0, 0.0, far / (far - near), -(far * near) / (far - near)],
            [0.0, 0.0, 1.0, 0.0],
        ]
    )
    # reference computes w2c^T @ proj^T then feeds it transposed to glm;
    # net effect: clip = (proj @ w2c) @ p_hom.
    return p @ w2c


def test_full_projection_matches_reference_math():
    cam = make_synthetic_camera(width=80, height=60)
    got = np.asarray(full_projection_matrix(cam))
    expected = torch_style_full_proj(
        float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy),
        cam.width, cam.height, np.asarray(cam.w2c),
    )
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


def test_camera_center_roundtrip():
    cam = make_synthetic_camera(distance=2.0, angle=0.7)
    center = np.asarray(cam.cam_center)
    # center must be at distance 2 from origin, and map to ~0 in view space
    np.testing.assert_allclose(np.linalg.norm(center), 2.0, rtol=1e-5)
    v = np.asarray(world_to_view(cam, jnp.asarray(center[None])))
    np.testing.assert_allclose(v, np.zeros((1, 3)), atol=1e-5)


def test_origin_projects_to_principal_point():
    cam = make_synthetic_camera(width=64, height=48, distance=2.0, angle=0.3)
    pix, z = project_points(cam, jnp.zeros((1, 3)))
    np.testing.assert_allclose(float(z[0]), 2.0, rtol=1e-5)
    # principal point in ndc2Pix convention: cx - 0.5
    np.testing.assert_allclose(
        np.asarray(pix)[0], [float(cam.cx) - 0.5, float(cam.cy) - 0.5], atol=1e-3
    )


def test_projection_matches_pinhole_formula():
    cam = make_synthetic_camera(width=96, height=72, distance=2.5, angle=-0.4)
    rng = np.random.default_rng(0)
    pts = rng.normal(0, 0.3, (50, 3)).astype(np.float32)
    pix, z = project_points(cam, jnp.asarray(pts))
    v = np.asarray(world_to_view(cam, jnp.asarray(pts)))
    expected_x = float(cam.fx) * v[:, 0] / v[:, 2] + float(cam.cx) - 0.5
    expected_y = float(cam.fy) * v[:, 1] / v[:, 2] + float(cam.cy) - 0.5
    np.testing.assert_allclose(np.asarray(pix)[:, 0], expected_x, rtol=1e-3, atol=2e-2)
    np.testing.assert_allclose(np.asarray(pix)[:, 1], expected_y, rtol=1e-3, atol=2e-2)


def test_make_camera_pads_3x4_extrinsics():
    k = np.array([[50.0, 0, 32], [0, 50.0, 24], [0, 0, 1]])
    w2c34 = np.hstack([np.eye(3), np.array([[0.1], [0.2], [1.5]])])
    cam = make_camera(k, w2c34, 64, 48)
    assert cam.w2c.shape == (4, 4)
    np.testing.assert_allclose(np.asarray(cam.w2c)[3], [0, 0, 0, 1])


def test_ndc_to_pixel():
    assert float(ndc_to_pixel(jnp.array(-1.0), 100)) == -0.5
    assert float(ndc_to_pixel(jnp.array(1.0), 100)) == 99.5
