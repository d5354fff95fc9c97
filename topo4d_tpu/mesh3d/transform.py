"""Mesh transforms + pose estimation (face3d mesh/transform.py parity).

Forward: rotate / similarity-transform / camera / project / to-image.
Backward: affine camera estimation from 3D-2D correspondences (the
normalized Gold Standard algorithm, MVGCV Alg. 7.2) and its sRt
decomposition — the pose step of the morphable-model fit.

All functions are pure jnp and jittable (fixed-iteration, closed-form);
the reference's NumPy versions (`/root/reference/face3d/mesh/transform.py:18-356`)
are the semantics contract, pinned by tests/test_mesh3d.py.
"""

from __future__ import annotations

import jax.numpy as jnp


def angle2matrix(angles) -> jnp.ndarray:
    """(3,) x/y/z Euler angles in DEGREES -> (3, 3) rotation, Rz@Ry@Rx.

    x pitch (positive looks down), y yaw (positive looks left), z roll
    (positive tilts right) — face3d transform.py:18-43.
    """
    x, y, z = jnp.deg2rad(jnp.asarray(angles, jnp.float32))
    cx, sx = jnp.cos(x), jnp.sin(x)
    cy, sy = jnp.cos(y), jnp.sin(y)
    cz, sz = jnp.cos(z), jnp.sin(z)
    rx = jnp.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    ry = jnp.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rz = jnp.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return (rz @ ry @ rx).astype(jnp.float32)


def angle2matrix_3ddfa(angles) -> jnp.ndarray:
    """3DDFA convention: RADIANS, transposed per-axis factors, Rx@Ry@Rz
    (face3d transform.py:45-71)."""
    x, y, z = jnp.asarray(angles, jnp.float32)
    cx, sx = jnp.cos(x), jnp.sin(x)
    cy, sy = jnp.cos(y), jnp.sin(y)
    cz, sz = jnp.cos(z), jnp.sin(z)
    rx = jnp.array([[1, 0, 0], [0, cx, sx], [0, -sx, cx]])
    ry = jnp.array([[cy, 0, -sy], [0, 1, 0], [sy, 0, cy]])
    rz = jnp.array([[cz, sz, 0], [-sz, cz, 0], [0, 0, 1]])
    return (rx @ ry @ rz).astype(jnp.float32)


def rotate(vertices: jnp.ndarray, angles) -> jnp.ndarray:
    """Rotate (N, 3) vertices by degree Euler angles (transform.py:76-91)."""
    return vertices @ angle2matrix(angles).T


def similarity_transform(
    vertices: jnp.ndarray, s, r: jnp.ndarray, t3d
) -> jnp.ndarray:
    """s * R @ X + t, the 7-dof similarity (transform.py:93-108)."""
    t3d = jnp.reshape(jnp.asarray(t3d, jnp.float32), (3,))
    return s * vertices @ jnp.asarray(r).T + t3d[None, :]


def lookat_camera(vertices: jnp.ndarray, eye, at=None, up=None) -> jnp.ndarray:
    """World -> camera space, camera at ``eye`` looking at ``at``
    down -z with ``up`` as vertical (transform.py:119-149)."""
    eye = jnp.asarray(eye, jnp.float32)
    at = jnp.zeros(3) if at is None else jnp.asarray(at, jnp.float32)
    up = jnp.array([0.0, 1.0, 0.0]) if up is None else jnp.asarray(up, jnp.float32)

    def unit(v):
        return v / jnp.maximum(jnp.linalg.norm(v), 1e-12)

    z_axis = -unit(at - eye)
    x_axis = unit(jnp.cross(up, z_axis))
    y_axis = jnp.cross(z_axis, x_axis)
    r = jnp.stack((x_axis, y_axis, z_axis))
    return (vertices - eye) @ r.T


def orthographic_project(vertices: jnp.ndarray) -> jnp.ndarray:
    """Scaled orthographic projection: identity, z kept for the z-buffer
    (transform.py:153-165)."""
    return vertices


def perspective_project(
    vertices: jnp.ndarray,
    fovy,
    aspect_ratio: float = 1.0,
    near: float = 0.1,
    far: float = 1000.0,
) -> jnp.ndarray:
    """OpenGL-frustum perspective to NDC, z negated back to a depth
    (transform.py:167-199)."""
    fovy = jnp.deg2rad(jnp.asarray(fovy, jnp.float32))
    top = near * jnp.tan(fovy)
    right = top * aspect_ratio
    p = jnp.array(
        [
            [near / right, 0.0, 0.0, 0.0],
            [0.0, near / top, 0.0, 0.0],
            [0.0, 0.0, -(far + near) / (far - near), -2 * far * near / (far - near)],
            [0.0, 0.0, -1.0, 0.0],
        ],
        jnp.float32,
    )
    homo = jnp.concatenate(
        [vertices, jnp.ones((vertices.shape[0], 1), vertices.dtype)], axis=1
    )
    proj = homo @ p.T
    proj = proj[:, :3] / proj[:, 3:]
    return proj * jnp.array([1.0, 1.0, -1.0])


def to_image(
    vertices: jnp.ndarray, h: int, w: int, is_perspective: bool = False
) -> jnp.ndarray:
    """Center-origin (y-up) coords -> image coords (y-down, top-left
    origin), z untouched (transform.py:202-223)."""
    x, y, z = vertices[:, 0], vertices[:, 1], vertices[:, 2]
    if is_perspective:
        x = x * (w / 2)
        y = y * (h / 2)
    x = x + w / 2
    y = h - (y + h / 2) - 1
    return jnp.stack([x, y, z], axis=1)


def estimate_affine_matrix_3d23d(x3d: jnp.ndarray, y3d: jnp.ndarray) -> jnp.ndarray:
    """(3, 4) affine from 3D-3D correspondences by least squares
    (transform.py:227-237)."""
    homo = jnp.concatenate([x3d, jnp.ones((x3d.shape[0], 1), x3d.dtype)], axis=1)
    sol, _, _, _ = jnp.linalg.lstsq(homo, y3d)
    return sol.T


def estimate_affine_matrix_3d22d(x3d: jnp.ndarray, x2d: jnp.ndarray) -> jnp.ndarray:
    """Gold Standard affine camera from n>=4 3D-2D correspondences.

    Both point sets are mean/scale normalized (sqrt(2)/sqrt(3) average
    norms), the 8-dof system is solved by least squares, and the
    normalizations are undone (transform.py:239-299). Returns (3, 4)
    with last row [0, 0, 0, 1].
    """
    n = x2d.shape[0]
    x2 = jnp.asarray(x2d, jnp.float32)
    x3 = jnp.asarray(x3d, jnp.float32)

    mean2 = jnp.mean(x2, axis=0)
    c2 = x2 - mean2
    scale2 = jnp.sqrt(2.0) / jnp.maximum(
        jnp.mean(jnp.linalg.norm(c2, axis=1)), 1e-12
    )
    c2 = c2 * scale2
    t_mat = jnp.array(
        [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], jnp.float32
    )
    t_mat = t_mat.at[0, 0].set(scale2).at[1, 1].set(scale2)
    t_mat = t_mat.at[:2, 2].set(-mean2 * scale2)

    mean3 = jnp.mean(x3, axis=0)
    c3 = x3 - mean3
    scale3 = jnp.sqrt(3.0) / jnp.maximum(
        jnp.mean(jnp.linalg.norm(c3, axis=1)), 1e-12
    )
    c3 = c3 * scale3
    u_mat = jnp.zeros((4, 4), jnp.float32)
    u_mat = u_mat.at[0, 0].set(scale3).at[1, 1].set(scale3).at[2, 2].set(scale3)
    u_mat = u_mat.at[:3, 3].set(-mean3 * scale3).at[3, 3].set(1.0)

    homo = jnp.concatenate([c3, jnp.ones((n, 1), jnp.float32)], axis=1)  # (n, 4)
    # rows [u; v] decouple: two independent (n, 4) least-squares solves
    pu, _, _, _ = jnp.linalg.lstsq(homo, c2[:, 0])
    pv, _, _, _ = jnp.linalg.lstsq(homo, c2[:, 1])
    p_norm = jnp.stack(
        [pu, pv, jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32)]
    )
    return jnp.linalg.inv(t_mat) @ (p_norm @ u_mat)


def p2srt(p: jnp.ndarray):
    """(3, 4) affine camera -> (scale, (3,3) rotation, (3,) translation)
    (transform.py:301-319)."""
    t = p[:, 3]
    r1 = p[0, :3]
    r2 = p[1, :3]
    n1 = jnp.linalg.norm(r1)
    n2 = jnp.linalg.norm(r2)
    s = (n1 + n2) / 2.0
    r1u = r1 / jnp.maximum(n1, 1e-12)
    r2u = r2 / jnp.maximum(n2, 1e-12)
    r3 = jnp.cross(r1u, r2u)
    return s, jnp.stack([r1u, r2u, r3]), t


def matrix2angle(r: jnp.ndarray):
    """(3, 3) rotation -> (pitch, yaw, roll) DEGREES, branch-free
    (lax-friendly ``where`` replaces the reference's gimbal-lock if,
    transform.py:331-356)."""
    sy = jnp.sqrt(r[0, 0] ** 2 + r[1, 0] ** 2)
    singular = sy < 1e-6
    x = jnp.where(
        singular, jnp.arctan2(-r[1, 2], r[1, 1]), jnp.arctan2(r[2, 1], r[2, 2])
    )
    y = jnp.arctan2(-r[2, 0], sy)
    z = jnp.where(singular, 0.0, jnp.arctan2(r[1, 0], r[0, 0]))
    to_deg = 180.0 / jnp.pi
    return x * to_deg, y * to_deg, z * to_deg
