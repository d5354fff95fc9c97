"""Pinhole camera model for Gaussian rasterization.

Reproduces the reference's camera convention (reference: helpers.py:63-88
``setup_camera``): COLMAP-style world-to-camera ``w2c`` (x right, y down,
z forward), an OpenGL-flavoured projection matrix built from (fx, fy, cx, cy)
with near=0.01 / far=100, and the ``ndc2Pix`` pixel mapping
``((ndc + 1) * size - 1) * 0.5`` used by diff-gaussian-rasterization.

``Camera`` is a pytree whose ``width`` / ``height`` are static aux data so a
camera can be passed straight into jitted functions; the array fields
(``w2c``, intrinsics) may carry a leading batch dimension for stacked views.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """A (possibly batched) pinhole camera.

    Attributes:
      w2c: (..., 4, 4) world-to-camera transform (COLMAP axes).
      fx, fy, cx, cy: (...,) intrinsics in pixels.
      width, height: static image size in pixels.
      near, far: static clip planes (reference default 0.01 / 100,
        train.py:98).
    """

    w2c: jnp.ndarray
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    width: int = dataclasses.field(metadata=dict(static=True))
    height: int = dataclasses.field(metadata=dict(static=True))
    near: float = dataclasses.field(default=0.01, metadata=dict(static=True))
    far: float = dataclasses.field(default=100.0, metadata=dict(static=True))

    @property
    def tan_fovx(self) -> jnp.ndarray:
        return self.width / (2.0 * self.fx)

    @property
    def tan_fovy(self) -> jnp.ndarray:
        return self.height / (2.0 * self.fy)

    @property
    def cam_center(self) -> jnp.ndarray:
        """Camera center in world coordinates: -R^T t."""
        rot = self.w2c[..., :3, :3]
        t = self.w2c[..., :3, 3]
        return -jnp.einsum("...ji,...j->...i", rot, t)

    def __getitem__(self, idx) -> "Camera":
        """Index a batched camera down to a single view."""
        return Camera(
            w2c=self.w2c[idx],
            fx=self.fx[idx],
            fy=self.fy[idx],
            cx=self.cx[idx],
            cy=self.cy[idx],
            width=self.width,
            height=self.height,
            near=self.near,
            far=self.far,
        )


def make_camera(
    k: np.ndarray,
    w2c: np.ndarray,
    width: int,
    height: int,
    near: float = 0.01,
    far: float = 100.0,
) -> Camera:
    """Build a Camera from a 3x3 intrinsic matrix and (3|4)x4 extrinsics.

    Mirrors the argument flow of the reference's ``setup_camera``
    (helpers.py:63-88) fed from the Agisoft loader (train.py:94-98).
    """
    k = np.asarray(k)
    w2c = np.asarray(w2c)
    if w2c.shape[-2] == 3:
        pad = np.broadcast_to(
            np.array([0.0, 0.0, 0.0, 1.0]), w2c.shape[:-2] + (1, 4)
        )
        w2c = np.concatenate([w2c, pad], axis=-2)
    return Camera(
        w2c=jnp.asarray(w2c, jnp.float32),
        fx=jnp.asarray(k[..., 0, 0], jnp.float32),
        fy=jnp.asarray(k[..., 1, 1], jnp.float32),
        cx=jnp.asarray(k[..., 0, 2], jnp.float32),
        cy=jnp.asarray(k[..., 1, 2], jnp.float32),
        width=int(width),
        height=int(height),
        near=near,
        far=far,
    )


def opengl_projection_matrix(cam: Camera) -> jnp.ndarray:
    """The reference's OpenGL-style projection (helpers.py:68-71)."""
    w, h = cam.width, cam.height
    near, far = cam.near, cam.far
    zeros = jnp.zeros_like(cam.fx)
    ones = jnp.ones_like(cam.fx)
    row0 = jnp.stack(
        [2 * cam.fx / w, zeros, -(w - 2 * cam.cx) / w * ones, zeros], axis=-1
    )
    row1 = jnp.stack(
        [zeros, 2 * cam.fy / h, -(h - 2 * cam.cy) / h * ones, zeros], axis=-1
    )
    row2 = jnp.stack(
        [zeros, zeros, far / (far - near) * ones, -(far * near) / (far - near) * ones],
        axis=-1,
    )
    row3 = jnp.stack([zeros, zeros, ones, zeros], axis=-1)
    return jnp.stack([row0, row1, row2, row3], axis=-2)


def full_projection_matrix(cam: Camera) -> jnp.ndarray:
    """proj @ w2c: world -> clip space (reference ``full_proj``, helpers.py:72)."""
    return opengl_projection_matrix(cam) @ cam.w2c


def ndc_to_pixel(ndc: jnp.ndarray, size: int) -> jnp.ndarray:
    """diff-gaussian-rasterization's ndc2Pix: ((ndc + 1) * size - 1) / 2."""
    return ((ndc + 1.0) * size - 1.0) * 0.5


def world_to_view(cam: Camera, points: jnp.ndarray) -> jnp.ndarray:
    """Transform (N, 3) world points into camera coordinates."""
    return (
        jnp.einsum("...ij,nj->...ni", cam.w2c[..., :3, :3], points)
        + cam.w2c[..., None, :3, 3]
    )


def project_points(cam: Camera, points: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Project (N, 3) world points to pixel coordinates.

    Returns (pix (N, 2), view_z (N,)). Uses the same homogeneous pipeline as
    the rasterizer (clip-space w division with the CUDA kernel's 1e-7 guard).
    """
    proj = full_projection_matrix(cam)
    homp = _homogeneous(points)  # one homogeneous build, one 4x4 apply
    clip = jnp.einsum("...ij,nj->...ni", proj, homp)
    hom = clip[..., :3]
    w = clip[..., 3]
    inv_w = 1.0 / (w + 1e-7)
    ndc = hom * inv_w[..., None]
    pix = jnp.stack(
        [
            ndc_to_pixel(ndc[..., 0], cam.width),
            ndc_to_pixel(ndc[..., 1], cam.height),
        ],
        axis=-1,
    )
    # view z from the shared w2c row instead of a second full transform
    view_z = (
        jnp.einsum("...j,nj->...n", cam.w2c[..., 2, :3], points)
        + cam.w2c[..., None, 2, 3]
    )
    return pix, view_z


def _homogeneous(points: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([points, jnp.ones_like(points[..., :1])], axis=-1)
