"""Gaussian parameter activation and EWA screen-space projection.

Implements the preprocess stage of the differentiable Gaussian rasterizer
the reference depends on (diff-gaussian-rasterization, ashawkey fork; API
surface observed at reference helpers.py:73-100, train.py:307): quaternion +
log-scale -> 3D covariance, EWA splatting to a 2D conic with the 0.3-pixel
dilation, 3-sigma radius, and the z > 0.2 frustum cull. All pure jnp and
fully differentiable; used by both the oracle renderer and the Pallas
production kernels.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

from topo4d_tpu.core.camera import Camera, full_projection_matrix, ndc_to_pixel
from topo4d_tpu.core.quaternion import quat_normalize, quat_to_rotmat

# diff-gaussian-rasterization constants (forward.cu semantics).
COV2D_DILATION = 0.3  # low-pass dilation added to the 2D covariance diagonal
NEAR_CULL_Z = 0.2  # view-space z threshold for frustum culling
ALPHA_MAX = 0.99  # per-splat opacity clamp
ALPHA_MIN = 1.0 / 255.0  # splats fainter than this are skipped
TRANSMITTANCE_MIN = 1e-4  # front-to-back blending termination threshold


class GaussianRenderVars(NamedTuple):
    """Activated per-Gaussian render inputs (reference helpers.py:91-100)."""

    means3d: jnp.ndarray  # (N, 3)
    colors: jnp.ndarray  # (N, 3) colors_precomp
    rotations: jnp.ndarray  # (N, 4) normalized quaternions
    opacities: jnp.ndarray  # (N,) in (0, 1)
    scales: jnp.ndarray  # (N, 3) positive


def activate_params(params: Dict[str, jnp.ndarray]) -> GaussianRenderVars:
    """params -> rendervars: sigmoid/exp/normalize (reference helpers.py:91-100)."""
    return GaussianRenderVars(
        means3d=params["means3D"],
        colors=params["rgb_colors"],
        rotations=quat_normalize(params["unnorm_rotations"]),
        opacities=jax.nn.sigmoid(params["logit_opacities"]).reshape(-1),
        scales=jnp.exp(params["log_scales"]),
    )


def build_cov3d(rotations: jnp.ndarray, scales: jnp.ndarray) -> jnp.ndarray:
    """3D covariance R S S^T R^T from unit quaternions and scales -> (N, 3, 3)."""
    rot = quat_to_rotmat(rotations)
    m = rot * scales[..., None, :]
    return m @ jnp.swapaxes(m, -1, -2)


class Projected(NamedTuple):
    """Screen-space Gaussians for one view."""

    means2d: jnp.ndarray  # (N, 2) pixel centers
    depths: jnp.ndarray  # (N,) view-space z
    conics: jnp.ndarray  # (N, 3) inverse 2D covariance (a, b, c)
    radii: jnp.ndarray  # (N,) int32 pixel radius; 0 = culled
    mask: jnp.ndarray  # (N,) bool, True = visible


def project_gaussians(
    rv: GaussianRenderVars,
    cam: Camera,
    means2d_offset: jnp.ndarray | None = None,
) -> Projected:
    """EWA projection of 3D Gaussians to screen space for a single view.

    ``means2d_offset`` mirrors the reference's zero ``means2D`` dummy tensor
    (helpers.py:98): an all-zero (N, 2) input added to the projected pixel
    centers so its cotangent carries the screen-space positional gradient
    used for densification statistics (reference external.py:119-123).

    All math runs in COMPONENT form — (N,) vectors per coordinate — since
    (N, 3)/(N, 2, 3)/(N, 3, 3) intermediates pad their minor dims to 128
    lanes on TPU (~42x op cost; see losses.temporal module docstring).
    The math is identical to the batched-matrix formulation
    (forward.cu computeCov2D semantics).
    """
    xt = rv.means3d.T  # (3, N)
    x, y, z3 = xt[0], xt[1], xt[2]

    # View-space positions and near cull: t = W p + t.
    w2c = cam.w2c
    tvx = w2c[0, 0] * x + w2c[0, 1] * y + w2c[0, 2] * z3 + w2c[0, 3]
    tvy = w2c[1, 0] * x + w2c[1, 1] * y + w2c[1, 2] * z3 + w2c[1, 3]
    tvz = w2c[2, 0] * x + w2c[2, 1] * y + w2c[2, 2] * z3 + w2c[2, 3]
    depths = tvz
    visible = depths > NEAR_CULL_Z

    # Clip-space projection -> pixel centers: p_hom = proj @ [p; 1].
    proj = full_projection_matrix(cam)
    ph0 = proj[0, 0] * x + proj[0, 1] * y + proj[0, 2] * z3 + proj[0, 3]
    ph1 = proj[1, 0] * x + proj[1, 1] * y + proj[1, 2] * z3 + proj[1, 3]
    ph3 = proj[3, 0] * x + proj[3, 1] * y + proj[3, 2] * z3 + proj[3, 3]
    inv_w = 1.0 / (ph3 + 1e-7)
    m2x = ndc_to_pixel(ph0 * inv_w, cam.width)
    m2y = ndc_to_pixel(ph1 * inv_w, cam.height)
    if means2d_offset is not None:
        m2x = m2x + means2d_offset[:, 0]
        m2y = m2y + means2d_offset[:, 1]

    # EWA: 2D covariance = J W Sigma W^T J^T with fov-clamped view coords.
    safe_z = jnp.where(visible, depths, 1.0)
    limx = 1.3 * cam.tan_fovx
    limy = 1.3 * cam.tan_fovy
    tx = jnp.clip(tvx / safe_z, -limx, limx) * safe_z
    ty = jnp.clip(tvy / safe_z, -limy, limy) * safe_z

    # 3D covariance entries from normalized quaternion + scales:
    # Sigma = (R S)(R S)^T, computed per component.
    qt = rv.rotations.T  # (4, N)
    qn = jnp.sqrt(qt[0] ** 2 + qt[1] ** 2 + qt[2] ** 2 + qt[3] ** 2)
    r, qx, qy, qz = qt[0] / qn, qt[1] / qn, qt[2] / qn, qt[3] / qn
    st = rv.scales.T  # (3, N)
    s0, s1, s2 = st[0], st[1], st[2]
    r00 = 1 - 2 * (qy * qy + qz * qz)
    r01 = 2 * (qx * qy - r * qz)
    r02 = 2 * (qx * qz + r * qy)
    r10 = 2 * (qx * qy + r * qz)
    r11 = 1 - 2 * (qx * qx + qz * qz)
    r12 = 2 * (qy * qz - r * qx)
    r20 = 2 * (qx * qz - r * qy)
    r21 = 2 * (qy * qz + r * qx)
    r22 = 1 - 2 * (qx * qx + qy * qy)
    m00, m01, m02 = r00 * s0, r01 * s1, r02 * s2
    m10, m11, m12 = r10 * s0, r11 * s1, r12 * s2
    m20, m21, m22 = r20 * s0, r21 * s1, r22 * s2
    c00 = m00 * m00 + m01 * m01 + m02 * m02
    c01 = m00 * m10 + m01 * m11 + m02 * m12
    c02 = m00 * m20 + m01 * m21 + m02 * m22
    c11 = m10 * m10 + m11 * m11 + m12 * m12
    c12 = m10 * m20 + m11 * m21 + m12 * m22
    c22 = m20 * m20 + m21 * m21 + m22 * m22

    # J rows (j00, j02) / (j11, j12), then JW = J @ rot_w2c.
    izz = 1.0 / (safe_z * safe_z)
    j00 = cam.fx / safe_z
    j02 = -cam.fx * tx * izz
    j11 = cam.fy / safe_z
    j12 = -cam.fy * ty * izz
    a0 = j00 * w2c[0, 0] + j02 * w2c[2, 0]
    a1 = j00 * w2c[0, 1] + j02 * w2c[2, 1]
    a2 = j00 * w2c[0, 2] + j02 * w2c[2, 2]
    b0 = j11 * w2c[1, 0] + j12 * w2c[2, 0]
    b1 = j11 * w2c[1, 1] + j12 * w2c[2, 1]
    b2 = j11 * w2c[1, 2] + j12 * w2c[2, 2]
    # u = Sigma a, v = Sigma b (symmetric Sigma)
    u0 = c00 * a0 + c01 * a1 + c02 * a2
    u1 = c01 * a0 + c11 * a1 + c12 * a2
    u2 = c02 * a0 + c12 * a1 + c22 * a2
    v0 = c00 * b0 + c01 * b1 + c02 * b2
    v1 = c01 * b0 + c11 * b1 + c12 * b2
    v2 = c02 * b0 + c12 * b1 + c22 * b2
    # low-pass dilation on BOTH diagonal entries (forward.cu computeCov2D:
    # cov[0][0] += 0.3f; cov[1][1] += 0.3f) — the antialiasing floor must
    # hold for sub-pixel extent in y as well as x
    cov_a = a0 * u0 + a1 * u1 + a2 * u2 + COV2D_DILATION
    cov_b = a0 * v0 + a1 * v1 + a2 * v2
    cov_c = b0 * v0 + b1 * v1 + b2 * v2 + COV2D_DILATION

    det = cov_a * cov_c - cov_b * cov_b
    visible = visible & (det != 0.0)
    safe_det = jnp.where(det != 0.0, det, 1.0)
    inv_det = 1.0 / safe_det

    # 3-sigma extent from the max eigenvalue (forward.cu radius rule).
    mid = 0.5 * (cov_a + cov_c)
    lambda1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(lambda1))

    # Cull Gaussians whose 3-sigma box misses the image entirely.
    on_image = (
        (m2x + radius_f >= 0)
        & (m2x - radius_f < cam.width)
        & (m2y + radius_f >= 0)
        & (m2y - radius_f < cam.height)
    )
    visible = visible & on_image

    radii = jnp.where(visible, radius_f, 0.0).astype(jnp.int32)
    return Projected(
        means2d=jnp.stack([m2x, m2y], axis=-1),
        depths=depths,
        conics=jnp.stack(
            [cov_c * inv_det, -cov_b * inv_det, cov_a * inv_det], axis=-1
        ),
        radii=radii,
        mask=visible,
    )
