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
    """
    means3d = rv.means3d
    n = means3d.shape[0]

    # View-space positions and near cull.
    rot_w2c = cam.w2c[..., :3, :3]
    t_view = means3d @ rot_w2c.T + cam.w2c[..., :3, 3]
    depths = t_view[..., 2]
    visible = depths > NEAR_CULL_Z

    # Clip-space projection -> pixel centers: p_hom = proj @ [p; 1].
    proj = full_projection_matrix(cam)
    ones = jnp.ones((n, 1), means3d.dtype)
    p4 = jnp.concatenate([means3d, ones], axis=-1)
    p_hom = p4 @ proj.T
    inv_w = 1.0 / (p_hom[..., 3] + 1e-7)
    ndc = p_hom[..., :3] * inv_w[..., None]
    means2d = jnp.stack(
        [
            ndc_to_pixel(ndc[..., 0], cam.width),
            ndc_to_pixel(ndc[..., 1], cam.height),
        ],
        axis=-1,
    )
    if means2d_offset is not None:
        means2d = means2d + means2d_offset

    # EWA: 2D covariance = J W Sigma W^T J^T with fov-clamped view coords
    # (forward.cu computeCov2D semantics).
    safe_z = jnp.where(visible, depths, 1.0)
    limx = 1.3 * cam.tan_fovx
    limy = 1.3 * cam.tan_fovy
    txtz = jnp.clip(t_view[..., 0] / safe_z, -limx, limx)
    tytz = jnp.clip(t_view[..., 1] / safe_z, -limy, limy)
    tx = txtz * safe_z
    ty = tytz * safe_z

    cov3d = build_cov3d(rv.rotations, rv.scales)
    zero = jnp.zeros_like(tx)
    j = jnp.stack(
        [
            jnp.stack([cam.fx / safe_z, zero, -cam.fx * tx / (safe_z * safe_z)], -1),
            jnp.stack([zero, cam.fy / safe_z, -cam.fy * ty / (safe_z * safe_z)], -1),
        ],
        axis=-2,
    )  # (N, 2, 3)
    jw = j @ rot_w2c  # (N, 2, 3)
    cov2d = jw @ cov3d @ jnp.swapaxes(jw, -1, -2)  # (N, 2, 2)
    cov_a = cov2d[..., 0, 0] + COV2D_DILATION
    cov_b = cov2d[..., 0, 1]
    cov_c = cov2d[..., 1, 1] + COV2D_DILATION

    det = cov_a * cov_c - cov_b * cov_b
    visible = visible & (det != 0.0)
    safe_det = jnp.where(det != 0.0, det, 1.0)
    inv_det = 1.0 / safe_det
    conics = jnp.stack([cov_c * inv_det, -cov_b * inv_det, cov_a * inv_det], axis=-1)

    # 3-sigma extent from the max eigenvalue (forward.cu radius rule).
    mid = 0.5 * (cov_a + cov_c)
    lambda1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(lambda1))

    # Cull Gaussians whose 3-sigma box misses the image entirely
    # (forward.cu computes a tile rect and drops empty rects).
    x0 = means2d[..., 0] - radius_f
    x1 = means2d[..., 0] + radius_f
    y0 = means2d[..., 1] - radius_f
    y1 = means2d[..., 1] + radius_f
    on_image = (x1 >= 0) & (x0 < cam.width) & (y1 >= 0) & (y0 < cam.height)
    visible = visible & on_image

    radii = jnp.where(visible, radius_f, 0.0).astype(jnp.int32)
    return Projected(
        means2d=means2d,
        depths=depths,
        conics=conics,
        radii=radii,
        mask=visible,
    )
