"""Pure-JAX oracle Gaussian rasterizer (the semantic contract).

O(N * pixels) per view, processed in pixel-row blocks to bound memory.
CPU-runnable; backward is autodiff everywhere EXCEPT the blending
weights, whose adjoint is a hand-derived custom VJP (see
``blend_weights`` — jnp.cumprod's JVP machinery miscomputed on TPU,
r5 root cause in docs/PERFORMANCE.md). Production rendering uses the
Pallas kernels in ``rasterizer.pallas``, which must match this oracle
on pixels AND pixel gradients.

See package docstring for the exact blending contract (mirrors CUDA
diff-gaussian-rasterization forward.cu / ashawkey depth+alpha fork).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from topo4d_tpu.core.camera import Camera
from topo4d_tpu.core.gaussian import (
    ALPHA_MAX,
    ALPHA_MIN,
    TRANSMITTANCE_MIN,
    GaussianRenderVars,
    Projected,
    project_gaussians,
)
from topo4d_tpu.rasterizer.tiles import (  # noqa: F401 (re-export)
    TILE,
    depth_sorted_order,
    tile_rect,
)


class RenderOutput(NamedTuple):
    """Mirrors the CUDA renderer's (image, radii, depth, alpha) tuple."""

    image: jnp.ndarray  # (3, H, W)
    radii: jnp.ndarray  # (N,) int32
    depth: jnp.ndarray  # (1, H, W)
    alpha: jnp.ndarray  # (1, H, W)


# depth_sorted_order lives in tiles.py (single definition shared with the
# binning variants) and is re-exported above for oracle users.


def _alpha_at_pixels(
    pix: jnp.ndarray,  # (P, 2) pixel centers
    means2d: jnp.ndarray,  # (M, 2)
    conics: jnp.ndarray,  # (M, 3)
    opacities: jnp.ndarray,  # (M,)
    valid: jnp.ndarray,  # (M,)
    rect: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray] | None = None,
) -> jnp.ndarray:
    """Per (pixel, gaussian) alpha, with the CUDA skip rules -> (P, M).

    ``rect`` = per-gaussian touched tile rect (x0, y0, x1, y1) in tile
    units: CUDA only blends a splat inside its 3-sigma TILE rect, so a
    pixel outside it never sees the splat even if alpha would exceed
    1/255 there. Pass None to disable (pure-math mode).
    """
    d = means2d[None, :, :] - pix[:, None, :]  # (P, M, 2)
    dx, dy = d[..., 0], d[..., 1]
    power = (
        -0.5 * (conics[None, :, 0] * dx * dx + conics[None, :, 2] * dy * dy)
        - conics[None, :, 1] * dx * dy
    )
    raw = opacities[None, :] * jnp.exp(power)
    # Straight-through 0.99 clamp: the CUDA backward ignores the min()
    # when differentiating (backward.cu computes dL_dG = opacity * dL_dalpha
    # unconditionally), so gradients flow as if unclamped.
    alpha = raw + jax.lax.stop_gradient(jnp.minimum(ALPHA_MAX, raw) - raw)
    keep = (power <= 0.0) & (alpha >= ALPHA_MIN) & valid[None, :]
    if rect is not None:
        x0, y0, x1, y1 = rect
        tx = jnp.floor(pix[:, 0] / TILE).astype(jnp.int32)[:, None]
        ty = jnp.floor(pix[:, 1] / TILE).astype(jnp.int32)[:, None]
        keep = keep & (
            (tx >= x0[None, :])
            & (tx < x1[None, :])
            & (ty >= y0[None, :])
            & (ty < y1[None, :])
        )
    return jnp.where(keep, alpha, 0.0)


@jax.custom_vjp
def blend_weights(alpha: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Front-to-back blending weights from per-pixel alphas in depth order.

    alpha: (P, M) in front-to-back order along M.
    Returns (w (P, M), T_final (P,)) where ``w_i = alpha_i * T_before_i``
    masked by the 1e-4 termination rule, and T_final is the transmittance
    at which blending stopped (== value the CUDA loop exits with).

    Custom VJP (r5): autodiff of this function routed gradients through
    jnp.cumprod's JVP machinery (a balanced associative_scan(mul) network
    and its transpose) and through jnp.min with thousands of tied minima
    (t_incl is constant past the last contributing splat). The backward
    below is the hand-derived exact adjoint using only elementwise f32
    ops and one reverse associative_scan ADD, so the oracle's gradient
    semantics are proven math independent of any backend's cumprod/min
    lowering — and it is the a.e.-CORRECT adjoint where the old
    autodiff was not: the tied-min rule split the t_final cotangent
    across duplicate trailing values, mis-weighting it at tied
    positions (finite-difference-checked). NB this custom VJP was first
    motivated by the r4 on-TPU banded-oracle gradient failure; the
    probe rerun showed that failure is a property of the monolithic
    band program's XLA:TPU compilation and NOT of the cumprod JVP (it
    persists with this VJP active) — see docs/PERFORMANCE.md "Oracle
    gradients on TPU". The termination mask ``keep`` is treated as
    piecewise-constant (the CUDA backward's hard-branch semantics,
    backward.cu).
    """
    w, t_final, _, _ = _blend_weights_core(alpha)
    return w, t_final


def _blend_weights_core(alpha):
    one_minus = 1.0 - alpha
    t_incl = jnp.cumprod(one_minus, axis=-1)  # T after splat i
    t_excl = jnp.concatenate(
        [jnp.ones_like(t_incl[..., :1]), t_incl[..., :-1]], axis=-1
    )  # T before splat i
    # alpha <= 0.99 => t_incl monotone non-increasing, so "terminated at or
    # before i" == t_incl_i < 1e-4, and the terminating splat is not drawn.
    keep = t_incl >= TRANSMITTANCE_MIN
    w = alpha * t_excl * keep
    t_final = jnp.min(jnp.where(keep, t_incl, 1.0), axis=-1)
    return w, t_final, t_incl, keep


def _blend_weights_fwd(alpha):
    w, t_final, t_incl, _ = _blend_weights_core(alpha)
    return (w, t_final), (alpha, t_incl)


def _blend_weights_bwd(res, cots):
    alpha, t_incl = res
    gw, gtf = cots
    t_excl = jnp.concatenate(
        [jnp.ones_like(t_incl[..., :1]), t_incl[..., :-1]], axis=-1
    )
    keep = t_incl >= TRANSMITTANCE_MIN
    keepf = keep.astype(alpha.dtype)
    # direct term: dw/dalpha_i at fixed transmittance
    g_direct = gw * t_excl * keepf
    # cotangent on t_incl[i]: from w_{i+1} = alpha_{i+1} t_incl[i] keep,
    # and from t_final = t_incl[last kept] (keep is a prefix of ones —
    # t_incl is monotone non-increasing — so "last kept" is well defined;
    # no tied-min gradient splitting)
    c_shift = gw * alpha * keepf
    c_incl = jnp.concatenate(
        [c_shift[..., 1:], jnp.zeros_like(c_shift[..., :1])], axis=-1
    )
    keep_next = jnp.concatenate(
        [keep[..., 1:], jnp.zeros_like(keep[..., :1])], axis=-1
    )
    last_kept = (keep & ~keep_next).astype(alpha.dtype)
    c_incl = c_incl + gtf[..., None] * last_kept
    # cumprod adjoint: d t_incl[i] / d u_j = t_incl[i] / u_j for i >= j
    # (u = 1 - alpha >= 0.01 since alpha <= ALPHA_MAX — division exact-
    # safe); the suffix sum is a reverse associative_scan of ADDs.
    s = jax.lax.associative_scan(
        jnp.add, c_incl * t_incl, reverse=True, axis=c_incl.ndim - 1
    )
    g_u = s / (1.0 - alpha)
    return (g_direct - g_u,)


blend_weights.defvjp(_blend_weights_fwd, _blend_weights_bwd)


def _render_rows(
    ys: jnp.ndarray,  # (R,) row indices
    width: int,
    means2d: jnp.ndarray,
    conics: jnp.ndarray,
    colors: jnp.ndarray,
    depths: jnp.ndarray,
    opacities: jnp.ndarray,
    valid: jnp.ndarray,
    bg: jnp.ndarray,
    rect,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Render a block of image rows -> (rgb (R, W, 3), depth, alpha)."""
    xs = jnp.arange(width, dtype=means2d.dtype)
    pix = jnp.stack(
        jnp.broadcast_arrays(xs[None, :], ys[:, None].astype(means2d.dtype)),
        axis=-1,
    ).reshape(-1, 2)  # (R*W, 2) as (x, y)
    alpha = _alpha_at_pixels(pix, means2d, conics, opacities, valid, rect)
    w, t_final = blend_weights(alpha)
    # HIGHEST precision: on TPU a default-precision matmul feeds the MXU
    # bf16 inputs, drifting the ORACLE itself by ~5e-3 max pixel at the
    # 8,280-Gaussian geometry scale (caught by the r4 on-TPU numerics
    # gate; same bug class as the r3 SSIM drift). The oracle is the
    # semantic contract — it must be exact f32 everywhere.
    hi = jax.lax.Precision.HIGHEST
    rgb = jnp.matmul(w, colors, precision=hi) + t_final[:, None] * bg[None, :]
    depth = jnp.matmul(w, depths[:, None], precision=hi)
    out_alpha = 1.0 - t_final
    r = ys.shape[0]
    return (
        rgb.reshape(r, width, 3),
        depth.reshape(r, width),
        out_alpha.reshape(r, width),
    )


@functools.partial(jax.jit, static_argnames=("row_block", "remat"))
def render_gaussians(
    rv: GaussianRenderVars,
    cam: Camera,
    bg: jnp.ndarray | None = None,
    means2d_offset: jnp.ndarray | None = None,
    row_block: int = 16,
    remat: bool = False,
) -> RenderOutput:
    """Render one view with the oracle rasterizer.

    Args:
      rv: activated Gaussians (see ``core.gaussian.activate_params``).
      cam: single (unbatched) camera.
      bg: (3,) background color; defaults to black (reference helpers.py:78).
      means2d_offset: optional zero (N, 2) tensor whose cotangent carries
        screen-space gradients (reference's ``means2D`` dummy).
      row_block: rows per block; bounds the (rows*W, N) working set.
      remat: rematerialize each row block in the backward. Without it,
        autodiff saves every block's (rows*W, N) alpha/cumprod residuals
        across the whole lax.map — ~20 GB at the 8,280 x 512x375
        geometry scale, an OOM on one chip. The on-TPU bench numerics
        gate differentiates the oracle at exactly that scale, so it
        sets remat=True (2x block compute, O(one block) memory).

    Returns RenderOutput(image (3,H,W), radii (N,), depth (1,H,W),
    alpha (1,H,W)) matching the CUDA tuple at reference train.py:307.
    """
    if bg is None:
        bg = jnp.zeros(3, dtype=jnp.float32)
    proj = project_gaussians(rv, cam, means2d_offset)
    order = depth_sorted_order(proj)

    means2d = proj.means2d[order]
    conics = proj.conics[order]
    colors = rv.colors[order]
    depths = proj.depths[order]
    opacities = rv.opacities[order]
    valid = proj.mask[order]
    rx0, ry0, rx1, ry1, _, _ = tile_rect(proj, cam.width, cam.height)
    rect = (rx0[order], ry0[order], rx1[order], ry1[order])

    h, w = cam.height, cam.width
    pad_h = (-h) % row_block
    all_ys = jnp.arange(h + pad_h).reshape(-1, row_block)

    def body(ys):
        return _render_rows(
            ys, w, means2d, conics, colors, depths, opacities, valid, bg, rect
        )

    if remat:
        body = jax.checkpoint(body)
    rgb, depth, alpha = jax.lax.map(body, all_ys)
    rgb = rgb.reshape(-1, w, 3)[:h]
    depth = depth.reshape(-1, w)[:h]
    alpha = alpha.reshape(-1, w)[:h]
    return RenderOutput(
        image=jnp.transpose(rgb, (2, 0, 1)),
        radii=proj.radii,
        depth=depth[None],
        alpha=alpha[None],
    )
