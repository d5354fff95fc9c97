"""Differentiable Gaussian rasterization for TPU.

Two interchangeable implementations of one contract (the semantics of the
CUDA ``diff-gaussian-rasterization`` package the reference trains with —
ashawkey fork with depth+alpha outputs; call sites at reference
train.py:307,388 and settings at helpers.py:73-88):

- ``reference.render_gaussians``: a pure-JAX oracle. O(N * pixels), runs on
  CPU, backward comes from autodiff. This is the test oracle everything else
  must `allclose`.
- ``pallas.render_gaussians_tpu``: tile-binned Pallas forward + custom-VJP
  backward kernels — the production path.

Contract (matching the CUDA rasterizer's sequential semantics exactly):

  For each pixel, Gaussians are blended front-to-back in (depth, index)
  order: ``alpha_i = min(0.99, opacity_i * exp(power_i))`` with
  ``power_i = -0.5 (a dx^2 + c dy^2) - b dx dy`` from the conic; splats with
  ``power > 0`` or ``alpha < 1/255`` are skipped; blending terminates when
  transmittance would drop below 1e-4 (the terminating splat is NOT drawn).
  Outputs: color ``sum w_i c_i + T_final * bg``, depth ``sum w_i z_i``,
  alpha ``1 - T_final``, and per-Gaussian pixel ``radii`` (0 = culled).

  Because ``alpha <= 0.99`` makes transmittance strictly monotone, the
  sequential loop is equivalent to the parallel form
  ``w_i = alpha_i * T_excl_i * [T_incl_i >= 1e-4]`` with
  ``T_incl = cumprod(1 - alpha)`` — which is how both implementations
  compute it (cumprod + matmul instead of a serial scan).
"""

from topo4d_tpu.rasterizer.reference import render_gaussians, RenderOutput
