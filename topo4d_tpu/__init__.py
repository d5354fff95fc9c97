"""topo4d_tpu: TPU-native topology-preserving 4D Gaussian head capture.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of Topo4D
(ECCV 2024): differentiable Gaussian-splat rasterization of mesh-bound
Gaussians, topology-preserving per-frame inverse rendering, UV-space
densification, and 8K texture baking — built TPU-first:

- ``rasterizer``: differentiable Gaussian rasterizer. A pure-JAX oracle
  (CPU-runnable, autodiff backward) defines the semantics; Pallas TPU
  kernels provide the production forward/backward.
- ``core``: camera model, quaternion/covariance math, Gaussian activation.
- ``topology``: mesh/one-ring/region engine and UV-space densification.
- ``losses``: photometric (L1+SSIM) and topological/temporal regularizers.
- ``opt``: fused Adam update + per-region constraint scatters as one
  jitted train step.
- ``parallel``: view/tile sharding over a ``jax.sharding.Mesh``.
- ``texture``: dense Gaussian texture optimization and UV-space baking.
- ``pipeline``: frame loop, checkpointing, export, CLI.
"""

__version__ = "0.1.0"
