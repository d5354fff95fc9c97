"""Geometry-scale render stage breakdown with state-carried timing.

Times, at the bench scale (8,280 Gaussians, 512x375):
  - full render fwd+bwd (direct binning)  [the 2.5 ms being attacked]
  - frozen-binning render fwd+bwd         [sort amortized out]
  - projection fwd
  - duplicate+sort binning fwd            [bin_gaussians_packed]
  - binning_for (compute_binning)         [the once-per-rebin cost]
Every loop carries state so the tunnel's result cache can't serve
repeats; marginal two-point timing cancels the per-sync cost.
"""
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp
import numpy as np

from topo4d_tpu.core.gaussian import activate_params, project_gaussians
from topo4d_tpu.rasterizer.pallas import binning_for, render_gaussians_pallas
from topo4d_tpu.rasterizer.tiles import bin_gaussians_packed
from topo4d_tpu.testing import make_head_fixture

T0 = time.perf_counter()


def note(msg):
    print(f"[+{time.perf_counter() - T0:7.1f}s] {msg}", flush=True)


def marginal(run, small=25, big=225, reps=3):
    run(small)
    run(big)
    t1 = min(run(small) for _ in range(reps))
    t2 = min(run(big) for _ in range(reps))
    return (t2 - t1) / (big - small)


def main():
    params_np, cams, _ = make_head_fixture()
    cam0 = cams[0]
    params = {k: jnp.asarray(v) for k, v in params_np.items()}
    gt = jnp.zeros((3, cam0.height, cam0.width)) + 0.4
    note("fixture ready")

    # ---- full render fwd+bwd, direct vs frozen binning ------------------
    from topo4d_tpu.losses.image import photometric_loss

    binning = jax.block_until_ready(
        binning_for(activate_params(params), cam0, max_span=2)
    )

    for tag, b in (("direct", None), ("frozen", binning)):

        def loss_fn(p):
            out = render_gaussians_pallas(
                activate_params(p), cam0, max_span=2, chunk=128, binning=b
            )
            return photometric_loss(out.image, gt)

        @jax.jit
        def vg(p):
            val, g = jax.value_and_grad(loss_fn)(p)
            return val, jax.tree_util.tree_map(
                lambda x, gg: x - 1e-12 * gg, p, g
            )

        p = params

        def run(iters):
            nonlocal p
            t0 = time.perf_counter()
            for _ in range(iters):
                val, p = vg(p)
            jax.block_until_ready(val)
            return time.perf_counter() - t0

        dt = marginal(run)
        note(f"render fwd+bwd ({tag} binning): {dt * 1e3:7.3f} ms")

    # ---- projection forward --------------------------------------------
    @jax.jit
    def proj_step(p):
        pr = project_gaussians(activate_params(p), cam0)
        nudge = 1e-12 * jnp.sum(pr.means2d)
        return pr, {
            k: v + nudge if k == "means3D" else v for k, v in p.items()
        }

    p = params

    def run_proj(iters):
        nonlocal p
        t0 = time.perf_counter()
        for _ in range(iters):
            pr, p = proj_step(p)
        jax.block_until_ready(pr.means2d)
        return time.perf_counter() - t0

    note(f"projection fwd:                {marginal(run_proj) * 1e3:7.3f} ms")

    # ---- duplicate+sort binning (fwd only) ------------------------------
    @jax.jit
    def bin_step(p):
        rv = activate_params(p)
        pr = project_gaussians(rv, cam0)
        bins = bin_gaussians_packed(
            pr, rv.colors, rv.opacities, cam0.width, cam0.height,
            max_span=2, chunk=128,
        )
        nudge = 1e-12 * bins.packed[0, 0]
        return bins, {
            k: v + nudge if k == "means3D" else v for k, v in p.items()
        }

    p = params

    def run_bin(iters):
        nonlocal p
        t0 = time.perf_counter()
        for _ in range(iters):
            bins, p = bin_step(p)
        jax.block_until_ready(bins.packed)
        return time.perf_counter() - t0

    note(f"project+bin+pack fwd:          {marginal(run_bin) * 1e3:7.3f} ms")

    # ---- compute_binning (the once-per-rebin cost) ----------------------
    @jax.jit
    def cb_step(p):
        b = binning_for(activate_params(p), cam0, max_span=2)
        nudge = 1e-12 * b.tile_start[0].astype(jnp.float32)
        return b, {
            k: v + nudge if k == "means3D" else v for k, v in p.items()
        }

    p = params

    def run_cb(iters):
        nonlocal p
        t0 = time.perf_counter()
        for _ in range(iters):
            b, p = cb_step(p)
        jax.block_until_ready(b.tile_start)
        return time.perf_counter() - t0

    note(f"binning_for (per rebin):       {marginal(run_cb) * 1e3:7.3f} ms")


if __name__ == "__main__":
    main()
