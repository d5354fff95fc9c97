"""Stage breakdown of the fused multi-view render at bench scale.

Times on the ambient (TPU) backend, all with carried state:
  - 24x lax.map single-view render fwd+bwd      [the 60.7ms baseline path]
  - fused multiview render fwd+bwd              [the tall-canvas path]
  - vmapped compute_binning alone (24 views)
  - vmapped pack_with_binning fwd alone
  - fused blend fwd alone (frozen binning+pack)
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
from topo4d_tpu.losses.image import photometric_loss
from topo4d_tpu.rasterizer.pallas import (
    render_gaussians_pallas,
    render_gaussians_pallas_multiview,
)
from topo4d_tpu.rasterizer.tiles import compute_binning, pack_with_binning
from topo4d_tpu.testing import make_camera_ring, make_head_fixture

T0 = time.perf_counter()


def note(msg):
    print(f"[+{time.perf_counter() - T0:7.1f}s] {msg}", flush=True)


def marginal(run, small=10, big=60, reps=3):
    run(small)
    run(big)
    t1 = min(run(small) for _ in range(reps))
    t2 = min(run(big) for _ in range(reps))
    return (t2 - t1) / (big - small)


def main():
    params_np, _, _ = make_head_fixture()
    params = {k: jnp.asarray(v) for k, v in params_np.items()}
    v = 24
    cams = make_camera_ring(v, width=375, height=512, distance=2.0)
    gt = jnp.zeros((v, 3, 512, 375)) + 0.4
    note("fixture ready")

    # ---- lax.map over per-view renders (the previous batched path) ------
    def loss_map(p):
        rv = activate_params(p)

        def one(args):
            im, cam = args
            out = render_gaussians_pallas(rv, cam, max_span=2, chunk=128)
            return photometric_loss(out.image, im)

        losses = jax.lax.map(one, (gt, cams))
        return jnp.mean(losses)

    # ---- fused multiview ------------------------------------------------
    def loss_mv(p):
        rv = activate_params(p)
        out = render_gaussians_pallas_multiview(
            rv, cams, max_span=2, chunk=128
        )
        losses = jax.vmap(photometric_loss)(out.image, gt)
        return jnp.mean(losses)

    for tag, fn in (("lax.map 24x", loss_map), ("fused mv", loss_mv)):
        @jax.jit
        def vg(p, fn=fn):
            val, g = jax.value_and_grad(fn)(p)
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
        note(f"render+photometric fwd+bwd ({tag}): {dt * 1e3:7.2f} ms")

    # ---- vmapped binning alone ------------------------------------------
    @jax.jit
    def bin_step(p):
        rv = activate_params(p)
        proj_v = jax.vmap(lambda c: project_gaussians(rv, c))(cams)
        b = jax.vmap(lambda pr: compute_binning(pr, 375, 512, 2))(proj_v)
        nudge = 1e-12 * b.tile_start[0, 0].astype(jnp.float32)
        return b, {
            k: x + nudge if k == "means3D" else x for k, x in p.items()
        }

    p = params

    def run_bin(iters):
        nonlocal p
        t0 = time.perf_counter()
        for _ in range(iters):
            b, p = bin_step(p)
        jax.block_until_ready(b.tile_start)
        return time.perf_counter() - t0

    note(f"vmapped binning x24:          {marginal(run_bin) * 1e3:7.2f} ms")

    # ---- vmapped pack fwd alone ------------------------------------------
    rv0 = activate_params(params)
    proj0 = jax.vmap(lambda c: project_gaussians(rv0, c))(cams)
    binning = jax.block_until_ready(
        jax.jit(
            lambda pv: jax.vmap(
                lambda pr: compute_binning(pr, 375, 512, 2)
            )(pv)
        )(proj0)
    )

    @jax.jit
    def pack_step(p):
        rv = activate_params(p)
        proj_v = jax.vmap(lambda c: project_gaussians(rv, c))(cams)
        bins = jax.vmap(
            lambda pr, b: pack_with_binning(
                pr, rv.colors, rv.opacities, b, 128
            )
        )(proj_v, binning)
        nudge = 1e-12 * bins.packed[0, 0, 0]
        return bins, {
            k: x + nudge if k == "means3D" else x for k, x in p.items()
        }

    p = params

    def run_pack(iters):
        nonlocal p
        t0 = time.perf_counter()
        for _ in range(iters):
            bins, p = pack_step(p)
        jax.block_until_ready(bins.packed)
        return time.perf_counter() - t0

    note(f"project+pack fwd x24 (frozen): {marginal(run_pack) * 1e3:7.2f} ms")


if __name__ == "__main__":
    main()
