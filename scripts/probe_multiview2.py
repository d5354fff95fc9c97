"""Isolate the fused-multiview regression: render-only vs photometric-only."""
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp
import numpy as np

from topo4d_tpu.core.gaussian import activate_params
from topo4d_tpu.losses.image import photometric_loss
from topo4d_tpu.rasterizer.pallas import (
    render_gaussians_pallas,
    render_gaussians_pallas_multiview,
)
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


def timed_vg(tag, fn, params):
    @jax.jit
    def vg(p):
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

    note(f"{tag}: {marginal(run) * 1e3:7.2f} ms")


def main():
    params_np, _, _ = make_head_fixture()
    params = {k: jnp.asarray(v) for k, v in params_np.items()}
    v = 24
    cams = make_camera_ring(v, width=375, height=512, distance=2.0)
    gt = jnp.zeros((v, 3, 512, 375)) + 0.4
    note("fixture ready")

    # render-only (sum of pixels as loss — no SSIM)
    def render_map(p):
        rv = activate_params(p)

        def one(args):
            (cam,) = args
            out = render_gaussians_pallas(rv, cam, max_span=2, chunk=128)
            return jnp.sum(out.image * out.image)

        return jnp.mean(jax.lax.map(one, (cams,)))

    def render_mv(p):
        rv = activate_params(p)
        out = render_gaussians_pallas_multiview(
            rv, cams, max_span=2, chunk=128
        )
        return jnp.mean(out.image * out.image) * 3 * 512 * 375

    timed_vg("render-only fwd+bwd (lax.map)", render_map, params)
    timed_vg("render-only fwd+bwd (fused) ", render_mv, params)

    # photometric-only on fixed images (no render): batched vs lax.map
    ims = jnp.asarray(
        np.random.default_rng(0)
        .uniform(0, 1, (v, 3, 512, 375))
        .astype(np.float32)
    )

    def photo_batched(p):
        off = p["means3D"][0, 0] * 1e-12
        losses = jax.vmap(photometric_loss)(ims + off, gt)
        return jnp.mean(losses)

    def photo_map(p):
        off = p["means3D"][0, 0] * 1e-12

        def one(args):
            im, g = args
            return photometric_loss(im + off, g)

        return jnp.mean(jax.lax.map(one, (ims, gt)))

    timed_vg("photometric x24 (vmap)      ", photo_batched, params)
    timed_vg("photometric x24 (lax.map)   ", photo_map, params)


if __name__ == "__main__":
    main()
