"""Ablation of the 4K texture step: where do ~300 ms/iter go?

Variants of the jitted fwd+bwd: full photometric (L1+SSIM, remat), L1-only,
no-render (loss on a frozen image), plus standalone SSIM fwd+bwd and the
packing-backward segment-sum at dense scale.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from topo4d_tpu.core.camera import make_camera
from topo4d_tpu.core.gaussian import GaussianRenderVars
from topo4d_tpu.losses.image import l1_loss, photometric_loss, ssim
from topo4d_tpu.rasterizer.pallas import render_gaussians_pallas


def marginal(name, fn, *args, i1=3, i2=12):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(i1):
        out = fn(*args)
    jax.block_until_ready(out)
    ta = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(i2):
        out = fn(*args)
    jax.block_until_ready(out)
    tb = time.perf_counter() - t0
    dt = (tb - ta) / (i2 - i1) * 1e3
    print(f"{name:44s} {dt:8.1f} ms", flush=True)
    return dt


def main(n=300_000, w=3840, h=2160):
    rng = np.random.default_rng(0)
    pts = rng.normal(0, 0.25, (n, 3)).astype(np.float32)
    pts[:, 2] *= 0.05
    rv = GaussianRenderVars(
        means3d=jnp.asarray(pts),
        colors=jnp.asarray(
            rng.uniform(0.1, 0.9, (n, 3)).astype(np.float32)
        ),
        rotations=jnp.asarray(
            np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
        ),
        opacities=jnp.full((n,), 0.95, jnp.float32),
        scales=jnp.full((n, 3), 0.0015, jnp.float32),
    )
    k = np.array(
        [[2.2 * w, 0, w / 2], [0, 2.2 * w, h / 2], [0, 0, 1]], np.float32
    )
    w2c = np.eye(4, dtype=np.float32)
    w2c[2, 3] = 2.0
    cam = make_camera(k, w2c, w, h)

    render = lambda rv: render_gaussians_pallas(rv, cam, max_span=2,
                                                chunk=128)
    gt = jax.block_until_ready(jax.jit(render)(rv).image)
    gt = jnp.clip(gt * 0.5 + 0.25, 0.0, 1.0)

    def vg(loss):
        def f(colors, gt):
            out = render(rv._replace(colors=colors))
            return loss(out.image, gt)
        return jax.jit(jax.value_and_grad(f))

    t_full = marginal("fwd+bwd L1+SSIM (remat)", vg(
        lambda a, b: jax.checkpoint(photometric_loss)(a, b)), rv.colors, gt)
    t_nore = marginal("fwd+bwd L1+SSIM no-remat",
                      vg(photometric_loss), rv.colors, gt)
    t_l1 = marginal("fwd+bwd L1 only", vg(lambda a, b: l1_loss(a, b)),
                    rv.colors, gt)

    im = jnp.clip(gt * 0.9 + 0.02, 0.0, 1.0)
    t_ssim = marginal("SSIM-only fwd+bwd (standalone)", jax.jit(
        jax.value_and_grad(lambda a: ssim(a, gt))), im)
    t_l1s = marginal("L1-only fwd+bwd (standalone)", jax.jit(
        jax.value_and_grad(lambda a: l1_loss(a, gt))), im)

    print(f"-> ssim in-situ {t_full - t_l1:6.1f} | remat cost "
          f"{t_full - t_nore:6.1f} | render-side {t_l1 - t_l1s:6.1f}",
          flush=True)


if __name__ == "__main__":
    main()
