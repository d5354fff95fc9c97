"""Marginal timing of the REAL jitted texture step at 4K / 300k scale.

Times make_texture_step (render fwd+bwd + photometric(SSIM banded) +
soft_color + Adam) — the per-iteration cost of the reference's 301-step
texture loop (train.py:715-743).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from topo4d_tpu.core.camera import make_camera
from topo4d_tpu.opt.adam import adam_init
from topo4d_tpu.rasterizer.pallas import render_gaussians_pallas
from topo4d_tpu.texture.dense import TextureState, make_texture_step


def main(n=300_000, w=3840, h=2160):
    rng = np.random.default_rng(0)
    pts = rng.normal(0, 0.25, (n, 3)).astype(np.float32)
    pts[:, 2] *= 0.05
    params_np = {
        "dense_rgb_colors": rng.uniform(0.1, 0.9, (n, 3)).astype(np.float32),
        "dense_unnorm_rotations": np.tile(
            np.array([1, 0, 0, 0], np.float32), (n, 1)
        ),
        "dense_logit_opacities": np.full((n, 1), 3.0, np.float32),
        "dense_log_scales": np.full((n, 3), np.log(0.0015), np.float32),
    }
    k = np.array(
        [[2.2 * w, 0, w / 2], [0, 2.2 * w, h / 2], [0, 0, 1]], np.float32
    )
    w2c = np.eye(4, dtype=np.float32)
    w2c[2, 3] = 2.0
    cam = make_camera(k, w2c, w, h)
    cams = jax.tree_util.tree_map(lambda x: jnp.asarray(x)[None], cam)

    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        opt = adam_init(params_np)
    params = {k2: jnp.asarray(v) for k2, v in params_np.items()}
    opt = jax.tree_util.tree_map(jnp.asarray, opt)
    state = TextureState(params=params, opt=opt)

    means = jnp.asarray(pts)
    gt = jnp.zeros((3, h, w), jnp.float32)
    anchor = jnp.asarray(params_np["dense_rgb_colors"])
    lr = {k2: jnp.asarray(0.002, jnp.float32) for k2 in params_np}
    weights = {"im": jnp.asarray(1.0), "soft_color": jnp.asarray(0.02)}
    vid = jnp.asarray(0, jnp.int32)

    step = make_texture_step(
        lambda rv, c, b: render_gaussians_pallas(
            rv, c, max_span=2, chunk=128, binning=b
        )
    )
    t0 = time.perf_counter()
    state, m = step(
        state, means, gt, cams, vid, anchor, (), lr, weights,
        with_metrics=False,
    )
    jax.block_until_ready(m["loss_total"])
    print(f"compile+first {time.perf_counter() - t0:.1f}s "
          f"loss {float(m['loss_total']):.4f}", flush=True)

    def run(iters, binning=None):
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = step(
                state, means, gt, cams, vid, anchor, (), lr, weights,
                binning, with_metrics=False,
            )
        jax.block_until_ready(m["loss_total"])
        return time.perf_counter() - t0

    t1 = run(4)
    t2 = run(16)
    dt = (t2 - t1) / 12 * 1e3
    print(f"texture step (re-bin each iter)   {dt:7.1f} ms  "
          f"({dt * 301 / 1e3:.1f} s / 301-iter frame)", flush=True)

    # frozen-binning path
    from topo4d_tpu.rasterizer.pallas import binning_for
    from topo4d_tpu.texture.dense import dense_rendervars

    binning = jax.block_until_ready(
        binning_for(dense_rendervars(state.params, means), cam, max_span=2)
    )
    state, m = step(
        state, means, gt, cams, vid, anchor, (), lr, weights, binning,
        with_metrics=False,
    )
    jax.block_until_ready(m["loss_total"])
    t1 = run(4, binning)
    t2 = run(16, binning)
    dt_b = (t2 - t1) / 12 * 1e3
    print(f"texture step (frozen binning)     {dt_b:7.1f} ms  "
          f"({dt_b * 301 / 1e3:.1f} s / 301-iter frame)", flush=True)

    # scanned segment (the production path): marginal per iteration
    from topo4d_tpu.texture.dense import make_texture_multi_step

    multi = make_texture_multi_step(
        lambda rv, c, b: render_gaussians_pallas(
            rv, c, max_span=2, chunk=128, binning=b
        )
    )
    images = gt[None]
    binnings = jax.tree_util.tree_map(lambda x: x[None], binning)

    def run_scan(iters):
        nonlocal state
        vids = jnp.zeros((iters,), jnp.int32)
        state, losses = multi(
            state, means, images, cams, vids, anchor, (), lr, weights,
            binnings,
        )
        t0 = time.perf_counter()
        state, losses = multi(
            state, means, images, cams, vids, anchor, (), lr, weights,
            binnings,
        )
        jax.block_until_ready(losses)
        return time.perf_counter() - t0

    s1 = run_scan(4)
    s2 = run_scan(16)
    dt_s = (s2 - s1) / 12 * 1e3
    print(f"texture step (scan+frozen bin)    {dt_s:7.1f} ms  "
          f"({dt_s * 301 / 1e3:.1f} s / 301-iter frame)", flush=True)


if __name__ == "__main__":
    main()
