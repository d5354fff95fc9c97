"""Attribute the dense texture step's "other" bucket (~40 of 158 ms).

docs/PERFORMANCE.md splits the 158 ms dense step into blend+assembly
~57, photometric 46.8, pack gather 19, other ~40. This isolates the
candidates inside "other": projection fwd+bwd at 300k (the EWA cov
backward through learned rotations), Adam at 300k x 4 leaves, the
soft_color anchor, dense_rendervars activation, and the step's
remaining glue. Marginal two-point timing, state carried (bench.py's
tunnel notes).
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

from topo4d_tpu.core.camera import make_camera
from topo4d_tpu.core.gaussian import project_gaussians
from topo4d_tpu.opt.adam import adam_init, adam_update
from topo4d_tpu.texture.dense import dense_rendervars
from topo4d_tpu.losses.image import l1_loss_sum_last

T0 = time.perf_counter()


def note(msg):
    print(f"[+{time.perf_counter() - T0:7.1f}s] {msg}", flush=True)


def marginal(run, n_small=5, n_big=25, reps=3):
    run(n_small)
    run(n_big)
    t_small = min(run(n_small) for _ in range(reps))
    t_big = min(run(n_big) for _ in range(reps))
    return (t_big - t_small) / (n_big - n_small)


def main(n=300_000, w=3840, h=2160):
    rng = np.random.default_rng(0)
    pts = rng.normal(0, 1.0, (n, 3)).astype(np.float32)
    pts *= np.array([0.06, 0.1, 0.01], np.float32)
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
    params = {k2: jnp.asarray(v) for k2, v in params_np.items()}
    means = jnp.asarray(pts)
    note("setup done")

    # ---- projection fwd+bwd at 300k (rotations learn) -------------------
    def proj_loss(params):
        rv = dense_rendervars(params, means)
        p = project_gaussians(rv, cam)
        return (
            jnp.sum(p.conics) * 1e-6 + jnp.sum(p.means2d) * 1e-9
            + jnp.sum(p.depths) * 1e-9
        )

    @jax.jit
    def proj_vg(params):
        val, g = jax.value_and_grad(proj_loss)(params)
        return val, jax.tree_util.tree_map(
            lambda p, gg: p - 1e-12 * gg, params, g
        )

    p2 = params

    def run_proj(iters):
        nonlocal p2
        t0 = time.perf_counter()
        for _ in range(iters):
            val, p2 = proj_vg(p2)
        jax.block_until_ready(val)
        return time.perf_counter() - t0

    note(f"projection fwd+bwd:    {marginal(run_proj) * 1e3:8.2f} ms")

    # ---- Adam at 300k x 4 leaves ----------------------------------------
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        opt0 = adam_init(params_np)
    opt = jax.tree_util.tree_map(jnp.asarray, opt0)
    lr = {k2: jnp.asarray(0.002, jnp.float32) for k2 in params_np}
    grads = {k2: jnp.asarray(v) * 1e-6 for k2, v in params_np.items()}

    @jax.jit
    def adam_once(params, opt):
        return adam_update(params, grads, opt, lr)

    p3, o3 = params, opt

    def run_adam(iters):
        nonlocal p3, o3
        t0 = time.perf_counter()
        for _ in range(iters):
            p3, o3 = adam_once(p3, o3)
        jax.block_until_ready(p3["dense_rgb_colors"])
        return time.perf_counter() - t0

    note(f"adam update:           {marginal(run_adam) * 1e3:8.2f} ms")

    # ---- anchor loss fwd+bwd --------------------------------------------
    anchor = jnp.asarray(params_np["dense_rgb_colors"])

    @jax.jit
    def anchor_vg(c):
        val, g = jax.value_and_grad(
            lambda x: l1_loss_sum_last(x, anchor)
        )(c)
        return val, c - 1e-12 * g

    c4 = params["dense_rgb_colors"] + 0.01

    def run_anchor(iters):
        nonlocal c4
        t0 = time.perf_counter()
        for _ in range(iters):
            val, c4 = anchor_vg(c4)
        jax.block_until_ready(val)
        return time.perf_counter() - t0

    note(f"soft_color anchor:     {marginal(run_anchor) * 1e3:8.2f} ms")

    # ---- activation (dense_rendervars) fwd+bwd ---------------------------
    @jax.jit
    def act_vg(params):
        def f(params):
            rv = dense_rendervars(params, means)
            return (
                jnp.sum(rv.colors) * 1e-6
                + jnp.sum(rv.rotations) * 1e-6
                + jnp.sum(rv.opacities) * 1e-6
                + jnp.sum(rv.scales) * 1e-6
            )
        val, g = jax.value_and_grad(f)(params)
        return val, jax.tree_util.tree_map(
            lambda p, gg: p - 1e-12 * gg, params, g
        )

    p5 = params

    def run_act(iters):
        nonlocal p5
        t0 = time.perf_counter()
        for _ in range(iters):
            val, p5 = act_vg(p5)
        jax.block_until_ready(val)
        return time.perf_counter() - t0

    note(f"activation:            {marginal(run_act) * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
