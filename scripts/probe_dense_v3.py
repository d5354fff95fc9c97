"""Dense 4K texture step: v1 vs v3 blend variants (+tps sweep)."""
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
from topo4d_tpu.opt.adam import adam_init
from topo4d_tpu.rasterizer.pallas import binning_for, render_gaussians_pallas
from topo4d_tpu.texture.dense import (
    TextureState,
    dense_rendervars,
    make_texture_step,
)

T0 = time.perf_counter()


def note(msg):
    print(f"[+{time.perf_counter() - T0:7.1f}s] {msg}", flush=True)


def marginal(run, n_small=3, n_big=12, reps=3):
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
    cams = jax.tree_util.tree_map(lambda x: jnp.asarray(x)[None], cam)

    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        opt = adam_init(params_np)
    params = {k2: jnp.asarray(v) for k2, v in params_np.items()}
    opt = jax.tree_util.tree_map(jnp.asarray, opt)

    means = jnp.asarray(pts)
    gt = jnp.zeros((3, h, w), jnp.float32)
    anchor = jnp.asarray(params_np["dense_rgb_colors"])
    lr = {k2: jnp.asarray(0.002, jnp.float32) for k2 in params_np}
    weights = {"im": jnp.asarray(1.0), "soft_color": jnp.asarray(0.02)}
    vid = jnp.asarray(0, jnp.int32)

    binning = jax.block_until_ready(
        binning_for(dense_rendervars(params, means), cam, max_span=2)
    )
    nonempty = int(jnp.sum(binning.tile_count > 0))
    cap = int(-(-int(nonempty * 1.25) // 2048) * 2048)
    cap = min(cap, int(binning.tile_count.shape[0]))
    note(f"binning ready ({nonempty} nonempty, cap {cap})")

    for variant, tps in (("stream", None), ("v3", None), ("v3", 8),
                         ("stream", 8)):
        step = make_texture_step(
            lambda rv, c, b, variant=variant, tps=tps: render_gaussians_pallas(
                rv, c, max_span=2, chunk=128, binning=b, tile_capacity=cap,
                variant=variant, tps=tps,
            )
        )
        state = TextureState(params=params, opt=opt)

        def run(iters):
            nonlocal state
            t0 = time.perf_counter()
            for _ in range(iters):
                state, m = step(
                    state, means, gt, cams, vid, anchor, (), lr, weights,
                    binning, with_metrics=False,
                )
            jax.block_until_ready(m["loss_total"])
            return time.perf_counter() - t0

        try:
            dt = marginal(run)
            note(f"dense step ({variant:6s} tps={tps}): {dt * 1e3:7.1f} ms")
        except Exception as exc:
            note(f"dense step ({variant:6s} tps={tps}): FAILED "
                 f"{type(exc).__name__}: {str(exc)[:150]}")


if __name__ == "__main__":
    main()
