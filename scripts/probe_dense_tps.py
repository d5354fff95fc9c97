"""tiles_per_step sweep for the DENSE compact blend (4K, 300k Gaussians).

docs/PERFORMANCE.md lever 3: the compact non-empty-tile blend runs
~14.2k occupied tiles at tps=4 (default). Deeper dense tiles (~84
entries) sit in a different regime from the shallow geometry tiles where
tps=8 gained nothing — measure the render fwd+bwd at tps 4/8 (16 OOMs
the backward's scoped VMEM at geometry scale; re-checked here).
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

from topo4d_tpu.utils.profiling import sync_value

from topo4d_tpu.core.camera import make_camera
from topo4d_tpu.rasterizer.pallas import binning_for, render_gaussians_pallas
from topo4d_tpu.texture.dense import dense_rendervars

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
    params = {
        "dense_rgb_colors": jnp.asarray(
            rng.uniform(0.1, 0.9, (n, 3)).astype(np.float32)
        ),
        "dense_unnorm_rotations": jnp.asarray(
            np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
        ),
        "dense_logit_opacities": jnp.full((n, 1), 3.0),
        "dense_log_scales": jnp.full((n, 3), float(np.log(0.0015))),
    }
    k = np.array(
        [[2.2 * w, 0, w / 2], [0, 2.2 * w, h / 2], [0, 0, 1]], np.float32
    )
    w2c = np.eye(4, dtype=np.float32)
    w2c[2, 3] = 2.0
    cam = make_camera(k, w2c, w, h)
    means = jnp.asarray(pts)
    rv = dense_rendervars(params, means)
    binning = sync_value(binning_for(rv, cam, max_span=2))
    nonempty = int(jnp.sum(binning.tile_count > 0))
    cap = min(
        int(-(-int(nonempty * 1.25) // 2048) * 2048),
        int(binning.tile_count.shape[0]),
    )
    note(f"binning ready ({nonempty} tiles, cap {cap})")

    for tps in (4, 8, 16):
        def render_loss(params):
            rv = dense_rendervars(params, means)
            out = render_gaussians_pallas(
                rv, cam, max_span=2, chunk=128, binning=binning,
                tile_capacity=cap, tps=tps,
            )
            return jnp.sum(out.image) * 1e-6

        @jax.jit
        def render_vg(params):
            val, g = jax.value_and_grad(render_loss)(params)
            return val, jax.tree_util.tree_map(
                lambda p, gg: p - 1e-12 * gg, params, g
            )

        p2 = params

        def run(iters):
            nonlocal p2
            t0 = time.perf_counter()
            for _ in range(iters):
                val, p2 = render_vg(p2)
            sync_value(val)
            return time.perf_counter() - t0

        try:
            dt = marginal(run)
            note(f"render fwd+bwd tps={tps}: {dt * 1e3:8.2f} ms")
        except Exception as exc:
            note(f"render fwd+bwd tps={tps}: FAILED {type(exc).__name__}: "
                 f"{str(exc)[:120]}")


if __name__ == "__main__":
    main()
