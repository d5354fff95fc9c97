"""v1 vs v3 blend kernel timing + TPU numerics at bench scale."""
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
from topo4d_tpu.rasterizer.pallas import render_gaussians_pallas
from topo4d_tpu.testing import make_camera_ring, make_head_fixture

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
    params_np, cams_fix, _ = make_head_fixture()
    params = {k: jnp.asarray(v) for k, v in params_np.items()}
    cam = cams_fix[0]
    gt = jnp.zeros((3, cam.height, cam.width)) + 0.4

    # TPU numerics: v3 vs v1 on the same scene
    rv = activate_params(params)
    o1 = render_gaussians_pallas(rv, cam, max_span=2, chunk=128,
                                 variant="stream")
    o2 = render_gaussians_pallas(rv, cam, max_span=2, chunk=128,
                                 variant="v3")
    d = float(jnp.max(jnp.abs(o2.image - o1.image)))
    note(f"TPU numerics: max |v2-v1| image = {d:.2e}")

    def g(p, variant):
        out = render_gaussians_pallas(
            activate_params(p), cam, max_span=2, chunk=128,
            variant=variant)
        return photometric_loss(out.image, gt)

    g1 = jax.grad(lambda p: g(p, "stream"))(params)
    g2 = jax.grad(lambda p: g(p, "v3"))(params)
    rel = max(
        float(jnp.max(jnp.abs(g2[k] - g1[k]))
              / (jnp.max(jnp.abs(g1[k])) + 1e-30))
        for k in params
    )
    note(f"TPU numerics: max rel grad diff v3 vs v1 = {rel:.2e}")

    # timing: single-view render+photometric fwd+bwd
    for variant in ("stream", "v3"):
        @jax.jit
        def vg(p, variant=variant):
            val, grads = jax.value_and_grad(
                lambda q: g(q, variant)
            )(p)
            return val, jax.tree_util.tree_map(
                lambda x, gg: x - 1e-12 * gg, p, grads
            )

        p = params

        def run(iters):
            nonlocal p
            t0 = time.perf_counter()
            for _ in range(iters):
                val, p = vg(p)
            jax.block_until_ready(val)
            return time.perf_counter() - t0

        note(f"render fwd+bwd 1 view ({variant:6s}): "
             f"{marginal(run) * 1e3:7.3f} ms")


if __name__ == "__main__":
    main()
