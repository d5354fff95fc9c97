"""Geometry-scale render fwd+bwd: streaming vs VMEM-resident blend."""
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
from topo4d_tpu.testing import make_head_fixture

T0 = time.perf_counter()


def note(msg):
    print(f"[+{time.perf_counter() - T0:7.1f}s] {msg}", flush=True)


def main():
    params_np, cams, _ = make_head_fixture()
    cam0 = cams[0]
    params = {k: jnp.asarray(v) for k, v in params_np.items()}
    gt = jnp.zeros((3, cam0.height, cam0.width)) + 0.4
    note("fixture ready")

    for variant in ("stream", "resident"):

        def loss_fn(params):
            rv = activate_params(params)
            out = render_gaussians_pallas(
                rv, cam0, max_span=2, chunk=128, variant=variant
            )
            return photometric_loss(out.image, gt)

        @jax.jit
        def vg(params):
            val, grads = jax.value_and_grad(loss_fn)(params)
            return val, jax.tree_util.tree_map(
                lambda p, g: p - 1e-12 * g, params, grads
            )

        p = params
        val, p = vg(p)
        jax.block_until_ready(val)
        note(f"{variant}: compiled")

        def run(iters):
            nonlocal p
            t0 = time.perf_counter()
            for _ in range(iters):
                val, p = vg(p)
            jax.block_until_ready(val)
            return time.perf_counter() - t0

        run(25)
        t1 = min(run(25) for _ in range(3))
        t2 = min(run(225) for _ in range(3))
        note(f"{variant}: render fwd+bwd {(t2 - t1) / 200 * 1e3:7.3f} ms")


if __name__ == "__main__":
    main()
