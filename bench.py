"""Benchmark: fwd+bwd rasterization throughput and sec/frame estimate.

Runs on whatever backend the ambient environment provides (real TPU chip
under the driver). Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}

Headline metric: Mpix/s/chip through forward+backward of the tiled
differentiable rasterizer at the reference's geometry-phase scale
(8,280 Gaussians, 512x375 view, 24-camera rig). ``vs_baseline`` is the
ratio of the BASELINE.md north-star (<= 5 s per tracked frame, 1,100
geometry iterations) to our extrapolated sec/frame — >= 1 means the
target is met.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from topo4d_tpu.core.gaussian import activate_params
    from topo4d_tpu.losses.image import photometric_loss
    from topo4d_tpu.rasterizer.pallas import render_gaussians_pallas
    from topo4d_tpu.testing import make_head_fixture

    params_np, cams, _ = make_head_fixture()
    cam0 = cams[0]
    h, w = cam0.height, cam0.width
    params = {k: jnp.asarray(v) for k, v in params_np.items()}
    n = params["means3D"].shape[0]

    rv0 = activate_params(params)
    render = jax.jit(
        lambda rv: render_gaussians_pallas(rv, cam0, max_span=2, chunk=128)
    )
    gt = jax.block_until_ready(render(rv0).image)

    def loss_fn(params, gt):
        rv = activate_params(params)
        out = render_gaussians_pallas(rv, cam0, max_span=2, chunk=128)
        return photometric_loss(out.image, gt)

    vg = jax.jit(jax.value_and_grad(loss_fn))

    # warmup / compile
    val, grads = vg(params, gt)
    jax.block_until_ready(grads)

    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        val, grads = vg(params, gt)
    jax.block_until_ready(grads)
    dt = time.perf_counter() - t0
    step_s = dt / iters
    mpix_s = h * w / step_s / 1e6

    # sec/frame estimate: 1,100 single-view fwd+bwd steps (reference
    # tracking schedule, train.py:775). Adam/constraint overhead is small
    # relative to render+grad; refined once the full pipeline benches.
    sec_per_frame = step_s * 1100
    target = 5.0

    stats = render(rv0)
    result = {
        "metric": "Mpix/s/chip fwd+bwd rasterize",
        "value": round(mpix_s, 2),
        "unit": "Mpix/s",
        "vs_baseline": round(target / sec_per_frame, 3),
        "step_ms": round(step_s * 1e3, 3),
        "sec_per_frame_1100it": round(sec_per_frame, 3),
        "gaussians": int(n),
        "image": f"{w}x{h}",
        "backend": jax.devices()[0].platform,
        "num_cropped": int(stats.num_cropped),
        "num_overflow": int(stats.num_overflow),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
