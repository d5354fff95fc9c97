"""Calibrate tunnel dispatch/sync overhead: total = sync_cost + per_call*n."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def run(tag, fn, arg, iters_list=(25, 100, 400)):
    out = jax.block_until_ready(fn(arg))
    totals = []
    for iters in iters_list:
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(arg)
        jax.block_until_ready(out)
        totals.append((time.perf_counter() - t0) * 1e3)
    i1, i2 = iters_list[0], iters_list[-1]
    b = (totals[-1] - totals[0]) / (i2 - i1)
    a = totals[0] - b * i1
    print(f"{tag:34s} totals={[round(t,1) for t in totals]} ms "
          f"-> fixed={a:7.1f} ms marginal={b:7.3f} ms/call", flush=True)


def main():
    tiny = jnp.ones(8)
    f = jax.jit(lambda x: x + 1.0)
    run("tiny x+1 (few buffers)", f, tiny)

    # ready-buffer sync cost
    t0 = time.perf_counter()
    for _ in range(50):
        jax.block_until_ready(tiny)
    print(f"block_until_ready ready buf x50: "
          f"{(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)

    # allocate many live buffers, retime
    rng = np.random.default_rng(0)
    keep = [jnp.asarray(rng.normal(size=(64, 64)).astype(np.float32))
            for _ in range(150)]
    jax.block_until_ready(keep)
    run("tiny x+1 (150 live buffers)", f, tiny)

    t0 = time.perf_counter()
    for _ in range(50):
        jax.block_until_ready(tiny)
    print(f"block_until_ready with 150 live x50: "
          f"{(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)

    # realistic render step marginal cost
    from topo4d_tpu.core.gaussian import activate_params
    from topo4d_tpu.rasterizer.pallas import render_gaussians_pallas
    from topo4d_tpu.testing import make_head_fixture

    params_np, cams, _ = make_head_fixture()
    cam0 = cams[0]
    params = {k: jnp.asarray(v) for k, v in params_np.items()}
    rv = activate_params(params)

    render = jax.jit(
        lambda rv: render_gaussians_pallas(rv, cam0, max_span=2, chunk=128)
    )
    run("render full fwd", render, rv, (10, 40, 160))

    from topo4d_tpu.losses.image import photometric_loss

    gt = jax.block_until_ready(render(rv).image)

    def loss_fn(params):
        rvv = activate_params(params)
        o = render_gaussians_pallas(rvv, cam0, max_span=2, chunk=128)
        return photometric_loss(o.image, gt)

    vg = jax.jit(jax.value_and_grad(loss_fn))
    run("render fwd+bwd (L1+SSIM)", vg, params, (10, 40, 160))


if __name__ == "__main__":
    main()
