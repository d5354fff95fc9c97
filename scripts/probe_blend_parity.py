"""TPU-side parity + timing for the monotone-window blend kernels."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from topo4d_tpu.core.gaussian import activate_params
from topo4d_tpu.losses.image import photometric_loss
from topo4d_tpu.rasterizer.pallas import render_gaussians_pallas
from topo4d_tpu.rasterizer.tiled import render_gaussians_tiled
from topo4d_tpu.testing import make_head_fixture


def marginal(name, fn, *args, i1=25, i2=225):
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
    print(f"{name:40s} {(tb - ta) / (i2 - i1) * 1e3:8.3f} ms", flush=True)
    return out


def main():
    params_np, cams, _ = make_head_fixture()
    cam0 = cams[0]
    params = {k: jnp.asarray(v) for k, v in params_np.items()}
    rv = activate_params(params)

    pal = jax.jit(lambda rv: render_gaussians_pallas(
        rv, cam0, max_span=2, chunk=128).image)
    til = jax.jit(lambda rv: render_gaussians_tiled(
        rv, cam0, max_span=2).image)
    ip = jax.block_until_ready(pal(rv))
    it = jax.block_until_ready(til(rv))
    err = float(jnp.max(jnp.abs(ip - it)))
    print(f"fwd max |pallas - tiled| = {err:.3e}", flush=True)
    assert err < 1e-2, "forward parity FAILED"  # TPU exp/matmul numerics vs tiled

    # a DISTANT target: with gt == tiled image, im_pallas - gt is ~1e-5
    # noise with random signs and the L1 subgradient flips per pixel,
    # which would compare sign noise, not kernels
    gt = jnp.clip(it * 0.5 + 0.25, 0.0, 1.0)

    def loss_p(params):
        rv = activate_params(params)
        o = render_gaussians_pallas(rv, cam0, max_span=2, chunk=128)
        return photometric_loss(o.image, gt)

    def loss_t(params):
        rv = activate_params(params)
        o = render_gaussians_tiled(rv, cam0, max_span=2)
        return photometric_loss(o.image, gt)

    gp = jax.jit(jax.grad(loss_p))(params)
    gt2 = jax.jit(jax.grad(loss_t))(params)
    jax.block_until_ready(gp)
    for k in sorted(gp):
        a, b = np.asarray(gp[k]), np.asarray(gt2[k])
        scale = max(np.abs(b).max(), 1e-6)
        rel = np.abs(a - b).max() / scale
        print(f"grad {k:16s} max rel err {rel:.3e}", flush=True)
        # TPU-only deviation vs tiled (log-space exp cumprod vs direct
        # chunked cumprod transcendental precision); old and new kernels
        # are bitwise-identical on this fixture
        assert rel < 1e-1, f"grad parity FAILED for {k}"

    vg = jax.jit(jax.value_and_grad(loss_p))
    jax.block_until_ready(vg(params)[1])
    marginal("render fwd+bwd (L1+SSIM)", lambda p: vg(p)[1]["means3D"], params)
    marginal("render fwd only", pal, rv)
    print("PARITY OK", flush=True)


if __name__ == "__main__":
    main()
