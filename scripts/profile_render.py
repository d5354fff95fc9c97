"""Phase-level timing breakdown of the Pallas render fwd+bwd on the chip."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from topo4d_tpu.core.gaussian import activate_params, project_gaussians
from topo4d_tpu.losses.image import photometric_loss
from topo4d_tpu.rasterizer.pallas import render_gaussians_pallas
from topo4d_tpu.rasterizer.pallas_blend import (
    PX,
    _blend_bwd_impl,
    _blend_fwd_impl,
)
from topo4d_tpu.rasterizer.tiles import bin_gaussians_packed, num_tiles
from topo4d_tpu.testing import make_head_fixture


def timeit(name, fn, *args, iters=30):
    print(f"[compile] {name}", flush=True)
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:35s} {dt:8.3f} ms")
    return out


def main():
    print("[fixture]", flush=True)
    params_np, cams, _ = make_head_fixture()
    cam0 = cams[0]
    h, w = cam0.height, cam0.width
    params = {k: jnp.asarray(v) for k, v in params_np.items()}
    rv = activate_params(params)

    proj = jax.block_until_ready(
        jax.jit(lambda rv: project_gaussians(rv, cam0))(rv)
    )
    timeit("project fwd", jax.jit(lambda rv: project_gaussians(rv, cam0)), rv)

    bin_fn = jax.jit(
        lambda p, c, o: bin_gaussians_packed(p, c, o, w, h, max_span=2)
    )
    bins = timeit("bin fwd", bin_fn, proj, rv.colors, rv.opacities)

    tiles_x, tiles_y = num_tiles(w, h)
    fwd = jax.jit(
        lambda p, s, c: _blend_fwd_impl(p, s, c, tiles_x, tiles_y, 128)
    )
    out = timeit("blend fwd kernel", fwd, bins.packed, bins.tile_start,
                 bins.tile_count)

    g = jnp.ones_like(out)
    bwd = jax.jit(
        lambda p, s, c, o, g: _blend_bwd_impl(
            p, s, c, o, g, tiles_x, tiles_y, 128
        )
    )
    timeit("blend bwd kernel", bwd, bins.packed, bins.tile_start,
           bins.tile_count, out, g)

    render = jax.jit(
        lambda rv: render_gaussians_pallas(rv, cam0, max_span=2, chunk=128)
    )
    rout = timeit("render full fwd", render, rv)
    gt = rout.image

    def loss_fn(params, gt):
        rvv = activate_params(params)
        o = render_gaussians_pallas(rvv, cam0, max_span=2, chunk=128)
        return jnp.sum(jnp.abs(o.image - gt))

    vg = jax.jit(jax.value_and_grad(loss_fn))
    timeit("render fwd+bwd (L1)", vg, params, gt)

    def loss_fn2(params, gt):
        rvv = activate_params(params)
        o = render_gaussians_pallas(rvv, cam0, max_span=2, chunk=128)
        return photometric_loss(o.image, gt)

    vg2 = jax.jit(jax.value_and_grad(loss_fn2))
    timeit("render fwd+bwd (L1+SSIM)", vg2, params, gt)

    # stats
    cend = out[:, 5, 0]
    import numpy as np
    cnt = np.asarray(bins.tile_count)
    ce = np.asarray(cend)
    kfull = np.ceil(cnt / 128).astype(int)
    print(f"tiles={cnt.size} entries={int(cnt.sum())} "
          f"max_count={int(cnt.max())} mean_count={cnt.mean():.1f}")
    print(f"windows full={int(kfull.sum())} processed={int(ce.sum())} "
          f"max_k={int(kfull.max())} max_cend={int(ce.max())}")


if __name__ == "__main__":
    main()
