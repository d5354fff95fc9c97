"""Tiles-per-grid-step sweep for the blend kernels."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from topo4d_tpu.core.gaussian import activate_params, project_gaussians
from topo4d_tpu.rasterizer import pallas_blend
from topo4d_tpu.rasterizer.pallas_blend import _blend_bwd_impl, _blend_fwd_impl
from topo4d_tpu.rasterizer.tiles import bin_gaussians_packed, num_tiles
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
    h, w = cam0.height, cam0.width
    params = {k: jnp.asarray(v) for k, v in params_np.items()}
    rv = activate_params(params)
    proj = jax.block_until_ready(
        jax.jit(lambda rv: project_gaussians(rv, cam0))(rv)
    )
    bins = jax.block_until_ready(
        jax.jit(
            lambda p, c, o: bin_gaussians_packed(p, c, o, w, h, max_span=2)
        )(proj, rv.colors, rv.opacities)
    )
    tiles_x, tiles_y = num_tiles(w, h)

    ref = None
    for tps in (4, 8, 16):
        pallas_blend.TILES_PER_STEP = tps
        fwd = jax.jit(
            lambda p, s, c, tps=tps: _blend_fwd_impl(
                p, s, c, tiles_x, tiles_y, 128
            )
        )
        out = marginal(f"blend fwd tps={tps}", fwd, bins.packed,
                       bins.tile_start, bins.tile_count)
        if ref is None:
            ref = out
        else:
            import numpy as np
            np.testing.assert_allclose(
                np.asarray(out[:, :5]), np.asarray(ref[:, :5]),
                rtol=1e-5, atol=1e-6,
            )
        g = jnp.ones_like(out)
        bwd = jax.jit(
            lambda p, s, c, o, g, tps=tps: _blend_bwd_impl(
                p, s, c, o, g, tiles_x, tiles_y, 128
            )
        )
        marginal(f"blend bwd tps={tps}", bwd, bins.packed, bins.tile_start,
                 bins.tile_count, out, g)


if __name__ == "__main__":
    main()
