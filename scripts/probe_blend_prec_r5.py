"""Per-site blend-dot precision sweep (VERDICT r4 item 3).

For the TOPO4D_BLEND_PREC config inherited from the environment, measures
on the ambient backend:
  - pixel + parameter-gradient error of the pallas renderer vs the
    XLA tiled path at Precision.HIGHEST (an f32-exact reference for the
    kernel's math; the bench gate's oracle comparison stays the final
    authority),
  - standalone blend fwd+bwd time (bench.py roofline-leg protocol).

Prints one JSON line. Run one process per config (the mode is read at
pallas_blend import):

  for c in highest,highest high,high split3,high split2,high; do
    TOPO4D_BLEND_PREC=$c python scripts/probe_blend_prec_r5.py
  done
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

T0 = time.perf_counter()


def note(msg):
    print(f"[prec +{time.perf_counter() - T0:6.1f}s] {msg}",
          file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from topo4d_tpu.core.gaussian import activate_params, project_gaussians
    from topo4d_tpu.rasterizer import pallas_blend as pb
    from topo4d_tpu.rasterizer.pallas import render_gaussians_pallas
    from topo4d_tpu.rasterizer.pallas_blend import pallas_blend
    from topo4d_tpu.rasterizer.tiled import render_gaussians_tiled
    from topo4d_tpu.rasterizer.tiles import (
        compute_binning,
        num_tiles,
        pack_with_binning,
    )
    from topo4d_tpu.testing import make_head_fixture
    from topo4d_tpu.utils.profiling import sync_value

    cfg = f"{pb.MASK_DOT_MODE},{pb.GEN_DOT_MODE}"
    note(f"config {cfg}")
    res = {"config": cfg, "backend": jax.devices()[0].platform}

    params_np, cams, _ = make_head_fixture()
    cam0 = cams[0]
    params = {k: jnp.asarray(v) for k, v in params_np.items()}
    interpret = jax.devices()[0].platform == "cpu"

    rv0 = activate_params(params)
    gt = sync_value(
        render_gaussians_pallas(rv0, cam0, max_span=2, chunk=128,
                                interpret=interpret).image
    )
    target = jnp.clip(0.8 * gt + 0.05, 0.0, 1.0)
    note("gt ready")

    def outputs(render):
        def loss(params):
            rv = activate_params(params)
            out = render(rv)
            return jnp.sum(jnp.square(out.image - target)), out

        (val, out), grads = jax.value_and_grad(loss, has_aux=True)(params)
        return (np.asarray(out.image),
                {k: np.asarray(v) for k, v in grads.items()})

    pix_p, g_p = outputs(
        lambda rv: render_gaussians_pallas(
            rv, cam0, max_span=2, chunk=128, interpret=interpret)
    )
    note("pallas done")
    pix_t, g_t = outputs(
        lambda rv: render_gaussians_tiled(rv, cam0, max_span=2,
                                          capacity=1024)
    )
    note("tiled done")

    def rel(a, b, q):
        denom = max(float(np.max(np.abs(b))), 1e-12)
        err = np.abs(np.asarray(a) - np.asarray(b))
        v = float(np.max(err)) if q >= 100 else float(np.percentile(err, q))
        return v / denom

    res["pix_p999"] = rel(pix_p, pix_t, 99.9)
    res["pix_max"] = rel(pix_p, pix_t, 100)
    gmax = 0.0
    for k in ("means3D", "rgb_colors", "unnorm_rotations",
              "logit_opacities", "log_scales"):
        gmax = max(gmax, rel(g_p[k], g_t[k], 99.9))
    res["grad_p999"] = gmax

    # blend-only fwd+bwd timing (bench protocol)
    proj = project_gaussians(rv0, cam0)
    binning = compute_binning(proj, cam0.width, cam0.height, 2)
    bins = pack_with_binning(proj, rv0.colors, rv0.opacities, binning, 128)
    tiles_x, tiles_y = num_tiles(cam0.width, cam0.height)

    @jax.jit
    def vg(packed):
        def f(p):
            out = pallas_blend(
                p, bins.tile_start, bins.tile_count, tiles_x, tiles_y,
                128, interpret,
            )
            return jnp.sum(out[:, 0:4, :])

        val, g = jax.value_and_grad(f)(packed)
        return val, packed - 1e-12 * g

    packed = bins.packed
    val, packed = vg(packed)
    sync_value(val)

    def run(iters):
        nonlocal packed
        t0 = time.perf_counter()
        for _ in range(iters):
            val, packed = vg(packed)
        sync_value(val)
        return time.perf_counter() - t0

    run(5)
    t1 = min(run(5) for _ in range(3))
    t2 = min(run(45) for _ in range(3))
    res["blend_ms"] = round((t2 - t1) / 40.0 * 1e3, 4)
    note("timed")
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
