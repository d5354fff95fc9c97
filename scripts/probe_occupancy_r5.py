"""MXU/VPU lane-occupancy experiment on the blend kernel (VERDICT r4 item 4).

The performance ledger attributes the blend's distance from its MXU
cost model (~27% of roofline, r4) to sub-MXU-width occupancy: at
geometry scale ~23 of 128 entry lanes per window are real for any given
tile's pixel rows. The direct attack named by the ledger — batch
multiple shallow tiles' pixel rows into ONE blend-window matmul operand
— is the kernel's existing batched fast path (tps tiles per grid step;
_fwd_kernel batchable branch). What had no recorded standalone-blend
measurement is that path's width sweep under the r5 per-site precision
config. This probe measures, at geometry scale:

  1. the REAL lane-occupancy statistics from the actual binning
     (entries/tile distribution, tiles per 128-entry window, fraction
     of steps where the batched path can fire);
  2. blend fwd+bwd standalone at tps in {4, 8} (16 OOMs the backward's
     scoped VMEM — recorded r2/r3), under the inherited
     TOPO4D_BLEND_PREC config.

Run once per precision config (module reads the env at import):
  TOPO4D_BLEND_PREC=split3,high python scripts/probe_occupancy_r5.py
Prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from topo4d_tpu.core.gaussian import activate_params, project_gaussians
    from topo4d_tpu.rasterizer import pallas_blend as pb
    from topo4d_tpu.rasterizer.pallas_blend import pallas_blend
    from topo4d_tpu.rasterizer.tiles import (
        compute_binning,
        num_tiles,
        pack_with_binning,
    )
    from topo4d_tpu.testing import make_head_fixture
    from topo4d_tpu.utils.profiling import sync_value

    res = {
        "config": f"{pb.MASK_DOT_MODE},{pb.GEN_DOT_MODE}",
        "backend": jax.devices()[0].platform,
    }
    interpret = jax.devices()[0].platform == "cpu"

    params_np, cams, _ = make_head_fixture()
    cam0 = cams[0]
    params = {k: jnp.asarray(v) for k, v in params_np.items()}
    rv0 = activate_params(params)
    proj = project_gaussians(rv0, cam0)
    binning = compute_binning(proj, cam0.width, cam0.height, 2)
    bins = pack_with_binning(proj, rv0.colors, rv0.opacities, binning, 128)
    tiles_x, tiles_y = num_tiles(cam0.width, cam0.height)

    # occupancy statistics from the real binning
    counts = np.asarray(binning.tile_count)
    starts = np.asarray(binning.tile_start)
    nz = counts[counts > 0]
    first_w = starts // 128
    last_w = (starts + np.maximum(counts, 1) - 1) // 128
    single_window = (first_w == last_w) & (counts > 0)
    # batched fast path fires when a step's 4 tiles are single-window on
    # a SHARED window (tile ids ascending => consecutive)
    tps = 4
    t = counts.shape[0]
    fire = 0
    steps = t // tps
    for s in range(steps):
        sl = slice(s * tps, (s + 1) * tps)
        ne = counts[sl] > 0
        if not ne.any():
            continue
        fw = first_w[sl][ne]
        if single_window[sl][ne].all() and (fw == fw[0]).all():
            fire += 1
    res.update({
        "tiles": int(t),
        "nonempty_tiles": int((counts > 0).sum()),
        "entries_per_tile_mean": float(nz.mean()),
        "entries_per_tile_p99": float(np.percentile(nz, 99)),
        "lane_occupancy_mean": float(nz.mean() / 128.0),
        "single_window_frac": float(single_window.sum() / max((counts > 0).sum(), 1)),
        "batched_path_step_frac": float(fire / max(steps, 1)),
    })

    def time_tps(tps_val):
        @jax.jit
        def vg(packed):
            def f(p):
                out = pallas_blend(
                    p, bins.tile_start, bins.tile_count, tiles_x, tiles_y,
                    128, interpret, None, None, "auto", None, tps_val,
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
        return round((t2 - t1) / 40.0 * 1e3, 4)

    for tps_val in (4, 8):
        try:
            res[f"blend_ms_tps{tps_val}"] = time_tps(tps_val)
        except Exception as exc:
            res[f"blend_ms_tps{tps_val}"] = f"{type(exc).__name__}: {exc}"[:120]
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
