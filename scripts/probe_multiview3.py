"""Blend-kernel-only timing: one fused 24-view launch vs 24 launches.

Pre-packs entries outside the timed region (frozen binning); the timed
graph is pack-along-frozen-permutation + blend fwd+bwd only (state
carried by nudging colors).
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

from topo4d_tpu.core.gaussian import activate_params, project_gaussians
from topo4d_tpu.rasterizer.pallas_blend import PX, pallas_blend
from topo4d_tpu.rasterizer.tiles import (
    TILE,
    compute_binning,
    num_tiles,
    pack_with_binning,
)
from topo4d_tpu.testing import make_camera_ring, make_head_fixture

T0 = time.perf_counter()


def note(msg):
    print(f"[+{time.perf_counter() - T0:7.1f}s] {msg}", flush=True)


def marginal(run, small=10, big=60, reps=3):
    run(small)
    run(big)
    t1 = min(run(small) for _ in range(reps))
    t2 = min(run(big) for _ in range(reps))
    return (t2 - t1) / (big - small)


def main():
    params_np, _, _ = make_head_fixture()
    params = {k: jnp.asarray(v) for k, v in params_np.items()}
    v, w, h = 24, 375, 512
    cams = make_camera_ring(v, width=w, height=h, distance=2.0)
    tiles_x, tiles_y = num_tiles(w, h)
    t = tiles_x * tiles_y

    rv0 = activate_params(params)
    proj_v = jax.jit(
        lambda p: jax.vmap(lambda c: project_gaussians(activate_params(p), c))(
            cams
        )
    )(params)
    binning_v = jax.block_until_ready(
        jax.jit(
            lambda pv: jax.vmap(lambda pr: compute_binning(pr, w, h, 2))(pv)
        )(proj_v)
    )
    note("binning ready")

    def packed_views(p):
        rv = activate_params(p)
        pv = jax.vmap(lambda c: project_gaussians(rv, c))(cams)
        return jax.vmap(
            lambda pr, b: pack_with_binning(pr, rv.colors, rv.opacities, b, 128)
        )(pv, binning_v)

    def fuse(bins):
        e_pad = bins.packed.shape[2]
        voff_e = jnp.arange(v, dtype=jnp.int32)[:, None] * e_pad
        tile_start = (bins.tile_start + voff_e).reshape(-1)
        tile_count = bins.tile_count.reshape(-1)
        tile_row = bins.packed[:, 6:7, :]
        voff_t = (jnp.arange(v, dtype=jnp.float32) * t)[:, None, None]
        tile_row = jnp.where(
            tile_row >= float(t), -2.0,
            jnp.where(tile_row >= 0.0, tile_row + voff_t, tile_row),
        )
        y_off = jnp.arange(v, dtype=jnp.float32) * float(tiles_y * TILE)
        packed = jnp.concatenate(
            [
                bins.packed[:, 0:1, :],
                bins.packed[:, 1:2, :] + y_off[:, None, None],
                bins.packed[:, 2:6, :],
                tile_row,
                bins.packed[:, 7:, :],
            ],
            axis=1,
        ).transpose(1, 0, 2).reshape(16, v * e_pad)
        return packed, tile_start, tile_count

    def loss_fused(p, tps):
        bins = packed_views(p)
        packed, ts, tc = fuse(bins)
        out = pallas_blend(packed, ts, tc, tiles_x, v * tiles_y, 128,
                           False, num_tiles=v * t, tps=tps)
        return jnp.sum(out[:, 0:4, :] ** 2)

    def loss_map(p):
        bins = packed_views(p)

        def one(args):
            packed, ts, tc = args
            out = pallas_blend(packed, ts, tc, tiles_x, tiles_y, 128,
                               False, variant="stream")
            return jnp.sum(out[:, 0:4, :] ** 2)

        return jnp.sum(
            jax.lax.map(one, (bins.packed, bins.tile_start, bins.tile_count))
        )

    variants = [
        ("map 24x (tps=4)", lambda p: loss_map(p)),
        ("fused tps=4    ", lambda p: loss_fused(p, 4)),
        ("fused tps=8    ", lambda p: loss_fused(p, 8)),
        ("fused tps=16   ", lambda p: loss_fused(p, 16)),
    ]
    for tag, fn in variants:
        @jax.jit
        def vg(p, fn=fn):
            val, g = jax.value_and_grad(fn)(p)
            return val, jax.tree_util.tree_map(
                lambda x, gg: x - 1e-12 * gg, p, g
            )

        p = params

        def run(iters):
            nonlocal p
            t0 = time.perf_counter()
            for _ in range(iters):
                val, p = vg(p)
            jax.block_until_ready(val)
            return time.perf_counter() - t0

        note(f"pack+blend fwd+bwd {tag}: {marginal(run) * 1e3:7.2f} ms")


if __name__ == "__main__":
    main()
