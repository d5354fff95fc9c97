"""Dense-scale (4K / 300k) binning + blend tuning probes.

1. sort-with-data (current) vs two-key keys+gid sort + row-gather packing
2. blend kernels at tiles_per_step 4 / 8 / 16
3. the packing-backward segment-sum
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from topo4d_tpu.core.camera import make_camera
from topo4d_tpu.core.gaussian import GaussianRenderVars, project_gaussians
from topo4d_tpu.rasterizer.pallas_blend import (
    _blend_bwd_impl,
    _blend_fwd_impl,
)
from topo4d_tpu.rasterizer.tiles import (
    bin_gaussians_packed,
    num_tiles,
    tile_rect,
)


def marginal(name, fn, *args, i1=3, i2=12):
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
    dt = (tb - ta) / (i2 - i1) * 1e3
    print(f"{name:48s} {dt:8.2f} ms", flush=True)
    return out


def main(n=300_000, w=3840, h=2160, max_span=2):
    rng = np.random.default_rng(0)
    pts = rng.normal(0, 0.25, (n, 3)).astype(np.float32)
    pts[:, 2] *= 0.05
    rv = GaussianRenderVars(
        means3d=jnp.asarray(pts),
        colors=jnp.asarray(rng.uniform(0.1, 0.9, (n, 3)).astype(np.float32)),
        rotations=jnp.asarray(
            np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
        ),
        opacities=jnp.full((n,), 0.95, jnp.float32),
        scales=jnp.full((n, 3), 0.0015, jnp.float32),
    )
    k = np.array(
        [[2.2 * w, 0, w / 2], [0, 2.2 * w, h / 2], [0, 0, 1]], np.float32
    )
    w2c = np.eye(4, dtype=np.float32)
    w2c[2, 3] = 2.0
    cam = make_camera(k, w2c, w, h)
    proj = jax.block_until_ready(
        jax.jit(lambda rv: project_gaussians(rv, cam))(rv)
    )

    bins = marginal(
        "bin packed (two-key sort-with-data)",
        jax.jit(lambda p, c, o: bin_gaussians_packed(
            p, c, o, w, h, max_span=max_span)),
        proj, rv.colors, rv.opacities,
    )

    @jax.jit
    def keys_gid_sort_gather(proj, colors, opacities):
        x0, y0, x1, y1, tiles_x, tiles_y = tile_rect(proj, w, h)
        span_w, span_h = x1 - x0, y1 - y0
        r = max_span * max_span
        kk = jnp.arange(r, dtype=jnp.int32)
        di, dj = kk // max_span, kk % max_span
        ty = y0[:, None] + di[None, :]
        tx = x0[:, None] + dj[None, :]
        valid = (proj.mask[:, None] & (di[None, :] < span_h[:, None])
                 & (dj[None, :] < span_w[:, None]))
        t = tiles_x * tiles_y
        tile_id = jnp.where(valid, ty * tiles_x + tx, t).astype(jnp.int32)
        nn = proj.means2d.shape[0]
        key = jnp.where(proj.mask, proj.depths, jnp.inf)
        order = jnp.argsort(key, stable=True)
        rank = jnp.zeros(nn, jnp.int32).at[order].set(
            jnp.arange(nn, dtype=jnp.int32))
        flat_tile = tile_id.reshape(-1)
        flat_rank = jnp.broadcast_to(rank[:, None], (nn, r)).reshape(-1)
        sorted_tile, sorted_rank = jax.lax.sort(
            (flat_tile, flat_rank), num_keys=2, is_stable=True
        )
        gid = order[sorted_rank]
        tbl = jnp.concatenate([
            proj.means2d, proj.conics, opacities[:, None],
            jnp.zeros((nn, 2)), colors, proj.depths[:, None],
            jnp.zeros((nn, 4)),
        ], axis=1)  # (N, 16)
        packed = tbl[gid].T
        packed = packed.at[6].set(sorted_tile.astype(jnp.float32))
        e = nn * r
        pad = (-e) % 128 + 128
        return jnp.pad(packed, ((0, 0), (0, pad)), constant_values=-1.0)

    marginal("bin keys+gid sort + row gather", keys_gid_sort_gather,
             proj, rv.colors, rv.opacities)

    tiles_x, tiles_y = num_tiles(w, h)
    for tps in (4, 8, 16):
        fwd = jax.jit(lambda p, s, c, tps=tps: _blend_fwd_impl(
            p, s, c, tiles_x, tiles_y, 128, tps=tps))
        out = marginal(f"blend fwd tps={tps}", fwd, bins.packed,
                       bins.tile_start, bins.tile_count)
    g = jnp.ones_like(out)
    for tps in (4, 8, 16):
        bwd = jax.jit(lambda p, s, c, o, g, tps=tps: _blend_bwd_impl(
            p, s, c, o, g, tiles_x, tiles_y, 128, tps=tps))
        marginal(f"blend bwd tps={tps}", bwd, bins.packed, bins.tile_start,
                 bins.tile_count, out, g)

    # packing backward: segment-sum scatter-add at dense scale
    e = n * max_span * max_span
    gid = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
    gp = jnp.asarray(rng.normal(0, 1, (16, e + 256)).astype(np.float32))
    ev = jnp.asarray(np.ones(e, bool))
    from topo4d_tpu.rasterizer.tiles import _bin_pack_bwd_impl
    marginal("packing bwd segment-sum", jax.jit(
        lambda gi, evv, gpp: _bin_pack_bwd_impl(gi, evv, n, gpp)),
        gid, ev, gp)


if __name__ == "__main__":
    main()
