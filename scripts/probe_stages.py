"""Stage bisection of project_gaussians and bin_gaussians_packed."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from topo4d_tpu.core.camera import full_projection_matrix, ndc_to_pixel
from topo4d_tpu.core.gaussian import (
    COV2D_DILATION,
    NEAR_CULL_Z,
    activate_params,
    build_cov3d,
    project_gaussians,
)
from topo4d_tpu.rasterizer.tiles import tile_rect
from topo4d_tpu.testing import make_head_fixture


def timeit(name, fn, *args, iters=50):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:42s} {dt:8.3f} ms", flush=True)
    return out


def main():
    params_np, cams, _ = make_head_fixture()
    cam = cams[0]
    params = {k: jnp.asarray(v) for k, v in params_np.items()}
    rv = activate_params(params)
    n = rv.means3d.shape[0]

    def stage_view(rv):
        rot_w2c = cam.w2c[..., :3, :3]
        t_view = rv.means3d @ rot_w2c.T + cam.w2c[..., :3, 3]
        return t_view

    timeit("P1 view transform", jax.jit(stage_view), rv)

    def stage_pix(rv):
        t_view = stage_view(rv)
        proj = full_projection_matrix(cam)
        ones = jnp.ones((n, 1), jnp.float32)
        p4 = jnp.concatenate([rv.means3d, ones], axis=-1)
        p_hom = p4 @ proj.T
        inv_w = 1.0 / (p_hom[..., 3] + 1e-7)
        ndc = p_hom[..., :3] * inv_w[..., None]
        means2d = jnp.stack(
            [ndc_to_pixel(ndc[..., 0], cam.width),
             ndc_to_pixel(ndc[..., 1], cam.height)], axis=-1)
        return means2d, t_view

    timeit("P2 +projection to pixels", jax.jit(stage_pix), rv)

    def stage_cov3d(rv):
        return build_cov3d(rv.rotations, rv.scales)

    timeit("P3 cov3d alone", jax.jit(stage_cov3d), rv)

    def stage_cov2d(rv):
        means2d, t_view = stage_pix(rv)
        depths = t_view[..., 2]
        visible = depths > NEAR_CULL_Z
        safe_z = jnp.where(visible, depths, 1.0)
        limx = 1.3 * cam.tan_fovx
        limy = 1.3 * cam.tan_fovy
        txtz = jnp.clip(t_view[..., 0] / safe_z, -limx, limx)
        tytz = jnp.clip(t_view[..., 1] / safe_z, -limy, limy)
        tx = txtz * safe_z
        ty = tytz * safe_z
        cov3d = build_cov3d(rv.rotations, rv.scales)
        zero = jnp.zeros_like(tx)
        j = jnp.stack(
            [jnp.stack([cam.fx / safe_z, zero,
                        -cam.fx * tx / (safe_z * safe_z)], -1),
             jnp.stack([zero, cam.fy / safe_z,
                        -cam.fy * ty / (safe_z * safe_z)], -1)],
            axis=-2)
        rot_w2c = cam.w2c[..., :3, :3]
        jw = j @ rot_w2c
        cov2d = jw @ cov3d @ jnp.swapaxes(jw, -1, -2)
        return cov2d

    timeit("P4 +cov2d (EWA)", jax.jit(stage_cov2d), rv)
    proj = timeit("P5 full project", jax.jit(
        lambda rv: project_gaussians(rv, cam)), rv)

    # binning stages
    w, h = cam.width, cam.height

    timeit("B1 tile_rect", jax.jit(
        lambda p: tile_rect(p, w, h)), proj)

    max_span = 2
    r = max_span * max_span

    def stage_entries(proj):
        x0, y0, x1, y1, tiles_x, tiles_y = tile_rect(proj, w, h)
        span_w = x1 - x0
        span_h = y1 - y0
        k = jnp.arange(r, dtype=jnp.int32)
        di = k // max_span
        dj = k % max_span
        ty = y0[:, None] + di[None, :]
        tx = x0[:, None] + dj[None, :]
        valid = (proj.mask[:, None] & (di[None, :] < span_h[:, None])
                 & (dj[None, :] < span_w[:, None]))
        t = tiles_x * tiles_y
        tile_id = jnp.where(valid, ty * tiles_x + tx, t).astype(jnp.int32)
        return tile_id

    timeit("B2 +entry tile ids", jax.jit(stage_entries), proj)

    def stage_rank(proj):
        key = jnp.where(proj.mask, proj.depths, jnp.inf)
        order = jnp.argsort(key, stable=True)
        rank = jnp.zeros(n, jnp.int32).at[order].set(
            jnp.arange(n, dtype=jnp.int32))
        return rank

    timeit("B3 depth rank (argsort+scatter)", jax.jit(stage_rank), proj)

    def stage_sort(proj, colors, opacities):
        tile_id = stage_entries(proj)
        rank = stage_rank(proj)
        flat_tile = tile_id.reshape(-1)
        flat_rank = jnp.broadcast_to(rank[:, None], (n, r)).reshape(-1)

        def expand(v):
            return jnp.broadcast_to(v[:, None], (n, r)).reshape(-1)

        data_ops = (
            expand(proj.means2d[:, 0]), expand(proj.means2d[:, 1]),
            expand(proj.conics[:, 0]), expand(proj.conics[:, 1]),
            expand(proj.conics[:, 2]), expand(opacities),
            expand(colors[:, 0]), expand(colors[:, 1]),
            expand(colors[:, 2]), expand(proj.depths),
        )
        fused = flat_tile * jnp.int32(n) + flat_rank
        return jax.lax.sort((fused,) + data_ops, num_keys=1,
                            is_stable=False)

    timeit("B4 +expand+sort", jax.jit(stage_sort), proj, rv.colors,
           rv.opacities)

    from topo4d_tpu.rasterizer.tiles import bin_gaussians_packed
    timeit("B5 full bin_gaussians_packed", jax.jit(
        lambda p, c, o: bin_gaussians_packed(p, c, o, w, h, max_span=2)),
        proj, rv.colors, rv.opacities)


if __name__ == "__main__":
    main()
