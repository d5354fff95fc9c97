"""Phase-level marginal timing of the dense texture step at 4K scale.

The texture loop (reference train.py:715-743) renders ~300k dense
Gaussians at full resolution for 301 iterations/frame; this probe finds
where the fwd+bwd time goes (project / bin sort / blend kernels / loss).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from topo4d_tpu.core.camera import Camera, make_camera
from topo4d_tpu.core.gaussian import GaussianRenderVars, project_gaussians
from topo4d_tpu.losses.image import photometric_loss
from topo4d_tpu.rasterizer.pallas import render_gaussians_pallas
from topo4d_tpu.rasterizer.pallas_blend import _blend_bwd_impl, _blend_fwd_impl
from topo4d_tpu.rasterizer.tiles import bin_gaussians_packed, num_tiles


def marginal(name, fn, *args, i1=4, i2=16):
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
    print(f"{name:44s} {dt:8.3f} ms", flush=True)
    return out


def make_dense_scene(n=300_000, w=3840, h=2160, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.normal(0, 0.25, (n, 3)).astype(np.float32)
    pts[:, 2] *= 0.05
    scale = np.full((n, 3), 0.0015, np.float32)
    quats = np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
    colors = rng.uniform(0.1, 0.9, (n, 3)).astype(np.float32)
    opac = np.full(n, 0.95, np.float32)
    rv = GaussianRenderVars(
        means3d=jnp.asarray(pts),
        colors=jnp.asarray(colors),
        rotations=jnp.asarray(quats),
        opacities=jnp.asarray(opac),
        scales=jnp.asarray(scale),
    )
    k = np.array([[2.2 * w, 0, w / 2], [0, 2.2 * w, h / 2], [0, 0, 1]],
                 np.float32)
    w2c = np.eye(4, dtype=np.float32)
    w2c[2, 3] = 2.0
    cam = make_camera(k, w2c, w, h)
    return rv, cam


def main():
    rv, cam = make_dense_scene()
    w, h = cam.width, cam.height
    n = rv.means3d.shape[0]
    print(f"[dense scene] n={n} {w}x{h}", flush=True)

    proj = jax.block_until_ready(
        jax.jit(lambda rv: project_gaussians(rv, cam))(rv))
    frac = float(jnp.mean(proj.mask.astype(jnp.float32)))
    rmax = int(jnp.max(proj.radii))
    print(f"visible frac {frac:.3f} max radius {rmax}px", flush=True)
    marginal("project fwd", jax.jit(lambda rv: project_gaussians(rv, cam)),
             rv)

    bin_fn = jax.jit(lambda p, c, o: bin_gaussians_packed(
        p, c, o, w, h, max_span=2))
    bins = marginal("bin fwd (sort-with-data)", bin_fn, proj, rv.colors,
                    rv.opacities)
    cnt = np.asarray(bins.tile_count)
    print(f"tiles={cnt.size} entries={int(cnt.sum())} "
          f"max_count={int(cnt.max())} mean_count={cnt.mean():.1f} "
          f"cropped={int(bins.num_cropped)}", flush=True)

    tiles_x, tiles_y = num_tiles(w, h)
    fwd = jax.jit(lambda p, s, c: _blend_fwd_impl(
        p, s, c, tiles_x, tiles_y, 128))
    out = marginal("blend fwd kernel", fwd, bins.packed, bins.tile_start,
                   bins.tile_count)
    g = jnp.ones_like(out)
    bwd = jax.jit(lambda p, s, c, o, g: _blend_bwd_impl(
        p, s, c, o, g, tiles_x, tiles_y, 128))
    marginal("blend bwd kernel", bwd, bins.packed, bins.tile_start,
             bins.tile_count, out, g)

    render = jax.jit(lambda rv: render_gaussians_pallas(
        rv, cam, max_span=2, chunk=128))
    rout = marginal("render full fwd", render, rv)
    gt = jnp.clip(rout.image * 0.5 + 0.25, 0.0, 1.0)

    def loss_fn(colors, gt):
        rv2 = rv._replace(colors=colors)
        o = render_gaussians_pallas(rv2, cam, max_span=2, chunk=128)
        return jax.checkpoint(photometric_loss)(o.image, gt)

    vg = jax.jit(jax.value_and_grad(loss_fn))
    marginal("render fwd+bwd (photometric, d/dcolors)", vg, rv.colors, gt)


if __name__ == "__main__":
    main()
