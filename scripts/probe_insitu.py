"""In-situ cost bisection of the full tracking step + binning sort probes.

Standalone marginals overstate fused costs; this probe removes components
from the REAL jitted step and measures the delta, plus compares the
sort-with-data binning against a keys-only sort + packed row gather.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


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
    dt = (tb - ta) / (i2 - i1) * 1e3
    print(f"{name:48s} {dt:8.3f} ms", flush=True)
    return dt


def main():
    from topo4d_tpu.config import Config
    from topo4d_tpu.opt.step import make_geometry_step
    from topo4d_tpu.pipeline.data import SyntheticSequence
    from topo4d_tpu.pipeline.scene import build_scene, cache_first_frame_attrs
    from topo4d_tpu.pipeline.trainer import Trainer, make_render_fn
    from topo4d_tpu.testing import (
        make_camera_ring,
        make_grid_mesh,
        make_synthetic_regions,
    )
    from topo4d_tpu.topology.obj_io import MeshObj

    rows, cols = 92, 90
    verts, faces = make_grid_mesh(rows, cols, extent=0.5)
    n = verts.shape[0]
    uvs = np.stack(
        np.meshgrid(np.linspace(0.05, 0.95, cols),
                    np.linspace(0.05, 0.95, rows), indexing="xy"),
        -1,
    ).reshape(-1, 2).astype(np.float32)
    mesh = MeshObj(vertices=verts, uvs=uvs, faces=faces,
                   uv_faces=[list(f) for f in faces])
    regions = make_synthetic_regions(n, faces)
    cfg = Config()
    cfg.raster.backend = "pallas"
    cfg.raster.max_span = 2
    cfg.data.use_mask = False
    cfg.data.log_views = []
    params_np, statics = build_scene(mesh, regions, cfg, num_views=24)
    cams = make_camera_ring(24, width=375, height=512, distance=2.0)
    src = SyntheticSequence(params=params_np, cameras=cams, num_frames=1)
    trainer = Trainer(cfg, src, params_np, statics)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        ffa = cache_first_frame_attrs(params_np, regions)
    trainer.first_frame_attrs = jax.tree_util.tree_map(jnp.asarray, ffa)
    cons = trainer._constraints("track")
    lr = trainer.lrs_for("track")
    weights = trainer.weights_for("track")
    gt = jnp.zeros((3, 512, 375))
    vid = jnp.asarray(0, jnp.int32)
    state, priors = trainer.state, trainer.priors
    print("[setup done]", flush=True)

    def run_step(step_fn, cons):
        def f(state, priors):
            s, p, m = step_fn(state, gt, cams, vid, priors, cons, lr,
                              weights, "track", with_metrics=False)
            return m["loss_total"]
        return f

    t_full = marginal("full step", run_step(trainer.step, cons),
                      state, priors)

    # no flatten losses at all
    step_noflat = make_geometry_step(
        {}, {}, trainer.render_fn, ring_indices=statics.ring.indices)
    pri_noflat = priors._replace(cos_init=jnp.zeros(0, jnp.float32))
    t_noflat = marginal("step w/o flatten+umbrella",
                        run_step(step_noflat, cons), state, pri_noflat)

    # no constraints
    t_nocons = marginal("step w/o constraints",
                        run_step(trainer.step, []), state, priors)

    # flatten without the gather-sharing umbrella and without ring_inv
    step_plain = make_geometry_step(
        statics.quadruples, statics.umbrellas, trainer.render_fn)
    t_plain = marginal("step w/o sharing/ring_inv (plain gathers)",
                       run_step(step_plain, cons), state, priors)

    print(f"-> flatten in-situ {t_full - t_noflat:6.3f} ms | "
          f"constraints in-situ {t_full - t_nocons:6.3f} ms | "
          f"sharing+inv saves {t_plain - t_full:6.3f} ms", flush=True)

    # ---- binning sort experiments ---------------------------------------
    from topo4d_tpu.core.gaussian import activate_params, project_gaussians
    from topo4d_tpu.rasterizer.tiles import (
        PACK_FIELDS, bin_gaussians_packed, tile_rect,
    )

    params = state.params
    rv = activate_params(params)
    cam0 = cams[0]
    proj = jax.block_until_ready(
        jax.jit(lambda rv: project_gaussians(rv, cam0))(rv))

    marginal("bin_gaussians_packed (sort-with-data)",
             jax.jit(lambda p, c, o: bin_gaussians_packed(
                 p, c, o, cam0.width, cam0.height, max_span=2).packed),
             proj, rv.colors, rv.opacities)

    max_span = 2

    @jax.jit
    def bin_keys_gather(proj, colors, opacities):
        x0, y0, x1, y1, tiles_x, tiles_y = tile_rect(
            proj, cam0.width, cam0.height)
        span_w, span_h = x1 - x0, y1 - y0
        r = max_span * max_span
        k = jnp.arange(r, dtype=jnp.int32)
        di, dj = k // max_span, k % max_span
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
        fused = (tile_id.reshape(-1) * jnp.int32(nn)
                 + jnp.broadcast_to(rank[:, None], (nn, r)).reshape(-1))
        (sorted_key,) = jax.lax.sort((fused,), num_keys=1, is_stable=False)
        sorted_tile = sorted_key // jnp.int32(nn)
        sorted_rank = sorted_key - sorted_tile * jnp.int32(nn)
        gid = order[sorted_rank]
        # packed per-gaussian table (N, 16) -> row gather -> transpose
        tbl = jnp.concatenate([
            proj.means2d, proj.conics, opacities[:, None],
            sorted_tile[:nn, None] * 0.0,  # placeholder col
            jnp.zeros((nn, 1)), colors, proj.depths[:, None],
            jnp.zeros((nn, 4)),
        ], axis=1)  # (N, 16)
        rowsg = tbl[gid]  # (E, 16)
        packed = rowsg.T  # (16, E)
        packed = packed.at[6].set(sorted_tile.astype(jnp.float32))
        e = nn * r
        pad = (-e) % 128 + 128
        return jnp.pad(packed, ((0, 0), (0, pad)), constant_values=-1.0)

    marginal("bin keys-only sort + row gather",
             bin_keys_gather, proj, rv.colors, rv.opacities)

    @jax.jit
    def sort_only(proj):
        x0, y0, x1, y1, tiles_x, tiles_y = tile_rect(
            proj, cam0.width, cam0.height)
        span_w, span_h = x1 - x0, y1 - y0
        r = max_span * max_span
        k = jnp.arange(r, dtype=jnp.int32)
        di, dj = k // max_span, k % max_span
        ty = y0[:, None] + di[None, :]
        tx = x0[:, None] + dj[None, :]
        valid = (proj.mask[:, None] & (di[None, :] < span_h[:, None])
                 & (dj[None, :] < span_w[:, None]))
        t = tiles_x * tiles_y
        tile_id = jnp.where(valid, ty * tiles_x + tx, t).astype(jnp.int32)
        nn = proj.means2d.shape[0]
        fused = tile_id.reshape(-1) * jnp.int32(nn)
        (sorted_key,) = jax.lax.sort((fused,), num_keys=1, is_stable=False)
        return sorted_key

    marginal("keys-only sort alone", sort_only, proj)


if __name__ == "__main__":
    main()
