"""Marginal-cost breakdown of the full tracking step's non-render parts."""
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
    print(f"{name:44s} {dt:8.3f} ms", flush=True)
    return out


def main():
    from topo4d_tpu.config import Config
    from topo4d_tpu.pipeline.data import SyntheticSequence
    from topo4d_tpu.pipeline.scene import build_scene, cache_first_frame_attrs
    from topo4d_tpu.pipeline.trainer import Trainer
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

    # full step
    def full(state, priors):
        s, p, m = trainer.step(state, gt, cams, vid, priors, cons, lr,
                               weights, "track")
        return m["loss_total"]

    marginal("full step", full, state, priors)

    from topo4d_tpu.core.gaussian import activate_params
    from topo4d_tpu.losses.flatten import build_fused_flatten, fused_flatten_loss
    from topo4d_tpu.losses.temporal import rigid_rot_iso_losses
    from topo4d_tpu.opt.adam import adam_update
    from topo4d_tpu.opt.constraints import apply_constraints
    from topo4d_tpu.opt.step import (
        HARD_FLATTEN_KEYS,
        SOFT_FLATTEN_KEYS,
        UMBRELLA_KEYS,
    )
    from topo4d_tpu.losses.flatten import build_fused_umbrella, fused_umbrella_loss

    params = state.params

    # temporal fwd+bwd
    def temporal_loss(params):
        rv = activate_params(params)
        t = rigid_rot_iso_losses(
            rv.means3d, rv.rotations, priors.temporal,
            priors.neighbor_indices, priors.neighbor_dist,
            priors.rig_w, priors.rot_w, priors.iso_w,
        )
        return 3.5 * t["rigid"] + 20.0 * t["rot"] + 20.0 * t["iso"]

    marginal("temporal fwd+bwd", jax.jit(jax.grad(temporal_loss)), params)

    fused_quads = build_fused_flatten(
        statics.quadruples, HARD_FLATTEN_KEYS, SOFT_FLATTEN_KEYS)
    fused_umb = build_fused_umbrella(statics.umbrellas, UMBRELLA_KEYS)

    def flat_loss(params):
        rv = activate_params(params)
        tot, _ = fused_flatten_loss(rv.means3d, fused_quads, weights,
                                    soft_cos_init=priors.cos_init)
        if fused_umb is not None:
            tot = tot + fused_umbrella_loss(rv.means3d, fused_umb, weights)
        return tot

    marginal("flatten+umbrella fwd+bwd", jax.jit(jax.grad(flat_loss)), params)

    # adam + constraints
    grads = jax.tree_util.tree_map(lambda v: v * 0 + 0.001, params)
    marginal("adam_update", jax.jit(
        lambda p, g, o: adam_update(p, g, o, lr)[0]["means3D"]),
        params, grads, state.opt)
    marginal("apply_constraints", jax.jit(
        lambda p: apply_constraints(p, cons)["means3D"]), params)

    # photometric on rendered image shape
    from topo4d_tpu.losses.image import photometric_loss
    im = jnp.zeros((3, 512, 375))
    marginal("photometric L1+SSIM fwd+bwd", jax.jit(jax.grad(
        lambda a: photometric_loss(a, gt))), im)

    from topo4d_tpu.losses.image import psnr
    marginal("psnr metric", jax.jit(lambda a: jnp.mean(psnr(a, gt))), im)


if __name__ == "__main__":
    main()
