"""Batched all-views geometry step at bench scale on the TPU.

The validated batched mode (tests/test_batched_parity.py: final loss
within tolerance of single-view parity mode at the same total render
budget) pays the topological losses + Adam + constraint scatters once
per 24 renders instead of once per render. This times the batched step
and derives sec/frame at the reference's 1,100-render budget
(ceil(1100/24) = 46 steps).
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


def main():
    from topo4d_tpu.config import Config
    from topo4d_tpu.pipeline.data import SyntheticSequence
    from topo4d_tpu.pipeline.scene import build_scene, cache_first_frame_attrs
    from topo4d_tpu.pipeline.trainer import Trainer, _cpu_device
    from topo4d_tpu.testing import (
        make_camera_ring,
        make_grid_mesh,
        make_synthetic_regions,
    )
    from topo4d_tpu.topology.obj_io import MeshObj

    t0 = time.perf_counter()
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
    cfg.schedule.views_per_step = 0  # batched mode
    params_np, statics = build_scene(mesh, regions, cfg, num_views=24)
    cams = make_camera_ring(24, width=375, height=512, distance=2.0)
    src = SyntheticSequence(params=params_np, cameras=cams, num_frames=1)
    trainer = Trainer(cfg, src, params_np, statics)
    with jax.default_device(_cpu_device()):
        ffa = cache_first_frame_attrs(params_np, regions)
    trainer.first_frame_attrs = jax.tree_util.tree_map(jnp.asarray, ffa)
    cons = trainer._constraints("track")
    lr = trainer.lrs_for("track")
    weights = trainer.weights_for("track")
    state, priors = trainer.state, trainer.priors
    images = jnp.zeros((24, 3, 512, 375))
    print(f"[+{time.perf_counter()-t0:6.1f}s] setup done", flush=True)

    def run(iters):
        nonlocal state, priors
        t1 = time.perf_counter()
        for _ in range(iters):
            state, priors, m = trainer.batched_step(
                state, images, cams, priors, cons, lr, weights, "track"
            )
        jax.block_until_ready(m["loss_total"])
        return time.perf_counter() - t1

    run(1)
    print(f"[+{time.perf_counter()-t0:6.1f}s] compiled", flush=True)
    run(4)
    t_small = min(run(2) for _ in range(3))
    t_big = min(run(10) for _ in range(3))
    dt = (t_big - t_small) / 8
    nb = -(-1100 // 24)
    print(
        f"[+{time.perf_counter()-t0:6.1f}s] batched step {dt*1e3:.1f} ms "
        f"({dt*1e3/24:.2f} ms/render) -> {dt*nb:.2f} s/frame at "
        f"{nb} steps (1100-render budget)",
        flush=True,
    )


if __name__ == "__main__":
    main()
