"""Scanned batched geometry segments: frozen vs fresh binning, on TPU.

Binning (duplicate-and-sort) is ~0.61 ms per render; the 24-view batched
step re-runs it 24x per step (~14.6 of 60.4 ms). The scanned batched
multi-step computes per-view binnings ONCE at segment entry
(raster.track_rebin_freq) — this probe measures the marginal per-step
cost of both scan variants with two-point timing (state carried through
warmup; see bench.py's tunnel result-cache note).
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
    from topo4d_tpu.parallel.batched import make_batched_geometry_multi_step
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
    cfg.raster.track_rebin_freq = 1000  # frozen across the whole segment
    cfg.data.use_mask = False
    cfg.data.log_views = []
    cfg.schedule.views_per_step = 0  # batched mode
    params_np, statics = build_scene(mesh, regions, cfg, num_views=24)
    cams = make_camera_ring(24, width=375, height=512, distance=2.0)
    src = SyntheticSequence(params=params_np, cameras=cams, num_frames=1)
    trainer = Trainer(cfg, src, params_np, statics)
    assert trainer.batched_multi_step is not None
    assert trainer._binnings_fn is not None
    frozen_ms = trainer.batched_multi_step
    fresh_ms = make_batched_geometry_multi_step(
        statics.quadruples, statics.umbrellas, trainer.render_fn,
        sequential_views=True, ring_indices=statics.ring.indices,
    )
    with jax.default_device(_cpu_device()):
        ffa = cache_first_frame_attrs(params_np, regions)
    trainer.first_frame_attrs = jax.tree_util.tree_map(jnp.asarray, ffa)
    cons = trainer._constraints("track")
    lr = trainer.lrs_for("track")
    weights = trainer.weights_for("track")
    images = jnp.zeros((24, 3, 512, 375))
    print(f"[+{time.perf_counter()-t0:6.1f}s] setup done", flush=True)

    nb = -(-1100 // 24)  # 46 steps at the reference's 1,100-render budget

    for name, ms in (("frozen", frozen_ms), ("fresh", fresh_ms)):
        state, priors = trainer.state, trainer.priors

        def run(s):
            nonlocal state, priors
            t1 = time.perf_counter()
            state, priors, losses = ms(
                state, images, cams, priors, cons, lr, weights, "track", s
            )
            jax.block_until_ready(losses)
            return time.perf_counter() - t1

        s1, s2 = 2, 12
        run(s1)
        run(s2)
        print(f"[+{time.perf_counter()-t0:6.1f}s] {name} compiled", flush=True)
        run(s1), run(s2)  # program-transfer warmup, state carried
        t_small = min(run(s1) for _ in range(3))
        t_big = min(run(s2) for _ in range(3))
        dt = (t_big - t_small) / (s2 - s1)
        fixed = t_small - s1 * dt
        print(
            f"[+{time.perf_counter()-t0:6.1f}s] {name}-binning scan: "
            f"{dt*1e3:.1f} ms/step ({dt*1e3/24:.2f} ms/render), "
            f"per-call fixed ~{fixed*1e3:.1f} ms -> "
            f"{dt*nb:.2f} s/frame (+{fixed:.3f} s/segment-entry)",
            flush=True,
        )


if __name__ == "__main__":
    main()
