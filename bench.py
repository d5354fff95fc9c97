"""Benchmark: fwd+bwd rasterization throughput and sec/frame estimate.

Runs on whatever backend the ambient environment provides (real TPU chip
under the driver). Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}

Headline metric: Mpix/s/chip through forward+backward of the Pallas
differentiable rasterizer at the reference's geometry-phase scale
(8,280 Gaussians, 512x375 view, 24-camera rig). ``sec_per_frame`` comes
from the FULL jitted tracking step (render + photometric + temporal +
flatten losses + Adam + region constraint scatters) at the reference's
1,100-iteration schedule; ``vs_baseline`` is the ratio of the BASELINE.md
north-star (<= 5 s per tracked frame) to that — >= 1 means target met.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

_T0 = time.perf_counter()


def _note(msg: str) -> None:
    """Progress marker on stderr (stdout carries only the JSON line)."""
    print(f"[bench +{time.perf_counter() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def _bench_full_step() -> float:
    """Seconds per full single-view tracking step at reference scale."""
    import jax
    import jax.numpy as jnp

    from topo4d_tpu.config import Config
    from topo4d_tpu.pipeline.data import SyntheticSequence
    from topo4d_tpu.pipeline.scene import (
        build_scene,
        cache_first_frame_attrs,
    )
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
        np.meshgrid(
            np.linspace(0.05, 0.95, cols), np.linspace(0.05, 0.95, rows),
            indexing="xy",
        ),
        -1,
    ).reshape(-1, 2).astype(np.float32)
    mesh = MeshObj(
        vertices=verts, uvs=uvs, faces=faces,
        uv_faces=[list(f) for f in faces],
    )
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

    from topo4d_tpu.pipeline.trainer import _cpu_device

    with jax.default_device(_cpu_device()):
        ffa = cache_first_frame_attrs(params_np, regions)
    trainer.first_frame_attrs = jax.tree_util.tree_map(jnp.asarray, ffa)
    cons = trainer._constraints("track")
    lr = trainer.lrs_for("track")
    weights = trainer.weights_for("track")
    gt = jnp.zeros((3, 512, 375))
    vid = jnp.asarray(0, jnp.int32)
    state, priors = trainer.state, trainer.priors
    # production path: the trainer scans runs of identically-configured
    # iterations into one device program (trainer.multi_step) and computes
    # metrics (PSNR) only on log iterations (log_freq=500 -> ~3 of 1100),
    # like the reference's report_progress cadence (train.py:702, 777).
    # Time the scanned segment; amortize the logged singles below.
    images = jnp.zeros((24, 3, 512, 375))
    from topo4d_tpu.pipeline.data import view_order

    order = view_order(24, 250, seed=1)

    def run_scan(iters, reps=4):
        # min over repeated post-warmup executions: through the remote
        # tunnel the FIRST execution of a freshly loaded program can be
        # multi-second (program transfer), which once inflated a 4.4 ms
        # step to a 9.8 ms "measurement"
        nonlocal state, priors
        vids = jnp.asarray(order[:iters], jnp.int32)
        for _ in range(2):  # compile + first (slow) execution
            state, priors, losses = trainer.multi_step(
                state, images, cams, vids, priors, cons, lr, weights,
                "track"
            )
            jax.block_until_ready(losses)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            state, priors, losses = trainer.multi_step(
                state, images, cams, vids, priors, cons, lr, weights,
                "track"
            )
            jax.block_until_ready(losses)
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = run_scan(25)
    _note("track scan(25) compiled+timed")
    t2 = run_scan(225)
    dt_nolog = (t2 - t1) / 200.0
    _note("track loop timed")

    # amortize the ~3 logged iterations per 1100-iteration frame
    state, priors, m = trainer.step(
        state, gt, cams, vid, priors, cons, lr, weights, "track",
        with_metrics=True,
    )
    jax.block_until_ready(m["loss_total"])

    def run_log(iters):
        nonlocal state, priors
        t0 = time.perf_counter()
        for _ in range(iters):
            state, priors, m = trainer.step(
                state, gt, cams, vid, priors, cons, lr, weights, "track",
                with_metrics=True,
            )
        jax.block_until_ready(m["loss_total"])
        return time.perf_counter() - t0

    l1 = run_log(5)
    l2 = run_log(30)
    dt_log = (l2 - l1) / 25.0
    n_logged = 3  # iterations 0, 500, 1000 of 1100 at log_freq=500
    return dt_nolog + max(dt_log - dt_nolog, 0.0) * n_logged / 1100.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from topo4d_tpu.core.gaussian import activate_params
    from topo4d_tpu.losses.image import photometric_loss
    from topo4d_tpu.rasterizer.pallas import render_gaussians_pallas
    from topo4d_tpu.testing import make_head_fixture

    params_np, cams, _ = make_head_fixture()
    _note("fixture ready")
    cam0 = cams[0]
    h, w = cam0.height, cam0.width
    params = {k: jnp.asarray(v) for k, v in params_np.items()}
    n = params["means3D"].shape[0]

    rv0 = activate_params(params)
    render = jax.jit(
        lambda rv: render_gaussians_pallas(rv, cam0, max_span=2, chunk=128)
    )
    gt = jax.block_until_ready(render(rv0).image)
    _note("render compiled + gt done")

    def loss_fn(params, gt):
        rv = activate_params(params)
        out = render_gaussians_pallas(rv, cam0, max_span=2, chunk=128)
        return photometric_loss(out.image, gt)

    # the step must CARRY STATE (params nudged by its own grads) so every
    # iteration has distinct inputs: repeated identical executions can be
    # served from a result cache by the remote-execution tunnel, which
    # once produced a fictitious 0.04 ms "render step"
    @jax.jit
    def vg(params, gt):
        val, grads = jax.value_and_grad(loss_fn)(params, gt)
        new_params = jax.tree_util.tree_map(
            lambda p, g: p - 1e-12 * g, params, grads
        )
        return val, new_params

    # warmup / compile
    val, params = vg(params, gt)
    jax.block_until_ready(val)
    _note("vg compiled")

    def run(iters):
        nonlocal params
        t0 = time.perf_counter()
        for _ in range(iters):
            val, params = vg(params, gt)
        jax.block_until_ready(val)
        return time.perf_counter() - t0

    # two-point fit strips the tunnel's fixed per-sync cost (~30-40 ms)
    t1 = run(25)
    t2 = run(225)
    step_s = (t2 - t1) / 200.0
    _note("render loop timed")
    from topo4d_tpu.utils.profiling import mpix_per_s

    mpix_s = mpix_per_s(h, w, 1, step_s)

    # full tracking step at reference scale (all losses + Adam + scatters)
    full_dt = _bench_full_step()
    _note("full step timed")
    sec_per_frame = full_dt * 1100
    target = 5.0

    stats = render(rv0)
    result = {
        "metric": "Mpix/s/chip fwd+bwd rasterize",
        "value": round(mpix_s, 2),
        "unit": "Mpix/s",
        "vs_baseline": round(target / sec_per_frame, 3),
        "render_step_ms": round(step_s * 1e3, 3),
        "full_step_ms": round(full_dt * 1e3, 3),
        "sec_per_frame_1100it": round(sec_per_frame, 3),
        "gaussians": int(n),
        "image": f"{w}x{h}",
        "backend": jax.devices()[0].platform,
        "num_cropped": int(stats.num_cropped),
        "num_overflow": int(stats.num_overflow),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    try:
        main()
    except Exception as exc:  # emit an honest failure record, then raise
        print(json.dumps({
            "metric": "Mpix/s/chip fwd+bwd rasterize",
            "value": 0,
            "unit": "Mpix/s",
            "vs_baseline": 0,
            "error": f"{type(exc).__name__}: {exc}",
        }))
        raise
