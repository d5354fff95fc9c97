"""Pixel-level arbiter for the dense-scale pallas-vs-tiled divergence.

probe_dense_gate_r5: at the dense fixture (300k Gaussians, 1920x1088),
pallas and tiled disagree on ~0.01% of pixels by ~16% of max —
bit-identically across runs AND across blend precision configs. This
probe renders both forwards, finds the most divergent pixels, downloads
the projected per-Gaussian quantities, and evaluates the SEQUENTIAL
NumPy port of the CUDA blending loop (testing.sequential_blend_numpy —
independent of both implementations and of the cumprod formulation) at
those exact pixels in f64, with the tile-rect culling both production
paths implement. Prints which leg matches the contract per pixel.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

T0 = time.perf_counter()


def note(m):
    print(f"[px +{time.perf_counter() - T0:6.1f}s] {m}", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from topo4d_tpu.core.camera import make_camera
    from topo4d_tpu.core.gaussian import project_gaussians
    from topo4d_tpu.rasterizer import reference as ref
    from topo4d_tpu.rasterizer.pallas import (
        attach_compact,
        binning_for,
        render_gaussians_pallas,
    )
    from topo4d_tpu.rasterizer.tiled import render_gaussians_tiled
    from topo4d_tpu.testing import sequential_blend_numpy
    from topo4d_tpu.texture.dense import dense_rendervars

    interpret = jax.devices()[0].platform == "cpu"
    n, w, h = 300_000, 1920, 1088
    rng = np.random.default_rng(0)
    pts = rng.normal(0, 1.0, (n, 3)).astype(np.float32)
    pts *= np.array([0.06, 0.1, 0.01], np.float32)
    params_np = {
        "dense_rgb_colors": rng.uniform(0.1, 0.9, (n, 3)).astype(np.float32),
        "dense_unnorm_rotations": np.tile(
            np.array([1, 0, 0, 0], np.float32), (n, 1)
        ),
        "dense_logit_opacities": np.full((n, 1), 3.0, np.float32),
        "dense_log_scales": np.full((n, 3), np.log(0.0015), np.float32),
    }
    k = np.array(
        [[2.2 * w, 0, w / 2], [0, 2.2 * w, h / 2], [0, 0, 1]], np.float32
    )
    w2c = np.eye(4, dtype=np.float32)
    w2c[2, 3] = 2.0
    cam = make_camera(k, w2c, w, h)
    params = {k2: jnp.asarray(v) for k2, v in params_np.items()}
    means = jnp.asarray(pts)
    rv = dense_rendervars(params, means)

    binning = binning_for(rv, cam, max_span=2, with_static=True)
    occ = int(jnp.sum(binning.tile_count > 0))
    cap = min(
        -(-int(occ * 1.2) // 2048) * 2048, int(binning.tile_count.shape[0])
    )
    binning = attach_compact(binning, cap)
    img_p = np.asarray(render_gaussians_pallas(
        rv, cam, max_span=2, chunk=128, binning=binning,
        tile_capacity=None, interpret=interpret).image)
    note("pallas forward done")
    tcap = -(-int(np.max(np.asarray(binning.tile_count))) // 128) * 128
    img_t = np.asarray(render_gaussians_tiled(
        rv, cam, max_span=2, capacity=tcap).image)
    note(f"tiled forward done (tcap {tcap})")

    d = np.abs(img_p - img_t).max(axis=0)  # (H, W)
    flat = np.argsort(d.reshape(-1))[::-1]
    note(f"divergent pixels > 0.01: {(d > 0.01).sum()}, max {d.max():.4f}")

    # projected quantities in FRONT-TO-BACK order (global depth sort)
    proj = project_gaussians(rv, cam)
    order = ref.depth_sorted_order(proj)
    rx0, ry0, rx1, ry1, _, _ = ref.tile_rect(proj, w, h)
    means2d = np.asarray(proj.means2d[order], np.float64)
    conics = np.asarray(proj.conics[order], np.float64)
    colors = np.asarray(rv.colors[order], np.float64)
    depths = np.asarray(proj.depths[order], np.float64)
    opac = np.asarray(rv.opacities[order], np.float64)
    valid = np.asarray(proj.mask[order])
    rect = tuple(
        np.asarray(a[order]) for a in (rx0, ry0, rx1, ry1)
    )
    note("projection downloaded")

    bg = np.zeros(3)
    picks = [int(f) for f in flat[:10]] + [int(f) for f in flat[-5:]]
    pix = np.array(
        [[f % w, f // w] for f in picks], np.float64
    )
    rgb_o, _, _ = sequential_blend_numpy(
        pix, means2d, conics, colors, depths, opac, valid, bg, rect
    )
    note("sequential oracle done")
    print(f"{'pixel':>14} {'d_pt':>8}  {'|p-o|':>9} {'|t-o|':>9}")
    for i, f in enumerate(picks):
        x, y = f % w, f // w
        p = img_p[:, y, x]
        t = img_t[:, y, x]
        o = rgb_o[i]
        print(f"({x:5d},{y:4d}) {d.reshape(-1)[f]:8.4f}  "
              f"{np.abs(p - o).max():9.5f} {np.abs(t - o).max():9.5f}",
              flush=True)


if __name__ == "__main__":
    main()
