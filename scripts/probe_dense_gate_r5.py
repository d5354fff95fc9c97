"""Standalone replication of bench's dense numerics gate (r5 debug).

The hardened dense gate's first TPU run reported pallas-vs-tiled pix
0.197 / grad 0.228 (prior runs: ~1e-4) while the same code is clean on
CPU. This probe replicates the leg in a fresh process and localizes:

  - pix_p vs img0 (the pallas render of the SAME params/binning made
    before the grad program — a self-consistency check),
  - pallas leg twice (two nonces), tiled leg twice,
  - all pairwise errors.

Prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def note(m):
    print(f"[dg +{time.perf_counter() - T0:6.1f}s] {m}", file=sys.stderr,
          flush=True)


T0 = time.perf_counter()


def rel(a, b, q=99.99):
    a, b = np.asarray(a), np.asarray(b)
    denom = max(float(np.max(np.abs(b))), 1e-12)
    return float(np.percentile(np.abs(a - b), q)) / denom


def main():
    import jax
    import jax.numpy as jnp

    from topo4d_tpu.core.camera import make_camera
    from topo4d_tpu.rasterizer.pallas import (
        attach_compact,
        binning_for,
        render_gaussians_pallas,
    )
    from topo4d_tpu.rasterizer.tiled import render_gaussians_tiled
    from topo4d_tpu.texture.dense import dense_rendervars
    from topo4d_tpu.utils.profiling import sync_value

    interpret = jax.devices()[0].platform == "cpu"
    res = {"backend": jax.devices()[0].platform}

    n = 300_000
    w = int(os.environ.get("DG_W", "1920"))
    h = int(os.environ.get("DG_H", "1088"))
    res["canvas"] = f"{w}x{h}"
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
    # NB bench's dense fixture uses scale log(0.0015) at 3840x2160 and
    # the numerics leg reuses those params at the 1920x1088 canvas
    k = np.array(
        [[2.2 * 1920, 0, w / 2], [0, 2.2 * 1920, h / 2], [0, 0, 1]],
        np.float32,
    )
    w2c = np.eye(4, dtype=np.float32)
    w2c[2, 3] = 2.0
    cam = make_camera(k, w2c, w, h)
    params = {k2: jnp.asarray(v) for k2, v in params_np.items()}
    means = jnp.asarray(pts)

    binning = binning_for(
        dense_rendervars(params, means), cam, max_span=2, with_static=True
    )
    occ = int(jnp.sum(binning.tile_count > 0))
    cap = min(
        -(-int(occ * 1.2) // 2048) * 2048, int(binning.tile_count.shape[0])
    )
    binning = attach_compact(binning, cap)
    img0 = np.asarray(
        render_gaussians_pallas(
            dense_rendervars(params, means), cam, max_span=2, chunk=128,
            binning=binning, tile_capacity=None, interpret=interpret,
        ).image
    )
    target = jnp.asarray(np.clip(0.9 * img0 + 0.02, 0.0, 1.0))
    note("img0 + binning ready")

    def outputs(name, render):
        def vg(params, target):
            def loss(params):
                rv = dense_rendervars(params, means)
                out = render(rv)
                return jnp.sum(jnp.square(out.image - target)), out

            return jax.value_and_grad(loss, has_aux=True)(params)

        vg.__name__ = name
        (val, out), grads = jax.jit(vg)(params, target)
        return np.asarray(out.image), {
            k2: np.asarray(v) for k2, v in grads.items()
        }

    nonce = f"{os.getpid():x}"
    tcap = -(-int(np.max(np.asarray(binning.tile_count))) // 128) * 128
    legs = {}
    for tag, name, render in [
        ("p1", f"dgp1_{nonce}", lambda rv: render_gaussians_pallas(
            rv, cam, max_span=2, chunk=128, binning=binning,
            tile_capacity=None, interpret=interpret)),
        ("p2", f"dgp2_{nonce}", lambda rv: render_gaussians_pallas(
            rv, cam, max_span=2, chunk=128, binning=binning,
            tile_capacity=None, interpret=interpret)),
        ("t1", f"dgt1_{nonce}", lambda rv: render_gaussians_tiled(
            rv, cam, max_span=2, capacity=tcap)),
        ("t2", f"dgt2_{nonce}", lambda rv: render_gaussians_tiled(
            rv, cam, max_span=2, capacity=tcap)),
    ]:
        legs[tag] = outputs(name, render)
        note(f"{tag} done")

    learned = ("dense_rgb_colors", "dense_unnorm_rotations")
    res["pix_p1_vs_img0"] = rel(legs["p1"][0], img0)
    res["pix_p1_vs_p2"] = rel(legs["p1"][0], legs["p2"][0])
    res["pix_t1_vs_t2"] = rel(legs["t1"][0], legs["t2"][0])
    for q in (99.0, 99.9, 99.99, 100.0):
        res[f"pix_p1_vs_t1_q{q}"] = rel(legs["p1"][0], legs["t1"][0], q)
        res[f"grad_p1_vs_t1_q{q}"] = max(
            rel(legs["p1"][1][k2], legs["t1"][1][k2], q=q)
            for k2 in learned
        )
    # termination-flip census: pixels where the two programs disagree
    # by more than any continuum error could produce
    d = np.abs(legs["p1"][0] - legs["t1"][0]).max(axis=0)
    covered = np.abs(img0).max(axis=0) > 0.01
    res["flip_pixels_gt_0p01"] = int((d > 0.01).sum())
    res["covered_pixels"] = int(covered.sum())
    res["grad_p1_vs_p2"] = max(
        rel(legs["p1"][1][k2], legs["p2"][1][k2], q=99.9) for k2 in learned
    )
    res["grad_t1_vs_t2"] = max(
        rel(legs["t1"][1][k2], legs["t2"][1][k2], q=99.9) for k2 in learned
    )
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
