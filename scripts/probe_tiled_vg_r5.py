"""Bisect the tiled-under-grad forward corruption at dense scale (r5).

probe_dense_pixels_r5 established: at 300k x 1920x1088, the DIRECT
tiled forward agrees with pallas and the sequential f64 oracle (max
7e-4 at knife pixels), but the tiled render's image INSIDE a
value_and_grad program differs from all of them by 0.16 at p99.99 —
deterministically, across blend precision configs. Same class as the
banded-oracle phenomenon. This probe compares, against the direct
tiled forward:

  A. tiled image out of plain value_and_grad (known bad),
  B. tiled image out of value_and_grad with jax.checkpoint around the
     render call,
  C. tiled image out of a forward-only jit of the SAME loss structure
     (no grad) — isolates autodiff from program shape.

Prints one JSON line of p99.99/max errors vs the direct forward.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

T0 = time.perf_counter()


def note(m):
    print(f"[tv +{time.perf_counter() - T0:6.1f}s] {m}", file=sys.stderr,
          flush=True)


def rel(a, b, q=99.99):
    a, b = np.asarray(a), np.asarray(b)
    denom = max(float(np.max(np.abs(b))), 1e-12)
    err = np.abs(a - b)
    return [float(np.percentile(err, q)) / denom,
            float(err.max()) / denom]


def main():
    import jax
    import jax.numpy as jnp

    from topo4d_tpu.core.camera import make_camera
    from topo4d_tpu.rasterizer.tiled import render_gaussians_tiled
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
    tcap = 1920

    img_direct = np.asarray(render_gaussians_tiled(
        dense_rendervars(params, means), cam, max_span=2,
        capacity=tcap).image)
    note("direct forward done")
    target = jnp.asarray(np.clip(0.9 * img_direct + 0.02, 0.0, 1.0))
    nonce = f"{os.getpid():x}"
    res = {"backend": jax.devices()[0].platform}

    def render(rv):
        return render_gaussians_tiled(rv, cam, max_span=2, capacity=tcap)

    def make(name, use_ckpt, with_grad):
        def body(params, target):
            def loss(params):
                rv = dense_rendervars(params, means)
                if use_ckpt:
                    out = jax.checkpoint(
                        lambda rv: render(rv).image
                    )(rv)
                    return jnp.sum(jnp.square(out - target)), out
                out = render(rv)
                return jnp.sum(jnp.square(out.image - target)), out.image

            if with_grad:
                (v, im), g = jax.value_and_grad(loss, has_aux=True)(params)
                return im, g["dense_rgb_colors"]
            v, im = loss(params)
            return im, v

        body.__name__ = f"{name}_{nonce}"
        return jax.jit(body)

    im_a, _ = make("tv_plain", False, True)(params, target)
    res["A_plain_vg"] = rel(np.asarray(im_a), img_direct)
    note(f"A done {res['A_plain_vg']}")
    im_b, _ = make("tv_ckpt", True, True)(params, target)
    res["B_ckpt_vg"] = rel(np.asarray(im_b), img_direct)
    note(f"B done {res['B_ckpt_vg']}")
    im_c, _ = make("tv_fwd", False, False)(params, target)
    res["C_fwd_only"] = rel(np.asarray(im_c), img_direct)
    note(f"C done {res['C_fwd_only']}")
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
