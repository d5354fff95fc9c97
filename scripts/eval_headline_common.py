"""Common-metric evaluation for the headline validation runs.

The three validate_headline modes log non-comparable `loss_total`s
(batched sums photometric over all views and takes 24x fewer regularizer
Adam steps). This scores each mode's EXPORTED per-frame parameters on
one common yardstick: mean photometric (0.8 L1 + 0.2 (1-SSIM)) and mean
PSNR over ALL 24 views against the dataset's GT frames — the
test_batched_parity criterion at reference scale.

CPU-runnable (tiled renderer, ~1 min/frame/mode).
Usage: JAX_PLATFORMS=cpu python scripts/eval_headline_common.py \
           <dataset_root> <validate_out_root> [frames=4]
"""
import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np


def main():
    root = sys.argv[1]
    vroot = sys.argv[2]
    frames = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    import jax
    import jax.numpy as jnp

    from topo4d_tpu.config import Config
    from topo4d_tpu.core.gaussian import activate_params
    from topo4d_tpu.losses.image import photometric_loss, psnr
    from topo4d_tpu.pipeline.data import DiskSequence
    from topo4d_tpu.rasterizer.tiled import render_gaussians_tiled

    cfg = Config()
    cfg.data.input_dir = root
    cfg.data.seq = "seq01"
    cfg.data.down_ratio = 2
    cfg.data.use_mask = False
    src = DiskSequence(cfg)
    cams = src.cameras
    v = src.num_views

    @jax.jit
    def view_scores(params, gt, vid):
        rv = activate_params(params)
        cam = jax.tree_util.tree_map(lambda x: x[vid], cams)
        im = render_gaussians_tiled(rv, cam, max_span=4, capacity=512).image
        im = (
            jnp.exp(params["cam_m"][vid])[:, None, None] * im
            + params["cam_c"][vid][:, None, None]
        )
        return photometric_loss(im, gt), jnp.mean(psnr(im, gt))

    report = {}
    for mode in ("parity", "batched0", "headline"):
        npz = np.load(
            os.path.join(vroot, mode, "val", "seq01", "params.npz")
        )
        rows = {}
        for t in range(frames):
            params = {
                "means3D": jnp.asarray(npz["means3D"][t]),
                "rgb_colors": jnp.asarray(npz["rgb_colors"][t]),
                "unnorm_rotations": jnp.asarray(npz["unnorm_rotations"][t]),
                "log_scales": jnp.asarray(npz["log_scales"]),
                "logit_opacities": jnp.asarray(npz["logit_opacities"]),
                "cam_m": jnp.asarray(npz["cam_m"]),
                "cam_c": jnp.asarray(npz["cam_c"]),
            }
            fd = src.frame(t + 1)
            pls, pss = [], []
            for i in range(v):
                pl_, ps_ = view_scores(
                    params, jnp.asarray(fd.images[i]),
                    jnp.asarray(i, jnp.int32),
                )
                pls.append(float(pl_))
                pss.append(float(ps_))
            rows[t] = {
                "photometric_mean": float(np.mean(pls)),
                "psnr_mean": float(np.mean(pss)),
            }
            print(f"{mode} frame {t}: photometric "
                  f"{rows[t]['photometric_mean']:.5f} psnr "
                  f"{rows[t]['psnr_mean']:.2f}", flush=True)
        report[mode] = rows

    out = os.path.join(vroot, "common_metric.json")
    with open(out, "w") as fh:
        json.dump(report, fh, indent=2)
    print("wrote", out)


if __name__ == "__main__":
    main()
