"""Fast long-sequence dataset fabrication (frames batched per dispatch).

`fabricate_dataset.fabricate` renders each view with its own device
dispatch + download, which through the tunneled TPU costs ~14 s/frame —
untenable for the 800-frame reference-default sequence (VERDICT r3 item
2). This wrapper reuses `fabricate` for everything structural (startup
OBJ + texture, facial_regions.pkl, Agisoft cameras.xml, mask layout) on
a 1-frame sequence, then regenerates ALL frames with

- ONE jitted lax.map render of all 24 views per frame (one dispatch,
  one (V, H, W, 3) uint8 download),
- PNG encodes on a thread pool,
- per-frame mask trees as hardlinks of frame 1's masks (they are
  static by construction).

Images use the same params (seeded rng), the same
`SyntheticSequence.vertices_at` wobble, the same tiled renderer settings
and the same uint8 quantization as `fabricate`'s; pixel values are
expected to match, though bit-identity of the fused lax.map program vs
per-view dispatch is not guaranteed by XLA and has not been verified.

Usage: python scripts/fabricate_fast.py <root> <views> <frames> <rows>
       <cols> <work_w> <work_h> <ratio> <motion_scale>
"""

import os
import sys
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def fabricate_fast(root, num_views=24, num_frames=800, rows=92, cols=90,
                   work_w=375, work_h=512, ratio=2, motion_scale=0.004,
                   dense_tree=False, uv_seam=False):
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from scripts.fabricate_dataset import fabricate
    from topo4d_tpu.core.gaussian import activate_params
    from topo4d_tpu.pipeline.data import SyntheticSequence
    from topo4d_tpu.rasterizer.tiled import render_gaussians_tiled
    from topo4d_tpu.testing import make_camera_ring, make_grid_mesh

    # structure + frame 1 + frame-1 masks via the reference fabricator
    fabricate(root, num_views, 1, rows, cols, work_w, work_h, ratio,
              motion_scale, dense_tree=False, uv_seam=uv_seam)

    # rebuild the exact scene the fabricator used (same seeds)
    verts, faces = make_grid_mesh(rows, cols, extent=0.5)
    n = verts.shape[0]
    rng = np.random.default_rng(0)
    pitch = 1.0 / max(rows, cols)
    params = {
        "means3D": verts.astype(np.float32),
        "rgb_colors": rng.uniform(0.1, 0.9, (n, 3)).astype(np.float32),
        "unnorm_rotations": np.tile(np.array([1.0, 0, 0, 0], np.float32),
                                    (n, 1)),
        "logit_opacities": np.full((n, 1), 6.0, np.float32),
        "log_scales": np.full((n, 3), np.log(pitch / 2), np.float32),
        "cam_m": np.zeros((num_views, 3), np.float32),
        "cam_c": np.zeros((num_views, 3), np.float32),
    }
    cams = make_camera_ring(num_views, width=work_w, height=work_h,
                           distance=2.0)
    src = SyntheticSequence(params=params, cameras=cams,
                           num_frames=num_frames,
                           motion_scale=motion_scale)
    base = {k: jnp.asarray(v) for k, v in params.items()}
    # device-array cameras: lax.map's traced index cannot slice numpy
    cams_dev = jax.tree_util.tree_map(jnp.asarray, cams)

    @jax.jit
    def render_all(means):
        rv = activate_params({**base, "means3D": means})
        return jax.lax.map(
            lambda i: jnp.clip(
                render_gaussians_tiled(
                    rv, cams_dev[i], max_span=4, capacity=512
                ).image.transpose(1, 2, 0) * 255.0, 0, 255
            ).astype(jnp.uint8),
            jnp.arange(num_views, dtype=jnp.int32),
        )

    seq = os.path.join(root, "seq01")
    mask1 = os.path.join(seq, "mask", "000001")
    pool = ThreadPoolExecutor(max_workers=8)

    def write_frame(t, imgs):
        fdir = os.path.join(seq, "%06d" % t)
        os.makedirs(fdir, exist_ok=True)
        for v in range(num_views):
            # temp-name + rename: a crash mid-write must not leave a
            # final-named partial PNG that the resume check would count
            # as complete (silent dataset corruption)
            dst = os.path.join(fdir, f"view{v:02d}.png")
            tmp = dst + ".tmp"
            Image.fromarray(imgs[v]).save(tmp, format="PNG")
            os.replace(tmp, dst)
        if t > 1:  # masks are static: hardlink frame 1's tree
            mdir = os.path.join(seq, "mask", "%06d" % t)
            os.makedirs(mdir, exist_ok=True)
            for name in os.listdir(mask1):
                dst = os.path.join(mdir, name)
                if not os.path.exists(dst):
                    os.link(os.path.join(mask1, name), dst)

    jobs = []
    for t in range(1, num_frames + 1):
        fdir = os.path.join(seq, "%06d" % t)
        if (
            os.path.isdir(fdir)
            and sum(
                f.endswith(".png") for f in os.listdir(fdir)
            ) == num_views
        ):  # resume after a tunnel wedge: frame complete iff all FINAL
            # names exist (writes go to .tmp then os.replace, so a
            # crash can never leave a complete-looking partial frame)
            continue
        imgs = np.asarray(render_all(
            jnp.asarray(src.vertices_at(t).astype(np.float32))
        ))
        jobs.append(pool.submit(write_frame, t, imgs))
        if t % 50 == 0:
            print(f"[fab-fast] frame {t}/{num_frames}", flush=True)
    for j in jobs:
        j.result()

    if dense_tree:
        # full-resolution tree for the texture phase (-did <root>_dense):
        # intrinsics scaled by `ratio` (fabricate_dataset.py:166-173),
        # rendered per view (a 12-Mpx canvas per dispatch) with uint8
        # conversion ON DEVICE so the download is 4x smaller
        from topo4d_tpu.config import DEFAULT_CMAP_INDEX
        from topo4d_tpu.core.camera import Camera
        from topo4d_tpu.pipeline.masks import bgr_colormap

        full_w, full_h = work_w * ratio, work_h * ratio
        dense_cams = Camera(
            w2c=cams.w2c,
            fx=np.asarray(cams.fx) * ratio,
            fy=np.asarray(cams.fy) * ratio,
            cx=np.asarray(cams.cx) * ratio,
            cy=np.asarray(cams.cy) * ratio,
            width=full_w, height=full_h,
        )
        dcams_dev = jax.tree_util.tree_map(jnp.asarray, dense_cams)

        @jax.jit
        def render_full_view(means, i):
            rv = activate_params({**base, "means3D": means})
            return jnp.clip(
                render_gaussians_tiled(
                    rv, dcams_dev[i], max_span=4, capacity=512
                ).image.transpose(1, 2, 0) * 255.0, 0, 255
            ).astype(jnp.uint8)

        dseq = os.path.join(root + "_dense", "seq01")
        skin = bgr_colormap(14)[DEFAULT_CMAP_INDEX["skin"]]
        mk = np.zeros((full_h, full_w, 3), np.uint8)
        mk[full_h // 4: 3 * full_h // 4, full_w // 4: 3 * full_w // 4] = skin

        def write_dense_view(t, v, img):
            fdir = os.path.join(dseq, "%06d" % t)
            mdir = os.path.join(dseq, "mask", "%06d" % t)
            os.makedirs(fdir, exist_ok=True)
            os.makedirs(mdir, exist_ok=True)
            Image.fromarray(img).save(
                os.path.join(fdir, f"view{v:02d}.png")
            )
            mpath = os.path.join(mdir, f"view{v:02d}.png")
            m0 = os.path.join(dseq, "mask", "000001", "view00.png")
            if t == 1 and v == 0:
                Image.fromarray(mk).save(mpath)
            elif not os.path.exists(mpath):
                os.link(m0, mpath)

        djobs = []
        for t in range(1, num_frames + 1):
            means = jnp.asarray(src.vertices_at(t).astype(np.float32))
            for v in range(num_views):
                img = np.asarray(
                    render_full_view(means, jnp.asarray(v, jnp.int32))
                )
                if t == 1 and v == 0:
                    write_dense_view(t, v, img)  # mask seed, in order
                else:
                    djobs.append(pool.submit(write_dense_view, t, v, img))
            print(f"[fab-fast] dense frame {t}/{num_frames}", flush=True)
        for j in djobs:
            j.result()

    pool.shutdown()
    print(f"[fab-fast] fabricated {num_frames} frames at {root}"
          + (" (+ dense tree)" if dense_tree else ""))


if __name__ == "__main__":
    a = sys.argv[1:]
    fabricate_fast(
        a[0],
        int(a[1]) if len(a) > 1 else 24,
        int(a[2]) if len(a) > 2 else 800,
        int(a[3]) if len(a) > 3 else 92,
        int(a[4]) if len(a) > 4 else 90,
        int(a[5]) if len(a) > 5 else 375,
        int(a[6]) if len(a) > 6 else 512,
        int(a[7]) if len(a) > 7 else 2,
        float(a[8]) if len(a) > 8 else 0.004,
        dense_tree=(len(a) > 9 and "dense" in a[9]),
        uv_seam=(len(a) > 9 and "seam" in a[9]),
    )
