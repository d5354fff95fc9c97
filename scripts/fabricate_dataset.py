"""Fabricate a tiny reference-layout dataset and (optionally) drive the CLI.

Builds everything the CLI surface needs, on disk, in the reference's
directory layout (SURVEY §2: camera.py:45-170 XML schema, train.py:58-112
frame layout): startup OBJ + template texture, facial_regions.pkl, Agisoft
cameras.xml (built by inverting the loader math), and per-frame GT images
rendered from a known Gaussian scene with the tiled renderer.

Usage: python scripts/fabricate_dataset.py <root_dir> [num_views] [frames]
"""

import os
import pickle
import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def fabricate(root, num_views=4, num_frames=2, rows=10, cols=10,
              work_w=48, work_h=32, ratio=8, motion_scale=0.002,
              dense_tree=True, uv_seam=False):
    import jax.numpy as jnp
    from PIL import Image

    from topo4d_tpu.core.gaussian import activate_params
    from topo4d_tpu.pipeline.data import SyntheticSequence
    from topo4d_tpu.rasterizer.tiled import render_gaussians_tiled
    from topo4d_tpu.testing import (
        make_camera_ring,
        make_grid_mesh,
        make_synthetic_regions,
    )
    from topo4d_tpu.topology.obj_io import write_obj_with_uv

    seq = os.path.join(root, "seq01")
    os.makedirs(seq, exist_ok=True)

    verts, faces = make_grid_mesh(rows, cols, extent=0.5)
    n = verts.shape[0]
    if uv_seam:
        # REAL UV seam (VERDICT r4 item 7; reference helpers.py:930-941
        # seam color duplication, helpers.py:436-467 seam-aware
        # densification): the grid's UV map splits into two islands at
        # column cm — every vertex of that column carries TWO uv coords
        # (multiplicity 2), one per island, with a u-gap between the
        # islands so seam texels cannot blend across in UV space.
        cm = cols // 2
        u_left = np.linspace(0.05, 0.46, cm + 1)
        u_right = np.linspace(0.54, 0.95, cols - cm)
        v_grid = np.linspace(0.05, 0.95, rows)
        left_ids = np.full((rows, cols), -1, np.int64)
        right_ids = np.full((rows, cols), -1, np.int64)
        uv_list = []
        for r in range(rows):
            for c in range(cm + 1):
                left_ids[r, c] = len(uv_list)
                uv_list.append((u_left[c], v_grid[r]))
        for r in range(rows):
            for c in range(cm, cols):
                right_ids[r, c] = len(uv_list)
                uv_list.append((u_right[c - cm], v_grid[r]))
        uvs = np.asarray(uv_list, np.float32)
        uv_faces = []
        for f in faces:
            cols_of = [int(v) % cols for v in f]
            ids = left_ids if min(cols_of) < cm else right_ids
            uv_faces.append(
                [int(ids[int(v) // cols, int(v) % cols]) for v in f]
            )
    else:
        uvs = np.stack(
            np.meshgrid(
                np.linspace(0.05, 0.95, cols), np.linspace(0.05, 0.95, rows),
                indexing="xy",
            ),
            -1,
        ).reshape(-1, 2).astype(np.float32)
        uv_faces = [list(f) for f in faces]
    write_obj_with_uv(
        os.path.join(seq, "face_v5.obj"), verts,
        [list(f) for f in faces], uvs, uv_faces,
    )

    # template texture: smooth gradient so sampled vertex colors vary
    ty, tx = np.meshgrid(np.linspace(0, 1, 64), np.linspace(0, 1, 64),
                         indexing="ij")
    tex = np.stack([tx, ty, 0.5 * np.ones_like(tx)], -1)
    Image.fromarray((tex * 255).astype(np.uint8)).save(
        os.path.join(seq, "face_v5.png")
    )

    regions = make_synthetic_regions(n, faces)
    os.makedirs(os.path.join(root, "assets"), exist_ok=True)
    raw = {
        "region_masks": regions.region_masks,
        **regions.masks,
        **regions.flat_faces,
    }
    if uv_seam:
        # face_masks gates densification by ANY-corner touch (reference
        # get_face_faces); the synthetic default (50% random vertices)
        # would make ~94% of quads frontal — 7.3M dense points, an HBM
        # OOM at 8K scale. Mirror the r04 tex8k protocol (docs/runs/
        # r04_tex8k: a contiguous 18x18 vertex patch -> ~356k dense)
        # but CENTER THE PATCH ON THE SEAM so the densified region
        # spans both UV islands and the seam machinery is exercised
        # composed (VERDICT r4 item 7).
        cm = cols // 2
        vids = np.arange(n)
        r_of, c_of = vids // cols, vids % cols
        r0 = max(rows // 2 - 9, 0)
        patch = (
            (r_of >= r0) & (r_of < min(r0 + 18, rows))
            & (c_of >= max(cm - 9, 0)) & (c_of < min(cm + 9, cols))
        )
        raw["face_masks"] = vids[patch].astype(np.int32)
    with open(os.path.join(root, "assets", "facial_regions.pkl"), "wb") as fh:
        pickle.dump(raw, fh)

    # cameras.xml: invert the loader math (agisoft.py:100-153) so
    # load_camera(resize_factor=ratio) reproduces make_camera_ring's views
    cams = make_camera_ring(num_views, width=work_w, height=work_h,
                            distance=2.0)
    full_w, full_h = work_w * ratio, work_h * ratio
    sensors, cameras = [], []
    for i in range(num_views):
        k = np.asarray(cams.fx)[i], np.asarray(cams.fy)[i], \
            np.asarray(cams.cx)[i], np.asarray(cams.cy)[i]
        fx, fy, cx, cy = (float(v) for v in k)
        f_full = fx * ratio
        cx_xml = cx * ratio - full_w / 2.0
        cy_xml = cy * ratio - full_h / 2.0
        sensors.append(
            f'<sensor id="{i}" label="s{i}" type="frame">'
            f'<resolution width="{full_w}" height="{full_h}"/>'
            f'<property name="pixel_width" value="0.004"/>'
            f'<property name="pixel_height" value="0.004"/>'
            f"<calibration><f>{f_full}</f><cx>{cx_xml}</cx>"
            f"<cy>{cy_xml}</cy><k1>0.0</k1><k2>0.0</k2></calibration>"
            f"</sensor>"
        )
        w2c = np.asarray(cams.w2c)[i]
        flip = np.diag([1.0, -1.0, -1.0])
        gl = np.eye(4)
        gl[:3, :3] = flip @ w2c[:3, :3]
        gl[:3, 3] = flip @ w2c[:3, 3]
        t1 = np.linalg.inv(gl)
        t1[:3, 1:3] *= -1
        vals = " ".join(f"{v:.12g}" for v in t1.reshape(-1))
        cameras.append(
            f'<camera id="{i}" sensor_id="{i}" label="view{i:02d}">'
            f"<transform>{vals}</transform></camera>"
        )
    xml = (
        '<?xml version="1.0" encoding="UTF-8"?>\n<document><chunk>'
        f'<sensors>{"".join(sensors)}</sensors>'
        f'<cameras>{"".join(cameras)}</cameras>'
        "</chunk></document>"
    )
    with open(os.path.join(seq, "cameras.xml"), "w") as fh:
        fh.write(xml)

    # GT frames rendered from the known scene (slight wobble per frame)
    from topo4d_tpu.testing import make_head_fixture  # noqa: F401 (doc link)

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
    src = SyntheticSequence(params=params, cameras=cams,
                            num_frames=num_frames,
                            motion_scale=motion_scale)
    for t in range(1, num_frames + 1):
        fd = src.frame(t)
        fdir = os.path.join(seq, "%06d" % t)
        os.makedirs(fdir, exist_ok=True)
        for v in range(num_views):
            im = np.clip(fd.images[v].transpose(1, 2, 0), 0, 1)
            Image.fromarray((im * 255).astype(np.uint8)).save(
                os.path.join(fdir, f"view{v:02d}.png")
            )

    # face-parsing mask tree (mask/%06d/<view>.png): black background with
    # an inner-mouth-colored block so the dimming path has pixels to hit
    from topo4d_tpu.config import DEFAULT_CMAP_INDEX
    from topo4d_tpu.pipeline.masks import bgr_colormap

    mouth_color = bgr_colormap(14)[DEFAULT_CMAP_INDEX["inner_mouth"]]
    for t in range(1, num_frames + 1):
        mdir = os.path.join(seq, "mask", "%06d" % t)
        os.makedirs(mdir, exist_ok=True)
        for v in range(num_views):
            mk = np.zeros((work_h, work_w, 3), np.uint8)
            mk[work_h // 2 : work_h // 2 + 4,
               work_w // 2 : work_w // 2 + 4] = mouth_color
            Image.fromarray(mk).save(
                os.path.join(mdir, f"view{v:02d}.png")
            )

    if not dense_tree:  # geometry-only sequences skip the big renders
        print(f"fabricated dataset at {root} (no dense tree)")
        return
    # full-resolution tree for the texture phase (-did <root>_dense):
    # dense cameras are the working ones with intrinsics scaled by `ratio`
    from topo4d_tpu.core.camera import Camera

    dense_cams = Camera(
        w2c=cams.w2c,
        fx=np.asarray(cams.fx) * ratio, fy=np.asarray(cams.fy) * ratio,
        cx=np.asarray(cams.cx) * ratio, cy=np.asarray(cams.cy) * ratio,
        width=full_w, height=full_h,
    )
    dseq = os.path.join(root + "_dense", "seq01")
    src_d = SyntheticSequence(params=params, cameras=dense_cams,
                              num_frames=num_frames,
                              motion_scale=motion_scale)
    skin_color = bgr_colormap(14)[DEFAULT_CMAP_INDEX["skin"]]
    for t in range(1, num_frames + 1):
        fd = src_d.frame(t)
        fdir = os.path.join(dseq, "%06d" % t)
        os.makedirs(fdir, exist_ok=True)
        mdir = os.path.join(dseq, "mask", "%06d" % t)
        os.makedirs(mdir, exist_ok=True)
        for v in range(num_views):
            im = np.clip(fd.images[v].transpose(1, 2, 0), 0, 1)
            Image.fromarray((im * 255).astype(np.uint8)).save(
                os.path.join(fdir, f"view{v:02d}.png")
            )
            # full-res parsing mask: center half marked "skin" so the
            # masked dense loss (use_mask_dense) has a live region
            mk = np.zeros((full_h, full_w, 3), np.uint8)
            mk[full_h // 4 : 3 * full_h // 4,
               full_w // 4 : 3 * full_w // 4] = skin_color
            Image.fromarray(mk).save(os.path.join(mdir, f"view{v:02d}.png"))
    print(f"fabricated dataset at {root} (+ dense tree at {root}_dense)")


if __name__ == "__main__":
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/topo4d_fab"
    nv = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    nf = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    # optional: rows cols work_w work_h ratio motion_scale (e2e runs use
    # the reference scale 92 90 375 512 2 and a visible motion amplitude)
    rows = int(sys.argv[4]) if len(sys.argv) > 4 else 10
    cols = int(sys.argv[5]) if len(sys.argv) > 5 else 10
    work_w = int(sys.argv[6]) if len(sys.argv) > 6 else 48
    work_h = int(sys.argv[7]) if len(sys.argv) > 7 else 32
    ratio = int(sys.argv[8]) if len(sys.argv) > 8 else 8
    ms = float(sys.argv[9]) if len(sys.argv) > 9 else 0.002
    fabricate(root, nv, nf, rows, cols, work_w, work_h, ratio, ms)
