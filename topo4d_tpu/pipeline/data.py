"""Sequence data sources: Agisoft-calibrated disk layout + synthetic.

Disk layout follows the reference (train.py:58-112): a sequence directory
holding ``cameras.xml``, per-frame subdirs ``%06d`` of per-view jpg/png
images named by camera label, and optionally a parallel ``mask/`` tree of
face-parsing maps. Views in the blacklist are skipped; each image is
rotated by its camera's +/-90-degree portrait rotation before use.
"""

from __future__ import annotations

import dataclasses
import os
from glob import glob
from typing import Dict, List, NamedTuple, Optional

import numpy as np

from topo4d_tpu.config import Config
from topo4d_tpu.core.agisoft import load_camera, rotate_image
from topo4d_tpu.core.camera import Camera, make_camera


class FrameData(NamedTuple):
    images: np.ndarray  # (V, 3, H, W) float32 in [0, 1]
    masks: Optional[np.ndarray]  # (V, 3, H, W) or None
    view_names: List[str]


def _stack_cameras(cam_dicts: List[Dict], near: float, far: float) -> Camera:
    ks = np.stack([c["intrinsics"] for c in cam_dicts])
    w2cs = []
    for c in cam_dicts:
        w2c = np.concatenate(
            [c["extrinsics"], np.array([[0.0, 0.0, 0.0, 1.0]])], axis=0
        )
        w2cs.append(w2c)
    h, w = cam_dicts[0]["image_size"]
    return make_camera(ks, np.stack(w2cs), int(w), int(h), near, far)


@dataclasses.dataclass
class DiskSequence:
    """Reference-layout sequence reader."""

    cfg: Config

    def __post_init__(self):
        data = self.cfg.data
        seq_dir = os.path.join(data.input_dir, data.seq)
        calib = os.path.join(seq_dir, "cameras.xml")
        first = sorted(glob(os.path.join(seq_dir, "000001", "*.jpg"))) + sorted(
            glob(os.path.join(seq_dir, "000001", "*.png"))
        )
        self.view_files = [
            os.path.basename(f)
            for f in first
            if not any(
                os.path.basename(f).startswith(b) for b in data.blacklist
            )
        ]
        self.view_names = [os.path.splitext(v)[0] for v in self.view_files]
        cams, cams_full = [], []
        self.trans_g = np.eye(4)
        for name in self.view_names:
            rt = data.rotate_mask.get(name, 0)
            cam, trans_g = load_camera(
                calib, name, resize_factor=data.down_ratio, rt=rt
            )
            cam_full, _ = load_camera(
                calib, name, resize_factor=data.dense_down_ratio, rt=rt
            )
            cams.append(cam)
            cams_full.append(cam_full)
            self.trans_g = trans_g
        near, far = self.cfg.raster.near, self.cfg.raster.far
        self.cameras = _stack_cameras(cams, near, far)
        self.cameras_full = _stack_cameras(cams_full, near, far)

    @property
    def num_views(self) -> int:
        return len(self.view_names)

    def frame(self, t: int, full_res: bool = False) -> Optional[FrameData]:
        """1-based frame t data or None when the frame dir is empty."""
        from PIL import Image

        data = self.cfg.data
        root = data.dense_input_dir if full_res else data.input_dir
        frame_dir = os.path.join(root, data.seq, "%06d" % t)
        mask_root = os.path.join(root, data.seq, "mask")
        want_mask = (
            data.use_mask_dense if full_res else data.use_mask
        )
        use_mask = want_mask and os.path.isdir(mask_root)
        if want_mask and not os.path.isdir(mask_root):
            if not getattr(self, "_warned_no_mask", False):
                print(
                    f"[topo4d] mask dir {mask_root} not found - proceeding "
                    f"without face-parsing masks"
                )
                self._warned_no_mask = True
        images, masks = [], []
        for fname, name in zip(self.view_files, self.view_names):
            path = os.path.join(frame_dir, fname)
            if not os.path.exists(path):
                alt = os.path.splitext(path)[0]
                for ext in (".jpg", ".png"):
                    if os.path.exists(alt + ext):
                        path = alt + ext
                        break
                else:
                    return None
            im = np.asarray(Image.open(path), np.float32) / 255.0
            ori_h, ori_w = im.shape[:2]
            rt = data.rotate_mask.get(name, 0)
            im = rotate_image(im, rt * 90)
            cam = self.cameras_full if full_res else self.cameras
            if im.shape[:2] != (cam.height, cam.width):
                raise ValueError(
                    f"{path} is {im.shape[1]}x{im.shape[0]} but the "
                    f"calibration at "
                    f"{'dense_' if full_res else ''}down_ratio="
                    f"{data.dense_down_ratio if full_res else data.down_ratio}"
                    f" expects {cam.width}x{cam.height}; point "
                    f"{'--dense_input_dir' if full_res else '--input_dir'} "
                    f"at images of that size or adjust the ratio"
                )
            images.append(im.transpose(2, 0, 1))
            if use_mask:
                mbase = os.path.join(
                    root, data.seq, "mask", "%06d" % t,
                    os.path.splitext(fname)[0],
                )
                # same extension fallback as images; a missing per-view
                # mask degrades the FRAME to maskless (warn once) instead
                # of crashing hours into a sequence
                for ext in (".png", ".jpg"):
                    if os.path.exists(mbase + ext):
                        mpath = mbase + ext
                        break
                else:
                    if not getattr(self, "_warned_missing_mask", False):
                        print(
                            f"[topo4d] mask {mbase}.png missing - frame "
                            f"{t} proceeds without masks"
                        )
                        self._warned_missing_mask = True
                    use_mask = False
                    masks = []
                    continue
                mk = np.asarray(Image.open(mpath), np.float32)[:ori_h, :ori_w]
                mk = rotate_image(mk / 255.0, rt * 90)
                masks.append(mk.transpose(2, 0, 1))
        return FrameData(
            images=np.stack(images),
            masks=np.stack(masks) if masks else None,
            view_names=self.view_names,
        )


@dataclasses.dataclass
class SyntheticSequence:
    """Procedural sequence for tests/benches: a known Gaussian scene whose
    vertices wobble over time; GT images are rendered with the oracle-grade
    tiled renderer."""

    params: Dict[str, np.ndarray]
    cameras: Camera
    num_frames: int = 3
    motion_scale: float = 0.002
    seed: int = 0

    def __post_init__(self):
        self.cameras_full = self.cameras
        self.view_names = [f"view{i:02d}" for i in range(self._v)]
        self.trans_g = np.eye(4)
        self._frames: Dict[int, FrameData] = {}

    @property
    def _v(self) -> int:
        return int(np.asarray(self.cameras.fx).shape[0])

    @property
    def num_views(self) -> int:
        return self._v

    def vertices_at(self, t: int) -> np.ndarray:
        rng = np.random.default_rng(self.seed + t)
        base = self.params["means3D"]
        if t <= 1:
            return base
        wobble = self.motion_scale * np.sin(
            0.5 * t + np.linspace(0, 6.28, base.shape[0])
        )
        return base + wobble[:, None] * np.array([0.3, 1.0, 0.2])

    def frame(self, t: int, full_res: bool = False) -> Optional[FrameData]:
        if t > self.num_frames:
            return None
        if t not in self._frames:
            import jax
            import jax.numpy as jnp

            from topo4d_tpu.core.gaussian import activate_params
            from topo4d_tpu.rasterizer.tiled import render_gaussians_tiled

            params = dict(self.params)
            params["means3D"] = self.vertices_at(t).astype(np.float32)
            rv = activate_params({k: jnp.asarray(v) for k, v in params.items()})
            imgs = []
            for i in range(self._v):
                out = render_gaussians_tiled(
                    rv, self.cameras[i], max_span=4, capacity=512
                )
                imgs.append(np.asarray(out.image))
            self._frames[t] = FrameData(
                images=np.stack(imgs), masks=None, view_names=self.view_names
            )
        return self._frames[t]


def view_order(num_views: int, num_iters: int, seed: int) -> np.ndarray:
    """Random view schedule without replacement per epoch (train.py:105-112)."""
    rng = np.random.default_rng(seed)
    epochs = -(-num_iters // num_views)
    order = np.concatenate(
        [rng.permutation(num_views) for _ in range(epochs)]
    )
    return order[:num_iters].astype(np.int32)
