"""DiskSequence loader: fabricated Agisoft layout, dense tree, size checks.

Covers the reference's disk contract (train.py:58-112 frame layout,
camera.py XML schema): calibration roundtrip at both down ratios, frame
loading at working and full resolution, and the explicit error when the
on-disk image size disagrees with the calibration-implied size.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from topo4d_tpu.config import Config


@pytest.fixture(scope="module")
def fab_root(tmp_path_factory):
    from fabricate_dataset import fabricate

    root = str(tmp_path_factory.mktemp("fab"))
    fabricate(root, num_views=2, num_frames=1, rows=6, cols=6,
              work_w=48, work_h=32, ratio=4)
    return root


def _make_cfg(root):
    cfg = Config()
    cfg.data.input_dir = root
    cfg.data.dense_input_dir = root + "_dense"
    cfg.data.seq = "seq01"
    cfg.data.down_ratio = 4
    cfg.data.dense_down_ratio = 1
    cfg.data.use_mask = False
    return cfg


def test_disk_sequence_roundtrip(fab_root):
    from topo4d_tpu.pipeline.data import DiskSequence

    src = DiskSequence(_make_cfg(fab_root))
    assert src.num_views == 2
    assert (src.cameras.width, src.cameras.height) == (48, 32)
    assert (src.cameras_full.width, src.cameras_full.height) == (192, 128)
    # dense intrinsics are the working ones scaled by the ratio
    np.testing.assert_allclose(
        np.asarray(src.cameras_full.fx), np.asarray(src.cameras.fx) * 4,
        rtol=1e-5,
    )
    fd = src.frame(1)
    assert fd.images.shape == (2, 3, 32, 48)
    fd_full = src.frame(1, full_res=True)
    assert fd_full.images.shape == (2, 3, 128, 192)
    # past-the-end frame reports exhaustion, not an exception
    assert src.frame(2) is None


def test_disk_sequence_size_mismatch_error(fab_root):
    from topo4d_tpu.pipeline.data import DiskSequence

    cfg = _make_cfg(fab_root)
    # point the dense root at the WORKING-res tree: 48x32 files vs the
    # calibration's 192x128 expectation must raise a pointed error
    cfg.data.dense_input_dir = fab_root
    src = DiskSequence(cfg)
    with pytest.raises(ValueError, match="dense_input_dir"):
        src.frame(1, full_res=True)
