"""Face-parsing mask utilities vs reference semantics (helpers.py:725-823,
train.py:320-327)."""

import jax.numpy as jnp
import numpy as np

from topo4d_tpu.config import DEFAULT_CMAP_INDEX
from topo4d_tpu.pipeline.masks import (
    bgr_colormap,
    dim_inner_mouth,
    get_mask,
    label_colormap,
)


def _reference_bit_colormap(n):
    """Literal port of the reference's generic branch (helpers.py:752-774)."""
    def bitget(byteval, idx):
        return (byteval & (1 << idx)) != 0

    cmap = np.zeros((n, 3), dtype=np.uint8)
    for i in range(n):
        ident = i
        r = g = b = 0
        for j in range(8):
            r = np.bitwise_or(r, bitget(ident, 0) << (7 - j))
            g = np.bitwise_or(g, bitget(ident, 1) << (7 - j))
            b = np.bitwise_or(b, bitget(ident, 2) << (7 - j))
            ident = ident >> 3
        cmap[i] = (r, g, b)
    return cmap


def test_label_colormap_matches_reference_bits():
    np.testing.assert_array_equal(
        label_colormap(14), _reference_bit_colormap(14)
    )
    assert label_colormap(11).shape == (11, 3)
    assert label_colormap(19).shape == (19, 3)


def test_get_mask_hits_exact_label_color():
    cmap = bgr_colormap(14)
    idx = DEFAULT_CMAP_INDEX["inner_mouth"]
    h, w = 6, 8
    mask_img = np.zeros((3, h, w), np.float32)
    # paint the inner-mouth BGR-swapped color into a 2x2 block
    mask_img[:, 2:4, 3:5] = (cmap[idx].astype(np.float32) / 255.0)[
        :, None, None
    ]
    got = np.asarray(
        get_mask(["inner_mouth"], jnp.asarray(mask_img), DEFAULT_CMAP_INDEX)
    )
    assert got.shape == (3, h, w)
    want = np.zeros((h, w))
    want[2:4, 3:5] = 1
    np.testing.assert_array_equal(got[0], want)
    np.testing.assert_array_equal(got[1], want)  # tiled over channels


def test_dim_inner_mouth_scales_only_masked_pixels():
    cmap = bgr_colormap(14)
    idx = DEFAULT_CMAP_INDEX["inner_mouth"]
    h, w = 4, 4
    mask_img = np.zeros((3, h, w), np.float32)
    mask_img[:, 0, 0] = cmap[idx].astype(np.float32) / 255.0
    gt = np.full((3, h, w), 0.8, np.float32)
    out = np.asarray(
        dim_inner_mouth(
            jnp.asarray(gt), jnp.asarray(mask_img), DEFAULT_CMAP_INDEX
        )
    )
    np.testing.assert_allclose(out[:, 0, 0], 0.08, rtol=1e-6)
    np.testing.assert_allclose(out[:, 1:, :], 0.8, rtol=1e-6)
    np.testing.assert_allclose(out[:, 0, 1:], 0.8, rtol=1e-6)
