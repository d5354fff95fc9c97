"""Face-parsing mask utilities.

Reference semantics: helpers.py:725-823 (``label_colormap`` with the
bit-twiddling generic branch used for n=14, ``get_mask`` matching mask RGB
against colormap tiles) and the inner-mouth GT dimming of train.py:320-327.
Mask extraction is pure jnp so it can run inside the data-prep jit.
"""

from __future__ import annotations

import functools
from typing import Dict, Sequence

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=4)
def label_colormap(n_label: int = 14) -> np.ndarray:
    """(N, 3) uint8 label colormap (reference helpers.py:725-798)."""
    if n_label == 11:  # helen / ibugmask
        return np.array(
            [
                (0, 0, 0), (255, 255, 0), (139, 76, 57), (139, 54, 38),
                (0, 205, 0), (0, 138, 0), (154, 50, 205), (72, 118, 255),
                (255, 165, 0), (0, 0, 139), (255, 0, 0),
            ],
            dtype=np.uint8,
        )
    if n_label == 19:  # celebamask-hq
        return np.array(
            [
                (0, 0, 0), (204, 0, 0), (76, 153, 0), (204, 204, 0),
                (51, 51, 255), (204, 0, 204), (0, 255, 255), (255, 204, 204),
                (102, 51, 0), (255, 0, 0), (102, 204, 0), (255, 255, 0),
                (0, 0, 153), (0, 0, 204), (255, 51, 153), (0, 204, 204),
                (0, 51, 0), (255, 153, 51), (0, 204, 0),
            ],
            dtype=np.uint8,
        )

    def bitget(val, idx):
        return (val & (1 << idx)) != 0

    cmap = np.zeros((n_label, 3), dtype=np.uint8)
    for i in range(n_label):
        ident = i
        r = g = b = 0
        for j in range(8):
            r = np.bitwise_or(r, bitget(ident, 0) << (7 - j))
            g = np.bitwise_or(g, bitget(ident, 1) << (7 - j))
            b = np.bitwise_or(b, bitget(ident, 2) << (7 - j))
            ident >>= 3
        cmap[i] = (r, g, b)
    return cmap


def bgr_colormap(n_label: int = 14) -> np.ndarray:
    """The reference uses the colormap channel-swapped (helpers.py:806)."""
    return label_colormap(n_label)[:, [2, 1, 0]]


def get_mask(
    target_labels: Sequence[str],
    mask_rgb: jnp.ndarray,  # (3, H, W) float in [0, 1]
    cmap_index: Dict[str, int],
    n_label: int = 14,
) -> jnp.ndarray:
    """Binary mask where the parsing image matches any target label color.

    Reference ``get_mask`` (helpers.py:811-823): per-pixel all-channel
    |rgb*255 - color| < 1 -> 1. Returns (3, H, W) tiled like the reference.
    """
    cmap = bgr_colormap(n_label)
    scaled = mask_rgb * 255.0
    hit = jnp.zeros(mask_rgb.shape[1:], bool)
    for label in target_labels:
        color = jnp.asarray(
            cmap[cmap_index[label]].astype(np.float32)
        ).reshape(3, 1, 1)
        hit = hit | jnp.all(jnp.abs(scaled - color) < 1.0, axis=0)
    return jnp.tile(hit[None].astype(mask_rgb.dtype), (3, 1, 1))


def dim_inner_mouth(
    gt: jnp.ndarray, mask_rgb: jnp.ndarray, cmap_index: Dict[str, int]
) -> jnp.ndarray:
    """Dim inner-mouth GT pixels x0.1 (reference train.py:320-327)."""
    m = get_mask(["inner_mouth"], mask_rgb, cmap_index)
    return jnp.where(m > 0.5, gt * 0.1, gt)
