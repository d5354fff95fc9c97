"""Photometric losses: L1 family, SSIM, PSNR (pure jnp / lax).

Reference semantics: helpers.py:115-131 (L1/L2 variants),
external.py:64-116 (SSIM via 11x11 Gaussian-window grouped conv, PSNR).
Images are channel-first (C, H, W) like the rasterizer output.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def l1_loss(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """mean |x - y| (reference ``l1_loss_v1``)."""
    return jnp.mean(jnp.abs(x - y))


def l1_loss_sum_last(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """mean over leading dims of sum_|last| |x - y| (reference ``l1_loss_v2``)."""
    return jnp.mean(jnp.sum(jnp.abs(x - y), axis=-1))


def l2_loss(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """mean sqrt((x - y)^2 + 1e-20) (reference ``l2_loss``)."""
    return jnp.mean(jnp.sqrt((x - y) ** 2 + 1e-20))


def weighted_l2_loss_v1(x, y, w):
    """mean sqrt((x - y)^2 * w + 1e-20) (reference helpers.py:126-127)."""
    return jnp.mean(jnp.sqrt((x - y) ** 2 * w + 1e-20))


def weighted_l2_loss_v2(x, y, w):
    """mean sqrt(sum_last((x - y)^2) * w + 1e-20) (reference helpers.py:130-131)."""
    return jnp.mean(jnp.sqrt(jnp.sum((x - y) ** 2, axis=-1) * w + 1e-20))


def mse(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """Per-leading-dim MSE (reference ``calc_mse``): (C, ...) -> (C, 1)."""
    d = (img1 - img2) ** 2
    return d.reshape(d.shape[0], -1).mean(axis=1, keepdims=True)


def psnr(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """20 log10(1 / sqrt(mse)) per leading dim (reference ``calc_psnr``)."""
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(mse(img1, img2)))


@functools.lru_cache(maxsize=8)
def _gaussian_1d(window_size: int, sigma: float) -> np.ndarray:
    """Normalized 1-D Gaussian taps (reference external.py:73-75)."""
    xs = np.arange(window_size) - window_size // 2
    g = np.exp(-(xs**2) / (2.0 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _band_matrix(size: int, window_size: int, sigma: float) -> jnp.ndarray:
    """Banded Toeplitz matrix implementing zero-padded 'same' 1-D conv.

    T[i, j] = g[j - i + k//2]; conv-by-matmul keeps the SSIM window on the
    MXU — a depthwise 3-channel conv lowers terribly on TPU (19 ms/step vs
    <1 ms this way), and the separable Gaussian makes the two 1-D passes
    exactly equal to the reference's 2-D window conv. Built ON DEVICE from
    iota: a host constant would bake size^2 floats into the executable
    (103 MB of MLIR for a 4K image).
    """
    g = jnp.asarray(_gaussian_1d(window_size, sigma))
    half = window_size // 2
    row = jax.lax.broadcasted_iota(jnp.int32, (size, size), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (size, size), 1)
    off = col - row + half
    inside = (off >= 0) & (off < window_size)
    return jnp.where(inside, g[jnp.clip(off, 0, window_size - 1)], 0.0)


_BLOCK = 128  # MXU-native tile; banded pass cost is 3*B per output element
_DENSE_MAX = 512  # below this a single dense Toeplitz matmul is cheaper


def _block_band_matrices(window_size: int, sigma: float):
    """(TL, TC, TR) (B, B) blocks of the banded Toeplitz operator.

    out[p] = sum_q g[q - p + half] x[q] split by 128-blocks: position a of
    out-block i draws from in-blocks i-1/i/i+1 at rows b with coefficient
    g[(q - p) + half]. Exact same coefficients as the dense matrix — at 4K
    this turns the O(size^2) Toeplitz matmul into 3 B-wide matmuls per
    block (~10-30x fewer FLOPs).
    """
    b = _BLOCK
    g = jnp.asarray(_gaussian_1d(window_size, sigma))
    half = window_size // 2
    row = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)  # q within block
    col = jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)  # p within block

    def band(shift):
        off = row + shift - col + half
        inside = (off >= 0) & (off < window_size)
        return jnp.where(inside, g[jnp.clip(off, 0, window_size - 1)], 0.0)

    return band(-b), band(0), band(b)


def _banded_pass_last(x: jnp.ndarray, window_size: int, sigma: float):
    """Banded 'same' conv along the LAST axis of (..., W), W % B == 0."""
    tl, tc, tr = _block_band_matrices(window_size, sigma)
    lead = x.shape[:-1]
    nb = x.shape[-1] // _BLOCK
    xb = x.reshape(lead + (nb, _BLOCK))
    zero = jnp.zeros(lead + (1, _BLOCK), x.dtype)
    xp = jnp.concatenate([zero, xb, zero], axis=-2)
    out = (
        jnp.einsum("...ib,ba->...ia", xp[..., :-2, :], tl,
                   preferred_element_type=jnp.float32)
        + jnp.einsum("...ib,ba->...ia", xb, tc,
                     preferred_element_type=jnp.float32)
        + jnp.einsum("...ib,ba->...ia", xp[..., 2:, :], tr,
                     preferred_element_type=jnp.float32)
    )
    return out.reshape(lead + (nb * _BLOCK,))


def _banded_pass_mid(x: jnp.ndarray, window_size: int, sigma: float):
    """Banded 'same' conv along the MIDDLE axis of (C, H, W), H % B == 0.

    Blocks H directly (no 4K-sized transposes): out[c, i·B+a, w] draws
    from in-blocks i-1/i/i+1 with the same (TL, TC, TR) coefficients.
    """
    tl, tc, tr = _block_band_matrices(window_size, sigma)
    c, h, w = x.shape
    nb = h // _BLOCK
    xb = x.reshape(c, nb, _BLOCK, w)
    zero = jnp.zeros((c, 1, _BLOCK, w), x.dtype)
    xp = jnp.concatenate([zero, xb, zero], axis=1)
    out = (
        jnp.einsum("ba,cibw->ciaw", tl, xp[:, :-2],
                   preferred_element_type=jnp.float32)
        + jnp.einsum("ba,cibw->ciaw", tc, xb,
                     preferred_element_type=jnp.float32)
        + jnp.einsum("ba,cibw->ciaw", tr, xp[:, 2:],
                     preferred_element_type=jnp.float32)
    )
    return out.reshape(c, h, w)


def _shift_pass(
    x: jnp.ndarray, axis: int, window_size: int, sigma: float
) -> jnp.ndarray:
    """'same' zero-padded 1-D Gaussian conv as tap-weighted shifted slices.

    XLA fuses the 11 slice+multiply+adds into one VPU pass — the
    algorithmic 11 MACs per output element (the banded matmul form burns
    3*128 per element on the MXU, 70x the FLOPs) and, decisively, full
    f32: on TPU, einsum/matmul run at DEFAULT precision = bf16 MXU
    inputs, which drifted the 4K SSIM value by ~1e-3 vs the torch
    reference (scripts/probe_ssim.py); this form matches the reference
    conv to f32 rounding on every backend.
    """
    g = _gaussian_1d(window_size, sigma)
    half = window_size // 2
    pads = [(0, 0)] * x.ndim
    pads[axis] = (half, half)
    xp = jnp.pad(x, pads)
    n = x.shape[axis]
    out = None
    for k in range(window_size):
        term = float(g[k]) * jax.lax.slice_in_dim(xp, k, k + n, axis=axis)
        out = term if out is None else out + term
    return out


def _window_conv(
    img: jnp.ndarray, window_size: int = 11, sigma: float = 1.5
) -> jnp.ndarray:
    """Depthwise 'same' Gaussian conv of (C, H, W).

    Both forms are exact f32 (the former matmul forms ran at DEFAULT
    precision = bf16 MXU inputs and drifted the 4K SSIM ~1e-3 vs the
    torch reference). Large images on accelerators take the Pallas
    separable-blur kernel (one VMEM pass; the XLA shift form leaves 11
    unfused temporaries there — 73 vs 29 ms at 4K fwd+bwd). Small
    images (the 512x375 geometry phase) and CPU take the shifted-slice
    form, which at that size beats the kernel's fixed launch cost
    (0.25 vs 0.29 ms) and doubles as the kernel's test oracle.
    """
    c, h, w = img.shape
    if jax.default_backend() != "cpu" and h * w > 1_000_000:
        from topo4d_tpu.losses.blur_pallas import gauss_blur_pallas

        return gauss_blur_pallas(img, window_size, sigma)
    out = _shift_pass(img, 1, window_size, sigma)
    return _shift_pass(out, 2, window_size, sigma)


def _window_conv_banded(
    img: jnp.ndarray, window_size: int = 11, sigma: float = 1.5
) -> jnp.ndarray:
    """The former matmul form (dense Toeplitz under 512, 128-block banded
    above), kept for probes/comparison. On TPU its einsums run at
    DEFAULT matmul precision (bf16 MXU inputs) — ~1e-3 SSIM drift."""
    c, h, w = img.shape

    def pass_axis(x, size, last):
        if size <= _DENSE_MAX:
            t = _band_matrix(size, window_size, sigma)
            if last:
                return jnp.einsum("cik,lk->cil", x, t,
                                  preferred_element_type=jnp.float32)
            return jnp.einsum("ij,cjk->cik", t, x,
                              preferred_element_type=jnp.float32)
        pad = (-size) % _BLOCK
        if last:
            xp = jnp.pad(x, ((0, 0), (0, 0), (0, pad)))
            return _banded_pass_last(xp, window_size, sigma)[:, :, :size]
        xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        return _banded_pass_mid(xp, window_size, sigma)[:, :size, :]

    out = pass_axis(img, h, last=False)
    return pass_axis(out, w, last=True)


def ssim(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    window_size: int = 11,
    sigma: float = 1.5,
    size_average: bool = True,
) -> jnp.ndarray:
    """SSIM of (C, H, W) images (reference ``calc_ssim``/``_ssim``).

    Identical to the torch version: depthwise Gaussian conv with zero
    'same' padding (border bias included), c1=0.01^2, c2=0.03^2.
    """
    # one batched conv over all five maps: 2 big MXU matmuls instead of 12
    # small ones (launch/layout overhead dominates at this image size)
    c = img1.shape[0]
    stacked = jnp.concatenate(
        [img1, img2, img1 * img1, img2 * img2, img1 * img2], axis=0
    )
    conv = _window_conv(stacked, window_size, sigma)
    mu1 = conv[0:c]
    mu2 = conv[c : 2 * c]
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = conv[2 * c : 3 * c] - mu1_sq
    sigma2_sq = conv[3 * c : 4 * c] - mu2_sq
    sigma12 = conv[4 * c : 5 * c] - mu1_mu2
    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    if size_average:
        return ssim_map.mean()
    return ssim_map.mean(axis=(1, 2))


def photometric_loss(
    pred: jnp.ndarray, target: jnp.ndarray, l1_weight: float = 0.8
) -> jnp.ndarray:
    """The reference image loss 0.8 L1 + 0.2 (1 - SSIM) (train.py:315)."""
    return l1_weight * l1_loss(pred, target) + (1.0 - l1_weight) * (
        1.0 - ssim(pred, target)
    )
