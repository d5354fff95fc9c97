"""Pallas TPU kernel: depthwise separable Gaussian blur for SSIM.

The SSIM window conv (reference external.py:73-116, an 11x11 Gaussian
depthwise conv2d) is the dense texture phase's second-largest cost.
The matmul forms burn 3*128 MACs per output element per pass (70x the
algorithmic FLOPs) AND run at the TPU's DEFAULT matmul precision — bf16
MXU inputs, which drifts the 4K SSIM value by ~1e-3 vs the torch
reference (scripts/probe_ssim.py). An XLA shift-and-add form is exact
but unfused (11 materialized temporaries: 73 ms vs the banded 46 ms at
4K fwd+bwd). This kernel does the algorithmic work once in VMEM, full
f32: per grid step it DMAs one (BH+2*half, W_in) halo block of one
channel, applies the vertical then horizontal taps as register slices,
and writes the (BH, W_out) result.

Zero-padded 'same' semantics exactly like the reference conv: the
caller pads H/W by `half` zeros (plus lane-alignment tail zeros, which
land beyond the crop and cannot influence kept pixels — a Gaussian tap
of a zero is zero).

The VJP is the kernel itself: a zero-padded 'same' conv with SYMMETRIC
taps is its own transpose (C^T = C per axis; the two axes commute), so
backward = forward applied to the cotangent — no second kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from topo4d_tpu.losses.image import _gaussian_1d

LANE = 128


def _block_rows(w_in: int) -> int:
    """Output rows per grid step, sized to the scoped-VMEM budget.

    Measured footprint scales ~34 B per (row x input-lane) cell
    (buf + mid + double-buffered out block + accumulation temporaries:
    BH=128 at w_in=3968 hit 17.3 MB against the 16 MB scoped limit;
    BH=64 fits). Small widths (the 512x375 geometry phase) take tall
    blocks — fewer grid steps, less per-step overhead.
    """
    bh = int(14_400_000 / (34 * w_in)) // 64 * 64
    return max(64, min(512, bh))


def _blur_kernel(taps, bh: int, w_in: int, w_out: int, halo: int):
    taps = [float(t) for t in taps]

    def kernel(x_hbm, out_ref, buf, mid, sem):
        c = pl.program_id(0)
        i = pl.program_id(1)
        # halo block: rows [i*BH, i*BH + bh + halo) of channel c —
        # always in bounds (caller pre-padded; halo is 8-row aligned
        # for Mosaic's HBM sublane slicing, rows beyond 2*half unused)
        dma = pltpu.make_async_copy(
            x_hbm.at[c, pl.ds(i * bh, bh + halo), :],
            buf,
            sem,
        )
        dma.start()
        dma.wait()
        # accumulate IN the scratch/output refs: an unrolled sum of 11
        # materialized (bh, w) temporaries blows the 16 MB scoped VMEM
        # budget at 4K; in-place accumulation keeps two live buffers
        # vertical taps: (bh, w_in) from (bh + 2*half, w_in)
        mid[...] = taps[0] * buf[0:bh, :]
        for k, t in enumerate(taps[1:], start=1):
            mid[...] = mid[...] + t * buf[k : k + bh, :]
        # horizontal taps: (bh, w_out); static lane-offset slices
        out_ref[0] = taps[0] * mid[:, 0:w_out]
        for k, t in enumerate(taps[1:], start=1):
            out_ref[0] = out_ref[0] + t * mid[:, k : k + w_out]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("w_out", "window_size", "sigma", "interpret"),
)
def _blur_padded(xp, w_out: int, window_size: int, sigma: float,
                 interpret: bool):
    """Blur the pre-padded (C, Hp, W_in) array -> (C, Hout, w_out).

    ``w_out`` and ``W_in`` are both lane multiples (W_in = w_out + LANE,
    so the horizontal taps' halo fits with room to spare); Hout is a BH
    multiple. The caller arranged the zero padding so cropped pixels
    see exactly the reference's zero-'same' window.
    """
    taps = _gaussian_1d(window_size, sigma)
    half = window_size // 2
    halo = 2 * half + ((-2 * half) % 8)  # 8-row aligned DMA size
    c, hp, w_in = xp.shape
    bh = _block_rows(w_in)
    n_h = (hp - halo) // bh
    return pl.pallas_call(
        _blur_kernel(taps, bh, w_in, w_out, halo),
        grid=(c, n_h),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, bh, w_out), lambda ci, hi: (ci, hi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((c, n_h * bh, w_out), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((bh + halo, w_in), jnp.float32),
            pltpu.VMEM((bh, w_in), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xp)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(1, 2, 3)
)
def gauss_blur_pallas(
    x: jnp.ndarray,
    window_size: int = 11,
    sigma: float = 1.5,
    interpret: bool = False,
) -> jnp.ndarray:
    """Depthwise zero-padded 'same' Gaussian blur of (C, H, W), f32."""
    half = window_size // 2
    c, h, w = x.shape
    # lane-aligned widths: output Wp = round_up(W, LANE); input
    # Wp + LANE (left halo `half`, the rest zeros on the right — zero
    # taps cannot influence the cropped [:, :w] region)
    wp = w + ((-w) % LANE)
    # rows: top halo `half`; bottom pad so every block's 8-aligned
    # (bh + halo)-row read stays in bounds
    halo = 2 * half + ((-2 * half) % 8)
    bh = _block_rows(wp + LANE)
    n_h = -(-h // bh)
    bottom = n_h * bh + halo - half - h
    xp = jnp.pad(
        x,
        (
            (0, 0),
            (half, bottom),
            (half, wp + LANE - w - half),
        ),
    )
    out = _blur_padded(xp, wp, window_size, sigma, interpret)
    return out[:, :h, :w]


def _blur_fwd(x, window_size, sigma, interpret):
    return gauss_blur_pallas(x, window_size, sigma, interpret), None


def _blur_bwd(window_size, sigma, interpret, _, g):
    # symmetric taps + zero 'same' padding: the conv is its own transpose
    return (gauss_blur_pallas(g, window_size, sigma, interpret),)


gauss_blur_pallas.defvjp(_blur_fwd, _blur_bwd)
