"""Tiled XLA rasterizer: binning + chunked cumprod blending.

The production architecture (shared with the Pallas kernels): Gaussians are
binned into 16x16 pixel tiles (``tiles.bin_gaussians``), each tile blends
its fixed-capacity entry range front-to-back in chunks, carrying
(transmittance, frozen-T) across chunks. The per-chunk math is the same
parallel cumprod formulation the oracle uses — the two paths must and do
`allclose` (see tests) — but memory is O(tiles * chunk * 256) instead of
O(N * pixels). The feature accumulation is a per-chunk matmul (MXU).

Fully differentiable via autodiff (the blend body is ``jax.checkpoint``ed
so the backward recomputes alphas instead of storing them). The Pallas
path replaces only the blend loop; binning stays XLA.

Capacity handling: per-tile entries beyond ``capacity`` are dropped AND
counted in ``num_overflow`` (never silent); ``num_cropped`` counts
Gaussians whose tile span exceeded ``max_span``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from topo4d_tpu.core.camera import Camera
from topo4d_tpu.core.gaussian import (
    ALPHA_MAX,
    ALPHA_MIN,
    TRANSMITTANCE_MIN,
    GaussianRenderVars,
    project_gaussians,
)
from topo4d_tpu.rasterizer.tiles import TILE, bin_gaussians, num_tiles


class TiledRenderOutput(NamedTuple):
    image: jnp.ndarray  # (3, H, W)
    radii: jnp.ndarray  # (N,)
    depth: jnp.ndarray  # (1, H, W)
    alpha: jnp.ndarray  # (1, H, W)
    num_cropped: jnp.ndarray  # () int32 — span-capacity crops
    num_overflow: jnp.ndarray  # () int32 — per-tile capacity drops


def _chunk_alpha(
    pix_x: jnp.ndarray,  # (T, PX)
    pix_y: jnp.ndarray,  # (T, PX)
    data: jnp.ndarray,  # (T, C, 8): x, y, ca, cb, cc, opac, valid, pad
) -> jnp.ndarray:
    """Per (tile, chunk-entry, pixel) alpha with CUDA skip rules -> (T, C, PX)."""
    dx = data[:, :, 0:1] - pix_x[:, None, :]
    dy = data[:, :, 1:2] - pix_y[:, None, :]
    power = (
        -0.5 * (data[:, :, 2:3] * dx * dx + data[:, :, 4:5] * dy * dy)
        - data[:, :, 3:4] * dx * dy
    )
    raw = data[:, :, 5:6] * jnp.exp(power)
    # straight-through 0.99 clamp (CUDA backward ignores the min)
    alpha = raw + jax.lax.stop_gradient(jnp.minimum(ALPHA_MAX, raw) - raw)
    keep = (power <= 0.0) & (alpha >= ALPHA_MIN) & (data[:, :, 6:7] > 0.5)
    return jnp.where(keep, alpha, 0.0)


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "max_span", "capacity", "chunk"),
)
def render_binned(
    proj,
    colors: jnp.ndarray,
    opacities: jnp.ndarray,
    bg: jnp.ndarray,
    width: int,
    height: int,
    max_span: int = 4,
    capacity: int = 1024,
    chunk: int = 64,
):
    """Blend pre-projected Gaussians through the tile pipeline.

    Returns (image (3,H,W), depth (1,H,W), alpha (1,H,W), num_cropped,
    num_overflow).
    """
    chunk = min(chunk, capacity)
    bins = bin_gaussians(proj, width, height, max_span)
    tiles_x, tiles_y = num_tiles(width, height)
    t = tiles_x * tiles_y
    px = TILE * TILE
    e = bins.gauss_id.shape[0]

    gid = bins.gauss_id
    valid_e = bins.entry_valid & proj.mask[gid]
    # packed per-entry data: x, y, conic(3), opacity, valid, pad
    data_e = jnp.stack(
        [
            proj.means2d[gid, 0],
            proj.means2d[gid, 1],
            proj.conics[gid, 0],
            proj.conics[gid, 1],
            proj.conics[gid, 2],
            opacities[gid],
            valid_e.astype(jnp.float32),
            jnp.zeros_like(opacities[gid]),
        ],
        axis=-1,
    )  # (E, 8)
    feat_e = jnp.stack(
        [
            colors[gid, 0],
            colors[gid, 1],
            colors[gid, 2],
            proj.depths[gid],
        ],
        axis=-1,
    )  # (E, 4)

    # fixed-capacity per-tile entry indices, padded to a whole number of
    # chunks: a clamped final dynamic_slice would otherwise overlap the
    # previous chunk and double-blend its entries
    cap_pad = -(-capacity // chunk) * chunk
    k = jnp.arange(cap_pad, dtype=jnp.int32)
    idx = jnp.clip(bins.tile_start[:, None] + k[None, :], 0, max(e - 1, 0))
    in_range = k[None, :] < jnp.minimum(bins.tile_count, capacity)[:, None]
    num_overflow = jnp.sum(
        jnp.maximum(bins.tile_count - capacity, 0)
    ).astype(jnp.int32)

    # pixel coordinates per tile
    tid = jnp.arange(t, dtype=jnp.int32)
    ty = tid // tiles_x
    tx = tid % tiles_x
    p = jnp.arange(px, dtype=jnp.int32)
    pix_x = (tx[:, None] * TILE + (p % TILE)[None, :]).astype(jnp.float32)
    pix_y = (ty[:, None] * TILE + (p // TILE)[None, :]).astype(jnp.float32)

    nchunks = -(-capacity // chunk)

    def body(carry, c_idx):
        t_unfrozen, t_frozen, accum = carry
        sl = jax.lax.dynamic_slice_in_dim(idx, c_idx * chunk, chunk, axis=1)
        msk = jax.lax.dynamic_slice_in_dim(in_range, c_idx * chunk, chunk, axis=1)
        data = data_e[sl]  # (T, C, 8)
        data = data * msk[..., None]
        feat = feat_e[sl]  # (T, C, 4)
        alpha = _chunk_alpha(pix_x, pix_y, data)  # (T, C, PX)
        one_m = 1.0 - alpha
        t_incl_local = jnp.cumprod(one_m, axis=1)
        t_excl_local = jnp.concatenate(
            [jnp.ones_like(t_incl_local[:, :1]), t_incl_local[:, :-1]], axis=1
        )
        t_incl = t_unfrozen[:, None, :] * t_incl_local
        t_excl = t_unfrozen[:, None, :] * t_excl_local
        keep = t_incl >= TRANSMITTANCE_MIN
        w = alpha * t_excl * keep  # (T, C, PX)
        # HIGHEST precision: preferred_element_type only pins the OUTPUT
        # dtype — on TPU the default still feeds the MXU bf16 inputs,
        # which drifted this path ~5e-3 max pixel vs the f32 math at
        # geometry scale (r4 on-TPU numerics gate; the r3 SSIM bug
        # class). This path must match the oracle contract exactly.
        accum = accum + jnp.einsum(
            "tcp,tcf->tpf", w, feat,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        t_unfrozen = t_incl[:, -1, :]
        t_frozen = jnp.minimum(
            t_frozen, jnp.min(jnp.where(keep, t_incl, 1.0), axis=1)
        )
        return (t_unfrozen, t_frozen, accum), None

    init = (
        jnp.ones((t, px)),
        jnp.ones((t, px)),
        jnp.zeros((t, px, 4)),
    )
    (t_unfrozen, t_frozen, accum), _ = jax.lax.scan(
        jax.checkpoint(body), init, jnp.arange(nchunks)
    )

    rgb_tiles = accum[:, :, :3] + t_frozen[:, :, None] * bg[None, None, :]
    depth_tiles = accum[:, :, 3]
    alpha_tiles = 1.0 - t_frozen

    def untile(x_tiles, channels):
        """(T, PX, C) -> (C, H, W)."""
        x = x_tiles.reshape(tiles_y, tiles_x, TILE, TILE, channels)
        x = x.transpose(0, 2, 1, 3, 4).reshape(
            tiles_y * TILE, tiles_x * TILE, channels
        )
        return x[:height, :width].transpose(2, 0, 1)

    image = untile(rgb_tiles, 3)
    depth = untile(depth_tiles[..., None], 1)
    alpha = untile(alpha_tiles[..., None], 1)
    return image, depth, alpha, bins.num_cropped, num_overflow


def render_gaussians_tiled(
    rv: GaussianRenderVars,
    cam: Camera,
    bg: Optional[jnp.ndarray] = None,
    means2d_offset: Optional[jnp.ndarray] = None,
    max_span: int = 4,
    capacity: int = 1024,
    chunk: int = 64,
) -> TiledRenderOutput:
    """Drop-in tiled renderer matching the oracle contract."""
    if bg is None:
        bg = jnp.zeros(3, dtype=jnp.float32)
    proj = project_gaussians(rv, cam, means2d_offset)
    image, depth, alpha, ncrop, nover = render_binned(
        proj,
        rv.colors,
        rv.opacities,
        bg,
        cam.width,
        cam.height,
        max_span=max_span,
        capacity=capacity,
        chunk=chunk,
    )
    return TiledRenderOutput(
        image=image,
        radii=proj.radii,
        depth=depth,
        alpha=alpha,
        num_cropped=ncrop,
        num_overflow=nover,
    )
