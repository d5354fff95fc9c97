"""Pallas TPU z-buffer bake: the production 8K texture-bake kernel.

The XLA scatter bake (``texture.bake``) pays three giant scatter passes
per band (~55 s for a 555k-triangle 8192^2 bake on a v5e — XLA
serializes scatters). This kernel keeps the same semantics but maps the
z-buffer onto the VPU as dense select-max updates, reusing the Gaussian
rasterizer's architecture (SURVEY N1/N2): triangles are duplicated into
(16x16-tile, id) entries, sorted by (tile, id), and a sequential grid
processes 128-entry windows per tile block — barycentrics for all
(pixel, entry) pairs at once, window winner by per-row max + first-lane
tie-break, carry (depth, color) across windows.

Semantics match ``texture.bake._bake_band`` (reference
face3d/mesh_numpy/render.py:177-217 contract): Cramer/Gram barycentrics,
inner-bbox clamp, inclusive-edge inside test, bigger-z-wins with
FIRST-triangle-wins ties (entries ascend by id within a tile; the carry
update is strict >, so earlier windows keep ties). Forward-only — baking
is an export step, no gradients.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 16
PX = TILE * TILE
ROWS = 24  # packed field rows (19 used, padded to a sublane multiple)
CHUNK = 128


class BakeBinning(NamedTuple):
    """Per-sequence frozen bake binning (reference helpers.py:953-960).

    The UV layout (``uv_px``, ``tri_uv_faces``) is a per-SEQUENCE
    constant — only vertex colors change between frames — yet the host
    duplicate-and-sort costs ~1.6-1.9 s per 8K bake. This caches the
    packed geometry rows, the compact tile map, and the per-entry corner
    color indices ON DEVICE once; each frame then refreshes only the nine
    color rows with one jitted gather (``_fill_and_bake``), bitwise equal
    to a fresh bake (pad-entry color rows differ but are never read: the
    tile-id row is -1 there, which matches no tile).

    ``corner_idx[k, e]`` indexes the color array for corner k of sorted
    entry e; with a ``corner_map`` it composes the UV->vertex color
    re-indexing (the reference's duplicate_texture_vertex_color_2,
    helpers.py:930-941) so frames gather straight from the per-vertex
    dense color array.
    """

    packed_geom: jnp.ndarray  # (ROWS, E_pad) f32, color rows 9..17 unused
    corner_idx: jnp.ndarray  # (3, E_pad) int32 into the color array
    tmap: jnp.ndarray  # (M_pad,) int32 compact tile ids (device)
    start: jnp.ndarray  # (M_pad,) int32
    count: jnp.ndarray  # (M_pad,) int32
    tmap_np: np.ndarray  # host copy for canvas assembly
    tiles_x: int
    tiles_y: int
    m: int  # occupied tiles


def _bin_core(
    verts_px: np.ndarray,
    tris: np.ndarray,
    height: int,
    width: int,
    chunk: int,
    e_round: int,
    m_round: int,
):
    """Shared host binning: geometry rows + corner ids, no colors.

    Returns (packed (ROWS, E_pad) with color rows left at the -1.0 fill,
    fe (E, 3) sorted-entry corner indices, tmap, start, count, tiles_x,
    tiles_y, m, e).
    """
    v = np.asarray(verts_px, np.float32)
    f = np.asarray(tris, np.int64)
    tiles_x = -(-width // TILE)
    tiles_y = -(-height // TILE)

    tx = v[:, 0][f]  # (F, 3)
    ty = v[:, 1][f]
    umin = np.ceil(tx.min(1))
    umax = np.floor(tx.max(1))
    vmin = np.ceil(ty.min(1))
    vmax = np.floor(ty.max(1))
    # canvas clamp + empty-bbox cull (oracle: bbox clamped to canvas)
    umin_c = np.maximum(umin, 0)
    umax_c = np.minimum(umax, width - 1)
    vmin_c = np.maximum(vmin, 0)
    vmax_c = np.minimum(vmax, height - 1)
    keep = (umax_c >= umin_c) & (vmax_c >= vmin_c)

    tx0 = (umin_c // TILE).astype(np.int64)
    tx1 = (umax_c // TILE).astype(np.int64)
    ty0 = (vmin_c // TILE).astype(np.int64)
    ty1 = (vmax_c // TILE).astype(np.int64)
    span_x = np.where(keep, tx1 - tx0 + 1, 0)
    span_y = np.where(keep, ty1 - ty0 + 1, 0)
    counts = (span_x * span_y).astype(np.int64)
    offs = np.concatenate([[0], np.cumsum(counts)])
    e = int(offs[-1])

    # expand (tri, tile) pairs
    tri_of = np.repeat(np.arange(f.shape[0]), counts)
    local = np.arange(e) - offs[tri_of]
    sx = span_x[tri_of]
    tile_ids = (
        (ty0[tri_of] + local // sx) * tiles_x + (tx0[tri_of] + local % sx)
    )
    order = np.lexsort((tri_of, tile_ids))  # (tile, id) ascending
    s_tile = tile_ids[order]
    s_tri = tri_of[order]

    # compact occupied tiles + ranges
    occupied, start = np.unique(s_tile, return_index=True)
    count = np.diff(np.concatenate([start, [e]]))
    m = occupied.size

    # packed fields (ROWS, E_pad)
    e_pad = max(-(-(e + chunk) // e_round) * e_round, e_round)
    packed = np.full((ROWS, e_pad), -1.0, np.float32)
    fe = f[s_tri]
    packed[0, :e] = v[:, 0][fe[:, 0]]
    packed[1, :e] = v[:, 1][fe[:, 0]]
    packed[2, :e] = v[:, 0][fe[:, 1]]
    packed[3, :e] = v[:, 1][fe[:, 1]]
    packed[4, :e] = v[:, 0][fe[:, 2]]
    packed[5, :e] = v[:, 1][fe[:, 2]]
    packed[6, :e] = v[:, 2][fe[:, 0]]
    packed[7, :e] = v[:, 2][fe[:, 1]]
    packed[8, :e] = v[:, 2][fe[:, 2]]
    packed[18, :e] = s_tile.astype(np.float32)

    m_pad = max(-(-m // m_round) * m_round, m_round)
    tmap = np.full(m_pad, tiles_x * tiles_y, np.int32)
    tmap[:m] = occupied.astype(np.int32)
    start_a = np.zeros(m_pad, np.int32)
    start_a[:m] = start.astype(np.int32)
    count_a = np.zeros(m_pad, np.int32)
    count_a[:m] = count.astype(np.int32)
    return packed, fe, tmap, start_a, count_a, tiles_x, tiles_y, m, e


def bin_triangles_np(
    verts_px: np.ndarray,  # (V, 3) pixel-space uv coords + z
    tris: np.ndarray,  # (F, 3) int32
    colors: np.ndarray,  # (V, C>=3)
    height: int,
    width: int,
    chunk: int = CHUNK,
    e_round: int = 1 << 17,
    m_round: int = 8192,
):
    """Host-side duplicate-and-sort binning of triangles into 16px tiles.

    Returns (packed (ROWS, E_pad) f32, tmap (M_pad,) i32, start, count,
    tiles_x, tiles_y, m) where the M_pad compact rows cover the occupied
    tiles in ascending order. E_pad/M_pad round up (e_round/m_round) so
    per-frame triangle-count jitter reuses the compiled kernel.
    """
    packed, fe, tmap, start_a, count_a, tiles_x, tiles_y, m, e = _bin_core(
        verts_px, tris, height, width, chunk, e_round, m_round
    )
    c = np.asarray(colors, np.float32)
    for k in range(3):  # vertex colors, 3 channels each
        packed[9 + 3 * k, :e] = c[:, 0][fe[:, k]]
        packed[10 + 3 * k, :e] = c[:, 1][fe[:, k]]
        packed[11 + 3 * k, :e] = c[:, 2][fe[:, k]]
    return packed, tmap, start_a, count_a, tiles_x, tiles_y, m


def compute_bake_binning(
    verts_px: np.ndarray,
    tris: np.ndarray,
    height: int,
    width: int,
    chunk: int = CHUNK,
    e_round: int = 1 << 17,
    m_round: int = 8192,
    corner_map: Optional[np.ndarray] = None,
) -> BakeBinning:
    """Bin once per sequence; per-frame bakes then only gather colors.

    ``corner_map`` (U,) int composes a UV-slot -> color-row re-indexing
    into the cached corner ids (see BakeBinning).
    """
    packed, fe, tmap, start_a, count_a, tiles_x, tiles_y, m, e = _bin_core(
        verts_px, tris, height, width, chunk, e_round, m_round
    )
    if corner_map is not None:
        fe = np.asarray(corner_map, np.int64)[fe]
    e_pad = packed.shape[1]
    corner = np.zeros((3, e_pad), np.int32)
    corner[:, :e] = fe.T.astype(np.int32)
    return BakeBinning(
        packed_geom=jnp.asarray(packed),
        corner_idx=jnp.asarray(corner),
        tmap=jnp.asarray(tmap),
        start=jnp.asarray(start_a),
        count=jnp.asarray(count_a),
        tmap_np=tmap,
        tiles_x=tiles_x,
        tiles_y=tiles_y,
        m=m,
    )


def _bake_kernel(tiles_x: int, width: int, height: int, chunk: int,
                 tps: int):
    neg_inf = -1e30  # Python float: jnp constants here would be captured

    def kernel(tmap_ref, start_ref, count_ref, packed_hbm, out_ref, buf,
               sem):
        # scalar arrays arrive as 128-wide SMEM blocks (whole-array
        # scalar prefetch at 131k compact tiles blows the 1 MB SMEM
        # budget; Mosaic requires the block to match XLA's T(1024)
        # layout) — this step's tps values sit at offset (step*tps)%1024
        bpx = tps * PX
        off0 = (pl.program_id(0) * tps) % 1024

        # block window range: entries of the tps tiles are contiguous
        first = jnp.int32(0x7FFFFFFF)
        last = jnp.int32(-1)
        for t in range(tps):
            s = start_ref[off0 + t]
            cnt = count_ref[off0 + t]
            first = jnp.where(
                cnt > 0, jnp.minimum(first, s // chunk), first
            )
            last = jnp.where(
                cnt > 0,
                jnp.maximum(last, (s + cnt - 1) // chunk),
                last,
            )
        k = jnp.maximum(last - first + 1, 0)

        # batched pixel coords + per-row tile ids
        row = jax.lax.broadcasted_iota(jnp.int32, (bpx, 1), 0)
        t_of_row = row // PX
        tile_idx = jnp.zeros((bpx, 1), jnp.int32)
        for t in range(tps):
            tile_idx = jnp.where(
                t_of_row == t, tmap_ref[off0 + t], tile_idx
            )
        p = row % PX
        px = (
            (tile_idx % tiles_x) * TILE + p % TILE
        ).astype(jnp.float32)
        py = (
            (tile_idx // tiles_x) * TILE + p // TILE
        ).astype(jnp.float32)
        tile_f = tile_idx.astype(jnp.float32)
        on_canvas = (px < width) & (py < height)
        lane = jax.lax.broadcasted_iota(jnp.int32, (bpx, chunk), 1)

        def get_dma(slot, c):
            off = pl.multiple_of((first + c) * chunk, chunk)
            return pltpu.make_async_copy(
                packed_hbm.at[:, pl.ds(off, chunk)],
                buf.at[slot],
                sem.at[slot],
            )

        @pl.when(k > 0)
        def _():
            get_dma(0, 0).start()

        def body(c, carry):
            zbuf, cr, cg, cb = carry
            slot = jax.lax.rem(c, 2)

            @pl.when(c + 1 < k)
            def _():
                get_dma(1 - slot, c + 1).start()

            get_dma(slot, c).wait()
            d = buf[slot]
            x0 = d[0:1, :]
            y0 = d[1:2, :]
            x1 = d[2:3, :]
            y1 = d[3:4, :]
            x2 = d[4:5, :]
            y2 = d[5:6, :]
            mine = d[18:19, :] == tile_f
            # oracle barycentrics (Gram/Cramer — texture.bake parity)
            v0x = x2 - x0
            v0y = y2 - y0
            v1x = x1 - x0
            v1y = y1 - y0
            dot00 = v0x * v0x + v0y * v0y
            dot01 = v0x * v1x + v0y * v1y
            dot11 = v1x * v1x + v1y * v1y
            denom = dot00 * dot11 - dot01 * dot01
            inv = jnp.where(denom == 0.0, 0.0, 1.0 / denom)
            dpx = px - x0  # (bpx, chunk)
            dpy = py - y0
            dot02 = v0x * dpx + v0y * dpy
            dot12 = v1x * dpx + v1y * dpy
            u = (dot11 * dot02 - dot01 * dot12) * inv
            w1 = (dot00 * dot12 - dot01 * dot02) * inv
            w0 = 1.0 - u - w1
            # inner bbox (ceil/floor of the f32 coords, like _bake_band)
            umin = jnp.ceil(jnp.minimum(jnp.minimum(x0, x1), x2))
            umax = jnp.floor(jnp.maximum(jnp.maximum(x0, x1), x2))
            vmin = jnp.ceil(jnp.minimum(jnp.minimum(y0, y1), y2))
            vmax = jnp.floor(jnp.maximum(jnp.maximum(y0, y1), y2))
            inside = (
                (u >= 0) & (w1 >= 0) & (w1 + u <= 1.0)
                & (px >= umin) & (px <= umax)
                & (py >= vmin) & (py <= vmax)
                & mine & on_canvas
            )
            depth = w0 * d[6:7, :] + w1 * d[7:8, :] + u * d[8:9, :]
            dm = jnp.where(inside, depth, neg_inf)
            wmax = jnp.max(dm, axis=1, keepdims=True)  # (bpx, 1)
            hit = wmax > neg_inf
            # first (lowest-id) entry among the window's depth winners
            cand = jnp.where(dm >= wmax, lane, jnp.int32(0x7FFFFFFF))
            wlane = jnp.min(cand, axis=1, keepdims=True)
            onehot = (lane == wlane) & hit
            colr = w0 * d[9:10, :] + w1 * d[12:13, :] + u * d[15:16, :]
            colg = w0 * d[10:11, :] + w1 * d[13:14, :] + u * d[16:17, :]
            colb = w0 * d[11:12, :] + w1 * d[14:15, :] + u * d[17:18, :]
            pick = lambda col: jnp.sum(
                jnp.where(onehot, col, 0.0), axis=1, keepdims=True
            )
            better = hit & (wmax > zbuf)  # strict: earlier windows keep ties
            zbuf = jnp.where(better, wmax, zbuf)
            cr = jnp.where(better, pick(colr), cr)
            cg = jnp.where(better, pick(colg), cg)
            cb = jnp.where(better, pick(colb), cb)
            return (zbuf, cr, cg, cb)

        init = (
            jnp.full((bpx, 1), neg_inf),
            jnp.zeros((bpx, 1), jnp.float32),
            jnp.zeros((bpx, 1), jnp.float32),
            jnp.zeros((bpx, 1), jnp.float32),
        )
        zbuf, cr, cg, cb = jax.lax.fori_loop(0, k, body, init)
        out = jnp.concatenate([cr, cg, cb, zbuf], axis=1)  # (bpx, 4)
        out_ref[...] = out.reshape(tps, PX, 4).transpose(0, 2, 1)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("tiles_x", "width", "height", "chunk", "tps",
                     "interpret"),
)
def _bake_compact(packed, tmap, start, count, tiles_x, width, height,
                  chunk, tps, interpret=False):
    m_pad = tmap.shape[0]
    if (1024 % tps) or (m_pad % 1024):
        raise ValueError("tps must divide 1024 and m_pad be 1024-aligned")
    scal = pl.BlockSpec(
        (1024,), lambda i: ((i * tps) // 1024,), memory_space=pltpu.SMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(m_pad // tps,),
        in_specs=[
            scal, scal, scal,
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (tps, 4, PX), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, ROWS, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        _bake_kernel(tiles_x, width, height, chunk, tps),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_pad, 4, PX), jnp.float32),
        interpret=interpret,
    )(tmap, start, count, packed)


@functools.partial(
    jax.jit,
    static_argnames=("tiles_x", "width", "height", "chunk", "tps",
                     "interpret"),
)
def _fill_and_bake(packed_geom, corner_idx, colors, tmap, start, count,
                   tiles_x, width, height, chunk, tps, interpret=False):
    """Refresh the nine color rows from the current color array and bake.

    One fused gather per corner (rows 9+3k..11+3k = corner k's r,g,b) —
    the only per-frame device work besides the kernel itself.
    """
    col_rows = jnp.concatenate(
        [colors[corner_idx[k], :3].T for k in range(3)], axis=0
    )  # (9, E_pad)
    packed = jnp.concatenate(
        [packed_geom[0:9], col_rows, packed_geom[18:]], axis=0
    )
    return _bake_compact(
        packed, tmap, start, count, tiles_x, width, height, chunk, tps,
        interpret,
    )


def _assemble_canvas(out, tmap_np, m, tiles_x, tiles_y, height, width):
    """(M_pad, 4, PX) kernel output -> (H, W, 3) canvas on the host."""
    img_tiles = np.zeros((tiles_x * tiles_y, PX, 3), np.float32)
    img_tiles[tmap_np[:m]] = out[:m, 0:3].transpose(0, 2, 1)
    img = (
        img_tiles.reshape(tiles_y, tiles_x, TILE, TILE, 3)
        .transpose(0, 2, 1, 3, 4)
        .reshape(tiles_y * TILE, tiles_x * TILE, 3)
    )
    return img[:height, :width]


def bake_texture_pallas(
    uv_coords_px: Optional[np.ndarray],
    tri_faces: Optional[np.ndarray],
    colors,
    height: int,
    width: int,
    tps: int = 4,
    interpret: bool = False,
    binning: Optional[BakeBinning] = None,
) -> np.ndarray:
    """Rasterize vertex colors over the UV canvas -> (H, W, C) float32.

    Drop-in for ``texture.bake.bake_texture`` (same contract; no
    ``window`` limit — triangles of any size bin into however many tiles
    they touch). Runs the compact Pallas z-buffer kernel over occupied
    16x16 tiles and assembles the canvas on the host.

    ``binning``: a per-sequence ``compute_bake_binning`` cache — skips
    the ~1.6-1.9 s host duplicate-and-sort (the geometry is a sequence
    constant; only ``colors`` changes per frame). Bitwise equal to the
    fresh path. With a binning, ``uv_coords_px``/``tri_faces`` may be
    None; ``colors`` may live on device.
    """
    if binning is None:
        binning = compute_bake_binning(
            uv_coords_px, tri_faces, height, width
        )
    out = np.asarray(
        _fill_and_bake(
            binning.packed_geom, binning.corner_idx,
            jnp.asarray(colors, jnp.float32), binning.tmap, binning.start,
            binning.count, binning.tiles_x, width, height, CHUNK, tps,
            interpret,
        )
    )  # (M_pad, 4, PX)
    return _assemble_canvas(
        out, binning.tmap_np, binning.m, binning.tiles_x, binning.tiles_y,
        height, width,
    )
