"""Tile binning for the production rasterizer (pure XLA, static shapes).

The CUDA rasterizer duplicates each Gaussian into one (tile, depth-key)
entry per touched 16x16 tile and radix-sorts the entries; tiles then blend
their contiguous entry ranges. We keep that architecture but express it as
XLA ops: a static per-Gaussian duplication capacity (``max_span`` tiles per
axis), one lexicographic ``lax.sort`` over (tile, depth-rank), and
``searchsorted`` for per-tile ranges. Dynamic per-tile counts under XLA's
static shapes are handled downstream with fixed-capacity chunking; any
Gaussian whose tile rect exceeds the span capacity is cropped and COUNTED
(``num_cropped``) — no silent truncation (SURVEY §7 hard part 2).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from topo4d_tpu.core.gaussian import Projected

TILE = 16  # pixels per tile side (CUDA BLOCK_X/BLOCK_Y)
PACK_FIELDS = 16  # rows of the transposed packed-entry layout
PACK_CHUNK = 128  # entries per DMA chunk (Mosaic minor-dim alignment)


class TileBins(NamedTuple):
    """Sorted entry lists + per-tile ranges."""

    gauss_id: jnp.ndarray  # (E,) int32 gaussian index per entry (sorted)
    entry_valid: jnp.ndarray  # (E,) bool
    tile_start: jnp.ndarray  # (T,) int32 first entry of each tile
    tile_count: jnp.ndarray  # (T,) int32 entries in each tile
    num_cropped: jnp.ndarray  # () int32 gaussians with cropped tile rects


def tile_rect(proj: Projected, width: int, height: int):
    """Per-Gaussian touched tile rect [x0, x1) x [y0, y1) (CUDA getRect)."""
    tiles_x = -(-width // TILE)
    tiles_y = -(-height // TILE)
    r = proj.radii.astype(jnp.float32)
    mx = proj.means2d[:, 0]
    my = proj.means2d[:, 1]
    x0 = jnp.clip(jnp.floor((mx - r) / TILE), 0, tiles_x).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((my - r) / TILE), 0, tiles_y).astype(jnp.int32)
    x1 = jnp.clip(
        jnp.floor((mx + r + TILE - 1) / TILE), 0, tiles_x
    ).astype(jnp.int32)
    y1 = jnp.clip(
        jnp.floor((my + r + TILE - 1) / TILE), 0, tiles_y
    ).astype(jnp.int32)
    zero = jnp.zeros_like(x0)
    x0 = jnp.where(proj.mask, x0, zero)
    x1 = jnp.where(proj.mask, x1, zero)
    y0 = jnp.where(proj.mask, y0, zero)
    y1 = jnp.where(proj.mask, y1, zero)
    return x0, y0, x1, y1, tiles_x, tiles_y


@functools.partial(jax.jit, static_argnames=("width", "height", "max_span"))
def bin_gaussians(
    proj: Projected, width: int, height: int, max_span: int = 4
) -> TileBins:
    """Duplicate-and-sort binning.

    max_span: static per-axis tile capacity per Gaussian (entries per
    Gaussian = max_span^2). Gaussians spanning more tiles are cropped to
    their top-left max_span x max_span sub-rect and counted in
    ``num_cropped``.
    """
    flat_tile, flat_rank, order, num_cropped, num_tiles, _ = _binning_keys(
        proj, width, height, max_span
    )
    sorted_tile, sorted_rank = jax.lax.sort(
        (flat_tile, flat_rank), num_keys=2, is_stable=True
    )
    tile_start, tile_count = _tile_ranges(sorted_tile, num_tiles)
    return TileBins(
        gauss_id=order[sorted_rank].astype(jnp.int32),
        entry_valid=sorted_tile < num_tiles,
        tile_start=tile_start,
        tile_count=tile_count,
        num_cropped=num_cropped,
    )


def num_tiles(width: int, height: int):
    """(tiles_x, tiles_y) for an image size (static)."""
    return -(-width // TILE), -(-height // TILE)


class PackedBins(NamedTuple):
    """Depth-sorted per-tile entry ranges with packed per-entry data.

    Entries are sorted by (tile, depth) and stored UNPADDED; a tile's range
    [start, start+count) may share its boundary 128-entry DMA windows with
    neighboring tiles. Kernels mask foreign entries via the tile-id field;
    the backward kernel's monotone window schedule accumulates each shared
    window in VMEM and flushes it to HBM exactly once (see pallas_blend).

    packed layout (PACK_FIELDS, E_pad) — fields x entries, transposed so
    entries ride the 128-lane axis (DMA windows need 128-aligned minor
    dims):
      0:x 1:y 2:conic_a 3:conic_b 4:conic_c 5:opacity 6:tile_id 7:pad
      8:r 9:g 10:b 11:depth 12..15:pad

    The field data rides THROUGH the lax.sort as extra operands — a
    post-sort gather of 16 fields costs ~3 ms on TPU, sort-with-data ~0.5.
    """

    packed: jnp.ndarray  # (PACK_FIELDS, E_pad) float32
    tile_start: jnp.ndarray  # (T,) int32 first entry of each tile
    tile_count: jnp.ndarray  # (T,) int32 entries per tile
    num_cropped: jnp.ndarray  # () int32


def bin_gaussians_packed(
    proj: Projected,
    colors: jnp.ndarray,
    opacities: jnp.ndarray,
    width: int,
    height: int,
    max_span: int = 4,
    chunk: int = PACK_CHUNK,
) -> PackedBins:
    """Binning with chunk-aligned tile ranges and packed entry data.

    Unlike the fixed-capacity path there is NO per-tile entry limit: every
    (gaussian, tile) pair within the span capacity gets an entry. E_out is
    the static bound N*max_span^2 rounded up past the next chunk boundary
    (a single tail pad keeps boundary DMA windows in bounds). ``chunk``
    must be a multiple of 128 (Mosaic lane alignment of the transposed
    layout).

    Custom VJP: the backward of a data-carrying sort is a permutation
    scatter per operand (~2.7 ms/step on TPU); instead the saved
    entry->gaussian ids turn the whole packing backward into ONE
    segment-sum scatter-add.
    """
    packed, tile_start, tile_count, num_cropped = _bin_pack(
        proj.means2d, proj.depths, proj.conics,
        proj.mask.astype(jnp.float32), proj.radii.astype(jnp.float32),
        colors, opacities, width, height, max_span, chunk,
    )
    return PackedBins(
        packed=packed,
        tile_start=tile_start,
        tile_count=tile_count,
        num_cropped=num_cropped,
    )


class CompactTiles(NamedTuple):
    """Frozen compact-mode tile list (``compact_nonempty_tiles`` output).

    Under a frozen binning the per-tile ranges are constants, so the
    compact argsort over the full tile canvas (32,400 rows at 4K, every
    step) can be taken once at binning time (``binning_for``'s
    ``tile_capacity``).
    """

    ids: jnp.ndarray  # (capacity,) int32 tile ids (T = padding)
    start: jnp.ndarray  # (capacity,) int32
    count: jnp.ndarray  # (capacity,) int32
    overflow: jnp.ndarray  # () int32 dropped non-empty tiles


class Binning(NamedTuple):
    """Frozen binning: the entry permutation + tile ranges, values-free.

    The duplicate-and-sort step depends only on projected centers, depths
    and radii. When those are frozen (the dense texture loop: means3D are
    stop-gradient, scales/opacities do not learn — train.py:715-743) the
    permutation can be computed ONCE per (frame, view) and every iteration
    reduces to one gather along it. Rotation updates can drift radii
    slightly; ``texture.rebin_freq`` in the config controls re-binning.

    ``inv_positions`` (N, max_span^2) is the INVERSE of the permutation:
    the sorted-entry positions belonging to each gaussian (every gaussian
    owns exactly max_span^2 slots, valid or not). It turns the packing
    backward from a scatter-add over E entries (~87 ms/iter at the 4K
    dense scale — XLA scatter serializes) into a dense gather+sum.
    """

    sorted_gid: jnp.ndarray  # (E,) int32 entry -> gaussian id
    sorted_tile: jnp.ndarray  # (E,) int32 entry -> tile id (t = invalid)
    entry_valid: jnp.ndarray  # (E,) bool
    tile_start: jnp.ndarray  # (T,) int32
    tile_count: jnp.ndarray  # (T,) int32
    num_cropped: jnp.ndarray  # () int32
    inv_positions: Optional[jnp.ndarray] = None  # (N, R) int32
    # split-pack (dense texture loop): the frame-CONSTANT packed rows
    # [x, y, opacity, tile, depth, zero], pre-gathered at binning time
    # (``pack_static_rows``). When present, ``pack_with_binning`` gathers
    # only the six learned rows (conics + colors) per step.
    static_rows: Optional[jnp.ndarray] = None  # (6, E_pad) f32
    # frozen compact-tile list for ``tile_capacity`` renders (the
    # capacity is implied by ids.shape[0])
    compact: Optional[CompactTiles] = None


def depth_sorted_order(proj: Projected) -> jnp.ndarray:
    """Front-to-back Gaussian order: stable sort by view z, culled last.

    The stable (depth, index) key is what makes results bitwise
    reproducible across chip counts (SURVEY §7 hard part 3). ONE
    definition — the oracle (rasterizer.reference) and every binning
    variant import this, so blend-order parity cannot drift in
    depth-tie cases.
    """
    key = jnp.where(proj.mask, proj.depths, jnp.inf)
    return jnp.argsort(key, stable=True)


def _binning_keys(proj: Projected, width: int, height: int, max_span: int):
    """Shared duplicate-and-key step of every binning variant.

    Returns (flat_tile (N*R,), flat_rank (N*R,), order (N,), num_cropped,
    num_tiles, fuse_key_ok) — the inputs to the (tile, depth-rank) sort.
    ONE implementation backs both the sort-with-data packing and the
    frozen ``compute_binning``, so the cached/direct equivalence cannot
    drift.
    """
    n = proj.means2d.shape[0]
    x0, y0, x1, y1, tiles_x, tiles_y = tile_rect(proj, width, height)
    span_w = x1 - x0
    span_h = y1 - y0
    cropped = (span_w > max_span) | (span_h > max_span)
    num_cropped = jnp.sum(cropped & proj.mask).astype(jnp.int32)

    r = max_span * max_span
    k = jnp.arange(r, dtype=jnp.int32)
    di = k // max_span
    dj = k % max_span
    ty = y0[:, None] + di[None, :]
    tx = x0[:, None] + dj[None, :]
    valid = (
        proj.mask[:, None]
        & (di[None, :] < span_h[:, None])
        & (dj[None, :] < span_w[:, None])
    )
    t = tiles_x * tiles_y
    tile_id = jnp.where(valid, ty * tiles_x + tx, t).astype(jnp.int32)

    order = depth_sorted_order(proj)
    rank = jnp.zeros(n, jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32)
    )
    flat_tile = tile_id.reshape(-1)
    flat_rank = jnp.broadcast_to(rank[:, None], (n, r)).reshape(-1)
    return flat_tile, flat_rank, order, num_cropped, t, (t + 1) * n < 2**31


def _tile_ranges(sorted_tile, t):
    start = jnp.searchsorted(
        sorted_tile, jnp.arange(t, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    end = jnp.searchsorted(
        sorted_tile, jnp.arange(t, dtype=jnp.int32), side="right"
    ).astype(jnp.int32)
    return start, end - start


@functools.partial(
    jax.jit, static_argnames=("width", "height", "max_span")
)
def compute_binning(
    proj: Projected, width: int, height: int, max_span: int = 4
) -> Binning:
    """Duplicate-and-sort once; returns the reusable permutation."""
    n = proj.means2d.shape[0]
    flat_tile, flat_rank, order, num_cropped, t, fuse_ok = _binning_keys(
        proj, width, height, max_span
    )
    if fuse_ok:
        fused = flat_tile * jnp.int32(n) + flat_rank
        sorted_key, sorted_rank = jax.lax.sort(
            (fused, flat_rank), num_keys=1, is_stable=False
        )
        sorted_tile = sorted_key // jnp.int32(n)
    else:
        sorted_tile, sorted_rank = jax.lax.sort(
            (flat_tile, flat_rank), num_keys=2, is_stable=True
        )
    tile_start, tile_count = _tile_ranges(sorted_tile, t)
    sorted_gid = order[sorted_rank].astype(jnp.int32)
    # inverse permutation: each gaussian's max_span^2 sorted-entry slots
    # (stable argsort groups by gid; every gid appears exactly R times)
    r = max_span * max_span
    inv = jnp.argsort(sorted_gid, stable=True).astype(jnp.int32)
    return Binning(
        sorted_gid=sorted_gid,
        sorted_tile=sorted_tile,
        entry_valid=sorted_tile < t,
        tile_start=tile_start,
        tile_count=tile_count,
        num_cropped=num_cropped,
        inv_positions=inv.reshape(n, r),
    )


@jax.custom_vjp
def _gather_entries(fields, sorted_gid, entry_valid, inv_positions):
    """(10, N) fields -> (10, E) sorted-entry rows (invalid zeroed).

    Custom VJP: the transpose of the take is a scatter-add over E
    entries, which XLA serializes (~87 ms/iter at 1.2M entries on a
    v5e). Every gaussian owns exactly R sorted slots, so the backward
    is instead a dense (10, N, R) gather along ``inv_positions`` summed
    over R — exact same sum, minus the scatter.
    """
    rows10 = jnp.take(fields, sorted_gid, axis=1)
    return jnp.where(entry_valid[None, :], rows10, 0.0)


def _gather_entries_fwd(fields, sorted_gid, entry_valid, inv_positions):
    out = _gather_entries(fields, sorted_gid, entry_valid, inv_positions)
    return out, (entry_valid, inv_positions)


def _gather_entries_bwd(res, g):
    entry_valid, inv = res
    gv = jnp.where(entry_valid[None, :], g, 0.0)  # (10, E)
    d_fields = jnp.sum(jnp.take(gv, inv.reshape(-1), axis=1)
                       .reshape(gv.shape[0], *inv.shape), axis=-1)
    return d_fields, None, None, None


_gather_entries.defvjp(_gather_entries_fwd, _gather_entries_bwd)


@functools.partial(jax.jit, static_argnames=("chunk",))
def pack_static_rows(
    proj: Projected,
    opacities: jnp.ndarray,
    binning: Binning,
    chunk: int = PACK_CHUNK,
) -> jnp.ndarray:
    """The frame-constant packed rows for the dense split-pack.

    In the texture loop only ``dense_rgb_colors`` and
    ``dense_unnorm_rotations`` learn (reference train.py:281-286):
    means2d/depth (functions of the frozen means3D) and opacity are
    constant within a frame, exactly like the frozen binning itself.
    Capturing them once at binning time lets every step gather only the
    6 learned rows (conics + colors) instead of all 10. The learned and
    tile rows are bitwise equal to the full path; the captured rows can
    differ by one ulp (the binning's own compiled projection may
    reassociate differently than the step's) — within the frozen-binning
    staleness contract.

    Returns (6, E_pad): rows [x, y, opacity, tile, depth, zero] with the
    same -1.0 tail padding as ``pack_with_binning``.
    """
    fields = jnp.stack(
        [
            proj.means2d[:, 0],
            proj.means2d[:, 1],
            opacities,
            proj.depths,
        ],
        axis=0,
    )  # (4, N)
    rows = jnp.take(fields, binning.sorted_gid, axis=1)
    rows = jnp.where(binning.entry_valid[None, :], rows, 0.0)
    e = rows.shape[1]
    tile_row = binning.sorted_tile.astype(jnp.float32)[None, :]
    zero = jnp.zeros((1, e), jnp.float32)
    s = jnp.concatenate(
        [rows[0:2], rows[2:3], tile_row, rows[3:4], zero], axis=0
    )  # (6, E)
    pad = (-e) % chunk + chunk
    return jnp.pad(s, ((0, 0), (0, pad)), constant_values=-1.0)


@functools.partial(jax.jit, static_argnames=("chunk",))
def pack_with_binning(
    proj: Projected,
    colors: jnp.ndarray,
    opacities: jnp.ndarray,
    binning: Binning,
    chunk: int = PACK_CHUNK,
) -> PackedBins:
    """Pack CURRENT values along a frozen permutation: one fused gather.

    With ``binning.inv_positions`` present the backward is a dense
    inverse gather (see ``_gather_entries``); otherwise XLA's take
    transpose (a scatter-add segment-sum) applies.

    With ``binning.static_rows`` (the dense split-pack) only the six
    LEARNED rows — conics (the rotations learn) and colors — are
    gathered per call; the frame-constant rows come from the binning.
    The frozen fields' cotangents are then not materialized (their
    params sit at zero LR; trajectories are identical — tested).
    """
    if chunk % PACK_CHUNK:
        raise ValueError(f"chunk must be a multiple of {PACK_CHUNK}")
    if binning.static_rows is not None:
        learned = jnp.stack(
            [
                proj.conics[:, 0],
                proj.conics[:, 1],
                proj.conics[:, 2],
                colors[:, 0],
                colors[:, 1],
                colors[:, 2],
            ],
            axis=0,
        )  # (6, N)
        if binning.inv_positions is not None:
            rows6 = _gather_entries(
                learned, binning.sorted_gid, binning.entry_valid,
                binning.inv_positions,
            )
        else:
            rows6 = jnp.take(learned, binning.sorted_gid, axis=1)
            rows6 = jnp.where(binning.entry_valid[None, :], rows6, 0.0)
        e = rows6.shape[1]
        pad = (-e) % chunk + chunk
        rows6 = jnp.pad(rows6, ((0, 0), (0, pad)), constant_values=-1.0)
        s = binning.static_rows
        packed = jnp.concatenate(
            [
                s[0:2],  # x, y
                rows6[0:3],  # conics
                s[2:3],  # opacity
                s[3:4],  # tile id
                s[5:6],  # zero row 7
                rows6[3:6],  # colors
                s[4:5],  # depth
                s[5:6], s[5:6], s[5:6], s[5:6],  # zero rows 12-15
            ],
            axis=0,
        )  # (16, E_pad)
        return PackedBins(
            packed=packed,
            tile_start=binning.tile_start,
            tile_count=binning.tile_count,
            num_cropped=binning.num_cropped,
        )
    fields = jnp.stack(
        [
            proj.means2d[:, 0],
            proj.means2d[:, 1],
            proj.conics[:, 0],
            proj.conics[:, 1],
            proj.conics[:, 2],
            opacities,
            colors[:, 0],
            colors[:, 1],
            colors[:, 2],
            proj.depths,
        ],
        axis=0,
    )  # (10, N)
    if binning.inv_positions is not None:
        rows10 = _gather_entries(
            fields, binning.sorted_gid, binning.entry_valid,
            binning.inv_positions,
        )
    else:
        rows10 = jnp.take(fields, binning.sorted_gid, axis=1)  # (10, E)
        rows10 = jnp.where(binning.entry_valid[None, :], rows10, 0.0)
    e = rows10.shape[1]
    zeros = jnp.zeros((1, e), jnp.float32)
    packed = jnp.concatenate(
        [
            rows10[0:6],
            binning.sorted_tile.astype(jnp.float32)[None, :],
            zeros,
            rows10[6:10],
            jnp.zeros((4, e), jnp.float32),
        ],
        axis=0,
    )  # (16, E)
    pad = (-e) % chunk + chunk  # keep boundary DMA windows in bounds
    packed = jnp.pad(packed, ((0, 0), (0, pad)), constant_values=-1.0)
    return PackedBins(
        packed=packed,
        tile_start=binning.tile_start,
        tile_count=binning.tile_count,
        num_cropped=binning.num_cropped,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def _bin_pack(
    means2d, depths, conics, maskf, radii_f, colors, opacities,
    width, height, max_span, chunk,
):
    out, _ = _bin_pack_fwd_impl(
        means2d, depths, conics, maskf, radii_f, colors, opacities,
        width, height, max_span, chunk,
    )
    return out


@functools.partial(
    jax.jit, static_argnames=("width", "height", "max_span", "chunk")
)
def _bin_pack_fwd_impl(
    means2d, depths, conics, maskf, radii_f, colors, opacities,
    width, height, max_span, chunk,
):
    if chunk % PACK_CHUNK:
        raise ValueError(f"chunk must be a multiple of {PACK_CHUNK}")
    proj = Projected(
        means2d=means2d,
        depths=depths,
        conics=conics,
        radii=radii_f.astype(jnp.int32),
        mask=maskf > 0.5,
    )
    n = proj.means2d.shape[0]
    r = max_span * max_span
    e = n * r
    flat_tile, flat_rank, order, num_cropped, t, fuse_ok = _binning_keys(
        proj, width, height, max_span
    )

    def expand(v):
        return jnp.broadcast_to(v[:, None], (n, r)).reshape(-1)

    data_ops = (
        expand(proj.means2d[:, 0]),
        expand(proj.means2d[:, 1]),
        expand(proj.conics[:, 0]),
        expand(proj.conics[:, 1]),
        expand(proj.conics[:, 2]),
        expand(opacities),
        expand(colors[:, 0]),
        expand(colors[:, 1]),
        expand(colors[:, 2]),
        expand(proj.depths),
    )
    if fuse_ok:
        # fused single int32 key sorts ~2x faster than lexicographic
        fused = flat_tile * jnp.int32(n) + flat_rank
        sorted_vals = jax.lax.sort(
            (fused,) + data_ops, num_keys=1, is_stable=False
        )
        sorted_key = sorted_vals[0]
        sorted_tile = sorted_key // jnp.int32(n)
        sorted_rank = sorted_key - sorted_tile * jnp.int32(n)
        data_sorted = sorted_vals[1:]
    else:
        # large tile*N products (dense texture phase at 4K): two-key sort
        sorted_vals = jax.lax.sort(
            (flat_tile, flat_rank) + data_ops, num_keys=2, is_stable=True
        )
        sorted_tile = sorted_vals[0]
        sorted_rank = sorted_vals[1]
        data_sorted = sorted_vals[2:]

    tile_start, tile_count = _tile_ranges(sorted_tile, t)

    zeros = jnp.zeros(e, jnp.float32)
    rows = [
        data_sorted[0],  # x
        data_sorted[1],  # y
        data_sorted[2],  # conic a
        data_sorted[3],  # conic b
        data_sorted[4],  # conic c
        data_sorted[5],  # opacity
        sorted_tile.astype(jnp.float32),  # tile id (mask field)
        zeros,
        data_sorted[6],  # r
        data_sorted[7],  # g
        data_sorted[8],  # b
        data_sorted[9],  # depth
        zeros,
        zeros,
        zeros,
        zeros,
    ]
    packed = jnp.stack(rows, axis=0)
    pad = (-e) % chunk + chunk  # keep boundary DMA windows in bounds
    # tile field -1 so padding can never alias a real tile's mask
    packed = jnp.pad(packed, ((0, 0), (0, pad)), constant_values=-1.0)
    entry_valid = sorted_tile < t
    # recover each sorted entry's gaussian id from its sorted rank:
    # gid = depth-order[rank] (no extra sort operand)
    sorted_gid = order[sorted_rank]
    out = (packed, tile_start, tile_count, num_cropped)
    residuals = (sorted_gid.astype(jnp.int32), entry_valid)
    return out, residuals


def _bin_pack_fwd(
    means2d, depths, conics, maskf, radii_f, colors, opacities,
    width, height, max_span, chunk,
):
    out, res = _bin_pack_fwd_impl(
        means2d, depths, conics, maskf, radii_f, colors, opacities,
        width, height, max_span, chunk,
    )
    return out, res


@functools.partial(jax.jit, static_argnames=("n",))
def _bin_pack_bwd_impl(sorted_gid, entry_valid, n, g_packed):
    e = sorted_gid.shape[0]
    # rows of g_packed carrying differentiable per-gaussian fields:
    # 0:x 1:y 2:ca 3:cb 4:cc 5:opac 8:r 9:g 10:b 11:depth
    rows = g_packed[jnp.asarray([0, 1, 2, 3, 4, 5, 8, 9, 10, 11]), :e]
    vals = jnp.where(entry_valid[None, :], rows, 0.0).T  # (E, 10)
    acc = jnp.zeros((n, 10), vals.dtype).at[sorted_gid].add(
        vals, mode="drop"
    )
    d_means2d = acc[:, 0:2]
    d_conics = acc[:, 2:5]
    d_opac = acc[:, 5]
    d_colors = acc[:, 6:9]
    d_depths = acc[:, 9]
    return d_means2d, d_depths, d_conics, d_opac, d_colors


def _bin_pack_bwd(width, height, max_span, chunk, res, g):
    sorted_gid, entry_valid = res
    n = sorted_gid.shape[0] // (max_span * max_span)
    g_packed = g[0]  # cotangents of (packed, tile_start, tile_count, ncrop)
    d_means2d, d_depths, d_conics, d_opac, d_colors = _bin_pack_bwd_impl(
        sorted_gid, entry_valid, n, g_packed
    )
    zero_mask = jnp.zeros(n, g_packed.dtype)
    return (
        d_means2d, d_depths, d_conics, zero_mask, zero_mask,
        d_colors, d_opac,
    )


_bin_pack.defvjp(_bin_pack_fwd, _bin_pack_bwd)


@functools.partial(jax.jit, static_argnames=("capacity",))
def compact_nonempty_tiles(tile_start, tile_count, capacity: int):
    """Compact the tile list to its non-empty rows (ascending tile id).

    At 4K the head covers a fraction of the 32,400-tile canvas; blending
    the empty background tiles costs grid steps and output bandwidth for
    nothing. Returns (tile_ids (capacity,), start, count, num_overflow):
    row i of the compacted arrays describes global tile tile_ids[i];
    padding rows carry the sentinel id T (scatter-drop discards them) and
    count 0. Ascending ids preserve the kernels' monotone window
    schedule. Tiles beyond ``capacity`` are DROPPED and counted in
    ``num_overflow`` — callers must surface it (no silent truncation,
    SURVEY §7 hard part 2).
    """
    t = tile_count.shape[0]
    nonempty = tile_count > 0
    m = jnp.sum(nonempty.astype(jnp.int32))
    # stable argsort on the "empty" flag keeps ascending tile ids in
    # front; take the first `capacity` rows
    order = jnp.argsort(jnp.logical_not(nonempty), stable=True)[:capacity]
    valid = jnp.arange(capacity, dtype=jnp.int32) < m
    tile_ids = jnp.where(valid, order.astype(jnp.int32), t)
    start = jnp.where(valid, tile_start[order], 0)
    count = jnp.where(valid, tile_count[order], 0)
    overflow = jnp.maximum(m - capacity, 0)
    return tile_ids, start, count, overflow
