"""Production Pallas renderer: project (XLA) -> bin (XLA) -> blend (Pallas).

Same contract as the oracle (``rasterizer.reference``) and the XLA tiled
path; forward AND backward must `allclose` both. The custom VJP covers only
the blend — the projection and the per-entry packing/gather stay under XLA
autodiff (its gather-grad gives the entry->Gaussian scatter-add).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from topo4d_tpu.core.camera import Camera
from topo4d_tpu.core.gaussian import GaussianRenderVars, project_gaussians
from topo4d_tpu.rasterizer.pallas_blend import PX, pallas_blend
from topo4d_tpu.rasterizer.tiled import TiledRenderOutput
from topo4d_tpu.rasterizer.tiles import (
    PACK_FIELDS,
    TILE,
    Binning,
    compact_nonempty_tiles,
    compute_binning,
    num_tiles,
    pack_with_binning,
)


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "max_span", "chunk", "interpret", "variant",
        "tile_capacity", "tps",
    ),
)
def _render_pallas_impl(
    proj,
    colors,
    opacities,
    bg,
    width: int,
    height: int,
    max_span: int,
    chunk: int,
    interpret: bool,
    binning: Optional[Binning] = None,
    variant: str = "auto",
    tile_capacity: Optional[int] = None,
    tps: Optional[int] = None,
):
    if binning is None:
        # fresh binning per call, but through the SAME compute+pack pair
        # as the frozen path: the sort-with-data variant's backward is a
        # segment scatter-add (~0.5 ms/iter at geometry scale — XLA
        # serializes scatters), while pack_with_binning's backward is the
        # dense inverse gather. Permutation and gradients are identical
        # (tests pin cached==direct); the binning itself is nondiff.
        binning = compute_binning(
            jax.lax.stop_gradient(proj), width, height, max_span
        )
    bins = pack_with_binning(proj, colors, opacities, binning, chunk)
    tiles_x, tiles_y = num_tiles(width, height)
    t = tiles_x * tiles_y
    tile_overflow = jnp.zeros((), jnp.int32)
    if tile_capacity is None and binning.compact is not None:
        # a frozen binning carrying a compact tile list implies its
        # capacity (the trainer auto-sizes it from the frame's occupancy
        # — texture.tile_capacity = -1); shapes are static under jit
        tile_capacity = binning.compact.ids.shape[0]
    if tile_capacity is not None and tile_capacity < t:
        # compact mode: blend only the non-empty tiles (at 4K most of
        # the canvas is empty background), then scatter into an empty
        # template whose rows composite to pure background
        if (
            binning.compact is not None
            and binning.compact.ids.shape[0] == tile_capacity
        ):
            # frozen with the binning: the per-step argsort over the
            # full tile canvas is a per-frame constant there
            ids, cstart, ccount, tile_overflow = binning.compact
        else:
            ids, cstart, ccount, tile_overflow = compact_nonempty_tiles(
                bins.tile_start, bins.tile_count, tile_capacity
            )
        out_c = pallas_blend(
            bins.packed, cstart, ccount, tiles_x, tiles_y, chunk,
            interpret, num_tiles=tile_capacity, variant=variant,
            tile_map=ids, tps=tps,
        )  # (capacity, 8, PX)
        template = jnp.zeros((t, 8, PX), jnp.float32).at[:, 4, :].set(1.0)
        out = template.at[ids].set(out_c, mode="drop")
    else:
        out = pallas_blend(
            bins.packed,
            bins.tile_start,
            bins.tile_count,
            tiles_x,
            tiles_y,
            chunk,
            interpret,
            variant=variant,
            tps=tps,
        )  # (T, 8, PX)

    rgb_tiles = out[:, 0:3, :] + out[:, 4:5, :] * bg[None, :, None]
    depth_tiles = out[:, 3:4, :]
    alpha_tiles = 1.0 - out[:, 4:5, :]

    def untile(x):
        """(T, C, PX) -> (C, H, W)."""
        c = x.shape[1]
        x = x.reshape(tiles_y, tiles_x, c, TILE, TILE)
        x = x.transpose(2, 0, 3, 1, 4).reshape(c, tiles_y * TILE, tiles_x * TILE)
        return x[:, :height, :width]

    return (
        untile(rgb_tiles), untile(depth_tiles), untile(alpha_tiles),
        bins.num_cropped, tile_overflow,
    )


def render_gaussians_pallas(
    rv: GaussianRenderVars,
    cam: Camera,
    bg: Optional[jnp.ndarray] = None,
    means2d_offset: Optional[jnp.ndarray] = None,
    max_span: int = 4,
    chunk: int = 128,
    interpret: bool = False,
    binning: Optional[Binning] = None,
    variant: str = "auto",
    tile_capacity: Optional[int] = None,
    tps: Optional[int] = None,
) -> TiledRenderOutput:
    """Drop-in Pallas renderer matching the oracle contract.

    ``interpret=True`` runs the kernels in the Pallas interpreter
    (CPU-testable); False compiles Mosaic TPU kernels.

    ``binning``: a frozen permutation from ``binning_for`` — skips the
    per-call duplicate-and-sort (the dense texture loop's dominant
    binning cost; means3D are frozen there so the depth order is stable).

    ``variant``: blend kernel selection — "auto" (VMEM-resident when the
    packed entries fit the budget, streaming otherwise), "resident", or
    "stream" (forced; used by parity tests to pin a path).

    ``tile_capacity``: blend at most this many NON-EMPTY tiles and
    composite the rest as background (the 4K dense phase: most of the
    canvas is empty). Non-empty tiles beyond the capacity are dropped
    and counted in ``num_overflow`` — size the capacity so it stays 0.
    """
    if bg is None:
        bg = jnp.zeros(3, dtype=jnp.float32)
    proj = project_gaussians(rv, cam, means2d_offset)
    image, depth, alpha, ncrop, tile_overflow = _render_pallas_impl(
        proj,
        rv.colors,
        rv.opacities,
        bg,
        cam.width,
        cam.height,
        max_span,
        chunk,
        interpret,
        binning,
        variant,
        tile_capacity,
        tps,
    )
    return TiledRenderOutput(
        image=image,
        radii=proj.radii,
        depth=depth,
        alpha=alpha,
        num_cropped=ncrop,
        # packed binning never drops entries; compact mode may drop
        # whole tiles past the capacity (counted here)
        num_overflow=tile_overflow,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "max_span", "chunk", "interpret", "variant",
        "tile_capacity",
    ),
)
def _render_pallas_multiview_impl(
    proj_v,
    colors,
    opacities,
    bg,
    width: int,
    height: int,
    max_span: int,
    chunk: int,
    interpret: bool,
    binning_v=None,
    variant: str = "auto",
    tile_capacity: Optional[int] = None,
):
    v = proj_v.means2d.shape[0]
    tiles_x, tiles_y = num_tiles(width, height)
    t = tiles_x * tiles_y
    if binning_v is None:
        # batched duplicate-and-sort: one lax.sort over a (V, E) batch is
        # far cheaper than V sequential sorts (the sort network amortizes
        # across the batch axis), and each view keeps the fused int32 key
        binning_v = jax.vmap(
            lambda p: compute_binning(p, width, height, max_span)
        )(jax.lax.stop_gradient(proj_v))
    bins = jax.vmap(
        lambda p, b: pack_with_binning(p, colors, opacities, b, chunk)
    )(proj_v, binning_v)
    e_pad = bins.packed.shape[2]

    # virtual tall canvas: view v's tiles are rows [v*tiles_y, (v+1)*tiles_y)
    # of a (V*tiles_y, tiles_x) tile grid. Offsetting each view's pixel-y
    # and tile-id fields and concatenating the per-view entry arrays turns
    # V renders into ONE blend launch; views never share tiles, so per-view
    # outputs match the single-view renderer exactly. Entry offsets are
    # chunk-aligned (each view's packed tail pad is >= chunk), so boundary
    # DMA windows never cross a view boundary into misaligned data.
    voff_e = jnp.arange(v, dtype=jnp.int32)[:, None] * e_pad
    tile_start = (bins.tile_start + voff_e).reshape(-1)
    tile_count = bins.tile_count.reshape(-1)

    tile_row = bins.packed[:, 6:7, :]
    voff_t = (jnp.arange(v, dtype=jnp.float32) * t)[:, None, None]
    # valid tiles [0, t) -> global id; the per-view invalid sentinel t
    # remaps to -2.0 (matches no tile id, distinct from the -1.0 pad)
    tile_row = jnp.where(
        tile_row >= float(t),
        -2.0,
        jnp.where(tile_row >= 0.0, tile_row + voff_t, tile_row),
    )
    y_off = jnp.arange(v, dtype=jnp.float32) * float(tiles_y * TILE)
    packed = jnp.concatenate(
        [
            bins.packed[:, 0:1, :],
            bins.packed[:, 1:2, :] + y_off[:, None, None],
            bins.packed[:, 2:6, :],
            tile_row,
            bins.packed[:, 7:, :],
        ],
        axis=1,
    )
    packed = packed.transpose(1, 0, 2).reshape(PACK_FIELDS, v * e_pad)

    t_all = v * t
    tile_overflow = jnp.zeros((), jnp.int32)
    if tile_capacity is not None and tile_capacity < t_all:
        ids, cstart, ccount, tile_overflow = compact_nonempty_tiles(
            tile_start, tile_count, tile_capacity
        )
        out_c = pallas_blend(
            packed, cstart, ccount, tiles_x, v * tiles_y, chunk,
            interpret, num_tiles=tile_capacity, variant=variant,
            tile_map=ids,
        )  # (capacity, 8, PX)
        template = jnp.zeros((t_all, 8, PX), jnp.float32).at[:, 4, :].set(1.0)
        out = template.at[ids].set(out_c, mode="drop")
    else:
        out = pallas_blend(
            packed, tile_start, tile_count, tiles_x, v * tiles_y, chunk,
            interpret, variant=variant,
        )  # (V*T, 8, PX)
    out = out.reshape(v, t, 8, PX)

    rgb_tiles = out[:, :, 0:3, :] + out[:, :, 4:5, :] * bg[None, None, :, None]
    depth_tiles = out[:, :, 3:4, :]
    alpha_tiles = 1.0 - out[:, :, 4:5, :]

    def untile(x):
        """(V, T, C, PX) -> (V, C, H, W)."""
        c = x.shape[2]
        x = x.reshape(v, tiles_y, tiles_x, c, TILE, TILE)
        x = x.transpose(0, 3, 1, 4, 2, 5).reshape(
            v, c, tiles_y * TILE, tiles_x * TILE
        )
        return x[:, :, :height, :width]

    return (
        untile(rgb_tiles), untile(depth_tiles), untile(alpha_tiles),
        jnp.sum(bins.num_cropped), tile_overflow,
    )


def render_gaussians_pallas_multiview(
    rv: GaussianRenderVars,
    cams: Camera,
    bg: Optional[jnp.ndarray] = None,
    max_span: int = 4,
    chunk: int = 128,
    interpret: bool = False,
    variant: str = "auto",
    tile_capacity: Optional[int] = None,
) -> TiledRenderOutput:
    """ALL views of a batched camera rendered in ONE blend kernel launch.

    The batched all-views train step (reference semantics: one random view
    per step, train.py:105-112; our validated summed-gradient mode) would
    otherwise lax.map V sequential single-view renders — the Pallas kernels
    have no vmap rule. Stacking the views on a virtual tall canvas instead
    gives the blend a V*T-tile grid in one launch: per-launch overheads
    amortize V-fold and the binning sort runs as one (V, E) batched sort.
    Outputs carry a leading view axis; per-view results are exactly those
    of ``render_gaussians_pallas`` (tested).

    ``tile_capacity``: blend at most this many NON-EMPTY tiles across all
    views (compact mode; overflow counted in ``num_overflow``).
    """
    if bg is None:
        bg = jnp.zeros(3, dtype=jnp.float32)
    proj_v = jax.vmap(lambda c: project_gaussians(rv, c))(cams)
    image, depth, alpha, ncrop, tile_overflow = _render_pallas_multiview_impl(
        proj_v, rv.colors, rv.opacities, bg, cams.width, cams.height,
        max_span, chunk, interpret, None, variant, tile_capacity,
    )
    return TiledRenderOutput(
        image=image,
        radii=proj_v.radii,
        depth=depth,
        alpha=alpha,
        num_cropped=ncrop,
        num_overflow=tile_overflow,
    )


def render_gaussians_pallas_tile_sharded(
    rv: GaussianRenderVars,
    cam: Camera,
    mesh,
    bg: Optional[jnp.ndarray] = None,
    max_span: int = 4,
    chunk: int = 128,
    interpret: bool = False,
    axis: str = "tile",
    binning: Optional[Binning] = None,
) -> TiledRenderOutput:
    """ONE view's render sharded over the TILE axis of a device mesh.

    The sequence-parallel analogue for this workload (SURVEY §5): the
    pixel/tile axis of a single high-resolution view (the 4K dense
    texture phase renders one view per iteration, where view-sharding
    cannot help) splits across chips. Projection/binning run replicated
    (packed entries are small next to the canvas); each device blends its
    contiguous tile block via the kernels' tile_offset, and the backward
    psums the replicated packed array's gradients across the mesh —
    inserted by shard_map's transpose, riding ICI.

    A frozen ``binning`` composes with the full dense-loop stack: its
    ``static_rows`` (split-pack) flow through ``pack_with_binning``, and
    its ``compact`` tile list, when present, is what gets sharded — each
    device blends a contiguous slice of the NON-EMPTY tiles (ascending
    ids keep the kernels' monotone window schedule) and the compact
    results scatter into the background template, exactly like the
    single-device compact mode.
    """
    import numpy as np
    from jax.sharding import PartitionSpec as P

    shard_map = jax.shard_map

    if bg is None:
        bg = jnp.zeros(3, dtype=jnp.float32)
    proj = project_gaussians(rv, cam)
    if binning is None:
        # same compute+pack pair as the single-device renderer (gather-
        # based backward; see _render_pallas_impl)
        binning = compute_binning(
            jax.lax.stop_gradient(proj), cam.width, cam.height, max_span
        )
    bins = pack_with_binning(
        proj, rv.colors, rv.opacities, binning, chunk
    )
    tiles_x, tiles_y = num_tiles(cam.width, cam.height)
    t = tiles_x * tiles_y
    ndev = int(np.prod(mesh.devices.shape))
    compact = binning.compact
    tile_overflow = jnp.zeros((), jnp.int32)
    if compact is not None:
        # shard the compact non-empty-tile list instead of the canvas
        cap = compact.ids.shape[0]
        tl = -(-cap // ndev)
        pad = ndev * tl - cap
        sent = jnp.full(pad, t, jnp.int32)  # sentinel id = empty row
        ids_all = jnp.concatenate([compact.ids, sent])
        starts = jnp.concatenate([compact.start, jnp.zeros(pad, jnp.int32)])
        counts = jnp.concatenate([compact.count, jnp.zeros(pad, jnp.int32)])
        tile_overflow = compact.overflow
    else:
        cap = None
        tl = -(-t // ndev)  # tiles per device (padded block)
        pad = ndev * tl - t
        ids_all = None
        starts = jnp.concatenate(
            [bins.tile_start, jnp.zeros(pad, jnp.int32)]
        )
        counts = jnp.concatenate(
            [bins.tile_count, jnp.zeros(pad, jnp.int32)]
        )
    offsets = (jnp.arange(ndev, dtype=jnp.int32) * tl)[:, None]  # (ndev, 1)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
        # pallas_call inside shard_map carries no vma annotations
        check_vma=False,
    )
    def blend_shard(packed, starts, counts, offs):
        out_local = pallas_blend(
            packed, starts[0], counts[0], tiles_x, tiles_y, chunk,
            interpret, tile_offset=offs[0], num_tiles=tl,
        )
        return out_local[None]  # (1, tl, 8, PX) — shard axis leads

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    def blend_shard_compact(packed, starts, counts, ids):
        out_local = pallas_blend(
            packed, starts[0], counts[0], tiles_x, tiles_y, chunk,
            interpret, num_tiles=tl, tile_map=ids[0],
        )
        return out_local[None]  # (1, tl, 8, PX)

    if compact is not None:
        out_c = blend_shard_compact(
            bins.packed, starts.reshape(ndev, tl),
            counts.reshape(ndev, tl), ids_all.reshape(ndev, tl),
        ).reshape(ndev * tl, 8, PX)[:cap]
        template = jnp.zeros((t, 8, PX), jnp.float32).at[:, 4, :].set(1.0)
        out = template.at[compact.ids].set(out_c, mode="drop")
    else:
        out = blend_shard(
            bins.packed, starts.reshape(ndev, tl),
            counts.reshape(ndev, tl), offsets,
        ).reshape(ndev * tl, 8, PX)[:t]

    rgb_tiles = out[:, 0:3, :] + out[:, 4:5, :] * bg[None, :, None]
    depth_tiles = out[:, 3:4, :]
    alpha_tiles = 1.0 - out[:, 4:5, :]

    def untile(x):
        c = x.shape[1]
        x = x.reshape(tiles_y, tiles_x, c, TILE, TILE)
        x = x.transpose(2, 0, 3, 1, 4).reshape(
            c, tiles_y * TILE, tiles_x * TILE
        )
        return x[:, : cam.height, : cam.width]

    return TiledRenderOutput(
        image=untile(rgb_tiles),
        radii=proj.radii,
        depth=untile(depth_tiles),
        alpha=untile(alpha_tiles),
        num_cropped=bins.num_cropped,
        num_overflow=tile_overflow,
    )


@functools.partial(jax.jit, static_argnames=("capacity",))
def attach_compact(binning: Binning, capacity: int) -> Binning:
    """Attach a frozen compact tile list of the given capacity.

    Used by the trainer's auto-sizing (``texture.tile_capacity = -1``):
    binnings are computed first, the frame's exact occupancy read off
    their tile counts, and the compact list frozen at
    capacity = occupancy x margin — so compact-tile blending is
    default-on with zero dropped tiles (VERDICT r3 item 7).
    """
    from topo4d_tpu.rasterizer.tiles import (
        CompactTiles,
        compact_nonempty_tiles,
    )

    if capacity >= binning.tile_count.shape[0]:
        return binning  # compact mode off: canvas already that small
    return binning._replace(
        compact=CompactTiles(
            *compact_nonempty_tiles(
                binning.tile_start, binning.tile_count, capacity
            )
        )
    )


@functools.partial(
    jax.jit,
    static_argnames=("max_span", "with_static", "chunk", "tile_capacity"),
)
def binning_for(
    rv: GaussianRenderVars,
    cam: Camera,
    max_span: int = 4,
    with_static: bool = False,
    chunk: int = 128,
    tile_capacity: Optional[int] = None,
):
    """Compute the reusable frozen binning for the current geometry.

    Camera width/height are static pytree aux, so the whole
    project+duplicate+sort runs as one jitted graph.

    ``with_static`` (dense texture loop): additionally capture the
    frame-constant packed rows (``tiles.pack_static_rows``) so each step
    gathers only the learned conic+color rows (``texture.split_pack``).

    ``tile_capacity``: additionally freeze the compact non-empty-tile
    list (``tiles.CompactTiles``) — the per-step canvas argsort of
    compact-mode renders is a per-frame constant under a frozen binning.
    """
    from topo4d_tpu.rasterizer.tiles import (
        CompactTiles,
        compact_nonempty_tiles,
        pack_static_rows,
    )

    proj = project_gaussians(rv, cam)
    b = compute_binning(
        jax.lax.stop_gradient(proj), cam.width, cam.height, max_span
    )
    if with_static:
        b = b._replace(
            static_rows=pack_static_rows(
                jax.lax.stop_gradient(proj),
                jax.lax.stop_gradient(rv.opacities),
                b,
                chunk,
            )
        )
    if tile_capacity is not None:
        t = b.tile_count.shape[0]
        if tile_capacity < t:  # capacity >= T means compact mode is off
            b = b._replace(
                compact=CompactTiles(
                    *compact_nonempty_tiles(
                        b.tile_start, b.tile_count, tile_capacity
                    )
                )
            )
    return b
