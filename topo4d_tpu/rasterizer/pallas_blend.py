"""Pallas TPU kernels for the tile blend (forward + custom-VJP backward).

The production hot path (SURVEY §7 layer 5). Replaces the XLA scan blend of
``tiled.py``: per-tile work is proportional to that tile's actual entry
count (dynamic loop over 128-entry DMA windows) and every intermediate
lives in VMEM.

Layout: transposed — PIXELS on sublanes (256 rows), ENTRIES on lanes
(128 per DMA window). Packed entry data is (16 fields, E) in HBM, sorted
by (tile, depth) WITHOUT per-tile padding: a tile's boundary windows may
contain neighboring tiles' entries, which the kernel masks out via the
tile-id field. Kernel techniques:

- exclusive cumulative transmittance via exp(log1p(-alpha) @ U_strict) —
  the cumprod along entries is a [256,128] x [128,128] MXU matmul;
- feature accumulation / gradient reductions are matmuls or sublane sums;
- early termination: the window loop exits once every pixel's
  transmittance drops below 1e-4 (the CUDA per-pixel 'done' rule);
- the backward kernel runs a SINGLE reverse sweep: the forward saves its
  early-termination window count (out row 5) and final raw transmittance
  carry (out row 6) as residuals, and the reverse sweep reconstructs each
  window's transmittance by division — t_excl = t_out·exp(s_excl−s_total)
  — exactly the trick the reference CUDA backward uses per entry
  (T /= (1−alpha), diff-gaussian-rasterization backward.cu), vectorized
  per 128-entry window. No forward resweep, and windows past the
  termination point (whose gradients are identically zero) are skipped;
- backward writes ACCUMULATE read-modify-write: boundary windows shared
  between adjacent tiles chain correctly because the grid is declared
  sequential ("arbitrary" dimension semantics); the grad buffer starts
  zeroed via input/output aliasing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from topo4d_tpu.core.gaussian import ALPHA_MAX, ALPHA_MIN, TRANSMITTANCE_MIN
from topo4d_tpu.rasterizer.tiles import PACK_CHUNK, PACK_FIELDS, TILE

PX = TILE * TILE  # 256 pixels per tile
_EXP_CLAMP = 80.0  # cap for exp() args in the reverse T reconstruction


def _pixel_coords(tile_idx, tiles_x: int):
    """Pixel-center coordinates of tile ``tile_idx`` -> two (PX, 1) f32."""
    row = jax.lax.broadcasted_iota(jnp.int32, (PX, 1), 0)
    tx = tile_idx % tiles_x
    ty = tile_idx // tiles_x
    px = (tx * TILE + row % TILE).astype(jnp.float32)
    py = (ty * TILE + row // TILE).astype(jnp.float32)
    return px, py


def _moment_basis():
    """(PX, 8) tile-LOCAL pixel moment basis [1, px, py, px^2, px*py, py^2, 0, 0].

    One MXU matmul P^T @ dpow turns the five per-pixel gradient reductions
    of the blend backward into (1, chunk) row combinations. Local (0..15)
    coordinates keep the expansion's cancellation error ~1e-4 relative.
    """
    row = jax.lax.broadcasted_iota(jnp.int32, (PX, 1), 0)
    px = (row % TILE).astype(jnp.float32)
    py = (row // TILE).astype(jnp.float32)
    one = jnp.ones((PX, 1), jnp.float32)
    zero = jnp.zeros((PX, 1), jnp.float32)
    return jnp.concatenate(
        [one, px, py, px * px, px * py, py * py, zero, zero], axis=1
    )


def _tri_masks(chunk: int):
    """(right-mult) masks: excl-prefix U[j,i]=j<i, suffix L[j,i]=j>i."""
    row = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    prefix = (row < col).astype(jnp.float32)
    suffix = (row > col).astype(jnp.float32)
    return prefix, suffix


def _chunk_terms(data, px, py, tile_f):
    """Shared forward math for one window.

    data: (16, chunk) packed field rows. Masks foreign entries (tile-id
    field != this tile) and applies the CUDA skip rules; all (PX, chunk).
    """
    x = data[0:1, :]
    y = data[1:2, :]
    ca = data[2:3, :]
    cb = data[3:4, :]
    cc = data[4:5, :]
    op = data[5:6, :]
    mine = data[6:7, :] == tile_f
    dx = x - px  # (PX, chunk)
    dy = y - py
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    g_exp = jnp.exp(power)
    raw = op * g_exp
    alpha = jnp.minimum(ALPHA_MAX, raw)
    keep = (power <= 0.0) & (alpha >= ALPHA_MIN) & mine
    alpha = jnp.where(keep, alpha, 0.0)
    return alpha, raw, g_exp, dx, dy


def _window_bounds(start, count, chunk):
    """First window index and number of windows covering [start, start+count)."""
    first = start // chunk
    last = (start + count + chunk - 1) // chunk
    return first, jnp.maximum(last - first, 0)


def _fwd_kernel(tiles_x: int, chunk: int, tiles_per_step: int):
    def kernel(start_ref, count_ref, packed_hbm, out_ref, buf, sem):
        step = pl.program_id(0)
        u_prefix, _ = _tri_masks(chunk)

        for t_off in range(tiles_per_step):  # static unroll
            i = step * tiles_per_step + t_off
            first, k = _window_bounds(start_ref[i], count_ref[i], chunk)
            px, py = _pixel_coords(i, tiles_x)
            tile_f = i.astype(jnp.float32)

            def get_dma(slot, c, first=first):
                off = pl.multiple_of((first + c) * chunk, chunk)
                return pltpu.make_async_copy(
                    packed_hbm.at[:, pl.ds(off, chunk)],
                    buf.at[slot],
                    sem.at[slot],
                )

            @pl.when(k > 0)
            def _():
                get_dma(0, 0).start()

            def cond(state, k=k):
                c, t_un, t_fr, acc = state
                return jnp.logical_and(
                    c < k, jnp.max(t_un) >= TRANSMITTANCE_MIN
                )

            def body(state, k=k, px=px, py=py, tile_f=tile_f, get_dma=get_dma):
                c, t_un, t_fr, acc = state
                slot = jax.lax.rem(c, 2)

                @pl.when(c + 1 < k)
                def _():
                    get_dma(1 - slot, c + 1).start()

                get_dma(slot, c).wait()
                data = buf[slot]
                alpha, _, _, _, _ = _chunk_terms(data, px, py, tile_f)
                log1m = jnp.log1p(-alpha)
                s_excl = jax.lax.dot(
                    log1m, u_prefix, preferred_element_type=jnp.float32
                )  # (PX, chunk) exclusive prefix along entries
                t_excl_l = jnp.exp(s_excl)
                t_incl_l = t_excl_l * (1.0 - alpha)
                t_excl = t_un * t_excl_l
                t_incl = t_un * t_incl_l
                keep2 = t_incl >= TRANSMITTANCE_MIN
                w = alpha * t_excl * jnp.where(keep2, 1.0, 0.0)  # (PX, chunk)
                feat = data[8:16, :]  # (8, chunk)
                acc = acc + jax.lax.dot_general(
                    w,
                    feat,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (PX, 8)
                t_un = t_incl[:, chunk - 1 : chunk]
                t_fr = jnp.minimum(
                    t_fr,
                    jnp.min(
                        jnp.where(keep2, t_incl, 1.0), axis=1, keepdims=True
                    ),
                )
                return (c + 1, t_un, t_fr, acc)

            ones = jnp.ones((PX, 1), jnp.float32)
            acc0 = jnp.zeros((PX, 8), jnp.float32)
            c_end, t_un, t_fr, acc = jax.lax.while_loop(
                cond, body, (jnp.int32(0), ones, ones, acc0)
            )

            # early termination leaves one prefetched DMA in flight — drain
            # it (scratch/semaphores persist across grid steps)
            @pl.when(jnp.logical_and(c_end < k, c_end > 0))
            def _():
                get_dma(jax.lax.rem(c_end, 2), c_end).wait()

            # rows 5/6 carry backward residuals: the number of windows the
            # forward actually processed (early termination) and the raw
            # final transmittance carry (reverse reconstruction seed)
            c_end_col = jnp.broadcast_to(
                c_end.astype(jnp.float32), (PX, 1)
            )
            out = jnp.concatenate(
                [acc[:, 0:4], t_fr, c_end_col, t_un,
                 jnp.zeros((PX, 1), jnp.float32)],
                axis=1,
            )
            # transpose to (8, PX): a (T, PX, 8) output buffer gets its
            # minor dim padded to 128 lanes by XLA in the backward epilogue
            # (16x memory, OOM at 4K); (T, 8, PX) lays out clean
            out_ref[t_off] = out.T

    return kernel


@functools.partial(
    jax.jit, static_argnames=("tiles_x", "tiles_y", "chunk", "interpret")
)
def _blend_fwd_impl(
    packed, tile_start, tile_count, tiles_x, tiles_y, chunk, interpret=False
):
    t = tiles_x * tiles_y
    tps = _tiles_per_step(t)
    pad_t = -(-t // tps) * tps
    if pad_t != t:
        # pad tile metadata so the grid divides evenly (extra tiles empty)
        tile_start = jnp.concatenate(
            [tile_start, jnp.zeros(pad_t - t, jnp.int32)]
        )
        tile_count = jnp.concatenate(
            [tile_count, jnp.zeros(pad_t - t, jnp.int32)]
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(pad_t // tps,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (tps, 8, PX), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, PACK_FIELDS, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        _fwd_kernel(tiles_x, chunk, tps),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((pad_t, 8, PX), jnp.float32),
        interpret=interpret,
    )(tile_start, tile_count, packed)
    return out[:t]


def _tiles_per_step(num_tiles: int) -> int:
    """Tiles per grid step: amortizes per-step overhead (~1-2 us each)."""
    for tps in (4, 2, 1):
        if num_tiles >= tps:
            return tps
    return 1


def _bwd_kernel(tiles_x: int, chunk: int, tiles_per_step: int):
    """Backward: single reverse sweep with RMW grad accumulation.

    Transmittance is reconstructed back-to-front from the forward's saved
    final carry (out row 6) by window-level division, and only the windows
    the forward actually processed (out row 5) are visited.
    """

    def kernel(
        start_ref, count_ref, cend_ref, packed_hbm, g_ref, fwd_ref,
        zeros_hbm, dpacked_hbm, buf, dbuf, ebuf, sem, wsem, esem,
    ):
        # dpacked is aliased to a zeros input, so RMW accumulation starts
        # from a defined state without an in-kernel memset
        del zeros_hbm
        step = pl.program_id(0)
        u_prefix, l_suffix = _tri_masks(chunk)
        basis = _moment_basis()

        for t_off in range(tiles_per_step):  # static unroll
            _bwd_one_tile(
                step * tiles_per_step + t_off,
                start_ref, count_ref, cend_ref, packed_hbm,
                g_ref[t_off].T, fwd_ref[t_off].T,
                dpacked_hbm, buf, dbuf, ebuf, sem, wsem, esem,
                tiles_x, chunk, u_prefix, l_suffix, basis,
            )

    return kernel


def _bwd_one_tile(
    i, start_ref, count_ref, cend_ref, packed_hbm, g8, fwd8, dpacked_hbm,
    buf, dbuf, ebuf, sem, wsem, esem, tiles_x, chunk, u_prefix, l_suffix,
    basis,
):
    first, k = _window_bounds(start_ref[i], count_ref[i], chunk)
    # windows past the forward's early-termination point carry zero
    # gradient (their t_incl < TRANSMITTANCE_MIN -> keep2/live = 0)
    k = jnp.minimum(k, cend_ref[i])
    px, py = _pixel_coords(i, tiles_x)
    tile_f = i.astype(jnp.float32)
    # tile-origin for the local-coordinate moment expansion
    ox = ((i % tiles_x) * TILE).astype(jnp.float32)
    oy = ((i // tiles_x) * TILE).astype(jnp.float32)
    # g8 (PX, 8): cols 0-3 feature grads, col 4 T_final grad
    g_final = g8[:, 4:5]  # (PX, 1)
    gt_final = g_final * fwd8[:, 4:5]  # g_T * frozen T_final
    t_seed = fwd8[:, 6:7]  # raw final transmittance carry

    def get_dma(slot, c):
        off = pl.multiple_of((first + c) * chunk, chunk)
        return pltpu.make_async_copy(
            packed_hbm.at[:, pl.ds(off, chunk)],
            buf.at[slot],
            sem.at[slot],
        )

    def read_grad_dma(slot, c):
        off = pl.multiple_of((first + c) * chunk, chunk)
        return pltpu.make_async_copy(
            dpacked_hbm.at[:, pl.ds(off, chunk)],
            ebuf.at[slot],
            esem.at[slot],
        )

    def write_grad_dma(slot, c):
        off = pl.multiple_of((first + c) * chunk, chunk)
        return pltpu.make_async_copy(
            dbuf.at[slot],
            dpacked_hbm.at[:, pl.ds(off, chunk)],
            wsem.at[slot],
        )

    # ---- reverse sweep with read-modify-write accumulation --------------
    @pl.when(k > 0)
    def _():
        get_dma(0, k - 1).start()
        read_grad_dma(0, k - 1).start()

    def rbody(j, carry):
        suf, t_out = carry
        c = k - 1 - j
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < k)
        def _():
            get_dma(1 - slot, c - 1).start()

        get_dma(slot, c).wait()
        data = buf[slot]
        alpha, raw, g_exp, dx, dy = _chunk_terms(data, px, py, tile_f)
        log1m = jnp.log1p(-alpha)
        s_excl = jax.lax.dot(
            log1m, u_prefix, preferred_element_type=jnp.float32
        )
        s_total = jnp.sum(log1m, axis=1, keepdims=True)  # (PX, 1)
        # t_excl = t_in * exp(s_excl) with t_in = t_out / prod(1-alpha):
        # division by the window suffix product, clamped so a fully
        # saturated t_out==0 stays 0 instead of 0*inf
        t_excl = t_out * jnp.exp(
            jnp.minimum(s_excl - s_total, _EXP_CLAMP)
        )
        t_incl = t_excl * (1.0 - alpha)
        keep2 = t_incl >= TRANSMITTANCE_MIN
        w = alpha * t_excl * jnp.where(keep2, 1.0, 0.0)

        feat = data[8:16, :]  # (8, chunk)
        gfeat = jax.lax.dot(
            g8, feat, preferred_element_type=jnp.float32
        )  # (PX, chunk): (g . feat_e)(p)
        q = w * gfeat
        sufq = (
            jax.lax.dot(q, l_suffix, preferred_element_type=jnp.float32)
            + suf
        )
        live = jnp.where((alpha > 0.0) & keep2, 1.0, 0.0)
        dalpha = live * (
            t_excl * gfeat - (sufq + gt_final) / (1.0 - alpha)
        )

        dpow = dalpha * raw  # CUDA straight-through clamp semantics
        ca = data[2:3, :]
        cb = data[3:4, :]
        cc = data[4:5, :]
        # pixel moments of dpow: ONE MXU matmul replaces the five
        # (PX, chunk) multiply+reduce pairs; Σ dpow·f(dx,dy) for any
        # quadratic f becomes a (1, chunk) combination of the moments
        # (tile-local coordinates bound the expansion's cancellation)
        m = jax.lax.dot_general(
            basis, dpow,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (8, chunk): [Σ, Σpx, Σpy, Σpx², Σpxpy, Σpy²]·dpow
        m0 = m[0:1, :]
        mx = m[1:2, :]
        my = m[2:3, :]
        mxx = m[3:4, :]
        mxy = m[4:5, :]
        myy = m[5:6, :]
        xl = data[0:1, :] - ox
        yl = data[1:2, :] - oy
        gx = xl * m0 - mx  # Σ dpow·dx
        gy = yl * m0 - my  # Σ dpow·dy
        dca = -0.5 * (xl * xl * m0 - 2.0 * xl * mx + mxx)
        dcb = -(xl * yl * m0 - xl * my - yl * mx + mxy)
        dcc = -0.5 * (yl * yl * m0 - 2.0 * yl * my + myy)
        dxm = -(ca * gx + cb * gy)
        dym = -(cb * gx + cc * gy)
        # dpow = dalpha·op·g_exp  =>  Σ dalpha·g_exp = m0 / op
        dop = m0 / jnp.maximum(data[5:6, :], 1e-30)
        dfeat = jax.lax.dot_general(
            g8,
            w,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (8, chunk)

        zero = jnp.zeros((2, chunk), jnp.float32)
        dout = jnp.concatenate(
            [dxm, dym, dca, dcb, dcc, dop, zero, dfeat], axis=0
        )  # (16, chunk)

        # previous write on this slot must land before we reuse dbuf
        @pl.when(j >= 2)
        def _():
            write_grad_dma(slot, c + 2).wait()

        read_grad_dma(slot, c).wait()
        dbuf[slot] = ebuf[slot] + dout

        @pl.when(j + 1 < k)
        def _():
            read_grad_dma(1 - slot, c - 1).start()

        write_grad_dma(slot, c).start()
        # carry the reconstructed incoming transmittance to the previous
        # window (clamped: a saturated 0 carry stays 0)
        t_in = t_out * jnp.exp(jnp.minimum(-s_total, _EXP_CLAMP))
        return (suf + jnp.sum(q, axis=1, keepdims=True), t_in)

    suf0 = jnp.zeros((PX, 1), jnp.float32)
    jax.lax.fori_loop(0, k, rbody, (suf0, t_seed))

    # drain outstanding writes
    @pl.when(k >= 2)
    def _():
        write_grad_dma(jax.lax.rem(k - 2, 2), 1).wait()

    @pl.when(k >= 1)
    def _():
        write_grad_dma(jax.lax.rem(k - 1, 2), 0).wait()


@functools.partial(
    jax.jit,
    static_argnames=("tiles_x", "tiles_y", "chunk", "interpret"),
)
def _blend_bwd_impl(
    packed, tile_start, tile_count, fwd_out, g_out, tiles_x, tiles_y, chunk,
    interpret=False,
):
    t = tiles_x * tiles_y
    e_pad = packed.shape[1]
    tps = _tiles_per_step(t)
    pad_t = -(-t // tps) * tps
    cend = fwd_out[:, 5, 0].astype(jnp.int32)  # forward residual row 5
    if pad_t != t:
        tile_start = jnp.concatenate(
            [tile_start, jnp.zeros(pad_t - t, jnp.int32)]
        )
        tile_count = jnp.concatenate(
            [tile_count, jnp.zeros(pad_t - t, jnp.int32)]
        )
        cend = jnp.concatenate([cend, jnp.zeros(pad_t - t, jnp.int32)])
        g_out = jnp.concatenate(
            [g_out, jnp.zeros((pad_t - t, 8, PX), g_out.dtype)]
        )
        fwd_out = jnp.concatenate(
            [fwd_out, jnp.zeros((pad_t - t, 8, PX), fwd_out.dtype)]
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(pad_t // tps,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (tps, 8, PX), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tps, 8, PX), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, PACK_FIELDS, chunk), jnp.float32),  # entry reads
            pltpu.VMEM((2, PACK_FIELDS, chunk), jnp.float32),  # grad writes
            pltpu.VMEM((2, PACK_FIELDS, chunk), jnp.float32),  # grad reads
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    zeros = jnp.zeros((PACK_FIELDS, e_pad), jnp.float32)
    return pl.pallas_call(
        _bwd_kernel(tiles_x, chunk, tps),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((PACK_FIELDS, e_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            dimension_semantics=("arbitrary",),  # RMW chains need sequential
        ),
        input_output_aliases={6: 0},  # zeros input (after 3 scalar args)
        interpret=interpret,
    )(tile_start, tile_count, cend, packed, g_out, fwd_out, zeros)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def pallas_blend(
    packed, tile_start, tile_count, tiles_x, tiles_y, chunk, interpret=False
):
    """Blend depth-sorted packed entries -> (T, 8, PX) tile buffers.

    Rows 0-3: alpha-blended (r, g, b, depth); row 4: final (frozen)
    transmittance T_final; rows 5/6: backward residuals (window count,
    raw T carry); row 7: zero. Background compositing and
    alpha = 1 - T_final happen in XLA outside. Layout note: the minor dim
    must be PX (=256), not 8 — XLA pads small minor dims to 128 lanes.
    """
    return _blend_fwd_impl(
        packed, tile_start, tile_count, tiles_x, tiles_y, chunk, interpret
    )


def _pallas_blend_fwd(
    packed, tile_start, tile_count, tiles_x, tiles_y, chunk, interpret=False
):
    out = _blend_fwd_impl(
        packed, tile_start, tile_count, tiles_x, tiles_y, chunk, interpret
    )
    return out, (packed, tile_start, tile_count, out)


def _pallas_blend_bwd(tiles_x, tiles_y, chunk, interpret, res, g_out):
    packed, tile_start, tile_count, fwd_out = res
    dpacked = _blend_bwd_impl(
        packed, tile_start, tile_count, fwd_out, g_out, tiles_x, tiles_y,
        chunk, interpret,
    )
    return (dpacked, None, None)


pallas_blend.defvjp(_pallas_blend_fwd, _pallas_blend_bwd)
