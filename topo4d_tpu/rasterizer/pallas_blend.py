"""Pallas TPU kernels for the tile blend (forward + custom-VJP backward).

The production hot path (SURVEY §7 layer 5). Replaces the XLA scan blend of
``tiled.py``: per-tile work is proportional to that tile's actual entry
count (dynamic while-loop over chunk-aligned DMA windows) and every
intermediate lives in VMEM. Key kernel techniques:

- cumulative transmittance via exp(L_strict @ log1p(-alpha)) — the
  exclusive cumprod becomes a [CHUNK, CHUNK] x [CHUNK, 256] matmul on the
  MXU instead of a sequential scan;
- feature accumulation and all backward reductions are matmuls/lane
  reductions;
- early termination: the chunk loop exits once every pixel's
  transmittance is below 1e-4 (the CUDA rasterizer's per-pixel 'done');
- the backward kernel is self-contained: a forward resweep stores each
  chunk's incoming transmittance in VMEM, then a reverse sweep computes
  exact gradients with a suffix carry (matching the oracle's autodiff
  through the same math, incl. the straight-through 0.99 clamp).

Entry ranges are chunk-aligned and disjoint (tiles.bin_gaussians_packed),
so the backward kernel's full-chunk DMA writes into the per-entry gradient
buffer are race-free by construction.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from topo4d_tpu.core.gaussian import ALPHA_MAX, ALPHA_MIN, TRANSMITTANCE_MIN
from topo4d_tpu.rasterizer.tiles import PACK_WIDTH, TILE

PX = TILE * TILE  # 256 pixels per tile
_NEG_LOG_EPS = 1e-12


def _pixel_coords(tile_idx, tiles_x: int):
    """Pixel-center coordinates of tile ``tile_idx`` -> two (1, PX) f32."""
    col = jax.lax.broadcasted_iota(jnp.int32, (1, PX), 1)
    tx = tile_idx % tiles_x
    ty = tile_idx // tiles_x
    px = (tx * TILE + col % TILE).astype(jnp.float32)
    py = (ty * TILE + col // TILE).astype(jnp.float32)
    return px, py


def _tri_masks(chunk: int):
    """Strictly-lower and strictly-upper triangular (chunk, chunk) f32."""
    row = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    lower = (col < row).astype(jnp.float32)
    upper = (col > row).astype(jnp.float32)
    return lower, upper


def _chunk_terms(data, px, py):
    """Shared forward math for one chunk of entries.

    data: (chunk, 16) packed entry block. Returns (alpha, raw, g_exp, dx,
    dy) with the CUDA skip rules applied (alpha == 0 for skipped pairs).
    """
    x = data[:, 0:1]
    y = data[:, 1:2]
    ca = data[:, 2:3]
    cb = data[:, 3:4]
    cc = data[:, 4:5]
    op = data[:, 5:6]
    valid = data[:, 6:7]
    dx = x - px  # (chunk, PX)
    dy = y - py
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    g_exp = jnp.exp(power)
    raw = op * g_exp
    alpha = jnp.minimum(ALPHA_MAX, raw)
    keep = (power <= 0.0) & (alpha >= ALPHA_MIN) & (valid > 0.5)
    alpha = jnp.where(keep, alpha, 0.0)
    return alpha, raw, g_exp, dx, dy


def _fwd_kernel(tiles_x: int, chunk: int):
    """Build the forward kernel body."""

    def kernel(start_ref, nchunk_ref, packed_hbm, out_ref, buf, sem):
        i = pl.program_id(0)
        start = start_ref[i]
        k = nchunk_ref[i]
        px, py = _pixel_coords(i, tiles_x)
        l_strict, _ = _tri_masks(chunk)

        def get_dma(slot, c):
            return pltpu.make_async_copy(
                packed_hbm.at[pl.ds(start + c * chunk, chunk)],
                buf.at[slot],
                sem.at[slot],
            )

        @pl.when(k > 0)
        def _():
            get_dma(0, 0).start()

        def cond(state):
            c, t_un, t_fr, acc = state
            return jnp.logical_and(c < k, jnp.max(t_un) >= TRANSMITTANCE_MIN)

        def body(state):
            c, t_un, t_fr, acc = state
            slot = jax.lax.rem(c, 2)

            @pl.when(c + 1 < k)
            def _():
                get_dma(1 - slot, c + 1).start()

            get_dma(slot, c).wait()
            data = buf[slot]
            alpha, _, _, _, _ = _chunk_terms(data, px, py)
            log1m = jnp.log1p(-alpha)
            s_excl = jax.lax.dot(
                l_strict, log1m, preferred_element_type=jnp.float32
            )
            t_excl_l = jnp.exp(s_excl)
            t_incl_l = t_excl_l * (1.0 - alpha)
            t_excl = t_un * t_excl_l
            t_incl = t_un * t_incl_l
            keep2 = t_incl >= TRANSMITTANCE_MIN
            w = alpha * t_excl * jnp.where(keep2, 1.0, 0.0)
            feat = data[:, 8:16]  # (chunk, 8)
            acc = acc + jax.lax.dot_general(
                feat,
                w,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (8, PX)
            t_un = t_incl[chunk - 1 : chunk, :]
            t_fr = jnp.minimum(
                t_fr,
                jnp.min(jnp.where(keep2, t_incl, 1.0), axis=0, keepdims=True),
            )
            return (c + 1, t_un, t_fr, acc)

        ones = jnp.ones((1, PX), jnp.float32)
        acc0 = jnp.zeros((8, PX), jnp.float32)
        c_end, t_un, t_fr, acc = jax.lax.while_loop(
            cond, body, (jnp.int32(0), ones, ones, acc0)
        )

        # early termination leaves one prefetched DMA in flight — drain it
        # (scratch/semaphores persist across grid steps)
        @pl.when(jnp.logical_and(c_end < k, c_end > 0))
        def _():
            get_dma(jax.lax.rem(c_end, 2), c_end).wait()

        out = jnp.concatenate(
            [acc[0:4], t_fr, jnp.zeros((3, PX), jnp.float32)], axis=0
        )
        out_ref[0] = out

    return kernel


@functools.partial(
    jax.jit, static_argnames=("tiles_x", "tiles_y", "chunk", "interpret")
)
def _blend_fwd_impl(
    packed, padded_start, nchunks, tiles_x, tiles_y, chunk, interpret=False
):
    t = tiles_x * tiles_y
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, 8, PX), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, PACK_WIDTH), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        _fwd_kernel(tiles_x, chunk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t, 8, PX), jnp.float32),
        interpret=interpret,
    )(padded_start, nchunks, packed)


def _bwd_kernel(tiles_x: int, chunk: int, max_chunks: int):
    """Backward kernel: forward resweep (boundary T's) + reverse grad sweep."""

    def kernel(
        start_ref, nchunk_ref, packed_hbm, g_ref, dpacked_hbm,
        buf, tb, dbuf, sem, wsem,
    ):
        i = pl.program_id(0)
        start = start_ref[i]
        k = nchunk_ref[i]
        px, py = _pixel_coords(i, tiles_x)
        l_strict, u_strict = _tri_masks(chunk)
        g8 = g_ref[0]  # (8, PX): rows 0-3 feature grads, row 4 T_final grad
        g_final = g8[4:5, :]  # (1, PX)

        def get_dma(slot, c):
            return pltpu.make_async_copy(
                packed_hbm.at[pl.ds(start + c * chunk, chunk)],
                buf.at[slot],
                sem.at[slot],
            )

        # ---- forward resweep: record each chunk's incoming T ------------
        @pl.when(k > 0)
        def _():
            get_dma(0, 0).start()

        def fbody(c, carry):
            t_un, t_fr = carry
            slot = jax.lax.rem(c, 2)

            @pl.when(c + 1 < k)
            def _():
                get_dma(1 - slot, c + 1).start()

            get_dma(slot, c).wait()
            tb[pl.ds(c, 1), :] = t_un
            data = buf[slot]
            alpha, _, _, _, _ = _chunk_terms(data, px, py)
            log1m = jnp.log1p(-alpha)
            s_excl = jax.lax.dot(
                l_strict, log1m, preferred_element_type=jnp.float32
            )
            t_incl_l = jnp.exp(s_excl) * (1.0 - alpha)
            t_incl = t_un * t_incl_l
            keep2 = t_incl >= TRANSMITTANCE_MIN
            t_un = t_incl[chunk - 1 : chunk, :]
            t_fr = jnp.minimum(
                t_fr,
                jnp.min(jnp.where(keep2, t_incl, 1.0), axis=0, keepdims=True),
            )
            return (t_un, t_fr)

        ones = jnp.ones((1, PX), jnp.float32)
        _, t_fr = jax.lax.fori_loop(0, k, fbody, (ones, ones))

        gt_final = g_final * t_fr  # (1, PX)

        # ---- reverse sweep ----------------------------------------------
        @pl.when(k > 0)
        def _():
            get_dma(0, k - 1).start()

        def rbody(j, suf):
            c = k - 1 - j
            slot = jax.lax.rem(j, 2)

            @pl.when(j + 1 < k)
            def _():
                get_dma(1 - slot, c - 1).start()

            get_dma(slot, c).wait()
            data = buf[slot]
            alpha, raw, g_exp, dx, dy = _chunk_terms(data, px, py)
            log1m = jnp.log1p(-alpha)
            s_excl = jax.lax.dot(
                l_strict, log1m, preferred_element_type=jnp.float32
            )
            t_un = tb[pl.ds(c, 1), :]
            t_excl = t_un * jnp.exp(s_excl)
            t_incl = t_excl * (1.0 - alpha)
            keep2 = t_incl >= TRANSMITTANCE_MIN
            w = alpha * t_excl * jnp.where(keep2, 1.0, 0.0)

            feat = data[:, 8:16]
            gfeat = jax.lax.dot(
                feat, g8, preferred_element_type=jnp.float32
            )  # (chunk, PX): (g . feat_i)(p)
            q = w * gfeat
            sufq = (
                jax.lax.dot(u_strict, q, preferred_element_type=jnp.float32)
                + suf
            )
            live = jnp.where((alpha > 0.0) & keep2, 1.0, 0.0)
            dalpha = live * (
                t_excl * gfeat - (sufq + gt_final) / (1.0 - alpha)
            )

            dpow = dalpha * raw  # CUDA straight-through clamp semantics
            ca = data[:, 2:3]
            cb = data[:, 3:4]
            dca = jnp.sum(dpow * (-0.5 * dx * dx), axis=1, keepdims=True)
            dcb = jnp.sum(dpow * (-dx * dy), axis=1, keepdims=True)
            dcc = jnp.sum(dpow * (-0.5 * dy * dy), axis=1, keepdims=True)
            dxm = jnp.sum(dpow * (-(ca * dx + cb * dy)), axis=1, keepdims=True)
            cc = data[:, 4:5]
            dym = jnp.sum(dpow * (-(cb * dx + cc * dy)), axis=1, keepdims=True)
            dop = jnp.sum(dalpha * live * g_exp, axis=1, keepdims=True)
            dfeat = jax.lax.dot_general(
                w,
                g8,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (chunk, 8)

            zero = jnp.zeros_like(dca)
            dout = jnp.concatenate(
                [dxm, dym, dca, dcb, dcc, dop, zero, zero], axis=1
            )  # (chunk, 8)
            pad = jnp.zeros((dout.shape[0], PACK_WIDTH - 16), jnp.float32)
            wslot = jax.lax.rem(j, 2)
            # wait for the previous write using this slot to land
            @pl.when(j >= 2)
            def _():
                pltpu.make_async_copy(
                    dbuf.at[wslot],
                    dpacked_hbm.at[pl.ds(start + (c + 2) * chunk, chunk)],
                    wsem.at[wslot],
                ).wait()
            dbuf[wslot] = jnp.concatenate([dout, dfeat, pad], axis=1)
            pltpu.make_async_copy(
                dbuf.at[wslot],
                dpacked_hbm.at[pl.ds(start + c * chunk, chunk)],
                wsem.at[wslot],
            ).start()

            return suf + jnp.sum(q, axis=0, keepdims=True)

        suf0 = jnp.zeros((1, PX), jnp.float32)
        jax.lax.fori_loop(0, k, rbody, suf0)

        # drain outstanding writes
        @pl.when(k >= 2)
        def _():
            pltpu.make_async_copy(
                dbuf.at[jax.lax.rem(k - 2, 2)],
                dpacked_hbm.at[pl.ds(start + 1 * chunk, chunk)],
                wsem.at[jax.lax.rem(k - 2, 2)],
            ).wait()

        @pl.when(k >= 1)
        def _():
            pltpu.make_async_copy(
                dbuf.at[jax.lax.rem(k - 1, 2)],
                dpacked_hbm.at[pl.ds(start, chunk)],
                wsem.at[jax.lax.rem(k - 1, 2)],
            ).wait()

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("tiles_x", "tiles_y", "chunk", "max_chunks", "interpret"),
)
def _blend_bwd_impl(
    packed, padded_start, nchunks, g_out, tiles_x, tiles_y, chunk, max_chunks,
    interpret=False,
):
    t = tiles_x * tiles_y
    e_out = packed.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 8, PX), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, PACK_WIDTH), jnp.float32),  # read double-buffer
            pltpu.VMEM((max_chunks, PX), jnp.float32),  # boundary T store
            pltpu.VMEM((2, chunk, PACK_WIDTH), jnp.float32),  # write double-buffer
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        _bwd_kernel(tiles_x, chunk, max_chunks),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((e_out, PACK_WIDTH), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(padded_start, nchunks, packed, g_out)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def pallas_blend(
    packed, padded_start, nchunks, tiles_x, tiles_y, chunk, max_chunks,
    interpret=False,
):
    """Blend chunk-aligned packed entries -> (T, 8, PX) tile buffers.

    Rows 0-3: alpha-blended (r, g, b, depth); row 4: final (frozen)
    transmittance T_final; rows 5-7: zero. Background compositing and
    alpha = 1 - T_final happen in XLA outside.
    """
    return _blend_fwd_impl(
        packed, padded_start, nchunks, tiles_x, tiles_y, chunk, interpret
    )


def _pallas_blend_fwd(
    packed, padded_start, nchunks, tiles_x, tiles_y, chunk, max_chunks,
    interpret=False,
):
    out = _blend_fwd_impl(
        packed, padded_start, nchunks, tiles_x, tiles_y, chunk, interpret
    )
    return out, (packed, padded_start, nchunks)


def _pallas_blend_bwd(tiles_x, tiles_y, chunk, max_chunks, interpret, res, g_out):
    packed, padded_start, nchunks = res
    # zero rows the kernel never writes (beyond the covered padded ranges)
    dpacked = _blend_bwd_impl(
        packed, padded_start, nchunks, g_out, tiles_x, tiles_y, chunk, max_chunks,
        interpret,
    )
    total = padded_start[-1] + nchunks[-1] * chunk
    covered = (
        jax.lax.broadcasted_iota(jnp.int32, (packed.shape[0], 1), 0) < total
    )
    dpacked = jnp.where(covered, dpacked, 0.0)
    return (dpacked, None, None)


pallas_blend.defvjp(_pallas_blend_fwd, _pallas_blend_bwd)
