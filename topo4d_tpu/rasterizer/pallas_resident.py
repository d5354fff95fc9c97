"""VMEM-resident Pallas blend kernels (small-entry-count fast path).

At geometry scale (8,280 Gaussians, max_span=2 -> ~33k packed entries,
~2.1 MB) the ENTIRE transposed entry array fits in VMEM, so the streaming
kernel's DMA choreography (double buffers, semaphores, window cache,
flush accumulator — pallas_blend.py) is pure overhead: the forward can
dynamic-slice 128-entry windows straight out of a resident (16, E) VMEM
block, and the backward can accumulate entry gradients in place into a
resident (16, E) VMEM output, in any order, with zero DMA management.

Same contract as ``pallas_blend`` (reference CUDA semantics, SURVEY §2.1
N1): identical outputs and gradients, verified against the oracle by
tests/test_rasterizer_pallas.py. The streaming kernel remains the path
for entry arrays past the VMEM budget (the 4K dense texture phase) and
for the tile-sharded multi-chip renderer.

Layout/grid:
- grid over tile blocks (``tps`` tiles per step) exactly like the
  streaming kernel, so the (T, 8, PX) output block mapping is unchanged;
- packed entries are ONE full-array VMEM input block (no index_map);
- backward emits dpacked as ONE full-array VMEM output accumulated
  across steps (zeroed at step 0) and written back to HBM once at the
  end — replaces the streaming kernel's monotone-flush machinery.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from topo4d_tpu.core.gaussian import TRANSMITTANCE_MIN
from topo4d_tpu.rasterizer.pallas_blend import (
    PX,
    _bwd_window_grads,
    _fwd_window,
    _moment_basis,
    _pixel_coords,
    _pixel_coords_batch,
    _tri_masks,
    _window_bounds,
)
from topo4d_tpu.rasterizer.tiles import PACK_FIELDS

# resident kernels are used when the padded entry array fits this budget
# (bwd holds packed + dpacked: 2 * E_pad * 16 * 4 bytes; 64k entries
# -> 8 MB of a ~16 MB/core VMEM, leaving room for blocks + scratch)
RESIDENT_MAX_ENTRIES = 64 * 1024


def fits_resident(e_pad: int) -> bool:
    return e_pad <= RESIDENT_MAX_ENTRIES


def _res_fwd_kernel(tiles_x: int, chunk: int, tps: int):
    # resident kernels serve only the unsharded, uncompacted case: the
    # grid position IS the global tile id (no tile map indirection)
    def kernel(start_ref, count_ref, packed_ref, out_ref):
        step = pl.program_id(0)
        u_prefix, _ = _tri_masks(chunk)
        i0 = step * tps

        # batched fast path: all tiles of the step inside ONE shared
        # window -> a single (tps*PX, chunk) blend serves them all
        firsts = []
        ks = []
        for t_off in range(tps):
            f_t, k_t = _window_bounds(
                start_ref[i0 + t_off], count_ref[i0 + t_off], chunk
            )
            firsts.append(f_t)
            ks.append(k_t)
        f_ref = firsts[0]
        any_entries = ks[0] > 0
        for t_off in range(1, tps):
            f_ref = jnp.where(any_entries, f_ref, firsts[t_off])
            any_entries = jnp.logical_or(any_entries, ks[t_off] > 0)
        batchable = jnp.logical_and(jnp.bool_(tps > 1), any_entries)
        for t_off in range(tps):
            batchable = jnp.logical_and(batchable, ks[t_off] <= 1)
            batchable = jnp.logical_and(
                batchable,
                jnp.logical_or(ks[t_off] == 0, firsts[t_off] == f_ref),
            )

        @pl.when(batchable)
        def _():
            off = pl.multiple_of(f_ref * chunk, chunk)
            data = packed_ref[:, pl.ds(off, chunk)]
            px, py, tile_f = _pixel_coords_batch(
                [i0 + t for t in range(tps)], tiles_x
            )
            bpx = tps * PX
            ones_b = jnp.ones((bpx, 1), jnp.float32)
            acc0_b = jnp.zeros((bpx, 8), jnp.float32)
            t_un, t_fr, acc, s_total = _fwd_window(
                data, px, py, tile_f, u_prefix, ones_b, acc0_b, chunk
            )
            row = jax.lax.broadcasted_iota(jnp.int32, (bpx, 1), 0)
            t_of_row = row // PX
            c_end_col = jnp.zeros((bpx, 1), jnp.float32)
            for t_off in range(tps):
                c_end_col = jnp.where(
                    jnp.logical_and(t_of_row == t_off, ks[t_off] > 0),
                    1.0, c_end_col,
                )
            out = jnp.concatenate(
                [acc[:, 0:4], t_fr, c_end_col, s_total,
                 jnp.zeros((bpx, 1), jnp.float32)],
                axis=1,
            )
            out_ref[...] = out.reshape(tps, PX, 8).transpose(0, 2, 1)

        @pl.when(jnp.logical_not(batchable))
        def _():
            for t_off in range(tps):  # static unroll
                i = i0 + t_off
                first, k = _window_bounds(
                    start_ref[i], count_ref[i], chunk
                )
                px, py = _pixel_coords(i, tiles_x)
                tile_f = jnp.int32(i).astype(jnp.float32)
                ones = jnp.ones((PX, 1), jnp.float32)

                def body(state, first=first, px=px, py=py, tile_f=tile_f):
                    c, t_un, t_fr, acc, log_t = state
                    off = pl.multiple_of((first + c) * chunk, chunk)
                    data = packed_ref[:, pl.ds(off, chunk)]
                    t_un, w_fr, acc, s_total = _fwd_window(
                        data, px, py, tile_f, u_prefix, t_un, acc, chunk
                    )
                    return (
                        c + 1, t_un, jnp.minimum(t_fr, w_fr), acc,
                        log_t + s_total,
                    )

                def cond(state, k=k):
                    c, t_un, *_ = state
                    return jnp.logical_and(
                        c < k, jnp.max(t_un) >= TRANSMITTANCE_MIN
                    )

                zeros1 = jnp.zeros((PX, 1), jnp.float32)
                c_end, t_un, t_fr, acc, log_t = jax.lax.while_loop(
                    cond, body,
                    (jnp.int32(0), ones, ones,
                     jnp.zeros((PX, 8), jnp.float32), zeros1),
                )
                c_end_col = jnp.broadcast_to(
                    c_end.astype(jnp.float32), (PX, 1)
                )
                out = jnp.concatenate(
                    [acc[:, 0:4], t_fr, c_end_col, log_t,
                     jnp.zeros((PX, 1), jnp.float32)],
                    axis=1,
                )
                out_ref[t_off] = out.T

    return kernel


def _res_bwd_kernel(tiles_x: int, chunk: int, tps: int):
    """Backward with an in-place resident gradient accumulator.

    dpacked lives as a full-array VMEM output block: zeroed on step 0,
    windows accumulate with += in any order, one write-back at the end.
    No monotone schedule, no flush DMAs, no aliased-zeros input.
    """

    def kernel(start_ref, count_ref, cend_ref, packed_ref,
               g_ref, fwd_ref, dpacked_ref):
        step = pl.program_id(0)
        u_prefix, l_suffix = _tri_masks(chunk)
        basis = _moment_basis()

        @pl.when(step == 0)
        def _():
            dpacked_ref[...] = jnp.zeros(
                dpacked_ref.shape, dpacked_ref.dtype
            )

        i0 = step * tps
        firsts = []
        ks = []
        for t_off in range(tps):
            f_t, k_t = _window_bounds(
                start_ref[i0 + t_off], count_ref[i0 + t_off], chunk
            )
            firsts.append(f_t)
            ks.append(jnp.minimum(k_t, cend_ref[i0 + t_off]))
        f_ref = firsts[0]
        any_entries = ks[0] > 0
        for t_off in range(1, tps):
            f_ref = jnp.where(any_entries, f_ref, firsts[t_off])
            any_entries = jnp.logical_or(any_entries, ks[t_off] > 0)
        batchable = jnp.logical_and(jnp.bool_(tps > 1), any_entries)
        for t_off in range(tps):
            batchable = jnp.logical_and(batchable, ks[t_off] <= 1)
            batchable = jnp.logical_and(
                batchable,
                jnp.logical_or(ks[t_off] == 0, firsts[t_off] == f_ref),
            )

        @pl.when(batchable)
        def _():
            off = pl.multiple_of(f_ref * chunk, chunk)
            data = packed_ref[:, pl.ds(off, chunk)]
            px, py, tile_f = _pixel_coords_batch(
                [i0 + t for t in range(tps)], tiles_x
            )
            bpx = tps * PX
            g8_b = g_ref[...].transpose(0, 2, 1).reshape(bpx, 8)
            fwd8_b = fwd_ref[...].transpose(0, 2, 1).reshape(bpx, 8)
            gt_final_b = g8_b[:, 4:5] * fwd8_b[:, 4:5]
            log_seed_b = fwd8_b[:, 6:7]
            basis_b = jnp.concatenate([basis] * tps, axis=0)
            dout, _, _ = _bwd_window_grads(
                data, px, py, tile_f, tiles_x, g8_b, gt_final_b,
                log_seed_b, jnp.zeros((bpx, 1), jnp.float32),
                u_prefix, l_suffix, basis_b, chunk,
            )
            dpacked_ref[:, pl.ds(off, chunk)] = (
                dpacked_ref[:, pl.ds(off, chunk)] + dout
            )

        @pl.when(jnp.logical_not(batchable))
        def _():
            for t_off in range(tps):  # static unroll
                i = i0 + t_off
                first, k0 = _window_bounds(
                    start_ref[i], count_ref[i], chunk
                )
                k = jnp.minimum(k0, cend_ref[i])
                px, py = _pixel_coords(i, tiles_x)
                tile_f = jnp.int32(i).astype(jnp.float32)
                g8 = g_ref[t_off].T  # (PX, 8)
                fwd8 = fwd_ref[t_off].T
                gt_final = g8[:, 4:5] * fwd8[:, 4:5]
                log_seed = fwd8[:, 6:7]

                def rbody(j, carry, first=first, k=k, px=px, py=py,
                          tile_f=tile_f, g8=g8, gt_final=gt_final):
                    suf, log_t_out = carry
                    c = k - 1 - j
                    off = pl.multiple_of((first + c) * chunk, chunk)
                    data = packed_ref[:, pl.ds(off, chunk)]
                    dout, suf, log_t_in = _bwd_window_grads(
                        data, px, py, tile_f, tiles_x, g8, gt_final,
                        log_t_out, suf, u_prefix, l_suffix, basis, chunk,
                    )
                    dpacked_ref[:, pl.ds(off, chunk)] = (
                        dpacked_ref[:, pl.ds(off, chunk)] + dout
                    )
                    return (suf, log_t_in)

                suf0 = jnp.zeros((PX, 1), jnp.float32)
                jax.lax.fori_loop(0, k, rbody, (suf0, log_seed))

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("tiles_x", "tiles_y", "chunk", "interpret", "tps"),
)
def blend_fwd_resident(
    packed, tile_start, tile_count, tiles_x, tiles_y, chunk,
    interpret=False, tps=4,
):
    t = tiles_x * tiles_y
    pad_t = -(-t // tps) * tps
    if pad_t != t:
        tile_start = jnp.concatenate(
            [tile_start, jnp.zeros(pad_t - t, jnp.int32)]
        )
        tile_count = jnp.concatenate(
            [tile_count, jnp.zeros(pad_t - t, jnp.int32)]
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(pad_t // tps,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (tps, 8, PX), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        _res_fwd_kernel(tiles_x, chunk, tps),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((pad_t, 8, PX), jnp.float32),
        interpret=interpret,
    )(tile_start, tile_count, packed)
    return out[:t]


@functools.partial(
    jax.jit,
    static_argnames=("tiles_x", "tiles_y", "chunk", "interpret", "tps"),
)
def blend_bwd_resident(
    packed, tile_start, tile_count, fwd_out, g_out, tiles_x, tiles_y,
    chunk, interpret=False, tps=4,
):
    t = tiles_x * tiles_y
    e_pad = packed.shape[1]
    pad_t = -(-t // tps) * tps
    cend = fwd_out[:, 5, 0].astype(jnp.int32)
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
    blk = pl.BlockSpec(
        (tps, 8, PX), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(pad_t // tps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            blk,
            blk,
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _res_bwd_kernel(tiles_x, chunk, tps),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((PACK_FIELDS, e_pad), jnp.float32),
        interpret=interpret,
    )(tile_start, tile_count, cend, packed, g_out, fwd_out)
