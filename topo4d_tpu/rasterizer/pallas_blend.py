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
  early-termination window count (out row 5) and final LOG transmittance
  carry (out row 6, a sum of log1p terms) as residuals, and the reverse
  sweep reconstructs each window's transmittance in log space —
  t_excl = exp(log_t_in + s_excl) with log_t_in = log_t_out − s_total —
  the same back-to-front reconstruction the reference CUDA backward does
  per entry (T /= (1−alpha), diff-gaussian-rasterization backward.cu),
  but with exact log sums instead of divisions, so saturated windows
  underflow to the correct 0 rather than dividing 0/0. No forward
  resweep, and windows past the termination point (whose gradients are
  identically zero) are skipped;
- monotone window schedule: entries are sorted by (tile, depth), so when
  tiles are processed in ascending order (forward) the global 128-entry
  window index never decreases, and in DESCENDING order (backward, whose
  per-tile sweep is back-to-front) it never increases. Two consequences,
  both exploited via scratch state that persists across grid steps:
    * a one-window VMEM cache: a boundary window shared by ~5 adjacent
      tiles (geometry scale: ~23 entries/tile) is DMA'd once, not 5x;
    * the backward accumulates each window's entry gradients in a VMEM
      register and flushes it to HBM EXACTLY ONCE when the schedule moves
      past it — no read-modify-write chains, no gradient read DMAs at
      all. Unvisited windows stay zero via input/output aliasing. Foreign
      (masked) entry columns produce exactly-zero gradient blocks, so the
      shared accumulator reproduces the per-tile RMW sum bit-for-bit up
      to f32 addition order.
  The grid stays sequential ("arbitrary" dimension semantics) — the
  schedule is the correctness argument.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from topo4d_tpu.core.gaussian import ALPHA_MAX, ALPHA_MIN, TRANSMITTANCE_MIN
from topo4d_tpu.rasterizer.tiles import PACK_CHUNK, PACK_FIELDS, TILE

PX = TILE * TILE  # 256 pixels per tile

# ---------------------------------------------------------------------------
# Per-site MXU precision for the blend dots (r5; VERDICT r4 item 3).
#
# r4 pinned all seven dot sites to Precision.HIGHEST (6 bf16 passes per
# dot) after the on-TPU numerics gate caught ~5.5e-3 pixel drift at the
# DEFAULT single bf16 pass — correct, but it regressed every headline
# number (BENCH_r04). Not every site needs 6 passes:
#
# - MASK sites contract against an operand that is EXACTLY representable
#   in bf16: the 0/1 triangular prefix/suffix masks, and the pixel-moment
#   basis (integers <= 256, within bf16's 8 significand bits). Splitting
#   only the generic operand into bf16-exact addends (split2 ~ 16
#   significand bits, split3 ~ full f32) makes each pass exact up to the
#   f32 accumulator, so split3 reaches f32 accuracy in 3 single passes
#   and split2 reaches ~2^-16 relative in 2.
# - GEN sites have two generic f32 operands: "gsplit3" (the manual
#   bf16x3 — Mosaic does not lower Precision.HIGH inside Pallas
#   kernels) carries ~2^-16 relative error — ~30x under the numerics
#   gate's TOL_PIX=5e-4 / TOL_GRAD=5e-3.
#
# Production config below; TOPO4D_BLEND_PREC="<mask>,<gen>" overrides for
# measurement probes (scripts/probe_blend_prec_r5.py) — per-config error
# and timing on the real chip decide the shipped values.
# ---------------------------------------------------------------------------
_PREC_ENUM = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}
# Shipped config split2,gsplit3: measured on the v5e at geometry scale
# (scripts/probe_blend_prec_r5.py, r5) its pallas-vs-tiled(HIGHEST)
# error is indistinguishable from all-HIGHEST (pix max 8.3e-5 vs
# 8.3e-5, grad p99.9 1.6e-4 vs 1.6e-4 — both at the non-matmul noise
# floor) while blend fwd+bwd runs 1.365 ms vs HIGHEST's 1.535
# (DEFAULT: 1.156 ms but 4.8e-3 pixel error — the r4 gate catch).
_prec_env = os.environ.get("TOPO4D_BLEND_PREC", "split2,gsplit3").split(",")
MASK_DOT_MODE = _prec_env[0].strip()
GEN_DOT_MODE = (_prec_env[1] if len(_prec_env) > 1 else _prec_env[0]).strip()
_SPLIT_PARTS = {"split2": 2, "split3": 3, "gsplit3": 3}


def _split_f32(x, parts: int):
    """Split f32 ``x`` into ``parts`` bf16-exact f32 addends.

    parts=2 carries ~16 significand bits of x, parts=3 ~ full f32 (the
    final residual still rounds to bf16 inside the dot, at 2^-(8*parts)
    relative — below f32 for parts >= 3).
    """
    hs = []
    r = x
    for _ in range(parts - 1):
        h = r.astype(jnp.bfloat16).astype(jnp.float32)
        hs.append(h)
        r = r - h
    hs.append(r)
    return hs


def split_dot(a, b, dimension_numbers, exact, parts):
    """Split-decomposed dot: single-pass bf16 dots summed in f32.

    With an ``exact`` operand ('lhs'/'rhs' — the 0/1 masks or the
    integer moment basis, exactly bf16-representable): only the OTHER
    operand is decomposed into ``parts`` bf16-exact addends — every
    pass is then exact up to the f32 accumulator; parts=3 carries ~f32
    accuracy, parts=2 ~2^-16.

    With ``exact=None`` (two generic operands): both operands split
    into (hi, lo) and the three significant cross products are summed
    (a_hi*b_hi + a_hi*b_lo + a_lo*b_hi), ~2^-16 relative — the manual
    equivalent of Precision.HIGH (bf16x3), which Mosaic does NOT lower
    inside Pallas kernels (NotImplementedError: Unsupported dot
    precision: HIGH — measured r5). ``parts`` is ignored here.
    """

    def d(x16, y16):
        return jax.lax.dot_general(
            x16, y16, dimension_numbers,
            preferred_element_type=jnp.float32,
        )

    if exact == "rhs":
        b16 = b.astype(jnp.bfloat16)
        terms = [d(ap.astype(jnp.bfloat16), b16)
                 for ap in _split_f32(a, parts)]
    elif exact == "lhs":
        a16 = a.astype(jnp.bfloat16)
        terms = [d(a16, bp.astype(jnp.bfloat16))
                 for bp in _split_f32(b, parts)]
    else:
        a_hi, a_lo = _split_f32(a, 2)
        b_hi, b_lo = _split_f32(b, 2)
        a_hi16, a_lo16 = a_hi.astype(jnp.bfloat16), a_lo.astype(jnp.bfloat16)
        b_hi16, b_lo16 = b_hi.astype(jnp.bfloat16), b_lo.astype(jnp.bfloat16)
        terms = [d(a_hi16, b_hi16), d(a_hi16, b_lo16), d(a_lo16, b_hi16)]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def _site_dot(a, b, dimension_numbers, exact=None):
    """One blend dot site at the configured per-site precision.

    ``exact``: which operand is exactly bf16-representable (None = both
    generic). Mask sites run MASK_DOT_MODE (split2/split3 decompose the
    OTHER operand via ``split_dot``); generic sites run GEN_DOT_MODE.

    On CPU (tests / interpret mode) precision enums are already exact
    f32 and free, while the split's explicit bf16 casts would ADD real
    rounding — and the hazard they work around (Mosaic lowering f32
    dots to one bf16 pass) does not exist there — so split modes
    resolve to HIGHEST off-TPU. ``split_dot`` itself is covered by a
    dedicated accuracy test (tests/test_rasterizer_pallas.py).
    """
    mode = GEN_DOT_MODE if exact is None else MASK_DOT_MODE
    if mode not in _PREC_ENUM and jax.devices()[0].platform != "tpu":
        mode = "highest"
    if mode in _PREC_ENUM:
        # NB Mosaic only lowers DEFAULT and HIGHEST inside Pallas
        # kernels; "high" on TPU fails at lowering (use gsplit3)
        return jax.lax.dot_general(
            a, b, dimension_numbers,
            preferred_element_type=jnp.float32,
            precision=_PREC_ENUM[mode],
        )
    return split_dot(a, b, dimension_numbers, exact, _SPLIT_PARTS[mode])


_DN_PLAIN = (((1,), (0,)), ((), ()))  # jax.lax.dot(a, b)


def _pixel_coords(tile_idx, tiles_x: int):
    """Pixel-center coordinates of tile ``tile_idx`` -> two (PX, 1) f32."""
    row = jax.lax.broadcasted_iota(jnp.int32, (PX, 1), 0)
    tx = tile_idx % tiles_x
    ty = tile_idx // tiles_x
    px = (tx * TILE + row % TILE).astype(jnp.float32)
    py = (ty * TILE + row // TILE).astype(jnp.float32)
    return px, py


def _pixel_coords_batch(tids, tiles_x: int):
    """Coordinates of an explicit list of tile ids stacked on sublanes.

    Returns (px, py, tile_f), each (len(tids)*PX, 1): rows
    [t*PX, (t+1)*PX) belong to tile ``tids[t]`` (traced scalars from the
    prefetched tile map — ids need not be contiguous under compaction).
    One MXU matmul serves all the listed tiles.
    """
    tps = len(tids)
    row = jax.lax.broadcasted_iota(jnp.int32, (tps * PX, 1), 0)
    t_of_row = row // PX
    tile_idx = jnp.zeros((tps * PX, 1), jnp.int32)
    for t_off, tid in enumerate(tids):
        tile_idx = jnp.where(t_of_row == t_off, tid, tile_idx)
    p = row % PX
    tx = tile_idx % tiles_x
    ty = tile_idx // tiles_x
    px = (tx * TILE + p % TILE).astype(jnp.float32)
    py = (ty * TILE + p // TILE).astype(jnp.float32)
    return px, py, tile_idx.astype(jnp.float32)


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
    # empty tiles (count=0, unaligned start) must not claim a window
    return first, jnp.where(count > 0, last - first, 0)


def _fwd_window(data, px, py, tile_f, u_prefix, t_un, acc, chunk):
    """One forward window: blend ``data`` into (t_un, t_fr_min, acc).

    Returns (t_un_out, window_t_fr, acc_out, s_total) where window_t_fr
    is the min surviving inclusive transmittance of this window (1 where
    none) and s_total = Σ log1p(-alpha) over the window — the log-space
    transmittance delta the backward reconstructs from (exactly; sums of
    logs never underflow the way the raw product does).
    """
    alpha, _, _, _, _ = _chunk_terms(data, px, py, tile_f)
    log1m = jnp.log1p(-alpha)
    s_excl = _site_dot(
        log1m, u_prefix, _DN_PLAIN, exact="rhs"
    )  # (PX, chunk) exclusive prefix along entries
    s_total = s_excl[:, chunk - 1 : chunk] + log1m[:, chunk - 1 : chunk]
    t_excl_l = jnp.exp(s_excl)
    t_incl_l = t_excl_l * (1.0 - alpha)
    t_excl = t_un * t_excl_l
    t_incl = t_un * t_incl_l
    keep2 = t_incl >= TRANSMITTANCE_MIN
    w = alpha * t_excl * jnp.where(keep2, 1.0, 0.0)  # (PX, chunk)
    feat = data[8:16, :]  # (8, chunk)
    acc = acc + _site_dot(
        w, feat, (((1,), (1,)), ((), ()))
    )  # (PX, 8)
    t_un_out = t_incl[:, chunk - 1 : chunk]
    t_fr = jnp.min(
        jnp.where(keep2, t_incl, 1.0), axis=1, keepdims=True
    )
    return t_un_out, t_fr, acc, s_total


def _fwd_kernel(tiles_x: int, chunk: int, tiles_per_step: int):
    def kernel(tmap_ref, start_ref, count_ref, packed_hbm, out_ref, buf,
               scal, sem):
        step = pl.program_id(0)
        u_prefix, _ = _tri_masks(chunk)

        # window cache: scal[0] = global window index of the data sitting
        # in buf[scal[1]] (DMA completed), -1 = empty. Persists across
        # grid steps (sequential grid).
        @pl.when(step == 0)
        def _():
            scal[0] = -1
            scal[1] = 0

        # tmap_ref maps grid position -> GLOBAL tile id: identity for a
        # plain render, offset arange for a sharded tile slice, or a
        # compacted non-empty-tile list (must be ascending — the window
        # cache/monotone schedule rides on it)
        # batched fast path: at geometry scale (~23 entries/tile vs the
        # 128-entry window) all tiles of a step often fit ONE shared
        # window — then a single (tps*PX, chunk) matmul serves them all
        i0 = step * tiles_per_step
        firsts = []
        ks = []
        for t_off in range(tiles_per_step):
            f_t, k_t = _window_bounds(
                start_ref[i0 + t_off], count_ref[i0 + t_off], chunk
            )
            firsts.append(f_t)
            ks.append(k_t)
        # reference window = the first nonempty tile's window; empty tiles
        # (k==0) join the batch harmlessly (all entries foreign -> masked
        # to the default empty output)
        f_ref = firsts[0]
        any_entries = ks[0] > 0
        for t_off in range(1, tiles_per_step):
            f_ref = jnp.where(any_entries, f_ref, firsts[t_off])
            any_entries = jnp.logical_or(any_entries, ks[t_off] > 0)
        batchable = jnp.logical_and(
            jnp.bool_(tiles_per_step > 1), any_entries
        )
        for t_off in range(tiles_per_step):
            batchable = jnp.logical_and(batchable, ks[t_off] <= 1)
            batchable = jnp.logical_and(
                batchable,
                jnp.logical_or(ks[t_off] == 0, firsts[t_off] == f_ref),
            )

        @pl.when(batchable)
        def _():
            first = f_ref
            hit = scal[0] == first
            slot = jnp.where(hit, scal[1], 0)

            def dma(slot=slot, first=first):
                off = pl.multiple_of(first * chunk, chunk)
                return pltpu.make_async_copy(
                    packed_hbm.at[:, pl.ds(off, chunk)],
                    buf.at[slot],
                    sem.at[slot],
                )

            @pl.when(jnp.logical_not(hit))
            def _():
                dma().start()
                dma().wait()
            px, py, tile_f = _pixel_coords_batch(
                [tmap_ref[i0 + t] for t in range(tiles_per_step)], tiles_x
            )
            bpx = tiles_per_step * PX
            ones_b = jnp.ones((bpx, 1), jnp.float32)
            acc0_b = jnp.zeros((bpx, 8), jnp.float32)
            t_un, t_fr, acc, s_total = _fwd_window(
                buf[slot], px, py, tile_f, u_prefix, ones_b, acc0_b, chunk
            )
            # per-tile window count residual: 1 for tiles with entries
            row = jax.lax.broadcasted_iota(jnp.int32, (bpx, 1), 0)
            t_of_row = row // PX
            c_end_col = jnp.zeros((bpx, 1), jnp.float32)
            for t_off in range(tiles_per_step):
                c_end_col = jnp.where(
                    jnp.logical_and(t_of_row == t_off, ks[t_off] > 0),
                    1.0, c_end_col,
                )
            out = jnp.concatenate(
                [acc[:, 0:4], t_fr, c_end_col, s_total,
                 jnp.zeros((bpx, 1), jnp.float32)],
                axis=1,
            )  # (tps*PX, 8)
            out_ref[...] = out.reshape(
                tiles_per_step, PX, 8
            ).transpose(0, 2, 1)
            scal[0] = first
            scal[1] = slot

        @pl.when(jnp.logical_not(batchable))
        def _():
            _fwd_general(
                step, tmap_ref, start_ref, count_ref, packed_hbm,
                out_ref, buf, scal, sem, tiles_x, chunk, tiles_per_step,
                u_prefix,
            )

    return kernel


def _fwd_general(
    step, tmap_ref, start_ref, count_ref, packed_hbm, out_ref, buf, scal,
    sem, tiles_x, chunk, tiles_per_step, u_prefix,
):
    """Per-tile forward path (multi-window tiles, mixed windows)."""
    for t_off in range(tiles_per_step):  # static unroll
        i = step * tiles_per_step + t_off
        first, k = _window_bounds(start_ref[i], count_ref[i], chunk)
        tid = tmap_ref[i]
        px, py = _pixel_coords(tid, tiles_x)
        tile_f = tid.astype(jnp.float32)
        # ascending tiles => ascending first; a hit means the previous
        # tile's last-loaded window IS this tile's first window
        hit = jnp.logical_and(k > 0, scal[0] == first)
        base = jnp.where(hit, scal[1], 0)

        def get_dma(slot, c, first=first):
            off = pl.multiple_of((first + c) * chunk, chunk)
            return pltpu.make_async_copy(
                packed_hbm.at[:, pl.ds(off, chunk)],
                buf.at[slot],
                sem.at[slot],
            )

        @pl.when(jnp.logical_and(k > 0, jnp.logical_not(hit)))
        def _():
            get_dma(base, 0).start()

        ones = jnp.ones((PX, 1), jnp.float32)
        acc0 = jnp.zeros((PX, 8), jnp.float32)

        # fast path: at geometry scale most tiles fit one window —
        # no prefetch, no while-loop state machine, no drain
        @pl.when(k == 1)
        def _(px=px, py=py, tile_f=tile_f, get_dma=get_dma, hit=hit,
              base=base, first=first):
            @pl.when(jnp.logical_not(hit))
            def _():
                get_dma(base, 0).wait()
            t_un, t_fr, acc, s_total = _fwd_window(
                buf[base], px, py, tile_f, u_prefix, ones, acc0, chunk
            )
            out = jnp.concatenate(
                [acc[:, 0:4], t_fr, ones, s_total,
                 jnp.zeros((PX, 1), jnp.float32)],
                axis=1,
            )
            out_ref[t_off] = out.T
            scal[0] = first
            scal[1] = base

        @pl.when(k != 1)
        def _(k=k, px=px, py=py, tile_f=tile_f, get_dma=get_dma,
              hit=hit, base=base, first=first):
            def cond(state):
                c, t_un, t_fr, acc, log_t = state
                return jnp.logical_and(
                    c < k, jnp.max(t_un) >= TRANSMITTANCE_MIN
                )

            def body(state):
                c, t_un, t_fr, acc, log_t = state
                slot = jax.lax.rem(c + base, 2)

                @pl.when(c + 1 < k)
                def _():
                    get_dma(1 - slot, c + 1).start()

                # cache hit: window 0's DMA was waited by a previous
                # tile
                @pl.when(jnp.logical_or(c > 0, jnp.logical_not(hit)))
                def _():
                    get_dma(slot, c).wait()
                t_un, w_fr, acc, s_total = _fwd_window(
                    buf[slot], px, py, tile_f, u_prefix, t_un, acc,
                    chunk,
                )
                return (
                    c + 1, t_un, jnp.minimum(t_fr, w_fr), acc,
                    log_t + s_total,
                )

            zeros1 = jnp.zeros((PX, 1), jnp.float32)
            c_end, t_un, t_fr, acc, log_t = jax.lax.while_loop(
                cond, body, (jnp.int32(0), ones, ones, acc0, zeros1)
            )

            # early termination leaves one prefetched DMA in flight —
            # drain it (scratch/semaphores persist across grid steps)
            @pl.when(jnp.logical_and(c_end < k, c_end > 0))
            def _():
                get_dma(jax.lax.rem(c_end + base, 2), c_end).wait()

            # record the last window whose DMA completed (the drained
            # prefetch, or the last processed window) for the next tile
            @pl.when(k > 0)
            def _():
                last_c = jnp.where(c_end < k, c_end, k - 1)
                scal[0] = first + last_c
                scal[1] = jax.lax.rem(last_c + base, 2)

            # rows 5/6 carry backward residuals: the number of windows
            # the forward actually processed (early termination) and
            # the LOG-SPACE final transmittance carry (the reverse
            # sweep reconstructs per-window T by exact log sums)
            c_end_col = jnp.broadcast_to(
                c_end.astype(jnp.float32), (PX, 1)
            )
            out = jnp.concatenate(
                [acc[:, 0:4], t_fr, c_end_col, log_t,
                 jnp.zeros((PX, 1), jnp.float32)],
                axis=1,
            )
            # transpose to (8, PX): a (T, PX, 8) output buffer gets its
            # minor dim padded to 128 lanes by XLA in the backward
            # epilogue (16x memory, OOM at 4K); (T, 8, PX) lays clean
            out_ref[t_off] = out.T



def _fwd_kernel_v3(tiles_x: int, chunk: int, tiles_per_step: int):
    """Unified window-span forward: one batched loop per grid step.

    v1 walks each tile's windows in its own while-loop (a serial
    dependency chain per tile; the batched fast path only fires when all
    tiles share ONE window). Measured on the v5e the kernel is
    LATENCY-bound on those serial iterations — cutting VPU cells 4x (the
    v2 sublane kernel) made it slower, widening tiles_per_step didn't
    help, DMA and grid-step overhead were already ruled out
    (docs/PERFORMANCE.md). v3 therefore walks the UNION of the step's
    tile windows once, with all tiles' pixel rows batched into every
    window visit: rows of tiles without entries in the visited window
    no-op exactly (foreign-entry masking -> alpha 0 -> log1m 0), so the
    math is identical to v1 while the serial chain shrinks ~3x (span of
    ~23-entry tiles ~ 1-2 windows vs 4 per-tile walks).

    Early termination is COLLECTIVE (all rows' transmittance below the
    CUDA 1e-4 threshold). The per-tile window-count residual (out row 5)
    becomes clamp(w_stop - first_t, 0, k_t): every window the step
    processed counts as processed for every tile it spans, which keeps
    the log-transmittance residual and the backward's per-tile window
    limit mutually consistent (windows a tile "rode along" for
    contribute exactly zero to both).
    """

    def kernel(tmap_ref, start_ref, count_ref, packed_hbm, out_ref, buf,
               scal, sem):
        step = pl.program_id(0)
        u_prefix, _ = _tri_masks(chunk)

        @pl.when(step == 0)
        def _():
            scal[0] = -1
            scal[1] = 0

        i0 = step * tiles_per_step
        firsts = []
        lasts = []
        ks = []
        for t_off in range(tiles_per_step):
            f_t, k_t = _window_bounds(
                start_ref[i0 + t_off], count_ref[i0 + t_off], chunk
            )
            firsts.append(f_t)
            lasts.append(f_t + k_t)
            ks.append(k_t)
        # union span over non-empty tiles
        big = jnp.int32(2**30)
        w_lo = big
        w_hi = jnp.int32(0)
        for t_off in range(tiles_per_step):
            ne = ks[t_off] > 0
            w_lo = jnp.where(ne, jnp.minimum(w_lo, firsts[t_off]), w_lo)
            w_hi = jnp.where(ne, jnp.maximum(w_hi, lasts[t_off]), w_hi)
        span = jnp.maximum(w_hi - jnp.minimum(w_lo, w_hi), 0)

        px, py, tile_f = _pixel_coords_batch(
            [tmap_ref[i0 + t] for t in range(tiles_per_step)], tiles_x
        )
        bpx = tiles_per_step * PX

        hit = jnp.logical_and(span > 0, scal[0] == w_lo)
        base = jnp.where(hit, scal[1], 0)

        def get_dma(slot, c):
            off = pl.multiple_of((w_lo + c) * chunk, chunk)
            return pltpu.make_async_copy(
                packed_hbm.at[:, pl.ds(off, chunk)],
                buf.at[slot],
                sem.at[slot],
            )

        @pl.when(jnp.logical_and(span > 0, jnp.logical_not(hit)))
        def _():
            get_dma(base, 0).start()

        ones = jnp.ones((bpx, 1), jnp.float32)
        acc0 = jnp.zeros((bpx, 8), jnp.float32)
        zeros1 = jnp.zeros((bpx, 1), jnp.float32)

        def cond(state):
            c, t_un, t_fr, acc, log_t = state
            return jnp.logical_and(
                c < span, jnp.max(t_un) >= TRANSMITTANCE_MIN
            )

        def body(state):
            c, t_un, t_fr, acc, log_t = state
            slot = jax.lax.rem(c + base, 2)

            @pl.when(c + 1 < span)
            def _():
                get_dma(1 - slot, c + 1).start()

            @pl.when(jnp.logical_or(c > 0, jnp.logical_not(hit)))
            def _():
                get_dma(slot, c).wait()
            t_un, w_fr, acc, s_total = _fwd_window(
                buf[slot], px, py, tile_f, u_prefix, t_un, acc, chunk
            )
            return (
                c + 1, t_un, jnp.minimum(t_fr, w_fr), acc,
                log_t + s_total,
            )

        c_end, t_un, t_fr, acc, log_t = jax.lax.while_loop(
            cond, body, (jnp.int32(0), ones, ones, acc0, zeros1)
        )

        # drain the in-flight prefetch left by early termination
        @pl.when(jnp.logical_and(c_end < span, c_end > 0))
        def _():
            get_dma(jax.lax.rem(c_end + base, 2), c_end).wait()

        @pl.when(span > 0)
        def _():
            last_c = jnp.where(c_end < span, c_end, span - 1)
            scal[0] = w_lo + last_c
            scal[1] = jax.lax.rem(last_c + base, 2)

        # per-tile processed-window residual (see docstring)
        w_stop = w_lo + c_end
        row = jax.lax.broadcasted_iota(jnp.int32, (bpx, 1), 0)
        t_of_row = row // PX
        c_end_col = jnp.zeros((bpx, 1), jnp.float32)
        for t_off in range(tiles_per_step):
            ct = jnp.clip(w_stop - firsts[t_off], 0, ks[t_off])
            c_end_col = jnp.where(
                t_of_row == t_off, ct.astype(jnp.float32), c_end_col
            )
        out = jnp.concatenate(
            [acc[:, 0:4], t_fr, c_end_col, log_t, zeros1], axis=1
        )  # (bpx, 8)
        out_ref[...] = out.reshape(
            tiles_per_step, PX, 8
        ).transpose(0, 2, 1)

    return kernel


def _bwd_kernel_v3(tiles_x: int, chunk: int, tiles_per_step: int):
    """Unified window-span backward: tiles descending, batched rows.

    Mirrors _fwd_kernel_v3: one reverse window loop per grid step over
    the union of the step's per-tile processed spans (first_t .. first_t
    + min(k_t, cend_t)), all tiles' rows batched into each visit via the
    per-entry tile origins of _bwd_window_grads. The forward's collective
    termination guarantees every visited window is, for each tile, either
    inside its processed range or past its entries entirely — so no row
    masking is needed beyond the existing foreign-entry tile match.
    Gradient accumulation/flush (one HBM write per window) is unchanged.
    """

    def kernel(
        tmap_ref, start_ref, count_ref, cend_ref, packed_hbm, g_ref,
        fwd_ref, zeros_hbm, dpacked_hbm, buf, accbuf, flushbuf, scal,
        sem, wsem,
    ):
        del zeros_hbm
        step = pl.program_id(0)
        nsteps = pl.num_programs(0)
        u_prefix, l_suffix = _tri_masks(chunk)
        basis = _moment_basis()

        @pl.when(step == 0)
        def _():
            scal[0] = -1
            scal[1] = 0
            scal[2] = -1
            scal[3] = 0
            scal[4] = 0

        def flush_dma(w):
            off = pl.multiple_of(w * chunk, chunk)
            return pltpu.make_async_copy(
                flushbuf,
                dpacked_hbm.at[:, pl.ds(off, chunk)],
                wsem,
            )

        def acc_window(dout, w_glob):
            switch = w_glob != scal[2]

            @pl.when(switch)
            def _():
                @pl.when(scal[3] == 1)
                def _():
                    flush_dma(scal[4]).wait()

                @pl.when(scal[2] >= 0)
                def _():
                    flushbuf[...] = accbuf[...]
                    flush_dma(scal[2]).start()
                    scal[4] = scal[2]
                    scal[3] = 1

                accbuf[...] = dout
                scal[2] = w_glob

            @pl.when(jnp.logical_not(switch))
            def _():
                accbuf[...] = accbuf[...] + dout

        i0 = (nsteps - 1 - step) * tiles_per_step
        firsts = []
        lasts = []
        for t_off in range(tiles_per_step):
            f_t, k_t = _window_bounds(
                start_ref[i0 + t_off], count_ref[i0 + t_off], chunk
            )
            k_t = jnp.minimum(k_t, cend_ref[i0 + t_off])
            firsts.append(f_t)
            lasts.append(f_t + k_t)
        big = jnp.int32(2**30)
        w_lo = big
        w_hi = jnp.int32(0)
        for t_off in range(tiles_per_step):
            ne = lasts[t_off] > firsts[t_off]
            w_lo = jnp.where(ne, jnp.minimum(w_lo, firsts[t_off]), w_lo)
            w_hi = jnp.where(ne, jnp.maximum(w_hi, lasts[t_off]), w_hi)
        span = jnp.maximum(w_hi - jnp.minimum(w_lo, w_hi), 0)

        px, py, tile_f = _pixel_coords_batch(
            [tmap_ref[i0 + t] for t in range(tiles_per_step)], tiles_x
        )
        bpx = tiles_per_step * PX
        g_all = g_ref[...]  # (tps, 8, PX)
        fwd_all = fwd_ref[...]
        g8_b = g_all.transpose(0, 2, 1).reshape(bpx, 8)
        fwd8_b = fwd_all.transpose(0, 2, 1).reshape(bpx, 8)
        gt_final = g8_b[:, 4:5] * fwd8_b[:, 4:5]
        log_seed = fwd8_b[:, 6:7]
        basis_b = jnp.concatenate([basis] * tiles_per_step, axis=0)

        # descending sweep: a hit means the previous step's last window
        # (its w_lo) IS this step's highest window
        hit = jnp.logical_and(span > 0, scal[0] == w_hi - 1)
        base = jnp.where(hit, scal[1], 0)

        def get_dma(slot, c):
            # c counts from the TOP: window w_hi - 1 - c
            off = pl.multiple_of((w_hi - 1 - c) * chunk, chunk)
            return pltpu.make_async_copy(
                packed_hbm.at[:, pl.ds(off, chunk)],
                buf.at[slot],
                sem.at[slot],
            )

        @pl.when(jnp.logical_and(span > 0, jnp.logical_not(hit)))
        def _():
            get_dma(base, 0).start()

        def rbody(j, carry):
            suf, log_t = carry
            slot = jax.lax.rem(j + base, 2)

            @pl.when(j + 1 < span)
            def _():
                get_dma(1 - slot, j + 1).start()

            @pl.when(jnp.logical_or(j > 0, jnp.logical_not(hit)))
            def _():
                get_dma(slot, j).wait()
            dout, suf, log_t = _bwd_window_grads(
                buf[slot], px, py, tile_f, tiles_x, g8_b, gt_final,
                log_t, suf, u_prefix, l_suffix, basis_b, chunk,
            )
            acc_window(dout, w_hi - 1 - j)
            return (suf, log_t)

        zeros1 = jnp.zeros((bpx, 1), jnp.float32)

        @pl.when(span > 0)
        def _():
            jax.lax.fori_loop(0, span, rbody, (zeros1, log_seed))
            scal[0] = w_lo
            scal[1] = jax.lax.rem(span - 1 + base, 2)

        @pl.when(step == nsteps - 1)
        def _():
            @pl.when(scal[3] == 1)
            def _():
                flush_dma(scal[4]).wait()

            @pl.when(scal[2] >= 0)
            def _():
                flushbuf[...] = accbuf[...]
                flush_dma(scal[2]).start()
                flush_dma(scal[2]).wait()

    return kernel


def _build_tile_map(
    tile_map, tile_offset, t, pad_t, tiles_x, tiles_y
):
    """Padded (pad_t,) grid-position -> global-tile-id map.

    Identity (+offset for a sharded slice) when no explicit map is given.
    Padding rows get the sentinel id tiles_x*tiles_y: it never matches a
    valid entry's tile field (invalid entries carry the same sentinel but
    zeroed fields -> alpha 0; pad columns carry -1) and scatter-drop
    discards it outside.
    """
    sent = jnp.int32(tiles_x * tiles_y)
    if tile_map is None:
        base = jnp.arange(pad_t, dtype=jnp.int32)
        if tile_offset is not None:
            base = base + tile_offset[0]
        return jnp.where(jnp.arange(pad_t) < t, base, sent)
    tmap = tile_map.astype(jnp.int32)
    if pad_t != t:
        tmap = jnp.concatenate(
            [tmap, jnp.full(pad_t - t, sent, jnp.int32)]
        )
    return tmap


@functools.partial(
    jax.jit,
    static_argnames=(
        "tiles_x", "tiles_y", "chunk", "interpret", "tps", "num_tiles",
        "variant",
    ),
)
def _blend_fwd_impl(
    packed, tile_start, tile_count, tiles_x, tiles_y, chunk, interpret=False,
    tps=None, tile_offset=None, num_tiles=None, variant="auto",
    tile_map=None,
):
    if (
        num_tiles is None and tile_map is None
        and variant not in ("stream", "v3")
    ):
        # small entry arrays: the DMA-free VMEM-resident kernel
        from topo4d_tpu.rasterizer.pallas_resident import (
            blend_fwd_resident,
            fits_resident,
        )

        if variant == "resident" or fits_resident(packed.shape[1]):
            return blend_fwd_resident(
                packed, tile_start, tile_count, tiles_x, tiles_y, chunk,
                interpret, tps or _tiles_per_step(tiles_x * tiles_y),
            )
    # sharded tile axis: tile_start/count are a LOCAL slice of num_tiles
    # tiles starting at global tile id tile_offset; compact mode:
    # tile_map lists the (ascending) global ids of the num_tiles rows
    t = num_tiles if num_tiles is not None else tiles_x * tiles_y
    tps = tps or _tiles_per_step(t)
    pad_t = -(-t // tps) * tps
    tmap = _build_tile_map(
        tile_map, tile_offset, t, pad_t, tiles_x, tiles_y
    )
    if pad_t != t:
        # pad tile metadata so the grid divides evenly (extra tiles empty)
        tile_start = jnp.concatenate(
            [tile_start, jnp.zeros(pad_t - t, jnp.int32)]
        )
        tile_count = jnp.concatenate(
            [tile_count, jnp.zeros(pad_t - t, jnp.int32)]
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(pad_t // tps,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (tps, 8, PX), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, PACK_FIELDS, chunk), jnp.float32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kfn = _fwd_kernel_v3 if variant == "v3" else _fwd_kernel
    out = pl.pallas_call(
        kfn(tiles_x, chunk, tps),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((pad_t, 8, PX), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),  # window cache is stateful
        ),
        interpret=interpret,
    )(tmap, tile_start, tile_count, packed)
    return out[:t]


TILES_PER_STEP = 4  # probed best on v5e (8/16 gain <5% and cost VMEM)


def _tiles_per_step(num_tiles: int) -> int:
    """Tiles per grid step: amortizes per-step overhead (~1-2 us each)."""
    for tps in (TILES_PER_STEP, 4, 2, 1):
        if num_tiles >= tps:
            return tps
    return 1


def _bwd_kernel(tiles_x: int, chunk: int, tiles_per_step: int):
    """Backward: single reverse sweep, tiles DESCENDING, one grad write
    per window.

    Transmittance is reconstructed back-to-front from the forward's saved
    final LOG carry (out row 6) by exact log-space sums, and only the windows
    the forward actually processed (out row 5) are visited. Descending
    tiles + the per-tile back-to-front sweep make the global window index
    monotone non-increasing, so a single VMEM accumulator (flushed to HBM
    when the schedule moves to a lower window) replaces per-tile
    read-modify-write chains. scal layout (SMEM, persists across steps):
      0: packed-cache window   1: packed-cache slot
      2: accumulator's window (-1 = empty)
      3: flush-in-flight flag  4: window of the in-flight flush
    """

    def kernel(
        tmap_ref, start_ref, count_ref, cend_ref, packed_hbm, g_ref,
        fwd_ref, zeros_hbm, dpacked_hbm, buf, accbuf, flushbuf, scal,
        sem, wsem,
    ):
        # dpacked is aliased to a zeros input: windows the schedule never
        # visits (entries past every tile's termination point, invalid-
        # tile tail entries) keep their zero gradient without a memset
        del zeros_hbm
        step = pl.program_id(0)
        nsteps = pl.num_programs(0)
        u_prefix, l_suffix = _tri_masks(chunk)
        basis = _moment_basis()

        @pl.when(step == 0)
        def _():
            scal[0] = -1
            scal[1] = 0
            scal[2] = -1
            scal[3] = 0
            scal[4] = 0

        def flush_dma(w):
            off = pl.multiple_of(w * chunk, chunk)
            return pltpu.make_async_copy(
                flushbuf,
                dpacked_hbm.at[:, pl.ds(off, chunk)],
                wsem,
            )

        def acc_window(dout, w_glob):
            # monotone schedule: same window -> accumulate in VMEM; lower
            # window -> flush the open one (exactly once per window) and
            # open this one. Foreign-entry columns of dout are exactly
            # zero, so accumulation across tiles sharing a window equals
            # the sum.
            switch = w_glob != scal[2]

            @pl.when(switch)
            def _():
                @pl.when(scal[3] == 1)
                def _():
                    flush_dma(scal[4]).wait()  # flushbuf free again

                @pl.when(scal[2] >= 0)
                def _():
                    flushbuf[...] = accbuf[...]
                    flush_dma(scal[2]).start()
                    scal[4] = scal[2]
                    scal[3] = 1

                accbuf[...] = dout
                scal[2] = w_glob

            @pl.when(jnp.logical_not(switch))
            def _():
                accbuf[...] = accbuf[...] + dout

        # batched fast path (mirror of the forward's): all tiles of this
        # block single-window on a shared window -> one batched gradient
        # computation, one accumulate. Per-entry tile origins inside
        # _bwd_window_grads make the contraction over all rows exact.
        i0 = (nsteps - 1 - step) * tiles_per_step
        firsts = []
        ks = []
        for t_off in range(tiles_per_step):
            f_t, k_t = _window_bounds(
                start_ref[i0 + t_off], count_ref[i0 + t_off], chunk
            )
            firsts.append(f_t)
            ks.append(jnp.minimum(k_t, cend_ref[i0 + t_off]))
        f_ref = firsts[0]
        any_entries = ks[0] > 0
        for t_off in range(1, tiles_per_step):
            f_ref = jnp.where(any_entries, f_ref, firsts[t_off])
            any_entries = jnp.logical_or(any_entries, ks[t_off] > 0)
        batchable = jnp.logical_and(
            jnp.bool_(tiles_per_step > 1), any_entries
        )
        for t_off in range(tiles_per_step):
            batchable = jnp.logical_and(batchable, ks[t_off] <= 1)
            batchable = jnp.logical_and(
                batchable,
                jnp.logical_or(ks[t_off] == 0, firsts[t_off] == f_ref),
            )

        @pl.when(batchable)
        def _():
            hit = scal[0] == f_ref
            slot = jnp.where(hit, scal[1], 0)

            def dma(slot=slot):
                off = pl.multiple_of(f_ref * chunk, chunk)
                return pltpu.make_async_copy(
                    packed_hbm.at[:, pl.ds(off, chunk)],
                    buf.at[slot],
                    sem.at[slot],
                )

            @pl.when(jnp.logical_not(hit))
            def _():
                dma().start()
                dma().wait()
            px, py, tile_f = _pixel_coords_batch(
                [tmap_ref[i0 + t] for t in range(tiles_per_step)], tiles_x
            )
            bpx = tiles_per_step * PX
            g_all = g_ref[...]  # (tps, 8, PX)
            fwd_all = fwd_ref[...]
            g8_b = g_all.transpose(0, 2, 1).reshape(bpx, 8)
            fwd8_b = fwd_all.transpose(0, 2, 1).reshape(bpx, 8)
            gt_final_b = g8_b[:, 4:5] * fwd8_b[:, 4:5]
            log_seed_b = fwd8_b[:, 6:7]
            basis_b = jnp.concatenate([basis] * tiles_per_step, axis=0)
            dout, _, _ = _bwd_window_grads(
                buf[slot], px, py, tile_f, tiles_x, g8_b, gt_final_b,
                log_seed_b, jnp.zeros((bpx, 1), jnp.float32),
                u_prefix, l_suffix, basis_b, chunk,
            )
            acc_window(dout, f_ref)
            scal[0] = f_ref
            scal[1] = slot

        @pl.when(jnp.logical_not(batchable))
        def _():
            # grid step s handles tile block (nsteps-1-s); within the
            # block tiles run high-to-low: global tile order descending
            for t_rev in range(tiles_per_step):  # static unroll
                t_off = tiles_per_step - 1 - t_rev
                _bwd_one_tile(
                    i0 + t_off, tmap_ref[i0 + t_off],
                    start_ref, count_ref, cend_ref, packed_hbm,
                    g_ref[t_off].T, fwd_ref[t_off].T,
                    buf, accbuf, flushbuf, scal, sem, flush_dma,
                    acc_window, tiles_x, chunk, u_prefix, l_suffix, basis,
                )

        # last grid step: flush the still-open window
        @pl.when(step == nsteps - 1)
        def _():
            @pl.when(scal[3] == 1)
            def _():
                flush_dma(scal[4]).wait()

            @pl.when(scal[2] >= 0)
            def _():
                flushbuf[...] = accbuf[...]
                flush_dma(scal[2]).start()
                flush_dma(scal[2]).wait()

    return kernel


def _bwd_window_grads(
    data, px, py, tile_f, tiles_x, g8, gt_final, log_t_out, suf,
    u_prefix, l_suffix, basis, chunk,
):
    """Gradients of one reverse-sweep window.

    Returns (dout (16, chunk), suf_out (PX, 1), log_t_in (PX, 1)): the
    packed entry gradients, the updated running suffix Σ w·(g·feat), and
    the LOG transmittance entering the PREVIOUS (earlier) window.

    Transmittance is reconstructed in log space: with log_t_in =
    log_t_out - s_total (exact sums of log1p terms, no division), the
    exponent log_t_in + s_excl is always <= 0 — exp never overflows and
    saturated windows underflow to the mathematically-correct 0 instead
    of a clamped estimate (the CUDA backward's T /= (1-alpha) divisions
    hit the same saturation issue this avoids).
    """
    alpha, raw, g_exp, dx, dy = _chunk_terms(data, px, py, tile_f)
    log1m = jnp.log1p(-alpha)
    s_excl = _site_dot(log1m, u_prefix, _DN_PLAIN, exact="rhs")
    s_total = jnp.sum(log1m, axis=1, keepdims=True)  # (PX, 1)
    log_t_in = log_t_out - s_total
    t_excl = jnp.exp(log_t_in + s_excl)
    t_incl = t_excl * (1.0 - alpha)
    keep2 = t_incl >= TRANSMITTANCE_MIN
    w = alpha * t_excl * jnp.where(keep2, 1.0, 0.0)

    feat = data[8:16, :]  # (8, chunk)
    gfeat = _site_dot(g8, feat, _DN_PLAIN)  # (PX, chunk): (g . feat_e)(p)
    q = w * gfeat
    sufq = _site_dot(q, l_suffix, _DN_PLAIN, exact="rhs") + suf
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
    m = _site_dot(
        basis, dpow, (((0,), (0,)), ((), ())), exact="lhs"
    )  # (8, chunk): [Σ, Σpx, Σpy, Σpx², Σpxpy, Σpy²]·dpow
    m0 = m[0:1, :]
    mx = m[1:2, :]
    my = m[2:3, :]
    mxx = m[3:4, :]
    mxy = m[4:5, :]
    myy = m[5:6, :]
    # PER-ENTRY tile origins from the tile-id field: entries whose
    # owning tile differs from any batched row have dpow == 0, so every
    # reduction below contracts over all rows safely (this is what lets
    # one call serve a whole batch of tiles sharing the window)
    tid = data[6:7, :]
    ox = jnp.mod(tid, float(tiles_x)) * TILE
    oy = jnp.floor(tid / float(tiles_x)) * TILE
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
    # only the 4 real feature rows (8..11: r, g, b, depth) take gradient;
    # cotangent columns 4..7 (T_final etc.) must NOT leak into pad rows
    dfeat = _site_dot(
        g8[:, 0:4], w, (((0,), (0,)), ((), ()))
    )  # (4, chunk)

    zero2 = jnp.zeros((2, chunk), jnp.float32)
    zero4 = jnp.zeros((4, chunk), jnp.float32)
    dout = jnp.concatenate(
        [dxm, dym, dca, dcb, dcc, dop, zero2, dfeat, zero4], axis=0
    )  # (16, chunk)
    return dout, suf + jnp.sum(q, axis=1, keepdims=True), log_t_in


def _bwd_one_tile(
    i, tid, start_ref, count_ref, cend_ref, packed_hbm, g8, fwd8,
    buf, accbuf, flushbuf, scal, sem, flush_dma, acc_window, tiles_x,
    chunk, u_prefix, l_suffix, basis,
):
    first, k = _window_bounds(start_ref[i], count_ref[i], chunk)
    # windows past the forward's early-termination point carry zero
    # gradient (their t_incl < TRANSMITTANCE_MIN -> keep2/live = 0)
    k = jnp.minimum(k, cend_ref[i])
    px, py = _pixel_coords(tid, tiles_x)
    tile_f = tid.astype(jnp.float32)
    # g8 (PX, 8): cols 0-3 feature grads, col 4 T_final grad
    g_final = g8[:, 4:5]  # (PX, 1)
    gt_final = g_final * fwd8[:, 4:5]  # g_T * frozen T_final
    log_seed = fwd8[:, 6:7]  # LOG final transmittance carry (exact sums)

    def get_dma(slot, c):
        off = pl.multiple_of((first + c) * chunk, chunk)
        return pltpu.make_async_copy(
            packed_hbm.at[:, pl.ds(off, chunk)],
            buf.at[slot],
            sem.at[slot],
        )

    # descending tiles: a hit means the previously processed tile's first
    # window IS this tile's last window (its sweep starts there)
    hit = jnp.logical_and(k > 0, scal[0] == first + k - 1)
    base = jnp.where(hit, scal[1], 0)

    # ---- reverse sweep; grads accumulate in the shared window register --
    @pl.when(jnp.logical_and(k > 0, jnp.logical_not(hit)))
    def _():
        get_dma(base, k - 1).start()

    suf0 = jnp.zeros((PX, 1), jnp.float32)

    # fast path: single-window tiles skip the fori machinery entirely
    @pl.when(k == 1)
    def _():
        @pl.when(jnp.logical_not(hit))
        def _():
            get_dma(base, 0).wait()
        dout, _, _ = _bwd_window_grads(
            buf[base], px, py, tile_f, tiles_x, g8, gt_final, log_seed,
            suf0, u_prefix, l_suffix, basis, chunk,
        )
        acc_window(dout, first)
        scal[0] = first
        scal[1] = base

    @pl.when(k > 1)
    def _():
        def rbody(j, carry):
            suf, log_t_out = carry
            c = k - 1 - j
            slot = jax.lax.rem(j + base, 2)

            @pl.when(j + 1 < k)
            def _():
                get_dma(1 - slot, c - 1).start()

            @pl.when(jnp.logical_or(j > 0, jnp.logical_not(hit)))
            def _():
                get_dma(slot, c).wait()
            dout, suf, log_t_in = _bwd_window_grads(
                buf[slot], px, py, tile_f, tiles_x, g8, gt_final, log_t_out,
                suf, u_prefix, l_suffix, basis, chunk,
            )
            acc_window(dout, first + c)
            return (suf, log_t_in)

        jax.lax.fori_loop(0, k, rbody, (suf0, log_seed))

        # the sweep's last DMA-completed window is this tile's FIRST window
        scal[0] = first
        scal[1] = jax.lax.rem(k - 1 + base, 2)


@functools.partial(
    jax.jit,
    static_argnames=(
        "tiles_x", "tiles_y", "chunk", "interpret", "tps", "num_tiles",
        "variant",
    ),
)
def _blend_bwd_impl(
    packed, tile_start, tile_count, fwd_out, g_out, tiles_x, tiles_y, chunk,
    interpret=False, tps=None, tile_offset=None, num_tiles=None,
    variant="auto", tile_map=None,
):
    if (
        num_tiles is None and tile_map is None
        and variant not in ("stream", "v3")
    ):
        from topo4d_tpu.rasterizer.pallas_resident import (
            blend_bwd_resident,
            fits_resident,
        )

        if variant == "resident" or fits_resident(packed.shape[1]):
            return blend_bwd_resident(
                packed, tile_start, tile_count, fwd_out, g_out, tiles_x,
                tiles_y, chunk, interpret,
                tps or _tiles_per_step(tiles_x * tiles_y),
            )
    t = num_tiles if num_tiles is not None else tiles_x * tiles_y
    e_pad = packed.shape[1]
    tps = tps or _tiles_per_step(t)
    pad_t = -(-t // tps) * tps
    tmap = _build_tile_map(
        tile_map, tile_offset, t, pad_t, tiles_x, tiles_y
    )
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
    nsteps = pad_t // tps
    rev = lambda i, *_: (nsteps - 1 - i, 0, 0)  # tiles run descending
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((tps, 8, PX), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((tps, 8, PX), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, PACK_FIELDS, chunk), jnp.float32),  # entry reads
            pltpu.VMEM((PACK_FIELDS, chunk), jnp.float32),  # window grad acc
            pltpu.VMEM((PACK_FIELDS, chunk), jnp.float32),  # flush staging
            pltpu.SMEM((8,), jnp.int32),  # caches + flush state
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    zeros = jnp.zeros((PACK_FIELDS, e_pad), jnp.float32)
    kfn = _bwd_kernel_v3 if variant == "v3" else _bwd_kernel
    return pl.pallas_call(
        kfn(tiles_x, chunk, tps),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((PACK_FIELDS, e_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            dimension_semantics=("arbitrary",),  # monotone window schedule
        ),
        input_output_aliases={7: 0},  # zeros input (after 4 scalar args)
        interpret=interpret,
    )(tmap, tile_start, tile_count, cend, packed, g_out, fwd_out,
      zeros)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 8, 9, 11))
def pallas_blend(
    packed, tile_start, tile_count, tiles_x, tiles_y, chunk,
    interpret=False, tile_offset=None, num_tiles=None, variant="auto",
    tile_map=None, tps=None,
):
    """Blend depth-sorted packed entries -> (T, 8, PX) tile buffers.

    Rows 0-3: alpha-blended (r, g, b, depth); row 4: final (frozen)
    transmittance T_final; rows 5/6: backward residuals (window count,
    log T carry); row 7: zero. Background compositing and
    alpha = 1 - T_final happen in XLA outside. Layout note: the minor dim
    must be PX (=256), not 8 — XLA pads small minor dims to 128 lanes.

    ``tile_offset`` ((1,) int32) + ``num_tiles`` (static): tile-axis
    sharding — tile_start/count are a LOCAL slice of ``num_tiles`` tiles
    whose first tile has GLOBAL id tile_offset (entry offsets stay
    global; the packed array is replicated).
    """
    return _blend_fwd_impl(
        packed, tile_start, tile_count, tiles_x, tiles_y, chunk, interpret,
        tps=tps, tile_offset=tile_offset, num_tiles=num_tiles,
        variant=variant, tile_map=tile_map,
    )


def _pallas_blend_fwd(
    packed, tile_start, tile_count, tiles_x, tiles_y, chunk,
    interpret=False, tile_offset=None, num_tiles=None, variant="auto",
    tile_map=None, tps=None,
):
    out = _blend_fwd_impl(
        packed, tile_start, tile_count, tiles_x, tiles_y, chunk, interpret,
        tps=tps, tile_offset=tile_offset, num_tiles=num_tiles,
        variant=variant, tile_map=tile_map,
    )
    return out, (packed, tile_start, tile_count, out, tile_offset, tile_map)


def _pallas_blend_bwd(tiles_x, tiles_y, chunk, interpret, num_tiles,
                      variant, tps, res, g_out):
    packed, tile_start, tile_count, fwd_out, tile_offset, tile_map = res
    dpacked = _blend_bwd_impl(
        packed, tile_start, tile_count, fwd_out, g_out, tiles_x, tiles_y,
        chunk, interpret, tps=tps, tile_offset=tile_offset,
        num_tiles=num_tiles, variant=variant, tile_map=tile_map,
    )
    return (dpacked, None, None, None, None)


pallas_blend.defvjp(_pallas_blend_fwd, _pallas_blend_bwd)
