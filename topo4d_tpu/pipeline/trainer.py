"""Sequence trainer: the frame loop (reference train.py:590-756).

Per frame: warm-started geometry optimization (random view per step or all
views batched), optional dense texture optimization, checkpointing, mesh +
texture export. All hot work happens in the two jitted steps; the Python
loop only schedules views and phases.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from topo4d_tpu.config import Config
from topo4d_tpu.core.camera import Camera
from topo4d_tpu.core.quaternion import quat_normalize
from topo4d_tpu.losses.flatten import (
    build_fused_flatten,
    dihedral_cos,
    fused_flatten_loss,
)
from topo4d_tpu.opt.step import HARD_FLATTEN_KEYS, SOFT_FLATTEN_KEYS
from topo4d_tpu.losses.temporal import TemporalPriors, make_temporal_priors
from topo4d_tpu.opt.adam import adam_init, reset_moments
from topo4d_tpu.opt.step import (
    GeometryPriors,
    TrainState,
    make_geometry_multi_step,
    make_geometry_step,
)
from topo4d_tpu.parallel.batched import (
    make_batched_geometry_multi_step,
    make_batched_geometry_step,
)
from topo4d_tpu.pipeline import checkpoint as ckpt
from topo4d_tpu.pipeline.data import view_order
from topo4d_tpu.pipeline.masks import dim_inner_mouth
from topo4d_tpu.pipeline.export import save_mesh
from topo4d_tpu.pipeline.progress import report_progress
from topo4d_tpu.pipeline.scene import (
    SceneStatics,
    build_constraints,
    build_dense_pre_constraints,
    cache_first_frame_attrs,
    init_dense_params,
)
from topo4d_tpu.texture.dense import (
    TextureState,
    make_texture_eval,
    make_texture_multi_step,
    make_texture_step,
)
from topo4d_tpu.topology.interpolate import interpolate_dense_attribute
from topo4d_tpu.parallel.multihost import is_host0
from topo4d_tpu.utils.profiling import PhaseTimer, device_trace, mpix_per_s


def _cpu_device():
    try:
        return jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        return None


def make_render_fn(cfg: Config):
    bg = jnp.asarray(cfg.raster.bg, jnp.float32)
    backend = cfg.raster.backend
    if backend == "pallas":
        from topo4d_tpu.rasterizer.pallas import render_gaussians_pallas

        return lambda rv, cam: render_gaussians_pallas(
            rv, cam, bg=bg, max_span=cfg.raster.max_span,
            chunk=cfg.raster.chunk, interpret=cfg.raster.interpret,
        )
    if backend == "tiled":
        from topo4d_tpu.rasterizer.tiled import render_gaussians_tiled

        return lambda rv, cam: render_gaussians_tiled(
            rv, cam, bg=bg, max_span=cfg.raster.max_span,
            capacity=cfg.raster.capacity,
        )
    if backend == "oracle":
        from topo4d_tpu.rasterizer.reference import render_gaussians

        return lambda rv, cam: render_gaussians(rv, cam, bg=bg)
    raise ValueError(f"unknown rasterizer backend {backend!r}")


def make_geo_binning_fns(cfg: Config):
    """(binned_render_fn, binnings_fn) for geometry-phase frozen binning.

    Active when the resolved ``raster.track_rebin_freq`` is > 0 on the
    pallas backend (``config.effective_track_rebin_freq``: auto = 0 in
    parity mode, 25 batched): scanned geometry segments then compute
    per-view binnings once at segment entry and reuse the permutations
    for every step in the segment (see
    RasterizerConfig.track_rebin_freq). Returns (None, None) otherwise —
    fresh binning per render.
    """
    from topo4d_tpu.config import effective_track_rebin_freq

    if (
        cfg.raster.backend != "pallas"
        or effective_track_rebin_freq(cfg) <= 0
    ):
        return None, None
    from topo4d_tpu.core.gaussian import activate_params
    from topo4d_tpu.rasterizer.pallas import (
        binning_for,
        render_gaussians_pallas,
    )

    bg = jnp.asarray(cfg.raster.bg, jnp.float32)

    def binned_render_fn(rv, cam, binning):
        return render_gaussians_pallas(
            rv, cam, bg=bg, max_span=cfg.raster.max_span,
            chunk=cfg.raster.chunk, interpret=cfg.raster.interpret,
            binning=binning,
        )

    def binnings_fn(params, cams):
        rv = activate_params(params)
        v = jax.tree_util.tree_leaves(cams)[0].shape[0]
        return jax.lax.map(
            lambda vid: binning_for(
                rv, cams[vid], max_span=cfg.raster.max_span
            ),
            jnp.arange(v, dtype=jnp.int32),
        )

    return binned_render_fn, binnings_fn


def make_dense_render_fn(cfg: Config):
    """Dense-loop renderer: (rv, cam, binning) — only the pallas backend
    consumes the frozen binning; others ignore it. With
    ``texture.tile_shard`` on a multi-device host, each render's tile
    axis spreads over the whole mesh."""
    base = make_render_fn(cfg)
    if cfg.raster.backend != "pallas":
        return lambda rv, cam, binning: base(rv, cam)
    bg = jnp.asarray(cfg.raster.bg, jnp.float32)
    if cfg.texture.tile_shard and len(jax.devices()) > 1:
        from jax.sharding import Mesh
        from topo4d_tpu.rasterizer.pallas import (
            render_gaussians_pallas_tile_sharded,
        )

        mesh = Mesh(np.array(jax.devices()), ("tile",))
        return lambda rv, cam, binning: render_gaussians_pallas_tile_sharded(
            rv, cam, mesh, bg=bg, max_span=cfg.raster.max_span,
            chunk=cfg.raster.chunk, interpret=cfg.raster.interpret,
            binning=binning,
        )
    from topo4d_tpu.rasterizer.pallas import render_gaussians_pallas

    # manual capacity (> 0) rides the static arg; auto (-1) rides the
    # compact list the trainer attaches to each frozen binning
    cap = cfg.texture.tile_capacity if cfg.texture.tile_capacity > 0 else None
    return lambda rv, cam, binning: render_gaussians_pallas(
        rv, cam, bg=bg, max_span=cfg.raster.max_span,
        chunk=cfg.raster.chunk, interpret=cfg.raster.interpret,
        binning=binning, tile_capacity=cap,
    )


class Trainer:
    """Orchestrates a full sequence fit."""

    def __init__(
        self,
        cfg: Config,
        source,  # DiskSequence | SyntheticSequence
        params_np: Dict[str, np.ndarray],
        statics: SceneStatics,
    ):
        self.cfg = cfg
        self.source = source
        self.statics = statics
        self.render_fn = make_render_fn(cfg)
        self.step = make_geometry_step(
            statics.quadruples, statics.umbrellas, self.render_fn,
            ring_indices=statics.ring.indices,
        )
        # scanned segments: one dispatch per run of identically-configured
        # iterations (same constraints/LRs, no logging); with
        # raster.track_rebin_freq > 0 the segment additionally freezes
        # per-view binnings computed at its entry
        self._binned_render_fn, self._binnings_fn = make_geo_binning_fns(cfg)
        self.multi_step = None
        if cfg.schedule.views_per_step == 1 and cfg.schedule.use_scan:
            self.multi_step = make_geometry_multi_step(
                statics.quadruples, statics.umbrellas, self.render_fn,
                ring_indices=statics.ring.indices,
                binned_render_fn=self._binned_render_fn,
                binnings_fn=self._binnings_fn,
            )
        # all-views mode: multi-device uses shard_map over the view axis
        # (required for the Pallas backend, which has no vmap rule)
        self.mesh = None
        if cfg.schedule.views_per_step == 0 and len(jax.devices()) > 1:
            from topo4d_tpu.parallel.mesh import make_view_mesh

            # the view axis must divide evenly; use the largest device
            # count that divides the rig size (24 views / 8 chips -> 8)
            v = source.num_views
            n = len(jax.devices())
            while n > 1 and v % n != 0:
                n -= 1
            self.mesh = make_view_mesh(n) if n > 1 else None
        # single-device pallas: fuse all views into ONE blend launch on a
        # virtual tall canvas instead of lax.map-ing V sequential renders
        multiview_fn = None
        if (
            cfg.schedule.fuse_views
            and cfg.raster.backend == "pallas"
            and self.mesh is None
        ):
            from topo4d_tpu.rasterizer.pallas import (
                render_gaussians_pallas_multiview,
            )

            bg = jnp.asarray(cfg.raster.bg, jnp.float32)
            multiview_fn = lambda rv, cams: render_gaussians_pallas_multiview(
                rv, cams, bg=bg, max_span=cfg.raster.max_span,
                chunk=cfg.raster.chunk, interpret=cfg.raster.interpret,
            )
        self.batched_step = make_batched_geometry_step(
            statics.quadruples, statics.umbrellas, self.render_fn,
            sequential_views=(cfg.raster.backend == "pallas"),
            mesh=self.mesh,
            ring_indices=statics.ring.indices,
            multiview_render_fn=multiview_fn,
        )
        # scanned batched segments (single-device): one dispatch per run
        # of identically-configured batched steps; frozen per-view
        # binnings when track_rebin_freq > 0
        self.batched_multi_step = None
        if (
            cfg.schedule.views_per_step == 0
            and cfg.schedule.use_scan
            and self.mesh is None
            and multiview_fn is None
        ):
            self.batched_multi_step = make_batched_geometry_multi_step(
                statics.quadruples, statics.umbrellas, self.render_fn,
                sequential_views=(cfg.raster.backend == "pallas"),
                ring_indices=statics.ring.indices,
                binned_render_fn=self._binned_render_fn,
                binnings_fn=self._binnings_fn,
            )

        params = {k: jnp.asarray(v) for k, v in params_np.items()}
        self.params0 = {k: jnp.asarray(v) for k, v in params.items()}
        n = params["means3D"].shape[0]
        self.state = TrainState(
            params=params, opt=adam_init(params), max_2d_radius=jnp.zeros(n)
        )
        # init math on CPU: eager ops on a tunneled TPU cost ~0.5 s each
        cpu = _cpu_device()
        with jax.default_device(cpu):
            rot_n = quat_normalize(jnp.asarray(params_np["unnorm_rotations"]))
            fused = build_fused_flatten(
                statics.quadruples, HARD_FLATTEN_KEYS, SOFT_FLATTEN_KEYS
            )
            cos0 = np.asarray(
                dihedral_cos(
                    jnp.asarray(params_np["means3D"]), fused.quads
                )[fused.num_hard :]
            )
            temporal0 = jax.tree_util.tree_map(
                np.asarray,
                make_temporal_priors(
                    jnp.asarray(params_np["means3D"]),
                    rot_n,
                    jnp.asarray(np.ascontiguousarray(statics.ring.indices.T)),
                ),
            )
        self._warm_start = jax.jit(
            lambda means, rots, nbr: make_temporal_priors(
                means, quat_normalize(rots), nbr
            )
        )
        # one-ring arrays transposed host-side to the (K, N) lane-friendly
        # layout (losses.temporal module docstring)
        tp = lambda a: jnp.asarray(np.ascontiguousarray(np.asarray(a).T))
        self._nbrT = tp(statics.ring.indices)
        self.priors = GeometryPriors(
            neighbor_indices=self._nbrT,
            neighbor_dist=tp(statics.ring.dist),
            iso_w=tp(statics.iso_w),
            rig_w=tp(statics.rig_w),
            rot_w=tp(statics.rot_w),
            init_scale=jnp.asarray(statics.init_scale),
            temporal=jax.tree_util.tree_map(jnp.asarray, temporal0),
            cos_init=jnp.asarray(cos0),
        )
        self.first_frame_attrs: Optional[Dict] = None
        self.output_params: List[Dict[str, np.ndarray]] = []
        self.texture_state: Optional[TextureState] = None
        self.dense_means3d = None
        self.dense_anchor = None
        self.texture_step = None
        self.texture_multi_step = None
        self.texture_eval = None
        self._texture_masked = None
        self.metrics_log: List[Dict] = []
        self._bake_binning = None
        self.timer = PhaseTimer()
        self._weights_cache: Dict[str, Dict[str, jnp.ndarray]] = {}
        self._lrs_cache: Dict[str, Dict[str, jnp.ndarray]] = {}
        self._out_dir = os.path.join(
            cfg.data.output_dir, cfg.data.exp, cfg.data.seq
        )

    # ------------------------------------------------------------------
    def weights_for(self, phase: str) -> Dict[str, jnp.ndarray]:
        # cached: rebuilding ~15 device scalars per iteration is a
        # host->device transfer storm on a tunneled TPU
        if phase not in self._weights_cache:
            w = self.cfg.weights.as_dict()
            self._weights_cache[phase] = {
                k: jnp.asarray(v, jnp.float32) for k, v in w.items()
            }
        return self._weights_cache[phase]

    def lrs_for(self, phase: str) -> Dict[str, jnp.ndarray]:
        if phase not in self._lrs_cache:
            table = getattr(self.cfg.lrs, phase)
            self._lrs_cache[phase] = {
                k: jnp.asarray(v, jnp.float32) for k, v in table.items()
            }
        return self._lrs_cache[phase]

    # ------------------------------------------------------------------
    def fit_frame_geometry(self, t: int, frame_data) -> Dict[str, float]:
        cfg = self.cfg
        sched = cfg.schedule
        is_init = t == 0
        num_iters = sched.init_opt_num if is_init else sched.opt_num
        images = jnp.asarray(frame_data.images)
        cams = self.source.cameras
        step_phase = "init" if is_init else "track"

        if not is_init:
            # warm start (train.py:420-438), jitted: eager ops through a
            # tunneled TPU would cost seconds per frame
            self.priors = self.priors._replace(
                temporal=self._warm_start(
                    self.state.params["means3D"],
                    self.state.params["unnorm_rotations"],
                    self._nbrT,
                )
            )
            self.state = self.state._replace(
                opt=reset_moments(
                    self.state.opt, ["means3D", "unnorm_rotations"]
                )
            )

        # optional inner-mouth dimming of tracking GT (train.py:320-327)
        if (
            not is_init
            and cfg.data.use_mask
            and frame_data.masks is not None
        ):
            if not hasattr(self, "_dim_mouth"):
                # built once: a per-frame lambda would retrace every call
                self._dim_mouth = jax.jit(jax.vmap(
                    lambda im, mk: dim_inner_mouth(
                        im, mk, cfg.data.cmap_index
                    )
                ))
            images = self._dim_mouth(images, jnp.asarray(frame_data.masks))

        order = view_order(images.shape[0], num_iters, seed=t)
        metrics = {}
        early_cut = int(num_iters * sched.eye_freeze_frac)
        batched = sched.views_per_step == 0

        def iter_attrs(i):
            """(constraint phase, lr key, log?) of iteration i."""
            if is_init:
                con = "init_early" if i < early_cut else "init"
                lr_key = "init"
            else:
                con = "track"
                lr_key = (
                    "polish" if i >= num_iters - sched.polish_iters
                    else "track"
                )
            log_this = i % sched.log_freq == 0 or i == num_iters - 1
            return con, lr_key, log_this

        weights = self.weights_for(step_phase)

        if batched:
            # every step consumes ALL views (summed gradients), so the
            # schedule contracts by the view count; phase boundaries
            # (eye freeze, polish) keep their fractional positions
            nb = sched.batched_opt_num or -(-num_iters // images.shape[0])
            log_every = max(1, round(nb * sched.log_freq / num_iters))
            # throughput accounting: every batched step renders all views
            self._last_geo_renders = nb * images.shape[0]
            if self.mesh is not None:
                from topo4d_tpu.parallel.mesh import shard_view_batch

                images = shard_view_batch(self.mesh, images)
                cams = shard_view_batch(self.mesh, cams)
            metrics = {}

            def batched_attrs(i):
                """(constraint phase, lr key, log?) of batched step i."""
                frac = i / nb
                if is_init:
                    con = (
                        "init_early" if frac < sched.eye_freeze_frac
                        else "init"
                    )
                    lr_key = "init"
                else:
                    con = "track"
                    lr_key = (
                        "polish"
                        if frac >= 1.0 - sched.polish_iters / num_iters
                        else "track"
                    )
                return con, lr_key, i % log_every == 0 or i == nb - 1

            # frozen binnings cap the scanned segment length (permutation
            # staleness bound); without them the scan is exact
            from topo4d_tpu.config import effective_track_rebin_freq

            seg_cap = (
                effective_track_rebin_freq(cfg)
                if self._binnings_fn is not None else nb
            )
            i = 0
            while i < nb:
                con_phase, lr_key, log_this = batched_attrs(i)
                if self.batched_multi_step is not None and not log_this:
                    # extend the segment while the step config is unchanged
                    j = i + 1
                    while (
                        j < nb
                        and j - i < seg_cap
                        and batched_attrs(j) == (con_phase, lr_key, False)
                    ):
                        j += 1
                    self.state, self.priors, _ = self.batched_multi_step(
                        self.state, images, cams, self.priors,
                        self._constraints(con_phase), self.lrs_for(lr_key),
                        weights, step_phase, j - i,
                    )
                    i = j
                    continue
                self.state, self.priors, m = self.batched_step(
                    self.state, images, cams, self.priors,
                    self._constraints(con_phase), self.lrs_for(lr_key),
                    weights, step_phase,
                )
                if log_this:
                    metrics = {k: float(v) for k, v in m.items()}
                    metrics["frame"] = t
                    metrics["iter"] = i
                    self.metrics_log.append(dict(metrics))
                    if cfg.data.log_views and is_host0():
                        report_progress(
                            self.state.params, self.render_fn, cams,
                            images, frame_data.view_names,
                            cfg.data.log_views, self._out_dir, t + 1, i,
                        )
                i += 1
            return metrics

        self._last_geo_renders = num_iters  # one view per iteration
        i = 0
        while i < num_iters:
            con_phase, lr_key, log_this = iter_attrs(i)
            constraints = self._constraints(con_phase)
            lr = self.lrs_for(lr_key)
            if self.multi_step is not None and not log_this:
                # extend the segment while the step config is unchanged;
                # frozen binnings (track_rebin_freq) cap its length
                from topo4d_tpu.config import effective_track_rebin_freq

                seg_cap = (
                    effective_track_rebin_freq(cfg)
                    if self._binnings_fn is not None else num_iters
                )
                j = i + 1
                while (
                    j < num_iters
                    and j - i < seg_cap
                    and iter_attrs(j) == (con_phase, lr_key, False)
                ):
                    j += 1
                vids = jnp.asarray(order[i:j], jnp.int32)
                self.state, self.priors, _ = self.multi_step(
                    self.state, images, cams, vids, self.priors,
                    constraints, lr, weights, step_phase,
                )
                i = j
                continue
            vid = jnp.asarray(order[i], jnp.int32)
            self.state, self.priors, m = self.step(
                self.state, images[order[i]], cams, vid, self.priors,
                constraints, lr, weights, step_phase,
                with_metrics=log_this,
            )
            if log_this:
                metrics = {k: float(v) for k, v in m.items()}
                metrics["frame"] = t
                metrics["iter"] = i
                self.metrics_log.append(dict(metrics))
                if cfg.data.log_views and is_host0():
                    report_progress(
                        self.state.params, self.render_fn, cams,
                        images, frame_data.view_names, cfg.data.log_views,
                        self._out_dir, t + 1, i,
                    )
            i += 1
        return metrics

    def _auto_tile_capacity(self, occ: int, total_tiles: int) -> int:
        """Sticky auto tile capacity (``texture.tile_capacity = -1``).

        occupancy x 1.2 rounded up to a quantum (2048 at 4K-scale
        canvases, 64 below), never shrinking across frames (a capacity
        change recompiles the dense step; occupancy drifts slowly, so
        growth is rare). Clamped to the canvas size — at or above it
        ``attach_compact`` leaves compact mode off.
        """
        quantum = 2048 if total_tiles > 8192 else 64
        cap = -(-int(occ * 1.2) // quantum) * quantum
        self._auto_tile_cap = max(cap, getattr(self, "_auto_tile_cap", 0))
        return min(self._auto_tile_cap, total_tiles)

    def _constraints(self, phase: str):
        key = (phase, id(self.first_frame_attrs))
        if getattr(self, "_con_cache_key", {}).get(phase) != key:
            if not hasattr(self, "_con_cache_key"):
                self._con_cache_key = {}
                self._con_cache = {}
            self._con_cache[phase] = build_constraints(
                phase, self.params0, self.statics.regions,
                self.first_frame_attrs,
            )
            self._con_cache_key[phase] = key
        return self._con_cache[phase]

    # ------------------------------------------------------------------
    def fit_frame_texture(self, t: int, frame_data) -> Dict[str, float]:
        cfg = self.cfg
        if self.texture_state is None:
            dense_np = init_dense_params(
                {k: np.asarray(v) for k, v in self.state.params.items()},
                self.statics,
                self.source.num_views,
            )
            dense = {k: jnp.asarray(v) for k, v in dense_np.items()}
            self.texture_state = TextureState(params=dense, opt=adam_init(dense))
            self.dense_anchor = dense["dense_rgb_colors"]
        else:
            # update_dense_states (train.py:498-508)
            self.dense_anchor = self.texture_state.params["dense_rgb_colors"]
        # masked dense loss (train.py:392-405): parsing images ride along;
        # a frame without masks falls back to the unmasked objective (the
        # loader already warned) instead of crashing inside get_mask
        masks = None
        if cfg.data.use_mask_dense and frame_data.masks is not None:
            masks = jnp.asarray(frame_data.masks)
        use_mask = masks is not None
        if self.texture_step is None or self._texture_masked != use_mask:
            # (re)built here rather than in the state-init branch so a
            # mid-sequence resume (restored texture_state) still gets them
            dense_render = make_dense_render_fn(cfg)
            self.texture_step = make_texture_step(
                dense_render, use_mask, cfg.data.cmap_index,
                remat=cfg.texture.remat_photometric,
            )
            self.texture_multi_step = make_texture_multi_step(
                dense_render, use_mask, cfg.data.cmap_index,
                remat=cfg.texture.remat_photometric,
            )
            self.texture_eval = make_texture_eval(dense_render)
            self._texture_masked = use_mask
            self._dense_pre = build_dense_pre_constraints(
                self.texture_state.params, self.statics.regions
            )

        topo = self.statics.dense.topo
        self.dense_means3d = interpolate_dense_attribute(
            self.state.params["means3D"],
            jnp.asarray(topo.quad_faces),
            jnp.asarray(topo.father_face),
            jnp.asarray(topo.weights),
        )
        images = jnp.asarray(frame_data.images)
        cams = self.source.cameras_full
        order = view_order(
            images.shape[0], cfg.schedule.dense_opt_num, seed=10_000 + t
        )
        lr = {
            k: jnp.asarray(v, jnp.float32) for k, v in self.cfg.lrs.dense.items()
        }
        weights = {
            k: jnp.asarray(v, jnp.float32)
            for k, v in self.cfg.dense_weights.as_dict().items()
        }
        # frozen per-view binning (dense means3D are fixed within a frame);
        # refreshed per rebin_freq (0 = once per frame per view)
        use_binning = (
            cfg.raster.backend == "pallas" and cfg.texture.rebin_freq != 1
        )
        use_scan = cfg.schedule.use_scan and (
            not use_binning or cfg.texture.rebin_freq == 0
        )
        if use_binning:
            from topo4d_tpu.rasterizer.pallas import (
                attach_compact,
                binning_for,
            )

            from topo4d_tpu.texture.dense import dense_rendervars

            cap_cfg = cfg.texture.tile_capacity
            man_cap = cap_cfg if cap_cfg > 0 else None

            def fresh_binning(v):
                # split_pack: capture the frame-constant packed rows so
                # each step gathers only the learned conic+color rows;
                # with a manual tile_capacity also freeze the compact
                # tile list (auto capacity attaches it once the frame's
                # occupancy is known — see _auto_tile_capacity)
                return binning_for(
                    dense_rendervars(
                        self.texture_state.params, self.dense_means3d
                    ),
                    cams[v],
                    max_span=cfg.raster.max_span,
                    with_static=cfg.texture.split_pack,
                    chunk=cfg.raster.chunk,
                    tile_capacity=man_cap,
                )

            def auto_compact(bs):
                # auto capacity: the frame's EXACT max occupancy across
                # the given binnings x 1.2, rounded up to 2048, sticky
                # across frames (shapes only grow -> rare recompiles,
                # zero in-frame overflow by construction). One capacity
                # per frame so per-view binnings stay stackable.
                if cap_cfg >= 0:
                    return bs
                # occupancy reduced device-side across views: ONE host
                # sync per frame, not one per view (the manual-capacity
                # path below follows the same pattern)
                occ = int(jnp.max(jnp.stack(
                    [jnp.sum(b.tile_count > 0) for b in bs]
                )))
                cap = self._auto_tile_capacity(
                    occ, int(bs[0].tile_count.shape[0])
                )
                return [attach_compact(b, cap) for b in bs]

        num_iters = cfg.schedule.dense_opt_num
        if t > 0 and cfg.schedule.dense_opt_num_tracked >= 0:
            # validated reduced tracked-frame schedule (saturation
            # evidence: texture.allview_eval curves, r05 tex8k run)
            num_iters = cfg.schedule.dense_opt_num_tracked
        log_freq = cfg.schedule.dense_log_freq
        metrics = {}

        def allview_psnr(binning_of):
            # eval-only mean PSNR over every view at the current params
            vals = []
            for v in range(int(images.shape[0])):
                vals.append(self.texture_eval(
                    self.texture_state, self.dense_means3d, images[v],
                    cams, jnp.asarray(v, jnp.int32), binning_of(v),
                ))
            return float(jnp.mean(jnp.stack(vals)))

        if use_scan:
            binnings_stacked = None
            if use_binning:
                per_view = auto_compact([
                    fresh_binning(v) for v in range(images.shape[0])
                ])
                binnings_stacked = jax.tree_util.tree_map(
                    lambda *x: jnp.stack(x), *per_view
                )
                if man_cap:
                    # one host sync per frame: dropped tiles are never
                    # silent (SURVEY §7 hard part 2); auto capacity
                    # cannot overflow (sized from exact occupancy)
                    occ = int(
                        jnp.max(
                            jnp.sum(
                                binnings_stacked.tile_count > 0, axis=1
                            )
                        )
                    )
                    if occ > man_cap:
                        print(
                            f"[topo4d] WARNING frame {t}: "
                            f"{occ - man_cap} occupied tiles beyond "
                            f"texture.tile_capacity={man_cap} are "
                            "dropped — raise the capacity"
                        )
            eval_binning = None
            if binnings_stacked is not None:
                eval_binning = jax.tree_util.tree_map(
                    lambda x: x[0], binnings_stacked
                )
            i = 0
            while i < num_iters:
                if i % log_freq == 0:
                    vid = jnp.asarray(order[i], jnp.int32)
                    binning = None
                    if binnings_stacked is not None:
                        binning = jax.tree_util.tree_map(
                            lambda x: x[order[i]], binnings_stacked
                        )
                    self.texture_state, m = self.texture_step(
                        self.texture_state, self.dense_means3d,
                        images[order[i]], cams, vid, self.dense_anchor,
                        self._dense_pre, lr, weights, binning,
                        mask=None if masks is None else masks[order[i]],
                    )
                    metrics = {("tex_" + k): float(v) for k, v in m.items()}
                    # fixed-view eval PSNR: comparable across log rows
                    # (tex_psnr renders the step's random view)
                    metrics["tex_psnr_fixed"] = float(self.texture_eval(
                        self.texture_state, self.dense_means3d, images[0],
                        cams, jnp.asarray(0, jnp.int32), eval_binning,
                    ))
                    if cfg.texture.allview_eval:
                        metrics["tex_psnr_allview"] = allview_psnr(
                            lambda v: None if binnings_stacked is None
                            else jax.tree_util.tree_map(
                                lambda x: x[v], binnings_stacked
                            )
                        )
                    metrics["iter"] = i
                    metrics["frame"] = t
                    self.metrics_log.append(dict(metrics))
                    i += 1
                    continue
                j = i + 1
                while j < num_iters and j % log_freq != 0:
                    j += 1
                vids = jnp.asarray(order[i:j], jnp.int32)
                self.texture_state, _ = self.texture_multi_step(
                    self.texture_state, self.dense_means3d, images, cams,
                    vids, self.dense_anchor, self._dense_pre, lr, weights,
                    binnings_stacked, masks,
                )
                i = j
            # terminal eval row: the final state's quality (log rows land
            # ON log_freq multiples, which miss the last iteration)
            metrics = {}
            metrics["tex_psnr_fixed"] = float(self.texture_eval(
                self.texture_state, self.dense_means3d, images[0],
                cams, jnp.asarray(0, jnp.int32), eval_binning,
            ))
            if cfg.texture.allview_eval:
                metrics["tex_psnr_allview"] = allview_psnr(
                    lambda v: None if binnings_stacked is None
                    else jax.tree_util.tree_map(
                        lambda x: x[v], binnings_stacked
                    )
                )
            metrics["iter"] = num_iters
            metrics["frame"] = t
            self.metrics_log.append(dict(metrics))
            return metrics

        binnings: Dict[int, object] = {}
        uses: Dict[int, int] = {}
        for i in range(num_iters):
            v = order[i]
            vid = jnp.asarray(v, jnp.int32)
            binning = None
            if use_binning:
                rebin = cfg.texture.rebin_freq
                if v not in binnings or (
                    rebin > 0 and uses[v] >= rebin
                ):
                    binnings[v] = auto_compact([fresh_binning(v)])[0]
                    uses[v] = 0
                uses[v] += 1
                binning = binnings[v]
            log_this = i % log_freq == 0
            self.texture_state, m = self.texture_step(
                self.texture_state, self.dense_means3d, images[order[i]],
                cams, vid, self.dense_anchor, self._dense_pre, lr, weights,
                binning, with_metrics=log_this,
                mask=None if masks is None else masks[order[i]],
            )
            if log_this:
                metrics = {("tex_" + k): float(val) for k, val in m.items()}
                eval_binning = None
                if use_binning:
                    # reuse (or create) view 0's shared binning
                    if 0 not in binnings:
                        binnings[0] = auto_compact([fresh_binning(0)])[0]
                        uses[0] = 0
                    eval_binning = binnings[0]
                metrics["tex_psnr_fixed"] = float(self.texture_eval(
                    self.texture_state, self.dense_means3d, images[0],
                    cams, jnp.asarray(0, jnp.int32), eval_binning,
                ))
                metrics["frame"] = t
                self.metrics_log.append(dict(metrics))
        return metrics

    # ------------------------------------------------------------------
    def run(self, resume: bool = True) -> None:
        cfg = self.cfg
        # multi-host: compute runs on every process (same jitted program,
        # global arrays); disk IO belongs to host 0 alone
        io = is_host0()
        if io:
            os.makedirs(self._out_dir, exist_ok=True)
        save_resume = (
            ckpt.save_resume_orbax
            if cfg.data.checkpoint_backend == "orbax"
            else ckpt.save_resume
        )
        load_resume = (
            ckpt.load_resume_orbax
            if cfg.data.checkpoint_backend == "orbax"
            else ckpt.load_resume
        )
        start_frame = 0
        if resume:
            payload = self._synced_resume(load_resume)
            if payload is not None:
                start_frame = payload["frame"]
                self.state = jax.tree_util.tree_map(
                    jnp.asarray, payload["state"]
                )
                self.priors = jax.tree_util.tree_map(
                    jnp.asarray, payload["priors"]
                )
                self.first_frame_attrs = payload["first_frame_attrs"]
                self.output_params = payload["output_params"]
                if payload.get("texture_state") is not None:
                    self.texture_state = jax.tree_util.tree_map(
                        jnp.asarray, payload["texture_state"]
                    )
                # metrics.jsonl is rewritten from metrics_log each frame;
                # without reloading, a resume would silently drop the
                # pre-resume frames' history from the artifact
                if io:
                    self.timer.load(
                        os.path.join(self._out_dir, "timings.json")
                    )
                mpath = os.path.join(self._out_dir, "metrics.jsonl")
                if io and not self.metrics_log and os.path.exists(mpath):
                    with open(mpath) as fh:
                        for line in fh:
                            try:
                                row = json.loads(line)
                            except json.JSONDecodeError:
                                continue  # torn tail from a hard kill
                            if row.get("frame", 1 << 30) < start_frame:
                                self.metrics_log.append(row)

        # frame IO prefetch: decode frame t+1's images (24 views, 4K at
        # texture res) on a worker thread while the device fits frame t
        from concurrent.futures import ThreadPoolExecutor

        want_tex = cfg.texture.gen_tex and self.statics.dense is not None

        def load(t1):
            geo = self.source.frame(t1)
            tex = (
                self.source.frame(t1, full_res=True)
                if want_tex and geo is not None else None
            )
            return geo, tex

        pool = ThreadPoolExecutor(max_workers=1)
        pending = pool.submit(load, start_frame + 1)
        # frame IO offload: checkpoint pickling + OBJ/texture export run
        # on this worker while the device fits the next frame (the 8K
        # bake's device kernel interleaves with training dispatches; the
        # PNG encode / pickle / OBJ write are pure host time). One job in
        # flight at most — the wait at the next frame boundary surfaces
        # failures and bounds checkpoint lag to one frame.
        io_pool = ThreadPoolExecutor(max_workers=1)
        io_pending = None

        try:
            with device_trace() as tracing:
                if tracing:
                    print(f"[topo4d] jax.profiler trace enabled")
                for t in range(start_frame, cfg.schedule.frame_num):
                    t_start = time.time()
                    frame_data, tex_data = pending.result()
                    if t + 1 < cfg.schedule.frame_num:
                        pending = pool.submit(load, t + 2)
                    if frame_data is None:
                        break
                    geo_t0 = time.perf_counter()
                    means_start = self.state.params["means3D"]
                    with self.timer.phase("geometry"):
                        geo = self.fit_frame_geometry(t, frame_data)
                    # per-frame vertex motion: the geometry fit's actual
                    # displacement (VERDICT r2: tracked-frame PSNR gains
                    # are unverifiable without it — frozen means and a
                    # rotation-only plateau look identical in the losses)
                    disp = jnp.linalg.norm(
                        self.state.params["means3D"] - means_start, axis=1
                    )
                    geo["max_dmeans3d"] = float(jnp.max(disp))
                    geo["mean_dmeans3d"] = float(jnp.mean(disp))
                    # _last_geo_renders counts images actually rendered (one
                    # per iteration single-view; views*steps batched)
                    # full precision: rounding to 3 decimals truncated slow
                    # (CPU test) runs to 0.0 and made the metric assertion
                    # timing-dependent
                    geo["mpix_per_s"] = mpix_per_s(
                        self.source.cameras.height, self.source.cameras.width,
                        self._last_geo_renders, time.perf_counter() - geo_t0,
                    )

                    if want_tex and tex_data is not None:
                        with self.timer.phase("texture"):
                            self.fit_frame_texture(t, tex_data)

                    self.output_params.append(
                        ckpt.params_snapshot(self.state.params, t == 0)
                    )
                    if t == 0:
                        self.first_frame_attrs = cache_first_frame_attrs(
                            self.state.params, self.statics.regions
                        )

                    io_job = self._make_io_job(
                        t, io, save_resume,
                        state=self.state,
                        priors=self.priors,
                        first_frame_attrs=self.first_frame_attrs,
                        output_params=list(self.output_params),
                        texture_state=self.texture_state,
                    )
                    if io_pending is not None:
                        # previous frame's IO must land before the next is
                        # queued (bounded lag; re-raises worker failures)
                        io_pending.result()
                        io_pending = None
                    if cfg.schedule.async_export:
                        io_pending = io_pool.submit(io_job)
                    else:
                        io_job()
                    geo["frame_seconds"] = round(time.time() - t_start, 4)
                    self.metrics_log.append(
                        {"frame": t, "summary": True,
                         "frame_seconds": geo["frame_seconds"],
                         "mpix_per_s": geo["mpix_per_s"],
                         "max_dmeans3d": geo["max_dmeans3d"],
                         "mean_dmeans3d": geo["mean_dmeans3d"]}
                    )
                    if io:
                        self._write_metrics()
                        self.timer.write(
                            os.path.join(self._out_dir, "timings.json")
                        )
                        # per-frame progress line (the reference's tqdm)
                        psnr_s = (
                            f" psnr {geo['psnr']:.2f}"
                            if "psnr" in geo else ""
                        )
                        print(
                            f"[topo4d] frame {t + 1}"
                            f"/{cfg.schedule.frame_num} loss "
                            f"{geo.get('loss_total', float('nan')):.5f}"
                            f"{psnr_s} ({geo['frame_seconds']:.1f}s, "
                            f"{geo['mpix_per_s']:.2f} Mpix/s, "
                            f"max|dv| {geo['max_dmeans3d']:.2e})",
                            flush=True,
                        )

            if io_pending is not None:
                io_pending.result()  # surface the last frame's IO failure
                io_pending = None
        finally:
            # cancel the in-flight decode on any exit path; let queued IO
            # finish (checkpoints stay consistent even on error exits)
            pool.shutdown(wait=False, cancel_futures=True)
            io_pool.shutdown(wait=True)

        # final params.npz regardless of ckp_freq (the reference only saves
        # every 5 frames, so short runs end with no params at all)
        if io and self.output_params:
            ckpt.save_params(self.output_params, self._out_dir)
        if io:
            # async IO may finish after the in-loop writes: re-emit the
            # final timings so every phase (incl. the last export) lands
            self.timer.write(os.path.join(self._out_dir, "timings.json"))

    def _make_io_job(self, t, io, save_resume, *, state, priors,
                     first_frame_attrs, output_params, texture_state):
        """Frame-t checkpoint + export as a self-contained closure.

        Captures immutable snapshots (jnp arrays / NamedTuples) so it can
        run on the IO worker while the main thread mutates ``self`` for
        frame t+1. ``schedule.async_export`` decides where it runs.
        """
        cfg = self.cfg

        def job():
            with self.timer.phase("checkpoint"):
                if io and t % cfg.schedule.ckp_freq == 0 and t != 0:
                    ckpt.save_params(output_params, self._out_dir)
                    ckpt.write_loss_json(
                        self._out_dir,
                        {k: True for k in self.statics.quadruples},
                        self.cfg.weights.as_dict(),
                    )
                if io:
                    save_resume(
                        self._out_dir, t + 1, state, priors,
                        first_frame_attrs, output_params, texture_state,
                    )

            with self.timer.phase("export"):
                if io:
                    use_pallas_bake = (
                        cfg.texture.bake_backend == "pallas"
                        or (
                            cfg.texture.bake_backend == "auto"
                            and jax.devices()[0].platform != "cpu"
                        )
                    )
                    if (
                        self._bake_binning is None
                        and cfg.texture.gen_tex
                        and texture_state is not None
                        and use_pallas_bake
                    ):
                        # per-sequence constant (VERDICT r2 item 2):
                        # ~1.6-1.9 s of host binning per 8K bake
                        # otherwise recomputed every frame
                        from topo4d_tpu.pipeline.export import (
                            build_bake_binning,
                        )

                        self._bake_binning = build_bake_binning(
                            self.statics, cfg.texture.tex_res
                        )
                    save_mesh(
                        os.path.join(self._out_dir, "%06d" % (t + 1)),
                        state.params,
                        self.statics,
                        t + 1,
                        dense_params=(
                            texture_state.params
                            if texture_state else None
                        ),
                        tex_res=cfg.texture.tex_res,
                        gen_texture=cfg.texture.gen_tex,
                        bake_window=cfg.texture.bake_window,
                        bake_bands=cfg.texture.bake_bands,
                        bake_backend=cfg.texture.bake_backend,
                        interpret=cfg.raster.interpret,
                        bake_binning=self._bake_binning,
                    )

        return job

    def _synced_resume(self, load_resume):
        """Load the resume payload, consistently across hosts.

        Every process reads the checkpoint (multi-host resume requires a
        shared output_dir — only host 0 writes it); host 0's frame index
        is broadcast and any disagreement fails fast instead of letting
        hosts run divergent per-frame programs.
        """
        payload = load_resume(self._out_dir)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            local = -1 if payload is None else payload["frame"]
            host0 = int(
                multihost_utils.broadcast_one_to_all(
                    np.asarray(local, np.int32)
                )
            )
            if host0 != local:
                raise RuntimeError(
                    f"resume checkpoint mismatch: host 0 is at frame "
                    f"{host0} but process {jax.process_index()} read "
                    f"{local}; multi-host resume requires output_dir on "
                    f"a shared filesystem"
                )
        return payload

    def _write_metrics(self):
        with open(os.path.join(self._out_dir, "metrics.jsonl"), "w") as fh:
            for row in self.metrics_log:
                fh.write(json.dumps(row) + "\n")
