"""The fused geometry train step: render -> losses -> Adam -> constraints.

The reference pays Python dispatch per iteration (train.py:661-700: loss
assembly, backward, optimizer step, then ~10 region tensor writes under
no_grad). Here the whole iteration is ONE jitted function; the LR schedule
and loss weights are traced inputs so phase changes never recompile, and
the post-step region freezes are scatters fused into the same executable
(SURVEY §7 layer 4).

Phases (static):
- "init": frame-0 fit — photometric + scale/scale_max (train.py:360-363)
  + soft-flatten losses whose current dihedral cosines are returned for
  caching (train.py:364-368).
- "track": frames>0 — photometric + rigid/rot/iso + the 9 flatten losses
  (train.py:330-357).
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from topo4d_tpu.core.camera import Camera
from topo4d_tpu.core.gaussian import GaussianRenderVars, activate_params
from topo4d_tpu.losses.flatten import (
    DihedralQuadruples,
    UmbrellaFlatten,
    build_fused_flatten,
    build_fused_umbrella,
    fused_flatten_loss,
    fused_umbrella_from_nb,
    fused_umbrella_loss,
)
from topo4d_tpu.losses.image import photometric_loss, psnr
from topo4d_tpu.losses.temporal import TemporalPriors, rigid_rot_iso_losses
from topo4d_tpu.opt.adam import AdamState, adam_update
from topo4d_tpu.opt.constraints import ScatterConstraint, apply_constraints

SOFT_FLATTEN_KEYS = ("flat_lid_top", "flat_lid_bottom", "flat_lip", "flat_mouth")
HARD_FLATTEN_KEYS = ("flat", "flat_lip_bottom")
UMBRELLA_KEYS = ("flat_eye", "flat_lip_socket", "flat_face_bottom")


class GeometryPriors(NamedTuple):
    """Per-run constants + per-timestep temporal caches (all traced).

    One-ring arrays are stored TRANSPOSED (K, N) — vertices on the
    128-lane minor dim (see losses.temporal module docstring for the TPU
    layout rule this serves).
    """

    neighbor_indices: jnp.ndarray  # (K, N)
    neighbor_dist: jnp.ndarray  # (K, N)
    iso_w: jnp.ndarray  # (K, N)
    rig_w: jnp.ndarray  # (K, N)
    rot_w: jnp.ndarray  # (K, N)
    init_scale: jnp.ndarray  # (N,) sqrt(mean knn sq dist)
    temporal: TemporalPriors
    cos_init: jnp.ndarray  # (Es,) fused soft-flatten initial cosines


class TrainState(NamedTuple):
    params: Dict[str, jnp.ndarray]
    opt: AdamState
    max_2d_radius: jnp.ndarray  # (N,) float — densification statistic


def build_topo_losses(
    quadruples: Dict[str, DihedralQuadruples],
    umbrellas: Dict[str, UmbrellaFlatten],
    ring_indices=None,  # (N, K) np.int32 — priors.neighbor_indices pre-transpose
) -> Callable:
    """The shared topological/temporal loss assembly (train.py:330-368).

    ONE implementation consumed by both the single-view step and the
    batched all-views step (parallel.batched) — they differ only in the
    photometric term. Returns ``topo(rv, priors, weights, phase) ->
    (losses, new_cos, pre_weighted)`` where ``pre_weighted`` is already
    weight-scaled (the fused flatten/umbrella terms).

    ``quadruples``/``umbrellas`` hold the host-precomputed flatten index
    sets (missing keys simply drop that loss, like the reference's
    ``is not None`` guards at train.py:349-357).

    ``ring_indices`` is the one-ring table the caller passes (transposed)
    as ``priors.neighbor_indices``. When it matches the umbrella sets'
    table, the umbrella loss rides the temporal losses' neighbor gather
    instead of issuing its own (saves a gather + backward scatter).
    """
    fused_quads = build_fused_flatten(
        quadruples, HARD_FLATTEN_KEYS, SOFT_FLATTEN_KEYS
    )
    fused_umb = build_fused_umbrella(umbrellas, UMBRELLA_KEYS)
    umb_shares_ring = (
        fused_umb is not None
        and ring_indices is not None
        and np.array_equal(fused_umb.neighbor_indices, ring_indices)
    )
    # scatter-free backward for the one-ring gather (the trainer passes
    # priors.neighbor_indices == ring_indices.T, which the losses flatten
    # back to the same (K·N,) order the table is built from)
    ring_inv = None
    if ring_indices is not None:
        from topo4d_tpu.losses.neighbors import build_inverse_incidence

        ring_inv = build_inverse_incidence(
            np.asarray(ring_indices).T.reshape(-1), ring_indices.shape[0]
        )

    def topo(rv, priors, weights, phase):
        losses: Dict[str, jnp.ndarray] = {}
        new_cos = priors.cos_init
        pre_weighted = jnp.zeros(())
        if phase == "init":
            min_scale = jnp.min(rv.scales, axis=1)
            losses["scale"] = jnp.sum(min_scale)
            max_scale = jnp.max(rv.scales, axis=1)
            losses["scale_max"] = jnp.sum(
                jax.nn.relu(max_scale - priors.init_scale * 1.5)
            )
            # only the soft sets are active at frame 0 (train.py:364-368)
            w0 = dict(weights)
            for k in fused_quads.hard_sets:
                w0[k] = jnp.zeros(())
            flat_total, new_cos = fused_flatten_loss(
                rv.means3d, fused_quads, w0, soft_cos_init=None
            )
            pre_weighted = pre_weighted + flat_total
        else:
            umb_fn = None
            if umb_shares_ring:
                umb_fn = lambda nb, xt: fused_umbrella_from_nb(
                    nb, xt, fused_umb, weights
                )
            temporal = rigid_rot_iso_losses(
                rv.means3d,
                rv.rotations,
                priors.temporal,
                priors.neighbor_indices,
                priors.neighbor_dist,
                priors.rig_w,
                priors.rot_w,
                priors.iso_w,
                extra=umb_fn,
                ring_inv=ring_inv,
            )
            umb_pre = temporal.pop("extra", None)
            if umb_pre is not None:
                pre_weighted = pre_weighted + umb_pre
            losses.update(temporal)
            flat_total, _ = fused_flatten_loss(
                rv.means3d, fused_quads, weights,
                soft_cos_init=priors.cos_init,
            )
            pre_weighted = pre_weighted + flat_total
            if fused_umb is not None and not umb_shares_ring:
                pre_weighted = pre_weighted + fused_umbrella_loss(
                    rv.means3d, fused_umb, weights
                )
        return losses, new_cos, pre_weighted

    return topo


def _build_step_impl(
    quadruples: Dict[str, DihedralQuadruples],
    umbrellas: Dict[str, UmbrellaFlatten],
    render_fn: Callable[[GaussianRenderVars, Camera], object],
    ring_indices=None,  # (N, K) np.int32 — priors.neighbor_indices pre-transpose
    binned_render_fn: Optional[Callable] = None,
) -> Callable:
    """Build the (unjitted) step body. ``render_fn(rv, cam) -> RenderOutput``.

    ``binned_render_fn(rv, cam, binning)`` (pallas backend): when the step
    receives a frozen ``binning`` it renders along that permutation
    instead of re-running the duplicate-and-sort (see
    ``raster.track_rebin_freq``).

    See ``build_topo_losses`` for the shared loss assembly.
    """
    topo = build_topo_losses(quadruples, umbrellas, ring_indices)

    def loss_fn(
        params: Dict[str, jnp.ndarray],
        gt: jnp.ndarray,
        cam: Camera,
        view_id: jnp.ndarray,
        priors: GeometryPriors,
        weights: Dict[str, jnp.ndarray],
        phase: str,
        binning=None,
    ):
        rv = activate_params(params)
        if binning is not None:
            out = binned_render_fn(rv, cam, binning)
        else:
            out = render_fn(rv, cam)
        im = (
            jnp.exp(params["cam_m"][view_id])[:, None, None] * out.image
            + params["cam_c"][view_id][:, None, None]
        )
        losses, new_cos, pre_weighted = topo(rv, priors, weights, phase)
        losses["im"] = photometric_loss(im, gt)
        losses["flatten"] = pre_weighted  # already weight-scaled
        total = (
            sum(weights[k] * v for k, v in losses.items() if k in weights)
            + pre_weighted
        )
        aux = (losses, new_cos, out.radii, im)
        return total, aux

    def step_impl(
        state: TrainState,
        gt: jnp.ndarray,  # (3, H, W) target for the chosen view
        cams: Camera,  # batched cameras
        view_id: jnp.ndarray,  # () int32
        priors: GeometryPriors,
        constraints: Sequence[ScatterConstraint],
        lr: Dict[str, jnp.ndarray],
        weights: Dict[str, jnp.ndarray],
        phase: str,
        with_metrics: bool = True,
        binning=None,
    ) -> Tuple[TrainState, GeometryPriors, Dict[str, jnp.ndarray]]:
        cam = cams[view_id]
        (total, (losses, new_cos, radii, im)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, gt, cam, view_id, priors, weights, phase, binning)

        new_params, new_opt = adam_update(state.params, grads, state.opt, lr)
        new_params = apply_constraints(new_params, constraints)

        seen = radii > 0
        max_radius = jnp.where(
            seen,
            jnp.maximum(radii.astype(jnp.float32), state.max_2d_radius),
            state.max_2d_radius,
        )

        metrics = {("loss_" + k): v for k, v in losses.items()}
        metrics["loss_total"] = total
        if with_metrics:
            # PSNR costs ~0.3 ms/step on a v5e chip; the reference only
            # reports it every log_freq iterations (train.py:454-474)
            metrics["psnr"] = jnp.mean(psnr(im, gt))

        new_priors = priors._replace(cos_init=new_cos)
        return (
            TrainState(params=new_params, opt=new_opt, max_2d_radius=max_radius),
            new_priors,
            metrics,
        )

    return step_impl


def make_geometry_step(
    quadruples: Dict[str, DihedralQuadruples],
    umbrellas: Dict[str, UmbrellaFlatten],
    render_fn: Callable[[GaussianRenderVars, Camera], object],
    ring_indices=None,
) -> Callable:
    """Single-iteration jitted step (see ``_build_step_impl``)."""
    step_impl = _build_step_impl(
        quadruples, umbrellas, render_fn, ring_indices
    )
    return jax.jit(step_impl, static_argnames=("phase", "with_metrics"))


def make_geometry_multi_step(
    quadruples: Dict[str, DihedralQuadruples],
    umbrellas: Dict[str, UmbrellaFlatten],
    render_fn: Callable[[GaussianRenderVars, Camera], object],
    ring_indices=None,
    binned_render_fn: Optional[Callable] = None,
    binnings_fn: Optional[Callable] = None,
) -> Callable:
    """Scanned segment of iterations: ONE dispatch for a run of steps.

    The reference (and the single-step path) pays a host dispatch per
    iteration; ``lax.scan`` over the view schedule turns a whole segment
    between log points into one device program. Semantics are identical
    to looping ``step`` with ``with_metrics=False`` — one view per
    iteration, same order. Returns (state, priors, loss_total (S,)).

    When ``binnings_fn(params, cams) -> stacked per-view Binning`` and
    ``binned_render_fn(rv, cam, binning)`` are given, per-view binnings
    are computed ONCE at segment entry and every scanned step packs
    current values along its view's frozen permutation — amortizing the
    duplicate-and-sort over the segment (``raster.track_rebin_freq``
    caps the segment length and thus the permutation staleness).
    """
    step_impl = _build_step_impl(
        quadruples, umbrellas, render_fn, ring_indices, binned_render_fn
    )
    freeze_binnings = binnings_fn is not None and binned_render_fn is not None

    @functools.partial(jax.jit, static_argnames=("phase",))
    def multi_step(
        state: TrainState,
        images: jnp.ndarray,  # (V, 3, H, W) all view targets
        cams: Camera,
        view_ids: jnp.ndarray,  # (S,) int32 schedule segment
        priors: GeometryPriors,
        constraints: Sequence[ScatterConstraint],
        lr: Dict[str, jnp.ndarray],
        weights: Dict[str, jnp.ndarray],
        phase: str,
    ):
        binnings = None
        if freeze_binnings:
            binnings = binnings_fn(state.params, cams)

        def body(carry, vid):
            state, priors = carry
            binning = None
            if binnings is not None:
                binning = jax.tree_util.tree_map(
                    lambda x: x[vid], binnings
                )
            state, priors, m = step_impl(
                state, images[vid], cams, vid, priors, constraints, lr,
                weights, phase, with_metrics=False, binning=binning,
            )
            return (state, priors), m["loss_total"]

        (state, priors), losses = jax.lax.scan(
            body, (state, priors), view_ids
        )
        return state, priors, losses

    return multi_step
