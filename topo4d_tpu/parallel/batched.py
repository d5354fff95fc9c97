"""View-batched geometry train step (the TPU scaling mode).

The reference optimizes one random view per Adam step (train.py:105-112,
663). The TPU-native update sums photometric gradients over ALL views in
one step — views shard across chips, per-vertex parameter grads psum over
ICI (inserted by XLA from the sharding annotations), topological losses are
computed once on the replicated params. This is a deliberate, documented
semantic change (SURVEY §7 layer 6); the single-view parity mode lives in
``opt.step``.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from topo4d_tpu.core.camera import Camera
from topo4d_tpu.core.gaussian import activate_params
from topo4d_tpu.losses.flatten import DihedralQuadruples, UmbrellaFlatten
from topo4d_tpu.losses.image import photometric_loss, psnr
from topo4d_tpu.opt.adam import adam_update
from topo4d_tpu.opt.constraints import ScatterConstraint, apply_constraints
from topo4d_tpu.opt.step import (
    GeometryPriors,
    TrainState,
    build_topo_losses,
)


def _build_batched_step_impl(
    quadruples: Dict[str, DihedralQuadruples],
    umbrellas: Dict[str, UmbrellaFlatten],
    render_fn: Callable,
    sequential_views: bool = False,
    mesh=None,
    ring_indices=None,  # (N, K) — see opt.step.make_geometry_step
    multiview_render_fn: Optional[Callable] = None,
    binned_render_fn: Optional[Callable] = None,
) -> Callable:
    """The (unjitted) all-views step body. ``render_fn(rv, cam) ->
    RenderOutput``.

    The returned ``step_impl(state, images, cams, priors, constraints,
    lr, weights, phase, binnings)`` renders every view (vmapped — shard
    ``images`` and the camera arrays over the ``view`` mesh axis to
    distribute), averages the photometric loss over views, adds the
    topological terms once, and applies Adam + constraints. Metrics
    include the mean PSNR over views.

    ``multiview_render_fn(rv, cams) -> RenderOutput`` (batched leaves):
    when given (single-device pallas), ALL views render in one fused
    kernel launch (``render_gaussians_pallas_multiview``) instead of a
    sequential lax.map — same math, one grid.

    ``binned_render_fn(rv, cam, binning)`` + a non-None ``binnings``
    (per-view frozen Binning stacked on axis 0): each view blends along
    its frozen permutation instead of re-running the duplicate-and-sort
    (sequential single-device path only — see ``raster.track_rebin_freq``).
    """

    if mesh is not None:
        from topo4d_tpu.parallel.sharded import make_sharded_view_loss

        sharded_loss = make_sharded_view_loss(render_fn, mesh)

    def per_view_losses(params, rv, images, cams, binnings):
        v = images.shape[0]
        args = (images, cams, params["cam_m"][:v], params["cam_c"][:v])
        if mesh is not None:
            # shard_map: each device maps over its LOCAL views (works with
            # the Pallas kernels), loss psums over the 'view' axis
            loss, mean_psnr, max_radii = sharded_loss(rv, *args)
            return loss, mean_psnr, max_radii

        if multiview_render_fn is not None:
            out = multiview_render_fn(rv, cams)  # batched (V, ...) leaves
            cam_m = params["cam_m"][:v][:, :, None, None]
            cam_c = params["cam_c"][:v][:, :, None, None]
            im = jnp.exp(cam_m) * out.image + cam_c
            losses = jax.vmap(photometric_loss)(im, images)
            psnrs = jax.vmap(lambda a, b: jnp.mean(psnr(a, b)))(im, images)
            return (
                jnp.mean(losses), jnp.mean(psnrs),
                jnp.max(out.radii, axis=0),
            )

        def one_view(gt, cam, cam_m, cam_c, binning=None):
            if binning is not None:
                out = binned_render_fn(rv, cam, binning)
            else:
                out = render_fn(rv, cam)
            im = (
                jnp.exp(cam_m)[:, None, None] * out.image
                + cam_c[:, None, None]
            )
            return photometric_loss(im, gt), jnp.mean(psnr(im, gt)), out.radii

        if sequential_views:
            # the Pallas blend kernels use manual DMA + scalar prefetch,
            # which have no vmap rule — scan views inside one jit instead
            if binnings is not None:
                losses, psnrs, radii = jax.lax.map(
                    lambda a: one_view(*a[:4], binning=a[4]),
                    args + (binnings,),
                )
            else:
                losses, psnrs, radii = jax.lax.map(
                    lambda a: one_view(*a), args
                )
        else:
            # vmap keeps the view axis visible to XLA so jit sharding
            # annotations partition it across the 'view' mesh axis
            losses, psnrs, radii = jax.vmap(one_view)(*args)
        return jnp.mean(losses), jnp.mean(psnrs), jnp.max(radii, axis=0)

    topo = build_topo_losses(quadruples, umbrellas, ring_indices)

    def loss_fn(params, images, cams, priors, weights, phase, binnings):
        rv = activate_params(params)
        im_loss, mean_psnr, max_radii = per_view_losses(
            params, rv, images, cams, binnings
        )
        losses, new_cos, pre_weighted = topo(rv, priors, weights, phase)
        losses["im"] = im_loss
        losses["flatten"] = pre_weighted  # already weight-scaled
        total = (
            sum(weights[k] * v for k, v in losses.items() if k in weights)
            + pre_weighted
        )
        return total, (losses, new_cos, max_radii, mean_psnr)

    def step_impl(
        state: TrainState,
        images: jnp.ndarray,  # (V, 3, H, W) — shard over 'view'
        cams: Camera,  # batched; arrays shard over 'view'
        priors: GeometryPriors,
        constraints: Sequence[ScatterConstraint],
        lr: Dict[str, jnp.ndarray],
        weights: Dict[str, jnp.ndarray],
        phase: str,
        binnings=None,  # per-view Binning stacked on axis 0, or None
    ) -> Tuple[TrainState, GeometryPriors, Dict[str, jnp.ndarray]]:
        (total, (losses, new_cos, max_radii, mean_psnr)), grads = (
            jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, images, cams, priors, weights, phase,
                binnings,
            )
        )
        new_params, new_opt = adam_update(state.params, grads, state.opt, lr)
        new_params = apply_constraints(new_params, constraints)

        seen = max_radii > 0
        max_radius = jnp.where(
            seen,
            jnp.maximum(max_radii.astype(jnp.float32), state.max_2d_radius),
            state.max_2d_radius,
        )
        metrics = {("loss_" + k): v for k, v in losses.items()}
        metrics["loss_total"] = total
        metrics["psnr"] = mean_psnr
        return (
            TrainState(params=new_params, opt=new_opt, max_2d_radius=max_radius),
            priors._replace(cos_init=new_cos),
            metrics,
        )

    return step_impl


def make_batched_geometry_step(
    quadruples: Dict[str, DihedralQuadruples],
    umbrellas: Dict[str, UmbrellaFlatten],
    render_fn: Callable,
    sequential_views: bool = False,
    mesh=None,
    ring_indices=None,
    multiview_render_fn: Optional[Callable] = None,
) -> Callable:
    """Jitted all-views step (see ``_build_batched_step_impl``)."""
    step_impl = _build_batched_step_impl(
        quadruples, umbrellas, render_fn, sequential_views, mesh,
        ring_indices, multiview_render_fn,
    )
    return jax.jit(step_impl, static_argnames=("phase",))


def make_batched_geometry_multi_step(
    quadruples: Dict[str, DihedralQuadruples],
    umbrellas: Dict[str, UmbrellaFlatten],
    render_fn: Callable,
    sequential_views: bool = False,
    ring_indices=None,
    binned_render_fn: Optional[Callable] = None,
    binnings_fn: Optional[Callable] = None,
) -> Callable:
    """Scanned run of all-views steps: ONE dispatch for a whole segment.

    ``multi_step(state, images, cams, priors, constraints, lr, weights,
    phase, num_steps)`` scans ``num_steps`` (static) batched steps.
    Semantics match looping the single batched step.

    When ``binnings_fn(params, cams) -> stacked per-view Binning`` and
    ``binned_render_fn`` are given, per-view binnings are computed ONCE
    at segment entry and every scanned step renders along the frozen
    permutations — amortizing V duplicate-and-sorts per step down to V
    per segment (``raster.track_rebin_freq`` caps the segment length).
    Single-device sequential path only (the shard_map mesh path keeps
    fresh binning).
    """
    step_impl = _build_batched_step_impl(
        quadruples, umbrellas, render_fn, sequential_views, None,
        ring_indices, None, binned_render_fn,
    )
    freeze_binnings = binnings_fn is not None and binned_render_fn is not None

    @functools.partial(jax.jit, static_argnames=("phase", "num_steps"))
    def multi_step(
        state: TrainState,
        images: jnp.ndarray,  # (V, 3, H, W)
        cams: Camera,
        priors: GeometryPriors,
        constraints: Sequence[ScatterConstraint],
        lr: Dict[str, jnp.ndarray],
        weights: Dict[str, jnp.ndarray],
        phase: str,
        num_steps: int,
    ):
        binnings = None
        if freeze_binnings:
            binnings = binnings_fn(state.params, cams)

        def body(carry, _):
            state, priors = carry
            state, priors, m = step_impl(
                state, images, cams, priors, constraints, lr, weights,
                phase, binnings,
            )
            return (state, priors), m["loss_total"]

        (state, priors), losses = jax.lax.scan(
            body, (state, priors), None, length=num_steps
        )
        return state, priors, losses

    return multi_step
