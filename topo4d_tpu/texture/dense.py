"""Dense-Gaussian texture optimization (the reference's texture loop).

Reference semantics (train.py:381-417, 715-743): a second, denser Gaussian
set sampled in UV space renders the full-resolution views; only
``dense_rgb_colors`` and ``dense_unnorm_rotations`` learn; the loss is
photometric + a soft L1 anchor to the previous frame's colors (x0.02);
non-frontal dense colors are zeroed before every step. Dense means3D are
re-derived from the tracked geometry each frame by the jitted bilinear
gather (``topology.interpolate``).
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from topo4d_tpu.core.camera import Camera
from topo4d_tpu.core.gaussian import GaussianRenderVars
from topo4d_tpu.core.quaternion import quat_normalize
from topo4d_tpu.losses.image import l1_loss_sum_last, photometric_loss, psnr
from topo4d_tpu.opt.adam import AdamState, adam_update
from topo4d_tpu.opt.constraints import ScatterConstraint, apply_constraints

# facial regions kept in the masked dense loss (reference train.py:396-398)
DENSE_MASK_LABELS = (
    "skin", "l_eyebrow", "r_eyebrow", "nose", "upper_lip", "lower_lip",
    "l_ear", "r_ear", "hair",
)


class TextureState(NamedTuple):
    params: Dict[str, jnp.ndarray]  # dense_* parameter dict
    opt: AdamState


def dense_rendervars(
    params: Dict[str, jnp.ndarray], dense_means3d: jnp.ndarray
) -> GaussianRenderVars:
    """params2rendervar_dense (reference helpers.py:102-112): means frozen."""
    return GaussianRenderVars(
        means3d=jax.lax.stop_gradient(dense_means3d),
        colors=params["dense_rgb_colors"],
        rotations=quat_normalize(params["dense_unnorm_rotations"]),
        opacities=jax.nn.sigmoid(params["dense_logit_opacities"]).reshape(-1),
        scales=jnp.exp(params["dense_log_scales"]),
    )


def _build_texture_step_impl(
    render_fn: Callable,
    use_mask: bool = False,
    cmap_index: Optional[Dict[str, int]] = None,
    remat: bool = False,
) -> Callable:
    """Texture iteration body: zero-region scatters -> render -> loss ->
    Adam (reference train.py:729-741, incl. the pre-step color zeroing).

    ``render_fn(rv, cam, binning)``: ``binning`` is an optional frozen
    tile permutation (``rasterizer.pallas.binning_for``). Dense means3D
    are stop-gradient and scales/opacities do not learn, so the depth
    order is stable across the 301 iterations; reusing the permutation
    removes the per-iteration duplicate-and-sort. ``texture.rebin_freq``
    in the config selects the cadence (0 = once per frame per view).

    ``use_mask`` (the reference's ``use_mask_dense``, train.py:392-405):
    the photometric term becomes a parsing-masked L1 over the facial
    regions in ``DENSE_MASK_LABELS`` — sum |im-gt| over masked pixels
    divided by the masked-pixel count; the step then takes a ``mask``
    (3, H, W) parsing image argument.
    """

    def loss_fn(params, dense_means3d, gt, cam, anchor_colors, weights,
                binning, mask):
        rv = dense_rendervars(params, dense_means3d)
        out = render_fn(rv, cam, binning)
        if use_mask:
            from topo4d_tpu.pipeline.masks import get_mask

            m = get_mask(DENSE_MASK_LABELS, mask, cmap_index)
            im_loss = jnp.sum(jnp.abs((out.image - gt) * m)) / jnp.maximum(
                jnp.sum(m), 1.0
            )
        else:
            # remat (texture.remat_photometric) trades ~2 GB of saved
            # SSIM residuals for a re-forward; OFF by default since the
            # Pallas blur VJP saves nothing (29.2 vs 20.9 ms at 4K)
            photo = (
                jax.checkpoint(photometric_loss) if remat
                else photometric_loss
            )
            im_loss = photo(out.image, gt)
        losses = {
            "im": im_loss,
            "soft_color": l1_loss_sum_last(
                params["dense_rgb_colors"], anchor_colors
            ),
        }
        total = sum(weights[k] * v for k, v in losses.items() if k in weights)
        return total, (losses, out.radii, out.image, out.num_overflow)

    def step_impl(
        state: TextureState,
        dense_means3d: jnp.ndarray,
        gt: jnp.ndarray,  # (3, H, W)
        cams: Camera,
        view_id: jnp.ndarray,
        anchor_colors: jnp.ndarray,  # previous frame's dense colors
        pre_constraints: Sequence[ScatterConstraint],
        lr: Dict[str, jnp.ndarray],
        weights: Dict[str, jnp.ndarray],
        binning=None,
        with_metrics: bool = True,
        mask=None,  # (3, H, W) parsing image when use_mask
    ) -> Tuple[TextureState, Dict[str, jnp.ndarray]]:
        cam = cams[view_id]
        params = apply_constraints(state.params, pre_constraints)
        (total, (losses, radii, im, overflow)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(
            params, dense_means3d, gt, cam, anchor_colors, weights,
            binning, mask,
        )
        new_params, new_opt = adam_update(params, grads, state.opt, lr)
        metrics = {("loss_" + k): v for k, v in losses.items()}
        metrics["loss_total"] = total
        # dropped-tile count under texture.tile_capacity (0 when off or
        # sized right) — the trainer surfaces any non-zero value
        metrics["num_tile_overflow"] = overflow
        if with_metrics:
            # PSNR at 4K costs a full-image pass; the reference reports it
            # only every dense_log_freq iterations (train.py:742)
            metrics["psnr"] = jnp.mean(psnr(im, gt))
        return TextureState(params=new_params, opt=new_opt), metrics

    return step_impl


def make_texture_step(
    render_fn: Callable,
    use_mask: bool = False,
    cmap_index: Optional[Dict[str, int]] = None,
    remat: bool = False,
) -> Callable:
    """Single-iteration jitted texture step (see the impl docstring)."""
    return jax.jit(
        _build_texture_step_impl(render_fn, use_mask, cmap_index, remat),
        static_argnames=("with_metrics",),
    )


def make_texture_eval(render_fn: Callable) -> Callable:
    """Eval-only dense PSNR on a FIXED view (r5; VERDICT r4 item 6).

    The logged ``tex_psnr`` renders whichever random view the log
    iteration optimizes (the reference's report cadence,
    train.py:454-495), so consecutive rows carry large per-view variance
    — a tracked frame's 19.3 -> 13.3 "decline" was indistinguishable
    from divergence (r4 tex8k verifier). This renders ONE fixed view at
    the current params without stepping, so consecutive values are
    comparable; the trainer logs it as ``tex_psnr_fixed`` next to the
    per-step ``tex_psnr``. Trajectory-neutral: no state is updated.
    """

    @jax.jit
    def eval_psnr(
        state: TextureState,
        dense_means3d: jnp.ndarray,
        gt: jnp.ndarray,  # (3, H, W) fixed view's target
        cams: Camera,
        view_id: jnp.ndarray,
        binning=None,
    ) -> jnp.ndarray:
        rv = dense_rendervars(state.params, dense_means3d)
        out = render_fn(rv, cams[view_id], binning)
        return jnp.mean(psnr(out.image, gt))

    return eval_psnr


def make_texture_multi_step(
    render_fn: Callable,
    use_mask: bool = False,
    cmap_index: Optional[Dict[str, int]] = None,
    remat: bool = False,
) -> Callable:
    """Scanned texture segment: one dispatch for a run of iterations.

    ``binnings`` is the per-view frozen-binning pytree STACKED over views
    (leading axis V) or None; the scan body indexes it by the iteration's
    view id. ``masks`` is the (V, 3, H, W) parsing batch when the masked
    dense loss is on. Semantics match looping the single step with
    metrics off.
    """
    step_impl = _build_texture_step_impl(render_fn, use_mask, cmap_index, remat)

    @jax.jit
    def multi_step(
        state: TextureState,
        dense_means3d: jnp.ndarray,
        images: jnp.ndarray,  # (V, 3, H, W)
        cams: Camera,
        view_ids: jnp.ndarray,  # (S,) int32
        anchor_colors: jnp.ndarray,
        pre_constraints: Sequence[ScatterConstraint],
        lr: Dict[str, jnp.ndarray],
        weights: Dict[str, jnp.ndarray],
        binnings=None,  # per-view Binning stacked on axis 0, or None
        masks=None,  # (V, 3, H, W) parsing images, or None
    ):
        def body(carry, vid):
            binning = None
            if binnings is not None:
                binning = jax.tree_util.tree_map(
                    lambda x: x[vid], binnings
                )
            new_state, m = step_impl(
                carry, dense_means3d, images[vid], cams, vid,
                anchor_colors, pre_constraints, lr, weights, binning,
                with_metrics=False,
                mask=None if masks is None else masks[vid],
            )
            return new_state, m["loss_total"]

        state, losses = jax.lax.scan(body, state, view_ids)
        return state, losses

    return multi_step
