"""Progress reporting: periodic rendered views + PSNR.

Reference ``report_progress`` / ``report_progress_dense``
(train.py:454-495): every ``log_freq`` iterations, re-render the configured
log views with the current parameters, compute PSNR against the frame's
ground truth, and save PNGs under ``<out>/<frame>/``.
"""

from __future__ import annotations

import functools
import os
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from topo4d_tpu.core.gaussian import activate_params
from topo4d_tpu.losses.image import psnr


@functools.partial(
    jax.jit, static_argnames=("render_fn", "apply_exposure")
)
def _log_view(render_fn, params, cam, gt, vid, apply_exposure):
    """One jitted render+exposure+PSNR per log view (eager ops through a
    tunneled TPU cost seconds each; the trainer passes the same render_fn
    object every call, so this compiles once). Param activation happens
    INSIDE the compiled graph for the same reason."""
    rv = activate_params(params) if "means3D" in params else None
    out = render_fn(rv, cam)
    im = out.image
    if apply_exposure and "cam_m" in params:
        im = (
            jnp.exp(params["cam_m"][vid])[:, None, None] * im
            + params["cam_c"][vid][:, None, None]
        )
    return jnp.clip(im, 0.0, 1.0), jnp.mean(psnr(im, gt))


def save_render_png(image: jnp.ndarray, path: str) -> None:
    """(3, H, W) float -> PNG."""
    from PIL import Image

    arr = np.asarray(jnp.clip(image, 0.0, 1.0))
    Image.fromarray(
        (arr.transpose(1, 2, 0) * 255).astype(np.uint8)
    ).save(path)


def report_progress(
    params: Dict[str, jnp.ndarray],
    render_fn,
    cams,
    images: jnp.ndarray,  # (V, 3, H, W) ground truth
    view_names: Sequence[str],
    log_views: Sequence[str],
    out_dir: str,
    frame: int,
    iteration: int,
    apply_exposure: bool = True,
) -> Optional[float]:
    """Render + save the configured views; returns the last view's PSNR."""
    last = None
    frame_dir = os.path.join(out_dir, "%06d" % frame)
    os.makedirs(frame_dir, exist_ok=True)
    for name in log_views:
        if name not in view_names:
            continue
        vid = list(view_names).index(name)
        im, view_psnr = _log_view(
            render_fn, params, cams[vid], images[vid],
            jnp.asarray(vid, jnp.int32), apply_exposure,
        )
        last = float(view_psnr)
        save_render_png(
            im, os.path.join(frame_dir, f"vis{name}_{iteration}.png")
        )
    return last
