"""shard_map view parallelism — the multi-chip path for the Pallas backend.

jit-with-sharding (parallel/batched.py) lets XLA partition a vmapped view
batch, but the Pallas blend kernels have no batching rule. Under
``shard_map`` each device runs the UNBATCHED per-view pipeline on its local
views (a sequential ``lax.map`` inside the shard) and the photometric loss
reduces with ``psum`` over the ``view`` axis — gradients of the replicated
Gaussian parameters all-reduce over ICI automatically (shard_map is
differentiable; the psum transposes to a broadcast and the replicated
params' grads psum back).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from topo4d_tpu.core.camera import Camera
from topo4d_tpu.losses.image import photometric_loss, psnr


def make_sharded_view_loss(render_fn: Callable, mesh: Mesh):
    """Returns ``fn(rv, images, cams, cam_m, cam_c) -> (loss, psnr, radii)``.

    images/cams/cam_m/cam_c carry a leading view axis sharded over the
    mesh's ``view`` axis; the return values are replicated scalars
    (mean loss, mean psnr) and the per-Gaussian max radii over all views.
    """

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P("view"), P("view"), P("view"), P("view")),
        out_specs=(P(), P(), P()),
        # pallas_call emits ShapeDtypeStructs without varying-mesh-axis
        # annotations; skip the vma check
        check_vma=False,
    )
    def sharded(rv, images, cams, cam_m, cam_c):
        def one_view(args):
            gt, cam, cm, cc = args
            out = render_fn(rv, cam)
            im = jnp.exp(cm)[:, None, None] * out.image + cc[:, None, None]
            return photometric_loss(im, gt), jnp.mean(psnr(im, gt)), out.radii

        losses, psnrs, radii = jax.lax.map(one_view, (images, cams, cam_m, cam_c))
        total_views = jax.lax.psum(
            jnp.asarray(images.shape[0], jnp.float32), "view"
        )
        loss = jax.lax.psum(jnp.sum(losses), "view") / total_views
        mean_psnr = jax.lax.psum(jnp.sum(psnrs), "view") / total_views
        max_radii = jax.lax.pmax(jnp.max(radii, axis=0), "view")
        return loss, mean_psnr, max_radii

    return sharded
