"""Fused multi-view render == per-view renders (values AND grads).

The batched all-views step renders every view in ONE Pallas launch on a
virtual tall canvas (rasterizer.pallas.render_gaussians_pallas_multiview);
views never share tiles, so each view's output must match the single-view
renderer exactly. Reference semantics contract: the per-view render is the
CUDA rasterizer's (SURVEY N1); the multi-view fusion is our TPU scaling
construct (reference train.py:105-112 optimizes one random view per step).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from topo4d_tpu.core.gaussian import activate_params
from topo4d_tpu.rasterizer.pallas import (
    render_gaussians_pallas,
    render_gaussians_pallas_multiview,
)
from topo4d_tpu.testing import make_camera_ring

V, H, W = 3, 64, 72


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(0)
    n = 220
    params = {
        "means3D": rng.normal(0, 0.3, (n, 3)).astype(np.float32),
        "rgb_colors": rng.uniform(0, 1, (n, 3)).astype(np.float32),
        "unnorm_rotations": rng.normal(0, 1, (n, 4)).astype(np.float32),
        "logit_opacities": rng.normal(1, 1, (n, 1)).astype(np.float32),
        "log_scales": rng.normal(-3.0, 0.3, (n, 3)).astype(np.float32),
    }
    params = {k: jnp.asarray(v) for k, v in params.items()}
    cams = make_camera_ring(V, width=W, height=H, distance=1.5)
    gt = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (V, 3, H, W)).astype(
            np.float32
        )
    )
    return params, cams, gt


def _single(params, cams, i):
    return render_gaussians_pallas(
        activate_params(params), cams[i], max_span=2, chunk=128,
        interpret=True,
    )


def _multi(params, cams, tile_capacity=None):
    return render_gaussians_pallas_multiview(
        activate_params(params), cams, max_span=2, chunk=128,
        interpret=True, tile_capacity=tile_capacity,
    )


def test_multiview_forward_matches_per_view(scene):
    params, cams, _ = scene
    out_m = _multi(params, cams)
    for i in range(V):
        out_s = _single(params, cams, i)
        np.testing.assert_allclose(
            out_m.image[i], out_s.image, rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            out_m.depth[i], out_s.depth, rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            out_m.alpha[i], out_s.alpha, rtol=1e-5, atol=1e-6
        )
        np.testing.assert_array_equal(out_m.radii[i], out_s.radii)


def test_multiview_grads_match_per_view(scene):
    params, cams, gt = scene

    def loss_m(p):
        return jnp.sum((_multi(p, cams).image - gt) ** 2)

    def loss_s(p):
        return sum(
            jnp.sum((_single(p, cams, i).image - gt[i]) ** 2)
            for i in range(V)
        )

    lm, gm = jax.value_and_grad(loss_m)(params)
    ls, gs = jax.value_and_grad(loss_s)(params)
    np.testing.assert_allclose(lm, ls, rtol=1e-5)
    # f32 accumulation order differs (per-view sums vs one fused sum)
    for k in params:
        np.testing.assert_allclose(
            gm[k], gs[k], rtol=1e-3, atol=2e-5, err_msg=k
        )


def test_multiview_compact_matches_full(scene):
    params, cams, gt = scene
    out_m = _multi(params, cams)
    # capacity: all non-empty tiles fit (the test scene fills most of the
    # tiny canvas, so compaction barely compresses — that's fine, the
    # point is path parity with zero overflow)
    t_all = V * (-(-H // 16)) * (-(-W // 16))
    cap = t_all - 1
    out_c = _multi(params, cams, tile_capacity=cap)
    assert int(out_c.num_overflow) == 0
    np.testing.assert_allclose(
        out_c.image, out_m.image, rtol=1e-5, atol=1e-6
    )

    gm = jax.grad(lambda p: jnp.sum((_multi(p, cams).image - gt) ** 2))(
        params
    )
    gc = jax.grad(
        lambda p: jnp.sum(
            (_multi(p, cams, tile_capacity=cap).image - gt) ** 2
        )
    )(params)
    for k in params:
        np.testing.assert_allclose(
            gc[k], gm[k], rtol=1e-5, atol=1e-6, err_msg=k
        )
