"""Pallas kernels (interpret mode on CPU) vs the oracle: pixels AND grads."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from topo4d_tpu.core.gaussian import activate_params, project_gaussians
from topo4d_tpu.rasterizer.pallas import render_gaussians_pallas
from topo4d_tpu.rasterizer.reference import render_gaussians
from topo4d_tpu.rasterizer.tiles import bin_gaussians_packed, num_tiles
from topo4d_tpu.testing import make_synthetic_camera, make_synthetic_scene


@pytest.fixture(scope="module")
def scene():
    params = {k: jnp.asarray(v) for k, v in make_synthetic_scene(n=160, seed=7).items()}
    rv = activate_params(params)
    cam = make_synthetic_camera(width=64, height=48)
    return params, rv, cam


def test_packed_binning_alignment(scene):
    _, rv, cam = scene
    proj = project_gaussians(rv, cam)
    bins = bin_gaussians_packed(
        proj, rv.colors, rv.opacities, cam.width, cam.height, max_span=8, chunk=128
    )
    starts = np.asarray(bins.tile_start)
    counts = np.asarray(bins.tile_count)
    # ranges are contiguous and non-overlapping
    ends = starts + counts
    assert (starts[1:] == ends[:-1]).all()
    packed = np.asarray(bins.packed)
    # each tile's entries carry its own tile id in the mask field
    for t in (0, len(starts) // 2, len(starts) - 1):
        seg = packed[6, starts[t] : ends[t]]
        assert (seg == t).all()
    # tail (invalid entries + padding) can never alias a real tile:
    # sentinel == num_tiles, padding == -1
    tail = packed[6, ends[-1]:]
    assert ((tail >= len(starts)) | (tail == -1.0)).all()
    assert packed.shape[1] % 128 == 0


def test_pallas_forward_matches_oracle(scene):
    _, rv, cam = scene
    bg = jnp.asarray([0.3, 0.2, 0.1])
    ref = render_gaussians(rv, cam, bg=bg)
    got = render_gaussians_pallas(rv, cam, bg=bg, max_span=8, chunk=128, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got.image), np.asarray(ref.image), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got.depth), np.asarray(ref.depth), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got.alpha), np.asarray(ref.alpha), rtol=1e-4, atol=1e-5
    )


def test_pallas_gradients_match_oracle(scene):
    params, _, cam = scene
    rng = np.random.default_rng(0)
    target = jnp.asarray(rng.uniform(0, 1, (3, cam.height, cam.width)).astype(np.float32))
    bg = jnp.asarray([0.1, 0.5, 0.2])

    def loss_ref(params):
        out = render_gaussians(activate_params(params), cam, bg=bg)
        return (
            jnp.mean(jnp.abs(out.image - target))
            + 0.05 * jnp.mean(out.alpha)
            + 0.02 * jnp.mean(out.depth)
        )

    def loss_pallas(params):
        out = render_gaussians_pallas(
            activate_params(params), cam, bg=bg, max_span=8, chunk=128, interpret=True
        )
        return (
            jnp.mean(jnp.abs(out.image - target))
            + 0.05 * jnp.mean(out.alpha)
            + 0.02 * jnp.mean(out.depth)
        )

    v_ref, g_ref = jax.value_and_grad(loss_ref)(params)
    v_pal, g_pal = jax.value_and_grad(loss_pallas)(params)
    np.testing.assert_allclose(float(v_pal), float(v_ref), rtol=1e-5)
    for k in g_ref:
        a, b = np.asarray(g_ref[k]), np.asarray(g_pal[k])
        scale = np.maximum(np.abs(a).max(), 1e-8)
        np.testing.assert_allclose(
            b / scale, a / scale, rtol=2e-3, atol=2e-5, err_msg=k
        )


def test_pallas_means2d_offset_gradient(scene):
    params, rv, cam = scene
    n = rv.means3d.shape[0]

    def loss(offset):
        out = render_gaussians_pallas(
            rv, cam, means2d_offset=offset, max_span=8, chunk=128, interpret=True
        )
        return jnp.sum(out.image**2)

    g = jax.grad(loss)(jnp.zeros((n, 2)))
    arr = np.asarray(g)
    assert np.isfinite(arr).all()
    assert np.abs(arr).max() > 0


def test_cached_binning_matches_direct(scene):
    """Frozen-permutation packing == sort-with-data packing: pixels + grads."""
    from topo4d_tpu.rasterizer.pallas import binning_for

    params, rv, cam = scene
    bg = jnp.asarray([0.2, 0.1, 0.4])
    binning = binning_for(rv, cam, max_span=8)

    direct = render_gaussians_pallas(
        rv, cam, bg=bg, max_span=8, chunk=128, interpret=True
    )
    cached = render_gaussians_pallas(
        rv, cam, bg=bg, max_span=8, chunk=128, interpret=True,
        binning=binning,
    )
    np.testing.assert_allclose(
        np.asarray(cached.image), np.asarray(direct.image),
        rtol=1e-6, atol=1e-7,
    )
    np.testing.assert_array_equal(
        np.asarray(cached.num_cropped), np.asarray(direct.num_cropped)
    )

    rng = np.random.default_rng(1)
    target = jnp.asarray(
        rng.uniform(0, 1, (3, cam.height, cam.width)).astype(np.float32)
    )

    def loss(params, binning):
        out = render_gaussians_pallas(
            activate_params(params), cam, bg=bg, max_span=8, chunk=128,
            interpret=True, binning=binning,
        )
        return jnp.mean(jnp.abs(out.image - target)) + 0.05 * jnp.mean(
            out.alpha
        )

    g_direct = jax.grad(loss)(params, None)
    g_cached = jax.grad(loss)(params, binning)
    for k in g_direct:
        a, b = np.asarray(g_direct[k]), np.asarray(g_cached[k])
        scale = np.maximum(np.abs(a).max(), 1e-8)
        np.testing.assert_allclose(
            b / scale, a / scale, rtol=1e-4, atol=1e-6, err_msg=k
        )


def test_gradients_in_saturated_windows_match_oracle():
    """>80 nats of opacity in one window: the log-space backward stays
    exact where a clamped division-based reconstruction breaks down."""
    n = 64  # all in one tile -> one window, sum log(1-0.99) ~ 295 nats
    rng = np.random.default_rng(5)
    params = {
        "means3D": jnp.asarray(
            rng.normal(0, 0.003, (n, 3)).astype(np.float32)
            + np.array([0, 0, 0], np.float32)
        ),
        "rgb_colors": jnp.asarray(
            rng.uniform(0.2, 0.8, (n, 3)).astype(np.float32)
        ),
        "unnorm_rotations": jnp.asarray(
            np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
        ),
        "logit_opacities": jnp.full((n, 1), 8.0),  # sigmoid -> ~0.9997
        "log_scales": jnp.full((n, 3), np.log(0.05)),
    }
    cam = make_synthetic_camera(width=32, height=32)
    rng2 = np.random.default_rng(6)
    target = jnp.asarray(
        rng2.uniform(0, 1, (3, 32, 32)).astype(np.float32)
    )

    def loss(params, renderer):
        out = renderer(activate_params(params), cam)
        return (
            jnp.mean(jnp.abs(out.image - target))
            + 0.05 * jnp.mean(out.alpha)
        )

    g_ref = jax.grad(loss)(
        params, lambda rv, c: render_gaussians(rv, c)
    )
    g_pal = jax.grad(loss)(
        params,
        lambda rv, c: render_gaussians_pallas(
            rv, c, max_span=8, chunk=128, interpret=True
        ),
    )
    for k in g_ref:
        a, b = np.asarray(g_ref[k]), np.asarray(g_pal[k])
        scale = np.maximum(np.abs(a).max(), 1e-8)
        np.testing.assert_allclose(
            b / scale, a / scale, rtol=2e-3, atol=5e-5, err_msg=k
        )


def test_batched_quad_tile_fast_path_matches_oracle():
    """Sparse scene: every grid step's 4 tiles share window 0 -> the
    batched (tps*PX, chunk) fast path runs and must match the oracle."""
    n = 24
    rng = np.random.default_rng(9)
    params = {
        "means3D": jnp.asarray(
            rng.uniform(-0.4, 0.4, (n, 3)).astype(np.float32)
        ),
        "rgb_colors": jnp.asarray(
            rng.uniform(0.1, 0.9, (n, 3)).astype(np.float32)
        ),
        "unnorm_rotations": jnp.asarray(
            np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
        ),
        "logit_opacities": jnp.asarray(
            rng.uniform(0.5, 3.0, (n, 1)).astype(np.float32)
        ),
        "log_scales": jnp.full((n, 3), np.log(0.02)),
    }
    rv = activate_params(params)
    cam = make_synthetic_camera(width=128, height=64)  # 8x4 = 32 tiles
    bg = jnp.asarray([0.1, 0.2, 0.3])
    ref = render_gaussians(rv, cam, bg=bg)
    got = render_gaussians_pallas(
        rv, cam, bg=bg, max_span=2, chunk=128, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got.image), np.asarray(ref.image), rtol=1e-4, atol=1e-5
    )

    # gradients through the same sparse configuration
    target = jnp.asarray(
        rng.uniform(0, 1, (3, 64, 128)).astype(np.float32)
    )

    def loss(params, renderer):
        out = renderer(activate_params(params), cam)
        return jnp.mean(jnp.abs(out.image - target)) + 0.05 * jnp.mean(
            out.alpha
        )

    g_ref = jax.grad(loss)(params, lambda rv, c: render_gaussians(rv, c, bg=bg))
    g_pal = jax.grad(loss)(
        params,
        lambda rv, c: render_gaussians_pallas(
            rv, c, bg=bg, max_span=2, chunk=128, interpret=True
        ),
    )
    for k in g_ref:
        a, b = np.asarray(g_ref[k]), np.asarray(g_pal[k])
        scale = np.maximum(np.abs(a).max(), 1e-8)
        np.testing.assert_allclose(
            b / scale, a / scale, rtol=2e-3, atol=2e-5, err_msg=k
        )


def test_variant_parity_resident_vs_stream(scene):
    """Forced resident and streaming blend kernels agree exactly.

    The auto dispatch picks the VMEM-resident kernel for small entry
    arrays (pallas_resident.fits_resident); this pins BOTH paths and
    checks value + gradient equality so neither loses coverage.
    """
    params, _, cam = scene
    bg = jnp.asarray([0.15, 0.25, 0.35])
    rng = np.random.default_rng(3)
    target = jnp.asarray(
        rng.uniform(0, 1, (3, cam.height, cam.width)).astype(np.float32)
    )

    def loss(params, variant):
        out = render_gaussians_pallas(
            activate_params(params), cam, bg=bg, max_span=8, chunk=128,
            interpret=True, variant=variant,
        )
        return (
            jnp.mean(jnp.abs(out.image - target))
            + 0.05 * jnp.mean(out.alpha)
            + 0.02 * jnp.mean(out.depth)
        )

    v_res, g_res = jax.value_and_grad(lambda p: loss(p, "resident"))(params)
    v_str, g_str = jax.value_and_grad(lambda p: loss(p, "stream"))(params)
    np.testing.assert_allclose(float(v_res), float(v_str), rtol=1e-6)
    for k in g_res:
        a, b = np.asarray(g_str[k]), np.asarray(g_res[k])
        scale = np.maximum(np.abs(a).max(), 1e-8)
        np.testing.assert_allclose(
            b / scale, a / scale, rtol=1e-5, atol=1e-7, err_msg=k
        )


def test_variant_parity_v3_vs_stream(scene):
    """The unified window-span v3 kernels agree with the v1 streaming path.

    Same CUDA blend contract (SURVEY N1); v3 walks the union of each
    grid step's tile windows once with all tiles' pixel rows batched
    (collective early termination — see _fwd_kernel_v3). max_span=8
    exercises multi-window spans, the prefetch drain, and per-tile
    window-count residuals that differ from v1's per-tile walk.
    """
    params, _, cam = scene
    bg = jnp.asarray([0.15, 0.25, 0.35])
    rng = np.random.default_rng(3)
    target = jnp.asarray(
        rng.uniform(0, 1, (3, cam.height, cam.width)).astype(np.float32)
    )

    def loss(params, variant):
        out = render_gaussians_pallas(
            activate_params(params), cam, bg=bg, max_span=8, chunk=128,
            interpret=True, variant=variant,
        )
        return (
            jnp.mean(jnp.abs(out.image - target))
            + 0.05 * jnp.mean(out.alpha)
            + 0.02 * jnp.mean(out.depth)
        )

    v2, g2 = jax.value_and_grad(lambda p: loss(p, "v3"))(params)
    v1, g1 = jax.value_and_grad(lambda p: loss(p, "stream"))(params)
    np.testing.assert_allclose(float(v2), float(v1), rtol=1e-6)
    for k in g1:
        a, b = np.asarray(g1[k]), np.asarray(g2[k])
        scale = np.maximum(np.abs(a).max(), 1e-8)
        np.testing.assert_allclose(
            b / scale, a / scale, rtol=1e-3, atol=2e-5, err_msg=k
        )


def test_tile_capacity_compact_matches_full(scene):
    """Compact non-empty-tile mode == full-grid render: pixels + grads.

    tile_capacity blends only occupied tiles and composites the rest as
    background; with enough capacity the result must be identical.
    Also checks the overflow counter stays 0 at sufficient capacity and
    counts dropped tiles when the capacity is too small.
    """
    params, rv, cam = scene
    from topo4d_tpu.core.gaussian import project_gaussians
    from topo4d_tpu.rasterizer.tiles import bin_gaussians_packed

    proj = project_gaussians(rv, cam)
    bins = bin_gaussians_packed(
        proj, rv.colors, rv.opacities, cam.width, cam.height, max_span=8,
        chunk=128,
    )
    n_occupied = int(np.sum(np.asarray(bins.tile_count) > 0))
    assert n_occupied > 2  # fixture sanity

    bg = jnp.asarray([0.3, 0.1, 0.2])
    rng = np.random.default_rng(5)
    target = jnp.asarray(
        rng.uniform(0, 1, (3, cam.height, cam.width)).astype(np.float32)
    )

    def loss(params, cap):
        out = render_gaussians_pallas(
            activate_params(params), cam, bg=bg, max_span=8, chunk=128,
            interpret=True, tile_capacity=cap,
        )
        return (
            jnp.mean(jnp.abs(out.image - target))
            + 0.05 * jnp.mean(out.alpha)
            + 0.02 * jnp.mean(out.depth)
        )

    full = render_gaussians_pallas(
        rv, cam, bg=bg, max_span=8, chunk=128, interpret=True
    )
    compact = render_gaussians_pallas(
        rv, cam, bg=bg, max_span=8, chunk=128, interpret=True,
        tile_capacity=n_occupied,
    )
    np.testing.assert_allclose(
        np.asarray(compact.image), np.asarray(full.image),
        rtol=1e-6, atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(compact.depth), np.asarray(full.depth),
        rtol=1e-6, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(compact.alpha), np.asarray(full.alpha),
        rtol=1e-6, atol=1e-7,
    )
    assert int(compact.num_overflow) == 0

    v_full, g_full = jax.value_and_grad(lambda p: loss(p, None))(params)
    v_comp, g_comp = jax.value_and_grad(
        lambda p: loss(p, n_occupied)
    )(params)
    np.testing.assert_allclose(float(v_comp), float(v_full), rtol=1e-6)
    for k in g_full:
        a, b = np.asarray(g_full[k]), np.asarray(g_comp[k])
        scale = np.maximum(np.abs(a).max(), 1e-8)
        np.testing.assert_allclose(
            b / scale, a / scale, rtol=1e-5, atol=1e-7, err_msg=k
        )

    # under-capacity: dropped tiles are COUNTED, never silent
    tiny = render_gaussians_pallas(
        rv, cam, bg=bg, max_span=8, chunk=128, interpret=True,
        tile_capacity=max(1, n_occupied - 2),
    )
    assert int(tiny.num_overflow) == 2


def test_split_dot_accuracy():
    """split_dot's bf16 decomposition vs the exact f32 dot.

    The production TPU config runs mask-operand blend dots via
    split_dot (pallas_blend MASK_DOT_MODE='split3'); on CPU the sites
    resolve to HIGHEST, so this test pins the decomposition's accuracy
    directly: with the exact-bf16 operand (0/1 masks / integer moment
    basis), parts=3 must carry ~f32-accumulation accuracy and parts=2 ~2^-16.
    """
    from topo4d_tpu.rasterizer.pallas_blend import (
        _moment_basis,
        _tri_masks,
        split_dot,
    )

    rng = np.random.default_rng(3)
    dn = (((1,), (0,)), ((), ()))
    # blend-like magnitudes: log1p(-alpha) in [-4.6, 0]
    a = jnp.asarray(
        -rng.uniform(0.0, 4.6, (256, 128)).astype(np.float32)
    )
    u_prefix, l_suffix = _tri_masks(128)
    exact = jax.lax.dot_general(
        a, u_prefix, dn, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    scale = float(jnp.max(jnp.abs(exact)))
    for parts, tol in ((3, 2e-6), (2, 1e-4)):
        got = split_dot(a, u_prefix, dn, "rhs", parts)
        err = float(jnp.max(jnp.abs(got - exact))) / scale
        assert err < tol, (parts, err)

    # exact-lhs variant (the moment-basis site)
    basis = _moment_basis()  # (256, 8) integers <= 256: exactly bf16
    dpow = jnp.asarray(rng.normal(0, 1, (256, 128)).astype(np.float32))
    dn_l = (((0,), (0,)), ((), ()))
    exact_m = jax.lax.dot_general(
        basis, dpow, dn_l, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    scale_m = float(jnp.max(jnp.abs(exact_m)))
    got_m = split_dot(basis, dpow, dn_l, "lhs", 3)
    err_m = float(jnp.max(jnp.abs(got_m - exact_m))) / scale_m
    assert err_m < 2e-6, err_m
