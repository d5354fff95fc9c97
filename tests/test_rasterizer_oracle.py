"""Oracle rasterizer tests.

The key test: the parallel cumprod blending must match a literal sequential
NumPy port of the CUDA per-pixel loop (termination rule included).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from topo4d_tpu.core.gaussian import activate_params, project_gaussians
from topo4d_tpu.rasterizer.reference import (
    blend_weights,
    depth_sorted_order,
    render_gaussians,
    _alpha_at_pixels,
)
from topo4d_tpu.testing import (
    make_synthetic_camera,
    make_synthetic_scene,
    sequential_blend_numpy,
)


@pytest.fixture(scope="module")
def scene():
    params = {k: jnp.asarray(v) for k, v in make_synthetic_scene(n=128).items()}
    rv = activate_params(params)
    cam = make_synthetic_camera(width=48, height=32)
    return params, rv, cam


def test_projection_visible(scene):
    _, rv, cam = scene
    proj = project_gaussians(rv, cam)
    # most synthetic gaussians should be visible in front of the camera
    assert int(np.sum(np.asarray(proj.mask))) > 100
    radii = np.asarray(proj.radii)
    assert radii[np.asarray(proj.mask)].min() >= 1
    assert (radii[~np.asarray(proj.mask)] == 0).all()


def test_parallel_blend_matches_sequential_cuda_loop(scene):
    _, rv, cam = scene
    proj = project_gaussians(rv, cam)
    order = depth_sorted_order(proj)
    means2d = np.asarray(proj.means2d)[order]
    conics = np.asarray(proj.conics)[order]
    colors = np.asarray(rv.colors)[order]
    depths = np.asarray(proj.depths)[order]
    opac = np.asarray(rv.opacities)[order]
    valid = np.asarray(proj.mask)[order]
    bg = np.array([0.1, 0.2, 0.3])

    rng = np.random.default_rng(0)
    pix = np.stack(
        [rng.uniform(0, cam.width, 200), rng.uniform(0, cam.height, 200)], axis=-1
    ).astype(np.float32)

    rgb_seq, dep_seq, a_seq = sequential_blend_numpy(
        pix, means2d, conics, colors, depths, opac, valid, bg
    )

    alpha = _alpha_at_pixels(
        jnp.asarray(pix), jnp.asarray(means2d), jnp.asarray(conics),
        jnp.asarray(opac), jnp.asarray(valid),
    )
    w, t_final = blend_weights(alpha)
    rgb_par = np.asarray(w @ jnp.asarray(colors)) + np.asarray(t_final)[:, None] * bg
    dep_par = np.asarray(w @ jnp.asarray(depths))
    a_par = 1.0 - np.asarray(t_final)

    np.testing.assert_allclose(rgb_par, rgb_seq, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(dep_par, dep_seq, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(a_par, a_seq, rtol=1e-4, atol=1e-5)


def test_render_full_image_matches_sequential(scene):
    _, rv, cam = scene
    bg = np.array([0.0, 0.0, 0.0], np.float32)
    out = render_gaussians(rv, cam, bg=jnp.asarray(bg))
    assert out.image.shape == (3, cam.height, cam.width)
    assert out.depth.shape == (1, cam.height, cam.width)
    assert out.alpha.shape == (1, cam.height, cam.width)

    proj = project_gaussians(rv, cam)
    order = depth_sorted_order(proj)
    from topo4d_tpu.rasterizer.tiles import tile_rect

    rx0, ry0, rx1, ry1, _, _ = tile_rect(proj, cam.width, cam.height)
    rect = tuple(np.asarray(r)[order] for r in (rx0, ry0, rx1, ry1))
    ys, xs = np.meshgrid(np.arange(5, 20, 7), np.arange(3, 45, 11), indexing="ij")
    pix = np.stack([xs.ravel(), ys.ravel()], axis=-1).astype(np.float32)
    rgb_seq, dep_seq, a_seq = sequential_blend_numpy(
        pix,
        np.asarray(proj.means2d)[order],
        np.asarray(proj.conics)[order],
        np.asarray(rv.colors)[order],
        np.asarray(proj.depths)[order],
        np.asarray(rv.opacities)[order],
        np.asarray(proj.mask)[order],
        bg,
        rect=rect,
    )
    img = np.asarray(out.image)
    for i, (x, y) in enumerate(pix.astype(int)):
        np.testing.assert_allclose(img[:, y, x], rgb_seq[i], rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(out.depth)[0, y, x], dep_seq[i], rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out.alpha)[0, y, x], a_seq[i], rtol=1e-4, atol=1e-5
        )


def test_background_fills_empty_pixels(scene):
    _, rv, cam = scene
    bg = jnp.asarray([0.25, 0.5, 0.75])
    out = render_gaussians(rv, cam, bg=bg)
    # corner pixels should be (nearly) pure background
    img = np.asarray(out.image)
    corner = img[:, 0, 0]
    alpha_corner = float(np.asarray(out.alpha)[0, 0, 0])
    if alpha_corner < 1e-3:
        np.testing.assert_allclose(corner, np.asarray(bg), atol=1e-2)


def test_gradients_flow_and_are_finite(scene):
    params, rv, cam = scene
    target = jnp.zeros((3, cam.height, cam.width))

    def loss_fn(params):
        rv = activate_params(params)
        out = render_gaussians(rv, cam)
        return jnp.mean(jnp.abs(out.image - target))

    grads = jax.grad(loss_fn)(params)
    for k, g in grads.items():
        arr = np.asarray(g)
        assert np.isfinite(arr).all(), f"non-finite grad in {k}"
    # means and colors must receive nonzero gradient
    assert np.abs(np.asarray(grads["means3D"])).max() > 0
    assert np.abs(np.asarray(grads["rgb_colors"])).max() > 0


def test_means2d_offset_carries_screen_gradient(scene):
    params, rv, cam = scene
    n = rv.means3d.shape[0]

    def loss_fn(offset):
        out = render_gaussians(rv, cam, means2d_offset=offset)
        return jnp.sum(out.image**2)

    g = jax.grad(loss_fn)(jnp.zeros((n, 2)))
    arr = np.asarray(g)
    assert np.isfinite(arr).all()
    assert np.abs(arr).max() > 0


def test_depth_order_deterministic(scene):
    _, rv, cam = scene
    proj = project_gaussians(rv, cam)
    o1 = np.asarray(depth_sorted_order(proj))
    o2 = np.asarray(depth_sorted_order(proj))
    np.testing.assert_array_equal(o1, o2)
