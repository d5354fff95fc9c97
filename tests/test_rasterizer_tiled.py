"""Tiled rasterizer must match the oracle on pixels AND gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from topo4d_tpu.core.gaussian import activate_params, project_gaussians
from topo4d_tpu.rasterizer.reference import render_gaussians
from topo4d_tpu.rasterizer.tiled import render_gaussians_tiled
from topo4d_tpu.rasterizer.tiles import bin_gaussians, num_tiles, tile_rect, TILE
from topo4d_tpu.testing import make_synthetic_camera, make_synthetic_scene


@pytest.fixture(scope="module")
def scene():
    params = {k: jnp.asarray(v) for k, v in make_synthetic_scene(n=200, seed=3).items()}
    rv = activate_params(params)
    cam = make_synthetic_camera(width=80, height=56)
    return params, rv, cam


def test_binning_covers_every_visible_gaussian(scene):
    _, rv, cam = scene
    proj = project_gaussians(rv, cam)
    bins = bin_gaussians(proj, cam.width, cam.height, max_span=8)
    # every visible gaussian appears at least once among valid entries
    gids = np.asarray(bins.gauss_id)[np.asarray(bins.entry_valid)]
    visible = np.nonzero(np.asarray(proj.mask))[0]
    assert set(visible).issubset(set(gids.tolist()))
    assert int(bins.num_cropped) == 0
    # tile ranges partition the valid entries
    counts = np.asarray(bins.tile_count)
    assert counts.sum() == len(gids)


def test_binning_entries_sorted_by_depth_within_tile(scene):
    _, rv, cam = scene
    proj = project_gaussians(rv, cam)
    bins = bin_gaussians(proj, cam.width, cam.height, max_span=8)
    depths = np.asarray(proj.depths)
    starts = np.asarray(bins.tile_start)
    counts = np.asarray(bins.tile_count)
    gid = np.asarray(bins.gauss_id)
    for t in range(starts.shape[0]):
        seg = gid[starts[t] : starts[t] + counts[t]]
        d = depths[seg]
        assert (np.diff(d) >= -1e-6).all()


def test_tiled_matches_oracle_forward(scene):
    _, rv, cam = scene
    bg = jnp.asarray([0.2, 0.1, 0.4])
    ref = render_gaussians(rv, cam, bg=bg)
    got = render_gaussians_tiled(rv, cam, bg=bg, max_span=8, capacity=256)
    assert int(got.num_cropped) == 0
    assert int(got.num_overflow) == 0
    np.testing.assert_allclose(
        np.asarray(got.image), np.asarray(ref.image), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got.depth), np.asarray(ref.depth), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got.alpha), np.asarray(ref.alpha), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(got.radii), np.asarray(ref.radii))


def test_tiled_matches_oracle_gradients(scene):
    params, _, cam = scene
    target = jnp.zeros((3, cam.height, cam.width))

    def loss_ref(params):
        out = render_gaussians(activate_params(params), cam)
        return jnp.mean(jnp.abs(out.image - target)) + 0.1 * jnp.mean(out.alpha)

    def loss_tiled(params):
        out = render_gaussians_tiled(
            activate_params(params), cam, max_span=8, capacity=256
        )
        return jnp.mean(jnp.abs(out.image - target)) + 0.1 * jnp.mean(out.alpha)

    g_ref = jax.grad(loss_ref)(params)
    g_tiled = jax.grad(loss_tiled)(params)
    for k in g_ref:
        a, b = np.asarray(g_ref[k]), np.asarray(g_tiled[k])
        np.testing.assert_allclose(b, a, rtol=2e-3, atol=2e-6, err_msg=k)


def test_overflow_is_counted_not_silent(scene):
    _, rv, cam = scene
    got = render_gaussians_tiled(rv, cam, max_span=8, capacity=8)
    # with a tiny capacity, busy tiles must report overflow
    assert int(got.num_overflow) > 0


def test_crop_is_counted(scene):
    _, rv, cam = scene
    got = render_gaussians_tiled(rv, cam, max_span=1, capacity=256)
    assert int(got.num_cropped) > 0


def test_nonmultiple_image_sizes(scene):
    _, rv, _ = scene
    cam = make_synthetic_camera(width=50, height=37)  # not multiples of 16
    ref = render_gaussians(rv, cam)
    got = render_gaussians_tiled(rv, cam, max_span=8, capacity=256)
    np.testing.assert_allclose(
        np.asarray(got.image), np.asarray(ref.image), rtol=1e-4, atol=1e-5
    )


def test_capacity_not_multiple_of_chunk(scene):
    """capacity % chunk != 0 must not double-blend the overlap region."""
    _, rv, cam = scene
    aligned = render_gaussians_tiled(rv, cam, capacity=128, chunk=64)
    odd = render_gaussians_tiled(rv, cam, capacity=100, chunk=64)
    # both capacities cover every tile in this scene (no overflow), so
    # the images must agree exactly
    assert int(aligned.num_overflow) == 0 and int(odd.num_overflow) == 0
    np.testing.assert_allclose(
        np.asarray(odd.image), np.asarray(aligned.image), atol=1e-6
    )
