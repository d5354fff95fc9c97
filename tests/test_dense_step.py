"""Dense texture step: learning dynamics + frozen-binning equivalence.

The texture loop's contract (train.py:715-743): only colors/rotations
learn, loss = photometric + 0.02 soft_color anchor. The cached-binning
path must reproduce the per-iteration results of the re-binning path
exactly while params are unchanged, and track it closely across updates.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from topo4d_tpu.opt.adam import adam_init
from topo4d_tpu.rasterizer.pallas import binning_for, render_gaussians_pallas
from topo4d_tpu.texture.dense import (
    TextureState,
    dense_rendervars,
    make_texture_step,
)
from topo4d_tpu.testing import make_synthetic_camera


@pytest.fixture(scope="module")
def dense_setup():
    rng = np.random.default_rng(3)
    n = 120
    pts = rng.normal(0, 0.2, (n, 3)).astype(np.float32)
    pts[:, 2] *= 0.05
    params = {
        "dense_rgb_colors": rng.uniform(0.2, 0.8, (n, 3)).astype(np.float32),
        "dense_unnorm_rotations": np.tile(
            np.array([1, 0, 0, 0], np.float32), (n, 1)
        ),
        "dense_logit_opacities": np.full((n, 1), 2.0, np.float32),
        "dense_log_scales": np.full((n, 3), np.log(0.05), np.float32),
    }
    params = {k: jnp.asarray(v) for k, v in params.items()}
    cam = make_synthetic_camera(width=48, height=32)
    cams = jax.tree_util.tree_map(lambda x: jnp.asarray(x)[None], cam)
    means = jnp.asarray(pts)
    gt = jnp.asarray(
        rng.uniform(0, 1, (3, 32, 48)).astype(np.float32)
    )
    return params, cams, means, gt


def _run(dense_setup, binning, steps=4):
    params, cams, means, gt = dense_setup
    render = lambda rv, cam, b: render_gaussians_pallas(
        rv, cam, max_span=8, chunk=128, interpret=True, binning=b
    )
    step = make_texture_step(render)
    state = TextureState(params=dict(params), opt=adam_init(params))
    anchor = params["dense_rgb_colors"]
    lr = {k: jnp.asarray(0.01, jnp.float32) for k in params}
    weights = {"im": jnp.asarray(1.0), "soft_color": jnp.asarray(0.02)}
    vid = jnp.asarray(0, jnp.int32)
    losses, psnrs = [], []
    for _ in range(steps):
        state, m = step(
            state, means, gt, cams, vid, anchor, (), lr, weights, binning
        )
        losses.append(float(m["loss_total"]))
        psnrs.append(float(m["psnr"]))
    return losses, psnrs


def test_texture_step_learns(dense_setup):
    losses, psnrs = _run(dense_setup, binning=None)
    assert losses[-1] < losses[0]
    assert psnrs[-1] > psnrs[0]


def test_texture_step_cached_binning_tracks_direct(dense_setup):
    params, cams, means, _ = dense_setup
    binning = binning_for(
        dense_rendervars(params, means), cams[0], max_span=8
    )
    direct_losses, _ = _run(dense_setup, binning=None)
    cached_losses, _ = _run(dense_setup, binning=binning)
    # step 0 is exact (same params, same permutation); later steps may
    # deviate only through radii drift from rotation updates
    assert cached_losses[0] == pytest.approx(direct_losses[0], rel=1e-6)
    np.testing.assert_allclose(cached_losses, direct_losses, rtol=1e-3)


def test_texture_step_split_pack_matches_full(dense_setup):
    """split-pack (static frame-constant rows) == full pack.

    The split path gathers only the learned conic+color rows per step —
    those rows and the tile row are BITWISE equal to the full pack; the
    frame-constant x/y/depth rows may differ by one ulp because the
    binning captures them from its own compiled projection (XLA may
    reassociate differently across programs). Losses and learned-param
    trajectories must track to float tolerance over several updates
    (VERDICT r2 item 1: the named dense-phase lever).
    """
    params, cams, means, gt = dense_setup
    rv = dense_rendervars(params, means)
    full = binning_for(rv, cams[0], max_span=8)
    split = binning_for(rv, cams[0], max_span=8, with_static=True)
    assert split.static_rows is not None

    def run(binning):
        # production LR table shape: only colors/rotations learn
        # (train.py:281-286) — the split-pack contract
        render = lambda rv, cam, b: render_gaussians_pallas(
            rv, cam, max_span=8, chunk=128, interpret=True, binning=b
        )
        step = make_texture_step(render)
        state = TextureState(params=dict(params), opt=adam_init(params))
        anchor = params["dense_rgb_colors"]
        lr = {
            "dense_rgb_colors": jnp.asarray(0.01, jnp.float32),
            "dense_unnorm_rotations": jnp.asarray(0.01, jnp.float32),
            "dense_logit_opacities": jnp.asarray(0.0, jnp.float32),
            "dense_log_scales": jnp.asarray(0.0, jnp.float32),
        }
        weights = {"im": jnp.asarray(1.0), "soft_color": jnp.asarray(0.02)}
        vid = jnp.asarray(0, jnp.int32)
        losses = []
        for _ in range(4):
            state, m = step(
                state, means, gt, cams, vid, anchor, (), lr, weights,
                binning,
            )
            losses.append(float(m["loss_total"]))
        return losses, state

    full_losses, full_state = run(full)
    split_losses, split_state = run(split)
    np.testing.assert_allclose(split_losses, full_losses, rtol=1e-6)
    for k in ("dense_rgb_colors", "dense_unnorm_rotations"):
        np.testing.assert_allclose(
            np.asarray(split_state.params[k]),
            np.asarray(full_state.params[k]),
            rtol=1e-5, atol=1e-7,
        )
    # learned rows + tile row of the pack are bitwise equal; static
    # x/y/opacity/depth rows agree to a relative ulp
    from topo4d_tpu.core.gaussian import project_gaussians
    from topo4d_tpu.rasterizer.tiles import pack_with_binning

    proj = project_gaussians(rv, cams[0])
    p_full = np.asarray(
        pack_with_binning(proj, rv.colors, rv.opacities, full).packed
    )
    p_split = np.asarray(
        pack_with_binning(proj, rv.colors, rv.opacities, split).packed
    )
    exact_rows = [2, 3, 4, 6, 8, 9, 10]  # conics, tile, colors
    np.testing.assert_array_equal(p_split[exact_rows], p_full[exact_rows])
    np.testing.assert_allclose(p_split, p_full, rtol=1e-6)


def test_frozen_compact_tiles_match_per_step(dense_setup):
    """binning_for(tile_capacity=...) == per-step compact computation.

    The compact argsort over the tile canvas is a per-frame constant
    under a frozen binning; freezing it must not change a pixel.
    """
    params, cams, means, gt = dense_setup
    rv = dense_rendervars(params, means)
    cap = 4  # below the 48x32 canvas's 6 tiles so compact mode engages
    plain = binning_for(rv, cams[0], max_span=8)
    frozen = binning_for(rv, cams[0], max_span=8, tile_capacity=cap)
    assert frozen.compact is not None
    out_plain = render_gaussians_pallas(
        rv, cams[0], max_span=8, chunk=128, interpret=True,
        binning=plain, tile_capacity=cap,
    )
    out_frozen = render_gaussians_pallas(
        rv, cams[0], max_span=8, chunk=128, interpret=True,
        binning=frozen, tile_capacity=cap,
    )
    np.testing.assert_array_equal(
        np.asarray(out_frozen.image), np.asarray(out_plain.image)
    )
    assert int(out_frozen.num_overflow) == int(out_plain.num_overflow)


def test_texture_step_masked_loss(dense_setup):
    """use_mask_dense: masked L1 over parsing regions (train.py:392-405)."""
    from topo4d_tpu.config import DEFAULT_CMAP_INDEX
    from topo4d_tpu.pipeline.masks import bgr_colormap

    params, cams, means, gt = dense_setup
    render = lambda rv, cam, b: render_gaussians_pallas(
        rv, cam, max_span=8, chunk=128, interpret=True, binning=b
    )
    step = make_texture_step(
        render, use_mask=True, cmap_index=DEFAULT_CMAP_INDEX
    )
    h, w = 32, 48
    mask_img = np.zeros((3, h, w), np.float32)
    skin = bgr_colormap(14)[DEFAULT_CMAP_INDEX["skin"]].astype(np.float32)
    mask_img[:, 8:24, 12:36] = (skin / 255.0)[:, None, None]

    state = TextureState(params=dict(params), opt=adam_init(params))
    anchor = params["dense_rgb_colors"]
    lr = {k: jnp.asarray(0.01, jnp.float32) for k in params}
    weights = {"im": jnp.asarray(1.0), "soft_color": jnp.asarray(0.02)}
    vid = jnp.asarray(0, jnp.int32)
    state, m = step(
        state, means, gt, cams, vid, anchor, (), lr, weights, None,
        mask=jnp.asarray(mask_img),
    )
    # the im term equals a hand-computed masked L1 on the RENDERED image
    rv = dense_rendervars(dict(params), means)
    im = render_gaussians_pallas(
        rv, cams[0], max_span=8, chunk=128, interpret=True
    ).image
    region = np.zeros((h, w), bool)
    region[8:24, 12:36] = True
    diff = np.abs(np.asarray(im) - np.asarray(gt))[:, region]
    want = diff.sum() / (3 * region.sum())
    np.testing.assert_allclose(float(m["loss_im"]), want, rtol=1e-5)


def test_texture_step_tile_sharded_matches_single(dense_setup):
    """Dense step with the tile-sharded renderer == single-device."""
    from jax.sharding import Mesh
    from topo4d_tpu.rasterizer.pallas import (
        render_gaussians_pallas_tile_sharded,
    )

    params, cams, means, gt = dense_setup
    mesh = Mesh(np.array(jax.devices()[:8]), ("tile",))
    render_sharded = lambda rv, c, b: render_gaussians_pallas_tile_sharded(
        rv, c, mesh, max_span=8, chunk=128, interpret=True, binning=b
    )
    step = make_texture_step(render_sharded)
    state = TextureState(params=dict(params), opt=adam_init(params))
    anchor = params["dense_rgb_colors"]
    lr = {k: jnp.asarray(0.01, jnp.float32) for k in params}
    weights = {"im": jnp.asarray(1.0), "soft_color": jnp.asarray(0.02)}
    vid = jnp.asarray(0, jnp.int32)
    state_s, m_s = step(
        state, means, gt, cams, vid, anchor, (), lr, weights, None
    )
    # reference: the plain single-device step
    render_plain = lambda rv, c, b: render_gaussians_pallas(
        rv, c, max_span=8, chunk=128, interpret=True, binning=b
    )
    step_p = make_texture_step(render_plain)
    state0 = TextureState(params=dict(params), opt=adam_init(params))
    state_p, m_p = step_p(
        state0, means, gt, cams, vid, anchor, (), lr, weights, None
    )
    np.testing.assert_allclose(
        float(m_s["loss_total"]), float(m_p["loss_total"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(state_s.params["dense_rgb_colors"]),
        np.asarray(state_p.params["dense_rgb_colors"]),
        rtol=1e-4, atol=1e-6,
    )


def test_compact_capacity_implied_by_binning(dense_setup):
    """Auto tile capacity (texture.tile_capacity = -1, VERDICT r3 item 7):
    a frozen binning carrying a compact tile list engages compact-mode
    blending WITHOUT the static tile_capacity argument — capacity is
    implied by the list's shape (attach_compact output) — and matches
    both the explicit-capacity render and the full-canvas render when
    the capacity covers every occupied tile."""
    from topo4d_tpu.rasterizer.pallas import attach_compact
    from topo4d_tpu.testing import make_synthetic_camera

    params, cams0, means, gt = dense_setup
    # wider canvas than the fixture's (its 6 tiles are all occupied):
    # compact mode needs empty background tiles to skip
    cam = make_synthetic_camera(width=160, height=96)
    cams = jax.tree_util.tree_map(lambda x: jnp.asarray(x)[None], cam)
    rv = dense_rendervars(params, means)
    plain = binning_for(rv, cams[0], max_span=8)
    occ = int(np.sum(np.asarray(plain.tile_count) > 0))
    t = int(plain.tile_count.shape[0])
    assert occ + 1 < t, (occ, t)
    cap = occ + 1  # engage compact mode, no dropped tiles
    frozen = attach_compact(plain, cap)
    assert frozen.compact is not None
    assert frozen.compact.ids.shape[0] == cap

    out_implied = render_gaussians_pallas(
        rv, cams[0], max_span=8, chunk=128, interpret=True,
        binning=frozen,  # no tile_capacity arg
    )
    out_explicit = render_gaussians_pallas(
        rv, cams[0], max_span=8, chunk=128, interpret=True,
        binning=frozen, tile_capacity=cap,
    )
    out_full = render_gaussians_pallas(
        rv, cams[0], max_span=8, chunk=128, interpret=True,
        binning=plain,
    )
    np.testing.assert_array_equal(
        np.asarray(out_implied.image), np.asarray(out_explicit.image)
    )
    np.testing.assert_array_equal(
        np.asarray(out_implied.image), np.asarray(out_full.image)
    )
    assert int(out_implied.num_overflow) == 0

    # attach_compact at canvas size leaves compact mode off
    same = attach_compact(plain, t)
    assert same.compact is None
