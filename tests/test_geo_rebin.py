"""Geometry-phase binning amortization (raster.track_rebin_freq).

Scanned geometry segments may freeze per-view binnings computed at
segment entry (opt.step.make_geometry_multi_step /
parallel.batched.make_batched_geometry_multi_step). The permutation the
duplicate-and-sort produces depends only on projected centers, depths
and radii; with geometry frozen (track LRs zero the relevant params) the
frozen path must be EXACT, and with the reference track LRs (means
~1.6e-5/step) the trajectory must stay within tolerance of fresh
binning. The scanned batched multi-step without frozen binnings must be
bit-comparable to looping the single batched step.
"""

import numpy as np
import jax
import jax.numpy as jnp

from topo4d_tpu.core.gaussian import activate_params
from topo4d_tpu.core.quaternion import quat_normalize
from topo4d_tpu.losses.flatten import (
    build_dihedral_quadruples,
    build_fused_flatten,
    build_umbrella_flatten,
    dihedral_cos,
)
from topo4d_tpu.losses.temporal import make_temporal_priors
from topo4d_tpu.opt.adam import adam_init
from topo4d_tpu.opt.step import (
    HARD_FLATTEN_KEYS,
    SOFT_FLATTEN_KEYS,
    GeometryPriors,
    TrainState,
    make_geometry_multi_step,
)
from topo4d_tpu.parallel.batched import (
    make_batched_geometry_multi_step,
    make_batched_geometry_step,
)
from topo4d_tpu.rasterizer.pallas import binning_for, render_gaussians_pallas
from topo4d_tpu.testing import make_head_fixture
from topo4d_tpu.topology.adjacency import build_one_ring, triangulate_faces

WEIGHTS = {
    "im": 1.0, "rigid": 3.5, "rot": 20.0, "iso": 20.0,
    "flat": 2e-4, "flat_lip_bottom": 2e-4, "flat_lid_top": 2e-4,
    "flat_lid_bottom": 1e-2, "flat_lip": 1e-4, "flat_mouth": 1e-3,
    "flat_eye": 1e4, "flat_face_bottom": 1e3, "flat_lip_socket": 1e3,
}
# reference track-phase LRs (train.py:606-616)
TRACK_LR = {
    "means3D": 1.6e-5, "rgb_colors": 0.0, "unnorm_rotations": 1e-3,
    "log_scales": 0.0, "logit_opacities": 0.0, "cam_m": 0.0, "cam_c": 0.0,
}
# colors learn, geometry (and thus the binning permutation) frozen
COLOR_LR = {
    "means3D": 0.0, "rgb_colors": 2.5e-3, "unnorm_rotations": 0.0,
    "log_scales": 0.0, "logit_opacities": 0.0, "cam_m": 0.0, "cam_c": 0.0,
}


def _setup(V=4):
    params_np, cams, (verts, faces) = make_head_fixture(
        rows=10, cols=10, num_views=V, width=48, height=32
    )
    n = verts.shape[0]
    params = {k: jnp.asarray(v) for k, v in params_np.items()}
    ring = build_one_ring(verts, faces)
    tris = np.asarray(triangulate_faces(faces))
    quads = build_dihedral_quadruples(tris)
    umb = build_umbrella_flatten(ring.ragged, n)
    quadruples = {
        k: quads
        for k in (
            "flat", "flat_lip_bottom", "flat_lip", "flat_mouth",
            "flat_lid_top", "flat_lid_bottom",
        )
    }
    umbrellas = {
        k: umb for k in ("flat_eye", "flat_lip_socket", "flat_face_bottom")
    }

    render_fn = lambda rv, cam: render_gaussians_pallas(
        rv, cam, max_span=4, interpret=True
    )
    binned_render_fn = lambda rv, cam, binning: render_gaussians_pallas(
        rv, cam, max_span=4, interpret=True, binning=binning
    )

    def binnings_fn(p, cams):
        rv = activate_params(p)
        v = jax.tree_util.tree_leaves(cams)[0].shape[0]
        return jax.lax.map(
            lambda vid: binning_for(rv, cams[vid], max_span=4),
            jnp.arange(v, dtype=jnp.int32),
        )

    rot_n = quat_normalize(params["unnorm_rotations"])
    nbrT = jnp.asarray(np.ascontiguousarray(np.asarray(ring.indices).T))
    wT = jnp.asarray(np.ascontiguousarray(np.asarray(ring.weight).T))
    fused = build_fused_flatten(
        quadruples, HARD_FLATTEN_KEYS, SOFT_FLATTEN_KEYS
    )
    priors = GeometryPriors(
        neighbor_indices=nbrT,
        neighbor_dist=jnp.asarray(
            np.ascontiguousarray(np.asarray(ring.dist).T)
        ),
        iso_w=wT, rig_w=wT, rot_w=wT,
        init_scale=jnp.full((n,), 0.05),
        temporal=make_temporal_priors(params["means3D"], rot_n, nbrT),
        cos_init=dihedral_cos(params["means3D"], fused.quads)[
            fused.num_hard:
        ],
    )

    # target: perturbed vertices (a tracked frame)
    rng = np.random.default_rng(3)
    tgt = dict(params)
    tgt["means3D"] = params["means3D"] + jnp.asarray(
        rng.normal(0, 0.005, (n, 3)).astype(np.float32)
    )
    rvt = activate_params(tgt)
    images = jnp.stack([
        render_fn(rvt, jax.tree_util.tree_map(lambda x: x[i], cams)).image
        for i in range(V)
    ])
    state = TrainState(
        params=params, opt=adam_init(params), max_2d_radius=jnp.zeros(n)
    )
    return (
        quadruples, umbrellas, render_fn, binned_render_fn, binnings_fn,
        np.asarray(ring.indices), state, priors, images, cams,
    )


def _lr(table):
    return {k: jnp.asarray(v, jnp.float32) for k, v in table.items()}


def test_batched_multi_step_matches_step_loop():
    (quadruples, umbrellas, render_fn, _, _, ring_idx, state, priors,
     images, cams) = _setup()
    stepB = make_batched_geometry_step(
        quadruples, umbrellas, render_fn, sequential_views=True,
        ring_indices=ring_idx,
    )
    multi = make_batched_geometry_multi_step(
        quadruples, umbrellas, render_fn, sequential_views=True,
        ring_indices=ring_idx,
    )
    lr = _lr(TRACK_LR)
    S = 3

    st, pr = state, priors
    for _ in range(S):
        st, pr, _ = stepB(st, images, cams, pr, (), lr, WEIGHTS, "track")

    st2, pr2, losses = multi(
        state, images, cams, priors, (), lr, WEIGHTS, "track", S
    )
    assert losses.shape == (S,)
    for k in st.params:
        np.testing.assert_allclose(
            np.asarray(st2.params[k]), np.asarray(st.params[k]),
            rtol=1e-6, atol=1e-7, err_msg=k,
        )


def test_batched_frozen_binning_exact_when_geometry_frozen():
    (quadruples, umbrellas, render_fn, binned_render_fn, binnings_fn,
     ring_idx, state, priors, images, cams) = _setup()
    fresh = make_batched_geometry_multi_step(
        quadruples, umbrellas, render_fn, sequential_views=True,
        ring_indices=ring_idx,
    )
    frozen = make_batched_geometry_multi_step(
        quadruples, umbrellas, render_fn, sequential_views=True,
        ring_indices=ring_idx, binned_render_fn=binned_render_fn,
        binnings_fn=binnings_fn,
    )
    lr = _lr(COLOR_LR)  # binning inputs (means/scales/rots) frozen
    S = 3
    st_a, _, la = fresh(
        state, images, cams, priors, (), lr, WEIGHTS, "track", S
    )
    st_b, _, lb = frozen(
        state, images, cams, priors, (), lr, WEIGHTS, "track", S
    )
    np.testing.assert_allclose(np.asarray(lb), np.asarray(la), rtol=1e-6)
    for k in st_a.params:
        np.testing.assert_allclose(
            np.asarray(st_b.params[k]), np.asarray(st_a.params[k]),
            rtol=1e-6, atol=1e-7, err_msg=k,
        )


def test_batched_frozen_binning_tracks_fresh_at_reference_lrs():
    (quadruples, umbrellas, render_fn, binned_render_fn, binnings_fn,
     ring_idx, state, priors, images, cams) = _setup()
    fresh = make_batched_geometry_multi_step(
        quadruples, umbrellas, render_fn, sequential_views=True,
        ring_indices=ring_idx,
    )
    frozen = make_batched_geometry_multi_step(
        quadruples, umbrellas, render_fn, sequential_views=True,
        ring_indices=ring_idx, binned_render_fn=binned_render_fn,
        binnings_fn=binnings_fn,
    )
    lr = _lr(TRACK_LR)
    S = 4
    st_a, _, la = fresh(
        state, images, cams, priors, (), lr, WEIGHTS, "track", S
    )
    st_b, _, lb = frozen(
        state, images, cams, priors, (), lr, WEIGHTS, "track", S
    )
    # optimization must progress identically to measurement precision:
    # means move ~lr/step, far below a tile
    np.testing.assert_allclose(np.asarray(lb), np.asarray(la), rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(st_b.params["means3D"]),
        np.asarray(st_a.params["means3D"]),
        atol=5e-5,
    )


def test_single_view_multi_step_frozen_binning():
    (quadruples, umbrellas, render_fn, binned_render_fn, binnings_fn,
     ring_idx, state, priors, images, cams) = _setup()
    fresh = make_geometry_multi_step(
        quadruples, umbrellas, render_fn, ring_indices=ring_idx,
    )
    frozen = make_geometry_multi_step(
        quadruples, umbrellas, render_fn, ring_indices=ring_idx,
        binned_render_fn=binned_render_fn, binnings_fn=binnings_fn,
    )
    vids = jnp.asarray([0, 1, 2, 3, 1, 0], jnp.int32)

    # geometry-frozen LRs: frozen binning is exact
    lr = _lr(COLOR_LR)
    st_a, _, la = fresh(
        state, images, cams, vids, priors, (), lr, WEIGHTS, "track"
    )
    st_b, _, lb = frozen(
        state, images, cams, vids, priors, (), lr, WEIGHTS, "track"
    )
    np.testing.assert_allclose(np.asarray(lb), np.asarray(la), rtol=1e-6)
    for k in st_a.params:
        np.testing.assert_allclose(
            np.asarray(st_b.params[k]), np.asarray(st_a.params[k]),
            rtol=1e-6, atol=1e-7, err_msg=k,
        )

    # reference track LRs: within tolerance
    lr = _lr(TRACK_LR)
    st_a, _, la = fresh(
        state, images, cams, vids, priors, (), lr, WEIGHTS, "track"
    )
    st_b, _, lb = frozen(
        state, images, cams, vids, priors, (), lr, WEIGHTS, "track"
    )
    np.testing.assert_allclose(np.asarray(lb), np.asarray(la), rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(st_b.params["means3D"]),
        np.asarray(st_a.params["means3D"]),
        atol=5e-5,
    )


def test_track_rebin_auto_default_is_exact_in_parity_mode():
    """VERDICT r3 item 4: the default config must give the reference's
    exact per-render fresh sort in parity mode (views_per_step=1); the
    frozen-binning approximation stays the default only for the batched
    mode where it is validated. Explicit values always win."""
    from topo4d_tpu.config import Config, effective_track_rebin_freq
    from topo4d_tpu.pipeline.trainer import make_geo_binning_fns

    cfg = Config()
    assert cfg.raster.track_rebin_freq == -1  # auto
    assert cfg.schedule.views_per_step == 1
    assert effective_track_rebin_freq(cfg) == 0
    # parity mode: no frozen-binning machinery is built at all
    assert make_geo_binning_fns(cfg) == (None, None)

    cfg.schedule.views_per_step = 0
    assert effective_track_rebin_freq(cfg) == 25
    brf, bfn = make_geo_binning_fns(cfg)
    assert brf is not None and bfn is not None

    # explicit settings override auto in both modes
    cfg.raster.track_rebin_freq = 0
    assert effective_track_rebin_freq(cfg) == 0
    cfg.schedule.views_per_step = 1
    cfg.raster.track_rebin_freq = 7
    assert effective_track_rebin_freq(cfg) == 7
