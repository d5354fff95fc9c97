import jax
import jax.numpy as jnp
import numpy as np
import pytest

from topo4d_tpu.core.camera import Camera
from topo4d_tpu.losses.temporal import TemporalPriors
from topo4d_tpu.opt.adam import adam_init, adam_update, reset_moments
from topo4d_tpu.opt.constraints import ScatterConstraint, apply_constraints
from topo4d_tpu.opt.step import GeometryPriors, TrainState, make_geometry_step
from topo4d_tpu.core.gaussian import activate_params
from topo4d_tpu.rasterizer.reference import render_gaussians
from topo4d_tpu.testing import make_camera_ring, make_synthetic_scene


def test_adam_matches_torch():
    torch = pytest.importorskip("torch")
    x0 = np.array([1.5, -2.0, 0.5], np.float32)
    lr = 0.1

    tp = torch.nn.Parameter(torch.tensor(x0.copy()))
    topt = torch.optim.Adam([tp], lr=lr, eps=1e-15)
    for _ in range(20):
        topt.zero_grad()
        loss = (tp**2).sum() + tp.sum()
        loss.backward()
        topt.step()

    params = {"x": jnp.asarray(x0)}
    state = adam_init(params)
    lrs = {"x": jnp.asarray(lr)}
    grad_fn = jax.grad(lambda p: jnp.sum(p["x"] ** 2) + jnp.sum(p["x"]))
    for _ in range(20):
        grads = grad_fn(params)
        params, state = adam_update(params, grads, state, lrs)
    np.testing.assert_allclose(
        np.asarray(params["x"]), tp.detach().numpy(), rtol=2e-4, atol=1e-5
    )


def test_adam_per_leaf_path_matches_fused():
    """Large models dispatch to the per-leaf Adam; identical math."""
    from topo4d_tpu.opt.adam import _adam_update_per_leaf

    rng = np.random.default_rng(11)
    params = {
        "a": jnp.asarray(rng.normal(size=(1000, 3)).astype(np.float32)),
        "b": jnp.asarray(rng.normal(size=(1000, 4)).astype(np.float32)),
        "c": jnp.asarray(rng.normal(size=(7,)).astype(np.float32)),
    }
    grads = {
        k: jnp.asarray(rng.normal(size=v.shape).astype(np.float32))
        for k, v in params.items()
    }
    lrs = {"a": jnp.asarray(0.01), "b": jnp.asarray(0.002),
           "c": jnp.asarray(0.1)}
    # different step counts per leaf exercise the bias corrections
    state = adam_init(params)
    state = state._replace(
        step={"a": jnp.asarray(3, jnp.int32), "b": jnp.asarray(0, jnp.int32),
              "c": jnp.asarray(10, jnp.int32)}
    )
    pf, sf = adam_update(params, grads, state, lrs)  # fused (small total)
    pl, sl = _adam_update_per_leaf(
        params, grads, state, lrs, 0.9, 0.999, 1e-15
    )
    for k in params:
        np.testing.assert_allclose(
            np.asarray(pl[k]), np.asarray(pf[k]), rtol=1e-6, atol=1e-7
        )
        np.testing.assert_allclose(
            np.asarray(sl.mu[k]), np.asarray(sf.mu[k]), rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(sl.nu[k]), np.asarray(sf.nu[k]), rtol=1e-6, atol=1e-12
        )
        assert int(sl.step[k]) == int(sf.step[k])


def test_reset_moments_keeps_step():
    params = {"a": jnp.ones(3), "b": jnp.ones(3)}
    state = adam_init(params)
    grads = {"a": jnp.ones(3), "b": jnp.ones(3)}
    params, state = adam_update(params, grads, state, {"a": 0.1, "b": 0.1})
    state = reset_moments(state, ["a"])
    assert float(jnp.sum(jnp.abs(state.mu["a"]))) == 0.0
    assert float(jnp.sum(jnp.abs(state.mu["b"]))) > 0.0
    assert int(state.step["a"]) == 1


def test_apply_constraints():
    params = {"c": jnp.zeros((5, 3))}
    con = [
        ScatterConstraint(param="c", idx=np.array([1, 3], np.int32), value=jnp.ones((2, 3)) * 7)
    ]
    out = apply_constraints(params, con)
    np.testing.assert_allclose(np.asarray(out["c"])[1], 7.0)
    np.testing.assert_allclose(np.asarray(out["c"])[0], 0.0)


# ------------------------------------------------- end-to-end fit (config 1)


@pytest.mark.slow
def test_single_frame_fit_improves_psnr():
    """BASELINE config 1: single-frame fit, PSNR must improve substantially."""
    n = 96
    params_true = {
        k: jnp.asarray(v) for k, v in make_synthetic_scene(n=n, seed=0).items()
    }
    cams = make_camera_ring(2, width=48, height=36)
    rv_true = activate_params(params_true)
    gts = [
        render_gaussians(rv_true, cams[i]).image for i in range(2)
    ]

    # perturb colors and positions
    rng = np.random.default_rng(1)
    params = dict(params_true)
    params["rgb_colors"] = params_true["rgb_colors"] + jnp.asarray(
        rng.normal(0, 0.2, (n, 3)).astype(np.float32)
    )
    params["means3D"] = params_true["means3D"] + jnp.asarray(
        rng.normal(0, 0.01, (n, 3)).astype(np.float32)
    )
    params["cam_m"] = jnp.zeros((2, 3))
    params["cam_c"] = jnp.zeros((2, 3))

    step = make_geometry_step({}, {}, render_gaussians)

    nbr = np.tile(np.arange(4)[:, None], (1, n)).astype(np.int32)  # (K, N)
    priors = GeometryPriors(
        neighbor_indices=jnp.asarray(nbr),
        neighbor_dist=jnp.zeros((4, n)),
        iso_w=jnp.zeros((4, n)),
        rig_w=jnp.zeros((4, n)),
        rot_w=jnp.zeros((4, n)),
        init_scale=jnp.exp(params_true["log_scales"][:, 0]),
        temporal=TemporalPriors(
            prev_inv_rot=jnp.zeros((4, n)), prev_offset=jnp.zeros((3, 4, n))
        ),
        cos_init=jnp.zeros(0),
    )
    state = TrainState(
        params=params, opt=adam_init(params), max_2d_radius=jnp.zeros(n)
    )
    lr = {
        "means3D": 1e-3, "rgb_colors": 2.5e-3, "unnorm_rotations": 1e-3,
        "logit_opacities": 0.0, "log_scales": 1e-3, "cam_m": 0.0, "cam_c": 0.0,
    }
    weights = {"im": 1.0, "scale": 0.0, "scale_max": 0.0}

    def eval_psnr(state):
        vals = []
        for i in range(2):
            out = render_gaussians(activate_params(state.params), cams[i])
            mse = jnp.mean((out.image - gts[i]) ** 2)
            vals.append(float(20 * jnp.log10(1.0 / jnp.sqrt(mse))))
        return np.mean(vals)

    psnr_before = eval_psnr(state)
    for i in range(150):
        vid = jnp.asarray(i % 2, jnp.int32)
        state, priors, metrics = step(
            state, gts[int(vid)], cams, vid, priors, [], lr, weights, "init"
        )
    psnr_after = eval_psnr(state)
    assert psnr_after > psnr_before + 4.0, (psnr_before, psnr_after)
    assert np.isfinite(float(metrics["loss_total"]))


@pytest.mark.slow
def test_track_phase_with_all_losses_runs():
    """Track phase with temporal + flatten losses compiles and is finite."""
    from topo4d_tpu.losses.flatten import (
        build_dihedral_quadruples,
        build_umbrella_flatten,
    )
    from topo4d_tpu.topology.adjacency import build_one_ring, triangulate_faces
    from topo4d_tpu.testing import make_grid_mesh
    from topo4d_tpu.core.quaternion import quat_normalize
    from topo4d_tpu.losses.temporal import make_temporal_priors
    from topo4d_tpu.losses.flatten import dihedral_cos

    verts, faces = make_grid_mesh(6, 6)
    verts = verts * 0.05
    n = verts.shape[0]
    ring = build_one_ring(verts, faces)
    tris = np.asarray(triangulate_faces(faces))
    quads = build_dihedral_quadruples(tris)
    umb = build_umbrella_flatten(ring.ragged, n)

    params = {
        "means3D": jnp.asarray(verts),
        "rgb_colors": jnp.full((n, 3), 0.5),
        "unnorm_rotations": jnp.asarray(np.tile([1.0, 0, 0, 0], (n, 1)).astype(np.float32)),
        "logit_opacities": jnp.full((n, 1), 3.0),
        "log_scales": jnp.full((n, 3), np.log(0.02).astype(np.float32)),
        "cam_m": jnp.zeros((2, 3)),
        "cam_c": jnp.zeros((2, 3)),
    }
    cams = make_camera_ring(2, width=40, height=30, distance=1.0)
    gt = render_gaussians(activate_params(params), cams[0]).image

    rot_n = quat_normalize(params["unnorm_rotations"])
    temporal = make_temporal_priors(
        params["means3D"], rot_n, jnp.asarray(ring.indices.T)
    )
    from topo4d_tpu.losses.flatten import build_fused_flatten
    from topo4d_tpu.opt.step import HARD_FLATTEN_KEYS, SOFT_FLATTEN_KEYS

    quadruples = {
        "flat": quads, "flat_lip_bottom": quads, "flat_lip": quads,
        "flat_mouth": quads, "flat_lid_top": quads, "flat_lid_bottom": quads,
    }
    fused = build_fused_flatten(quadruples, HARD_FLATTEN_KEYS, SOFT_FLATTEN_KEYS)
    cos_fused = dihedral_cos(params["means3D"], fused.quads)[fused.num_hard:]
    priors = GeometryPriors(
        neighbor_indices=jnp.asarray(ring.indices.T),
        neighbor_dist=jnp.asarray(ring.dist.T),
        iso_w=jnp.asarray(ring.weight.T),
        rig_w=jnp.asarray(ring.weight.T),
        rot_w=jnp.asarray(ring.weight.T),
        init_scale=jnp.full((n,), 0.02),
        temporal=temporal,
        cos_init=cos_fused,
    )
    umbrellas = {"flat_eye": umb, "flat_lip_socket": umb, "flat_face_bottom": umb}
    step = make_geometry_step(quadruples, umbrellas, render_gaussians)

    state = TrainState(params=params, opt=adam_init(params), max_2d_radius=jnp.zeros(n))
    lr = {k: 1e-4 for k in params}
    weights = {
        "im": 1.0, "rigid": 3.5, "rot": 20.0, "iso": 20.0,
        "flat": 2e-4, "flat_lip_bottom": 2e-4, "flat_lid_top": 2e-4,
        "flat_lid_bottom": 1e-2, "flat_lip": 1e-4, "flat_mouth": 1e-3,
        "flat_eye": 1e4, "flat_face_bottom": 1e3, "flat_lip_socket": 1e3,
    }
    # constraint: pin first 5 vertices
    con = [ScatterConstraint(param="means3D", idx=np.arange(5, dtype=np.int32),
                             value=params["means3D"][:5])]
    for i in range(3):
        state, priors, metrics = step(
            state, gt, cams, jnp.asarray(0, jnp.int32), priors, con, lr,
            weights, "track",
        )
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    np.testing.assert_allclose(
        np.asarray(state.params["means3D"][:5]), np.asarray(params["means3D"][:5]),
        atol=1e-7,
    )


def test_dense_constraints_match_scatter():
    """compile_dense_constraints reproduces ordered scatter semantics."""
    from topo4d_tpu.opt.constraints import (
        ScatterConstraint,
        apply_constraints,
        compile_dense_constraints,
    )

    rng = np.random.default_rng(7)
    params = {
        "a": jnp.asarray(rng.normal(size=(10, 3)).astype(np.float32)),
        "b": jnp.asarray(rng.normal(size=(10, 1)).astype(np.float32)),
    }
    cons = [
        ScatterConstraint(param="a", idx=np.array([1, 3, 5], np.int32),
                          value=jnp.ones((3, 3)) * 2),
        # overlapping write: index 3 must take the LATER value
        ScatterConstraint(param="a", idx=np.array([3, 7], np.int32),
                          value=jnp.ones((2, 3)) * 9),
        ScatterConstraint(param="b", idx=np.array([0], np.int32),
                          value=jnp.ones((1, 1)) * -4),
    ]
    dense = compile_dense_constraints(params, cons)
    out_scatter = apply_constraints(params, cons)
    out_dense = apply_constraints(params, dense)
    for k in params:
        np.testing.assert_allclose(
            np.asarray(out_dense[k]), np.asarray(out_scatter[k])
        )
