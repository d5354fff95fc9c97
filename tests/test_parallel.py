"""View-sharded batched step on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from topo4d_tpu.core.gaussian import activate_params
from topo4d_tpu.opt.adam import adam_init
from topo4d_tpu.opt.step import GeometryPriors, TrainState
from topo4d_tpu.losses.temporal import TemporalPriors
from topo4d_tpu.parallel.batched import make_batched_geometry_step
from topo4d_tpu.parallel.mesh import make_view_mesh, replicated, shard_view_batch
from topo4d_tpu.rasterizer.tiled import render_gaussians_tiled
from topo4d_tpu.rasterizer.reference import render_gaussians
from topo4d_tpu.testing import make_head_fixture


def small_setup(v=8, w=48, h=32):
    params_np, cams, (verts, faces) = make_head_fixture(
        rows=8, cols=8, num_views=v, width=w, height=h
    )
    n = verts.shape[0]
    params = {k: jnp.asarray(x) for k, x in params_np.items()}
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 1, (v, 3, h, w)).astype(np.float32))
    priors = GeometryPriors(
        neighbor_indices=jnp.zeros((4, n), jnp.int32),
        neighbor_dist=jnp.zeros((4, n)),
        iso_w=jnp.zeros((4, n)),
        rig_w=jnp.zeros((4, n)),
        rot_w=jnp.zeros((4, n)),
        init_scale=jnp.full((n,), 0.05),
        temporal=TemporalPriors(
            prev_inv_rot=jnp.zeros((4, n)), prev_offset=jnp.zeros((3, 4, n))
        ),
        cos_init=jnp.zeros(0),
    )
    state = TrainState(params=params, opt=adam_init(params), max_2d_radius=jnp.zeros(n))
    lr = {k: jnp.asarray(1e-3, jnp.float32) for k in params}
    weights = {"im": 1.0, "scale": 0.0, "scale_max": 0.0}
    return params, cams, images, priors, state, lr, weights


def render_fn(rv, cam):
    return render_gaussians_tiled(rv, cam, max_span=4, capacity=128)


def test_batched_step_runs_sharded():
    assert len(jax.devices()) >= 8
    params, cams, images, priors, state, lr, weights = small_setup()
    step = make_batched_geometry_step({}, {}, render_fn)
    mesh = make_view_mesh(8)
    with mesh:
        images_s = shard_view_batch(mesh, images)
        cams_s = shard_view_batch(mesh, cams)
        state_r = replicated(mesh, state)
        priors_r = replicated(mesh, priors)
        new_state, _, metrics = step(
            state_r, images_s, cams_s, priors_r, [], lr, weights, "init"
        )
    assert np.isfinite(float(metrics["loss_total"]))
    # params changed
    delta = float(
        jnp.max(jnp.abs(new_state.params["rgb_colors"] - params["rgb_colors"]))
    )
    assert delta > 0


def test_batched_step_matches_unsharded():
    """Sharded and single-device execution must agree numerically."""
    params, cams, images, priors, state, lr, weights = small_setup()
    step = make_batched_geometry_step({}, {}, render_fn)

    new_state_1, _, m1 = step(state, images, cams, priors, [], lr, weights, "init")

    mesh = make_view_mesh(8)
    with mesh:
        images_s = shard_view_batch(mesh, images)
        cams_s = shard_view_batch(mesh, cams)
        new_state_8, _, m8 = step(
            replicated(mesh, state), images_s, cams_s, replicated(mesh, priors),
            [], lr, weights, "init",
        )
    np.testing.assert_allclose(
        float(m1["loss_total"]), float(m8["loss_total"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(new_state_1.params["means3D"]),
        np.asarray(new_state_8.params["means3D"]),
        rtol=1e-4, atol=1e-6,
    )


def test_batched_gradient_equals_mean_of_per_view_gradients():
    """The batched update rule == mean over views of single-view im grads."""
    from topo4d_tpu.losses.image import photometric_loss

    params, cams, images, priors, state, lr, weights = small_setup(v=4)

    def batched_loss(params):
        rv = activate_params(params)

        def one(gt, cam, cm, cc):
            out = render_fn(rv, cam)
            im = jnp.exp(cm)[:, None, None] * out.image + cc[:, None, None]
            return photometric_loss(im, gt)

        return jnp.mean(
            jax.vmap(one)(images, cams, params["cam_m"][:4], params["cam_c"][:4])
        )

    def single_loss(params, i):
        rv = activate_params(params)
        out = render_fn(rv, cams[i])
        im = (
            jnp.exp(params["cam_m"][i])[:, None, None] * out.image
            + params["cam_c"][i][:, None, None]
        )
        return photometric_loss(im, images[i])

    g_b = jax.grad(batched_loss)(params)
    g_means = np.mean(
        [np.asarray(jax.grad(single_loss)(params, i)["means3D"]) for i in range(4)],
        axis=0,
    )
    np.testing.assert_allclose(
        np.asarray(g_b["means3D"]), g_means, rtol=1e-4, atol=1e-7
    )


def test_dryrun_multichip_entry():
    import sys, pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


def test_shard_map_pallas_matches_unsharded():
    """The shard_map path (Pallas-compatible) == plain vmap path."""
    from topo4d_tpu.rasterizer.pallas import render_gaussians_pallas

    params, cams, images, priors, state, lr, weights = small_setup(v=8, w=64, h=32)

    def pallas_fn(rv, cam):
        return render_gaussians_pallas(
            rv, cam, max_span=4, chunk=128, interpret=True
        )

    mesh = make_view_mesh(8)
    step_sharded = make_batched_geometry_step({}, {}, pallas_fn, mesh=mesh)
    step_plain = make_batched_geometry_step({}, {}, render_fn)

    with mesh:
        images_s = shard_view_batch(mesh, images)
        cams_s = shard_view_batch(mesh, cams)
        new_s, _, m_s = step_sharded(
            replicated(mesh, state), images_s, cams_s,
            replicated(mesh, priors), [], lr, weights, "init",
        )
    new_p, _, m_p = step_plain(state, images, cams, priors, [], lr, weights, "init")
    np.testing.assert_allclose(
        float(m_s["loss_total"]), float(m_p["loss_total"]), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(new_s.params["means3D"]),
        np.asarray(new_p.params["means3D"]),
        rtol=1e-3, atol=1e-6,
    )


def test_multihost_single_process_noop(monkeypatch):
    from topo4d_tpu.parallel import multihost

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.setattr(multihost.initialize_multihost, "_done", False,
                        raising=False)
    assert multihost.initialize_multihost() is False
    # idempotent
    assert multihost.initialize_multihost() is False
    assert multihost.is_host0() is True


def test_multihost_env_parsing(monkeypatch):
    from topo4d_tpu.parallel import multihost

    calls = {}
    monkeypatch.setattr(
        multihost.jax.distributed, "initialize",
        lambda **kw: calls.update(kw),
    )
    monkeypatch.setattr(multihost.initialize_multihost, "_done", False,
                        raising=False)
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
    monkeypatch.setenv("JAX_PROCESS_ID", "2")
    assert multihost.initialize_multihost() is True
    assert calls == {
        "coordinator_address": "10.0.0.1:1234",
        "num_processes": 4,
        "process_id": 2,
    }
    multihost.initialize_multihost._done = False


def test_tile_sharded_render_matches_single_device():
    """One view's tiles sharded over 8 devices == single-device render."""
    from jax.sharding import Mesh
    from topo4d_tpu.rasterizer.pallas import (
        render_gaussians_pallas,
        render_gaussians_pallas_tile_sharded,
    )
    from topo4d_tpu.testing import make_synthetic_camera, make_synthetic_scene

    params = {
        k: jnp.asarray(v)
        for k, v in make_synthetic_scene(n=160, seed=7).items()
    }
    cam = make_synthetic_camera(width=128, height=64)  # 8x4 = 32 tiles
    mesh = Mesh(np.array(jax.devices()[:8]), ("tile",))
    bg = jnp.asarray([0.2, 0.1, 0.3])

    rv = activate_params(params)
    single = render_gaussians_pallas(
        rv, cam, bg=bg, max_span=4, chunk=128, interpret=True
    )
    sharded = render_gaussians_pallas_tile_sharded(
        rv, cam, mesh, bg=bg, max_span=4, chunk=128, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(sharded.image), np.asarray(single.image),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(sharded.alpha), np.asarray(single.alpha),
        rtol=1e-5, atol=1e-6,
    )

    # gradients: the replicated packed array's cotangents psum over ICI
    rng = np.random.default_rng(3)
    target = jnp.asarray(
        rng.uniform(0, 1, (3, 64, 128)).astype(np.float32)
    )

    def loss(params, renderer):
        out = renderer(activate_params(params))
        return jnp.mean(jnp.abs(out.image - target)) + 0.05 * jnp.mean(
            out.alpha
        )

    g_single = jax.grad(loss)(
        params,
        lambda rv: render_gaussians_pallas(
            rv, cam, bg=bg, max_span=4, chunk=128, interpret=True
        ),
    )
    g_sharded = jax.grad(loss)(
        params,
        lambda rv: render_gaussians_pallas_tile_sharded(
            rv, cam, mesh, bg=bg, max_span=4, chunk=128, interpret=True
        ),
    )
    for k in g_single:
        a, b = np.asarray(g_single[k]), np.asarray(g_sharded[k])
        scale = np.maximum(np.abs(a).max(), 1e-8)
        np.testing.assert_allclose(
            b / scale, a / scale, rtol=1e-4, atol=1e-6, err_msg=k
        )


def test_tile_sharded_compact_matches_single_device():
    """The production multi-chip dense composition (VERDICT r3 item 5):
    frozen binning + split-pack static rows + compact non-empty-tile
    list, tile-sharded over 8 devices — pixels and parameter gradients
    must match the single-device compact render."""
    from jax.sharding import Mesh
    from topo4d_tpu.rasterizer.pallas import (
        attach_compact,
        binning_for,
        render_gaussians_pallas,
        render_gaussians_pallas_tile_sharded,
    )
    from topo4d_tpu.testing import make_synthetic_camera, make_synthetic_scene

    params = {
        k: jnp.asarray(v)
        for k, v in make_synthetic_scene(
            n=160, seed=11, spread=0.12
        ).items()
    }
    cam = make_synthetic_camera(width=192, height=96)  # 12x6 = 72 tiles
    mesh = Mesh(np.array(jax.devices()[:8]), ("tile",))
    bg = jnp.asarray([0.05, 0.1, 0.15])

    rv = activate_params(params)
    plain = binning_for(rv, cam, max_span=4, with_static=True)
    occ = int(np.sum(np.asarray(plain.tile_count) > 0))
    t = int(plain.tile_count.shape[0])
    assert occ + 1 < t, (occ, t)
    frozen = attach_compact(plain, occ + 1)
    assert frozen.compact is not None and frozen.static_rows is not None

    single = render_gaussians_pallas(
        rv, cam, bg=bg, max_span=4, chunk=128, interpret=True,
        binning=frozen,
    )
    sharded = render_gaussians_pallas_tile_sharded(
        rv, cam, mesh, bg=bg, max_span=4, chunk=128, interpret=True,
        binning=frozen,
    )
    np.testing.assert_allclose(
        np.asarray(sharded.image), np.asarray(single.image),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(sharded.depth), np.asarray(single.depth),
        rtol=1e-5, atol=1e-6,
    )
    assert int(sharded.num_overflow) == 0

    rng = np.random.default_rng(5)
    target = jnp.asarray(rng.uniform(0, 1, (3, 96, 192)).astype(np.float32))

    def loss(params, renderer):
        out = renderer(activate_params(params))
        return jnp.mean(jnp.abs(out.image - target))

    g_single = jax.grad(loss)(
        params,
        lambda rv: render_gaussians_pallas(
            rv, cam, bg=bg, max_span=4, chunk=128, interpret=True,
            binning=frozen,
        ),
    )
    g_sharded = jax.grad(loss)(
        params,
        lambda rv: render_gaussians_pallas_tile_sharded(
            rv, cam, mesh, bg=bg, max_span=4, chunk=128, interpret=True,
            binning=frozen,
        ),
    )
    for k in g_single:
        a, b = np.asarray(g_single[k]), np.asarray(g_sharded[k])
        scale = np.maximum(np.abs(a).max(), 1e-8)
        np.testing.assert_allclose(
            b / scale, a / scale, rtol=1e-4, atol=1e-6, err_msg=k
        )

    # dropped tiles still surface through the counter when under-sized
    under = attach_compact(plain, max(1, occ - 2))
    out_under = render_gaussians_pallas_tile_sharded(
        rv, cam, mesh, bg=bg, max_span=4, chunk=128, interpret=True,
        binning=under,
    )
    assert int(out_under.num_overflow) > 0
