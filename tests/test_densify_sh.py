"""Latent capabilities: SH evaluation and capacity-based densification."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from topo4d_tpu.core.sh import C0, eval_sh, rgb_to_sh, sh_to_rgb
from topo4d_tpu.opt.densify import (
    DensifyState,
    accumulate_stats,
    densify_init,
    densify_step,
    pad_params,
    reset_opacity,
)


def test_sh_deg0_is_constant():
    sh = jnp.ones((5, 3, 1))
    dirs = jnp.asarray(np.random.default_rng(0).normal(size=(5, 3)))
    out = eval_sh(0, sh, dirs)
    np.testing.assert_allclose(np.asarray(out), C0, atol=1e-6)


def test_sh_roundtrip_rgb():
    rgb = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (10, 3)))
    np.testing.assert_allclose(
        np.asarray(sh_to_rgb(rgb_to_sh(rgb))), np.asarray(rgb), atol=1e-6
    )


def test_sh_matches_reference_formula_deg2():
    # independent transcription of helpers.py:884-900 for degree 2
    rng = np.random.default_rng(2)
    sh = rng.normal(size=(4, 1, 9))
    dirs = rng.normal(size=(4, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    x, y, z = dirs[:, 0:1], dirs[:, 1:2], dirs[:, 2:3]
    c1 = 0.4886025119029199
    c2 = [1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
          -1.0925484305920792, 0.5462742152960396]
    expected = (
        C0 * sh[..., 0]
        - c1 * y * sh[..., 1] + c1 * z * sh[..., 2] - c1 * x * sh[..., 3]
        + c2[0] * x * y * sh[..., 4] + c2[1] * y * z * sh[..., 5]
        + c2[2] * (2 * z * z - x * x - y * y) * sh[..., 6]
        + c2[3] * x * z * sh[..., 7] + c2[4] * (x * x - y * y) * sh[..., 8]
    )
    got = np.asarray(eval_sh(2, jnp.asarray(sh), jnp.asarray(dirs)))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


# ---------------------------------------------------------------- densify


def small_params(n):
    rng = np.random.default_rng(3)
    return {
        "means3D": jnp.asarray(rng.normal(0, 1, (n, 3)).astype(np.float32)),
        "rgb_colors": jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32)),
        "unnorm_rotations": jnp.asarray(
            np.tile([1.0, 0, 0, 0], (n, 1)).astype(np.float32)
        ),
        "logit_opacities": jnp.full((n, 1), 2.0),
        "log_scales": jnp.full((n, 3), np.log(0.05).astype(np.float32)),
    }


def test_densify_clone_and_prune():
    n, cap = 8, 32
    params = pad_params(small_params(n), cap)
    # make gaussian 0 low-opacity (prune) and gaussian 1 hot (clone)
    params["logit_opacities"] = params["logit_opacities"].at[0].set(-10.0)
    state = densify_init(n, cap)
    grads = jnp.zeros((cap, 2)).at[1].set(1.0)
    seen = jnp.arange(cap) < n
    state = accumulate_stats(state, grads, seen)
    new_params, new_state, stats = densify_step(
        params, state, jax.random.PRNGKey(0), scene_radius=100.0
    )
    assert int(stats["prunes"]) == 1
    assert int(stats["clones"]) == 1
    assert int(stats["overflow"]) == 0
    # alive count: 8 - 1 prune + 1 clone
    assert int(stats["alive"]) == 8
    alive = np.asarray(new_state.alive)
    # the clone reuses the first free slot — the just-pruned slot 0
    # (freed-this-pass slots are allocatable)
    assert alive[0]
    assert not alive[n:].any()
    np.testing.assert_allclose(
        np.asarray(new_params["means3D"])[0],
        np.asarray(params["means3D"])[1],
        atol=1e-6,
    )


def test_densify_split_replaces_parent():
    n, cap = 4, 32
    params = pad_params(small_params(n), cap)
    # big scale -> split branch
    params["log_scales"] = params["log_scales"].at[2].set(np.log(5.0))
    state = densify_init(n, cap)
    grads = jnp.zeros((cap, 2)).at[2].set(1.0)
    state = accumulate_stats(state, grads, jnp.arange(cap) < n)
    new_params, new_state, stats = densify_step(
        params, state, jax.random.PRNGKey(1), scene_radius=100.0
    )
    assert int(stats["splits"]) == 1
    # parent replaced by 2 children: 4 - 1 + 2 = 5 alive (the parent
    # GAUSSIAN is gone; its freed SLOT may host a child)
    assert int(stats["alive"]) == 5
    alive = np.asarray(new_state.alive)
    scales = np.asarray(new_params["log_scales"])
    # children identified by the downscaled size, wherever they landed
    children = np.nonzero(
        alive & np.isclose(
            scales[:, 0], np.log(5.0) + np.log(1.0 / 1.6), atol=1e-5
        )
    )[0]
    assert children.size == 2
    np.testing.assert_allclose(
        scales[children], np.log(5.0) + np.log(1.0 / 1.6), atol=1e-5
    )


def test_densify_overflow_counted():
    n, cap = 8, 9  # only 1 free slot
    params = pad_params(small_params(n), cap)
    state = densify_init(n, cap)
    grads = jnp.ones((cap, 2))  # everyone hot -> 8 clone requests
    state = accumulate_stats(state, grads, jnp.arange(cap) < n)
    _, _, stats = densify_step(
        params, state, jax.random.PRNGKey(2), scene_radius=100.0
    )
    assert int(stats["overflow"]) > 0  # dropped requests are reported


def test_reset_opacity():
    params = small_params(4)
    out = reset_opacity(params, 0.01)
    op = np.asarray(jax.nn.sigmoid(out["logit_opacities"]))
    assert (op <= 0.0101).all()


def test_densify_overflow_count_exact():
    """Dropped-request count must be exact, not an overcount."""
    n, cap = 8, 9  # one free slot, 8 clone requests -> 7 dropped
    params = pad_params(small_params(n), cap)
    state = densify_init(n, cap)
    grads = jnp.ones((cap, 2))
    state = accumulate_stats(state, grads, jnp.arange(cap) < n)
    new_params, new_state, stats = densify_step(
        params, state, jax.random.PRNGKey(0), scene_radius=100.0
    )
    assert int(stats["clones"]) == 8
    assert int(stats["overflow"]) == 7
    assert int(stats["alive"]) == 9


def test_densify_reused_slot_gets_zero_moments():
    """A clone placed into a pruned slot must not inherit Adam moments."""
    from topo4d_tpu.opt.adam import adam_init

    n, cap = 4, 4  # full capacity: the clone must reuse the pruned slot
    params = pad_params(small_params(n), cap)
    params["logit_opacities"] = params["logit_opacities"].at[0].set(-10.0)
    opt = adam_init({k: params[k] for k in params})
    # poison slot 0's moments as if a dead gaussian trained there
    opt = opt._replace(
        mu={k: v.at[0].set(99.0) for k, v in opt.mu.items()},
        nu={k: v.at[0].set(99.0) for k, v in opt.nu.items()},
    )
    state = densify_init(n, cap)
    grads = jnp.zeros((cap, 2)).at[1].set(1.0)  # gaussian 1 hot -> clone
    state = accumulate_stats(state, grads, jnp.arange(cap) < n)
    new_params, new_opt, new_state, stats = densify_step(
        params, state, jax.random.PRNGKey(0), scene_radius=100.0, opt=opt
    )
    assert int(stats["clones"]) == 1 and int(stats["prunes"]) == 1
    # the clone landed in slot 0 (the only free one after the prune)...
    assert bool(new_state.alive[0])
    # ...with freshly zeroed moments
    for k in ("means3D", "rgb_colors"):
        np.testing.assert_allclose(np.asarray(new_opt.mu[k])[0], 0.0)
        np.testing.assert_allclose(np.asarray(new_opt.nu[k])[0], 0.0)
        # untouched rows keep their moments
        np.testing.assert_allclose(np.asarray(new_opt.mu[k])[2], 0.0)


def test_accumulate_stats_tracks_max_radius():
    n, cap = 4, 8
    state = densify_init(n, cap)
    grads = jnp.zeros((cap, 2))
    radii = jnp.arange(cap, dtype=jnp.int32) * 3
    state = accumulate_stats(state, grads, jnp.arange(cap) < n, radii)
    np.testing.assert_allclose(np.asarray(state.max_radius)[:4],
                               [0, 3, 6, 9])
    np.testing.assert_allclose(np.asarray(state.max_radius)[4:], 0.0)
