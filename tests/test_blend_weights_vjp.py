"""blend_weights' hand-derived custom VJP (r5) vs autodiff + finite
differences.

The oracle's blending adjoint is a custom rule (elementwise + one
reverse associative_scan ADD; reference.py docstring) so its gradient
semantics are proven math independent of any backend's cumprod/min
autodiff lowering. These tests pin:

  - forward identical to the plain cumprod formulation,
  - gradients match raw autodiff on the CONTINUUM (the custom rule is
    a.e. MORE correct at tied-min positions, so exact equality is not
    asserted there),
  - central finite differences at sampled components, including
    terminated rows (the hard-branch semantics),
  - the w-path and the t_final-path cotangents separately.
"""

import jax
import jax.numpy as jnp
import numpy as np

from topo4d_tpu.core.gaussian import TRANSMITTANCE_MIN
from topo4d_tpu.rasterizer.reference import blend_weights


def _old_blend(a):
    one_minus = 1.0 - a
    t_incl = jnp.cumprod(one_minus, axis=-1)
    t_excl = jnp.concatenate(
        [jnp.ones_like(t_incl[..., :1]), t_incl[..., :-1]], axis=-1
    )
    keep = t_incl >= TRANSMITTANCE_MIN
    w = a * t_excl * keep
    t_final = jnp.min(jnp.where(keep, t_incl, 1.0), axis=-1)
    return w, t_final


def _fixture(seed=0, p=48, m=200):
    rng = np.random.default_rng(seed)
    alpha = np.zeros((p, m), np.float32)
    mask = rng.uniform(size=(p, m)) < 0.3
    alpha[mask] = rng.uniform(0.003, 0.99, mask.sum())
    # a block of rows that terminates early (deep near-opaque stacks)
    alpha[:8, :40] = rng.uniform(0.9, 0.99, (8, 40))
    return jnp.asarray(alpha)


def test_forward_identical():
    alpha = _fixture()
    wn, tn = blend_weights(alpha)
    wo, to = _old_blend(alpha)
    np.testing.assert_array_equal(np.asarray(wn), np.asarray(wo))
    np.testing.assert_array_equal(np.asarray(tn), np.asarray(to))


def test_grads_match_autodiff_continuum():
    alpha = _fixture(1)
    rng = np.random.default_rng(11)
    gw = jnp.asarray(rng.normal(size=alpha.shape).astype(np.float32))
    gtf = jnp.asarray(
        rng.normal(size=alpha.shape[:1]).astype(np.float32)
    )

    def loss(fn):
        def f(a):
            w, tf = fn(a)
            return jnp.sum(w * gw) + jnp.sum(tf * gtf)

        return jax.grad(f)(alpha)

    gn = np.asarray(loss(blend_weights))
    go = np.asarray(loss(_old_blend))
    # continuum agreement: the old autodiff mis-weights t_final
    # cotangents at tied-min positions (a measure-zero set the custom
    # rule handles correctly), so compare at p99 and bound the worst
    err = np.abs(gn - go)
    denom = np.abs(go).max()
    assert np.percentile(err, 99) / denom < 1e-5
    assert err.max() / denom < 5e-4


def test_finite_differences():
    alpha = _fixture(2, p=8, m=60)
    rng = np.random.default_rng(5)
    gw = jnp.asarray(rng.normal(size=alpha.shape).astype(np.float32))
    gtf = jnp.asarray(
        rng.normal(size=alpha.shape[:1]).astype(np.float32)
    )

    def f(a):
        w, tf = blend_weights(a)
        return jnp.sum(w * gw) + jnp.sum(tf * gtf)

    g = np.asarray(jax.grad(f)(alpha))
    f64 = lambda a: float(f(a))
    picks = [(0, 3), (0, 25), (3, 10), (7, 59), (5, 0)]
    for i, j in picks:
        eps = 2e-3
        ap = alpha.at[i, j].add(eps)
        am = alpha.at[i, j].add(-eps)
        fd = (f64(ap) - f64(am)) / (2 * eps)
        # f32 losses bound FD resolution; the analytic grads are O(1)
        np.testing.assert_allclose(g[i, j], fd, rtol=5e-2, atol=5e-3)


def test_terminated_rows_zero_grad_past_cut():
    # a row that terminates by construction: splats past the cut carry
    # exactly zero gradient through w (hard-branch semantics)
    alpha = np.zeros((1, 16), np.float32)
    alpha[0, :6] = 0.95  # T after 4 splats = 0.05^4 = 6.25e-6 < 1e-4
    alpha[0, 10] = 0.5  # past termination
    a = jnp.asarray(alpha)
    w, tf = blend_weights(a)
    assert float(w[0, 10]) == 0.0

    def f(a):
        w, _ = blend_weights(a)
        return jnp.sum(w * jnp.arange(16, dtype=jnp.float32))

    g = np.asarray(jax.grad(f)(a))
    assert g[0, 10] == 0.0  # no contribution: splat never drawn
    assert abs(g[0, 0]) > 0.0
