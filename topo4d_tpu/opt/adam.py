"""Adam with per-leaf learning rates as traced inputs.

Matches torch.optim.Adam semantics (the reference's optimizer,
train.py:272-297: per-param-group lr, eps=1e-15, default betas) with two
TPU-minded design choices:

- learning rates are a *pytree input* to the update, not state — the
  reference's three-phase LR schedule (train.py:606-616, 705-711) swaps
  scalars without triggering a recompile;
- per-leaf step counters so the reference's per-timestep moment reset
  (external.py:126-138: zero exp_avg/exp_avg_sq, keep step) is exact.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp


class AdamState(NamedTuple):
    step: Dict[str, jnp.ndarray]  # per-leaf int32 step count
    mu: Dict[str, jnp.ndarray]  # first moment
    nu: Dict[str, jnp.ndarray]  # second moment


def adam_init(params: Dict[str, jnp.ndarray]) -> AdamState:
    # host-side zeros: device-side zeros_like costs one remote compile PER
    # op on a tunneled TPU (~1-2 s each); a host buffer transfer does not
    import numpy as np

    def z(v):
        return jnp.asarray(np.zeros(v.shape, np.dtype(v.dtype)))

    return AdamState(
        step={k: jnp.asarray(0, jnp.int32) for k in params},
        mu={k: z(v) for k, v in params.items()},
        nu={k: z(v) for k, v in params.items()},
    )


# above this many total elements the flatten-and-concat fusion below is
# counterproductive: the concat/slice data movement dominates (measured
# 29.7 ms/step at the dense phase's 3.3M elements on a v5e, vs <1 ms per
# -leaf) while the per-leaf dispatch overhead it was built to amortize
# (~1.4 ms for 7 tiny leaves) is amortized by sheer size instead. The
# geometry model (~116k elements at N=8,280) stays on the measured-fast
# fused path; the dense texture set (3.3M at 300k) goes per-leaf.
_FUSE_MAX_ELEMENTS = 262_144


def _adam_update_per_leaf(params, grads, state, lr, b1, b2, eps):
    """Per-leaf Adam: one fused elementwise kernel per leaf.

    Identical per-element math to the fused path (no cross-element ops),
    so results are bitwise equal — pinned by tests/test_opt.py.
    """
    new_p, mu, nu, step = {}, {}, {}, {}
    for k, p in params.items():
        g = grads[k]
        t = (state.step[k] + 1).astype(p.dtype)
        mu[k] = b1 * state.mu[k] + (1.0 - b1) * g
        nu[k] = b2 * state.nu[k] + (1.0 - b2) * (g * g)
        scale = (lr[k] / (1.0 - b1**t)).astype(p.dtype)
        denom_corr = (1.0 / (1.0 - b2**t)).astype(p.dtype)
        new_p[k] = p - scale * mu[k] / (jnp.sqrt(nu[k] * denom_corr) + eps)
        step[k] = state.step[k] + 1
    return new_p, AdamState(step=step, mu=mu, nu=nu)


def adam_update(
    params: Dict[str, jnp.ndarray],
    grads: Dict[str, jnp.ndarray],
    state: AdamState,
    lr: Dict[str, jnp.ndarray],
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-15,
):
    """One FUSED Adam step. Returns (new_params, new_state).

    torch parity: denom = sqrt(nu_hat) + eps (eps outside the sqrt),
    update = lr * mu_hat / denom. For models of tiny leaves the
    element-wise math runs once over the concatenation of all leaves —
    per-leaf kernels cost ~1.4 ms/step on TPU for this model's ~7 tiny
    parameters; fused it is ~0.2 ms. Per-leaf LRs and bias corrections
    become segment vectors. Large models (the 300k-Gaussian dense phase)
    dispatch to the per-leaf path instead, where the concat/slice
    movement would dominate (bitwise-identical results).
    """
    keys = list(params.keys())
    sizes = [int(params[k].size) for k in keys]
    if sum(sizes) > _FUSE_MAX_ELEMENTS:
        return _adam_update_per_leaf(params, grads, state, lr, b1, b2, eps)

    def flat(tree):
        return jnp.concatenate([tree[k].reshape(-1) for k in keys])

    p = flat(params)
    g = flat(grads)
    mu = b1 * flat(state.mu) + (1.0 - b1) * g
    nu = b2 * flat(state.nu) + (1.0 - b2) * (g * g)

    # two flat (P,) segment vectors — a (P, 2) stack pads its minor dim to
    # 128 lanes on TPU (~64x op cost; see losses.temporal layout note)
    seg_a, seg_b = [], []
    for k, sz in zip(keys, sizes):
        t = (state.step[k] + 1).astype(p.dtype)
        scale = lr[k] / (1.0 - b1**t)
        denom_corr = 1.0 / (1.0 - b2**t)
        ones = jnp.ones((sz,), p.dtype)
        seg_a.append(jnp.asarray(scale, p.dtype) * ones)
        seg_b.append(jnp.asarray(denom_corr, p.dtype) * ones)
    sa = jnp.concatenate(seg_a)
    sb = jnp.concatenate(seg_b)
    new_p = p - sa * mu / (jnp.sqrt(nu * sb) + eps)

    def unflat(v):
        out = {}
        off = 0
        for k, sz in zip(keys, sizes):
            out[k] = v[off : off + sz].reshape(params[k].shape)
            off += sz
        return out

    return unflat(new_p), AdamState(
        step={k: state.step[k] + 1 for k in keys},
        mu=unflat(mu),
        nu=unflat(nu),
    )


def reset_moments(state: AdamState, keys) -> AdamState:
    """Zero first/second moments for ``keys``, keep step counts.

    Exact analogue of the reference's ``update_params_and_optimizer``
    surgery (external.py:126-138), applied per timestep to means3D and
    rotations (train.py:434-435).
    """
    mu = dict(state.mu)
    nu = dict(state.nu)
    for k in keys:
        mu[k] = jnp.zeros_like(mu[k])
        nu[k] = jnp.zeros_like(nu[k])
    return AdamState(step=state.step, mu=mu, nu=nu)
