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
    return AdamState(
        step={k: jnp.zeros((), jnp.int32) for k in params},
        mu={k: jnp.zeros_like(v) for k, v in params.items()},
        nu={k: jnp.zeros_like(v) for k, v in params.items()},
    )


def adam_update(
    params: Dict[str, jnp.ndarray],
    grads: Dict[str, jnp.ndarray],
    state: AdamState,
    lr: Dict[str, jnp.ndarray],
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-15,
):
    """One Adam step. Returns (new_params, new_state).

    torch parity: denom = sqrt(nu_hat) + eps (eps outside the sqrt),
    update = lr * mu_hat / denom.
    """
    new_params = {}
    new_mu = {}
    new_nu = {}
    new_step = {}
    for k, p in params.items():
        g = grads[k]
        t = state.step[k] + 1
        mu = b1 * state.mu[k] + (1.0 - b1) * g
        nu = b2 * state.nu[k] + (1.0 - b2) * (g * g)
        tf = t.astype(p.dtype)
        mu_hat = mu / (1.0 - b1**tf)
        nu_hat = nu / (1.0 - b2**tf)
        new_params[k] = p - lr[k] * mu_hat / (jnp.sqrt(nu_hat) + eps)
        new_mu[k] = mu
        new_nu[k] = nu
        new_step[k] = t
    return new_params, AdamState(step=new_step, mu=new_mu, nu=new_nu)


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
