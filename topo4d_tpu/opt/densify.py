"""Adaptive densification (clone / split / prune) — TPU re-design.

The reference inherits Dynamic3DGaussians' densification
(external.py:119-331) but never invokes it from train.py (SURVEY §1
"dead/latent code") — mesh-bound Gaussians have a fixed count. We keep the
capability, redesigned for XLA's static shapes: the Gaussian set lives in
a FIXED-CAPACITY buffer with an ``alive`` mask; clones/splits write into
free slots (compaction by sort), prunes clear the mask. No reallocation,
no recompilation, deterministic.

Semantics mirror the reference thresholds: densify where the accumulated
screen-space gradient norm exceeds ``grad_thresh`` (clone if small, split
if large, split children sampled inside the parent and scaled down by
1/(0.8 n)), prune by opacity/size (external.py:184-232).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from topo4d_tpu.core.quaternion import quat_to_rotmat

PARAM_KEYS = (
    "means3D", "rgb_colors", "unnorm_rotations", "logit_opacities",
    "log_scales",
)


class DensifyState(NamedTuple):
    alive: jnp.ndarray  # (N_cap,) bool
    grad_accum: jnp.ndarray  # (N_cap,) accumulated means2D grad norms
    denom: jnp.ndarray  # (N_cap,) accumulation counts
    max_radius: jnp.ndarray  # (N_cap,) float


def densify_init(n_alive: int, capacity: int) -> DensifyState:
    alive = jnp.arange(capacity) < n_alive
    z = jnp.zeros(capacity)
    return DensifyState(alive=alive, grad_accum=z, denom=z, max_radius=z)


def pad_params(params: Dict[str, jnp.ndarray], capacity: int):
    """Grow param arrays to the static capacity (host-side, one-off)."""
    out = dict(params)
    for k in PARAM_KEYS:
        v = params[k]
        pad = capacity - v.shape[0]
        out[k] = jnp.concatenate(
            [v, jnp.zeros((pad,) + v.shape[1:], v.dtype)], axis=0
        )
    return out


def accumulate_stats(
    state: DensifyState,
    means2d_grad: jnp.ndarray,
    seen: jnp.ndarray,
    radii=None,
) -> DensifyState:
    """Accumulate screen-space gradient norms + max 2D radius
    (external.py:119-123; the radius stat mirrors the reference's
    variables['max_2D_radius'] bookkeeping, train.py:373-376)."""
    norm = jnp.linalg.norm(means2d_grad[:, :2], axis=-1)
    upd = seen & state.alive
    max_radius = state.max_radius
    if radii is not None:
        max_radius = jnp.where(
            upd, jnp.maximum(max_radius, radii.astype(jnp.float32)),
            max_radius,
        )
    return state._replace(
        grad_accum=jnp.where(upd, state.grad_accum + norm, state.grad_accum),
        denom=jnp.where(upd, state.denom + 1.0, state.denom),
        max_radius=max_radius,
    )


def densify_step(
    params: Dict[str, jnp.ndarray],
    state: DensifyState,
    key: jax.Array,
    scene_radius: float,
    grad_thresh: float = 2e-4,
    prune_opacity: float = 0.005,
    split_n: int = 2,
    opt=None,  # AdamState: children get ZERO moments (cat_params_to_optimizer)
):
    """One clone/split/prune pass inside the fixed capacity.

    Returns (params, state, stats) — or (params, opt, state, stats) when
    an AdamState is passed, with the moments of every (re)written slot
    zeroed like the reference's optimizer-state surgery
    (external.py:126-181: new points get zero exp_avg/exp_avg_sq).
    stats counts clones/splits/prunes and ``overflow`` (requests dropped
    because capacity ran out — reported, never silent).
    """
    cap = state.alive.shape[0]
    grads = jnp.where(state.denom > 0, state.grad_accum / state.denom, 0.0)
    scales = jnp.exp(params["log_scales"])
    max_scale = jnp.max(scales, axis=1)

    hot = state.alive & (grads >= grad_thresh)
    to_clone = hot & (max_scale <= 0.01 * scene_radius)
    to_split = hot & (max_scale > 0.01 * scene_radius)

    # prune: low opacity or oversized (external.py:219-224)
    opacity = jax.nn.sigmoid(params["logit_opacities"][:, 0])
    to_prune = state.alive & (
        (opacity < prune_opacity) | (max_scale > 0.1 * scene_radius)
    )

    # requests: each clone wants 1 new slot, each split wants split_n
    # (parent is pruned after splitting, reference external.py:216-217).
    # Slots freed THIS pass are allocatable: children read their sources
    # from the original arrays, so a write into a pruned/split slot can
    # never corrupt a pending read.
    want = to_clone.astype(jnp.int32) + to_split.astype(jnp.int32) * split_n
    free = ~state.alive | to_prune | to_split
    n_free = jnp.sum(free)

    # allocate: k-th request goes to the k-th free slot
    req_rank = jnp.cumsum(want) - want  # exclusive prefix of requests
    free_idx = jnp.nonzero(free, size=cap, fill_value=cap)[0]

    new_params = {k: v for k, v in params.items()}
    new_alive = state.alive & ~to_prune & ~to_split

    stats_overflow = jnp.sum(
        jnp.minimum(want, jnp.maximum(req_rank + want - n_free, 0))
    )

    new_opt = opt

    def place(child: int, src_mask, jitter):
        """Scatter copies of masked sources into free slots."""
        nonlocal new_params, new_alive, new_opt
        offs = req_rank + child
        ok = src_mask & (offs < n_free)
        # out-of-range destination (== cap) drops the write entirely
        dst = jnp.where(ok, free_idx[jnp.minimum(offs, cap - 1)], cap)
        for k in PARAM_KEYS:
            val = params[k] + (jitter[k] if k in jitter else 0.0)
            new_params[k] = new_params[k].at[dst].set(val, mode="drop")
            if new_opt is not None:
                # a reused slot must not inherit the dead occupant's
                # moments (reference zero-pads optimizer state)
                zeros = jnp.zeros_like(val)
                # per-leaf step stays (torch keeps the group step when
                # concatenating new points)
                new_opt = new_opt._replace(
                    mu={**new_opt.mu,
                        k: new_opt.mu[k].at[dst].set(zeros, mode="drop")},
                    nu={**new_opt.nu,
                        k: new_opt.nu[k].at[dst].set(zeros, mode="drop")},
                )
        new_alive = new_alive.at[dst].set(True, mode="drop")

    # clones: exact copies (external.py:191-194)
    place(0, to_clone, {})

    # splits: children sampled N(0, scale) in the parent frame, scales
    # divided by 0.8 * n (external.py:199-210)
    rots = quat_to_rotmat(params["unnorm_rotations"])
    for child in range(split_n):
        key, sub = jax.random.split(key)
        eps = jax.random.normal(sub, params["means3D"].shape) * jnp.exp(
            params["log_scales"]
        )
        offset = jnp.einsum("nij,nj->ni", rots, eps)
        jitter = {
            "means3D": offset,
            "log_scales": jnp.log(1.0 / (0.8 * split_n))
            * jnp.ones_like(params["log_scales"]),
        }
        place(child, to_split, jitter)

    stats = {
        "clones": jnp.sum(to_clone),
        "splits": jnp.sum(to_split),
        "prunes": jnp.sum(to_prune),
        "overflow": stats_overflow,
        "alive": jnp.sum(new_alive),
    }
    new_state = DensifyState(
        alive=new_alive,
        grad_accum=jnp.zeros(cap),
        denom=jnp.zeros(cap),
        max_radius=jnp.zeros(cap),
    )
    if opt is not None:
        return new_params, new_opt, new_state, stats
    return new_params, new_state, stats


def reset_opacity(params: Dict[str, jnp.ndarray], value: float = 0.01):
    """Periodic opacity reset (external.py:228-230)."""
    import numpy as np

    logit = float(np.log(value / (1 - value)))
    cur = params["logit_opacities"]
    return {**params, "logit_opacities": jnp.minimum(cur, logit)}
