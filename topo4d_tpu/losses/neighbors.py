"""Scatter-free one-ring gather primitive.

``x[indices]`` with indices (N, K) costs a serialized scatter-add in its
backward on TPU. One-ring adjacency is symmetric, so the transpose is
itself a gather over precomputed inverse slots
(topology.adjacency.inverse_slots):
    dx[v] = sum_j dy[indices[v, j], inv_slot[v, j]].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def gather_neighbors(
    x: jnp.ndarray,  # (N, C)
    indices: jnp.ndarray,  # (N, K) int — symmetric ring, self-padded
    inv_slot: jnp.ndarray,  # (N, K) int — from adjacency.inverse_slots
) -> jnp.ndarray:
    return x[indices]


def _fwd(x, indices, inv_slot):
    return x[indices], (indices, inv_slot)


def _bwd(res, dy):
    indices, inv_slot = res
    dx = jnp.sum(dy[indices, inv_slot], axis=1)
    return (dx, None, None)


gather_neighbors.defvjp(_fwd, _bwd)
