"""Scatter-free gather primitives.

``x[indices]`` costs a serialized scatter-add in its backward on TPU
(measured ~8.6 us per 1k scattered rows on a v5e chip vs ~2.9 us for a
row gather — scripts/probe_scatter.py). Two scatter-free backwards:

- ``gather_neighbors``: one-ring adjacency is symmetric, so the transpose
  is itself a gather over precomputed inverse slots
  (topology.adjacency.inverse_slots):
      dx[v] = sum_j dy[indices[v, j], inv_slot[v, j]].
- ``gather_rows_inv``: for an ARBITRARY static index vector, the backward
  gathers each target row's cotangent sources from a host-precomputed
  inverse-incidence table (``build_inverse_incidence``) and sums them —
  exact regardless of masking, since the table enumerates every position
  that references the row.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


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


def build_inverse_incidence(idx_flat: np.ndarray, n: int) -> np.ndarray:
    """(n, dmax) positions into ``idx_flat`` per referenced row.

    Host-side, once per static index set. ``inv[v]`` lists every position
    p with ``idx_flat[p] == v``, padded with ``len(idx_flat)`` (callers
    append a zero row to the cotangent before gathering). Entries >= n
    (explicit sentinels) are ignored.
    """
    idx_flat = np.asarray(idx_flat, np.int64).reshape(-1)
    l = idx_flat.shape[0]
    real = idx_flat < n
    pos = np.nonzero(real)[0]
    vals = idx_flat[pos]
    order = np.argsort(vals, kind="stable")
    sorted_v = vals[order]
    counts = np.bincount(sorted_v, minlength=n)
    dmax = max(int(counts.max()) if counts.size else 0, 1)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    slot = np.arange(sorted_v.shape[0]) - np.repeat(starts, counts)
    inv = np.full((n, dmax), l, np.int32)
    inv[sorted_v, slot] = pos[order].astype(np.int32)
    return inv


@jax.custom_vjp
def gather_rows_inv(
    table: jnp.ndarray,  # (N, C)
    idx: jnp.ndarray,  # (L,) int32, values < N
    inv: jnp.ndarray,  # (N, dmax) int32 from build_inverse_incidence
) -> jnp.ndarray:
    """``table[idx]`` whose backward is a row gather, not a scatter-add."""
    return table[idx]


def _gri_fwd(table, idx, inv):
    return table[idx], (inv, table.shape[1])


def _gri_bwd(res, g):
    inv, c = res
    gpad = jnp.concatenate([g, jnp.zeros((1, c), g.dtype)], axis=0)
    n, dmax = inv.shape
    dtable = jnp.sum(gpad[inv.reshape(-1)].reshape(n, dmax, c), axis=1)
    return (dtable, None, None)


gather_rows_inv.defvjp(_gri_fwd, _gri_bwd)
