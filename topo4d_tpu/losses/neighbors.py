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
    inv, extra_pos, extra_vert = build_inverse_incidence_split(
        idx_flat, n, slots=None
    )
    assert extra_pos.size == 0
    return inv


# measured on a v5e chip (scripts/probe_scatter.py): row gathers vs
# unsorted scatter-adds, microseconds per 1k rows
_GATHER_US_PER_KROW = 2.9
_SCATTER_US_PER_KROW = 8.6


def build_inverse_incidence_split(
    idx_flat: np.ndarray, n: int, slots: "int | None" = 0
):
    """Inverse incidence as a dense (n, S) table + overflow COO lists.

    When the incidence degree is skewed (flatten quadruples: mean ~9,
    max ~20), padding the dense table to dmax wastes ~half the backward's
    gather rows. S is chosen to minimize the modeled backward cost
    n*S*gather + overflow*scatter; positions beyond slot S per vertex go
    to (extra_pos, extra_vert) handled by one small scatter-add.
    ``slots=None`` forces the single dense table (S = dmax).
    """
    idx_flat = np.asarray(idx_flat, np.int64).reshape(-1)
    l = idx_flat.shape[0]
    pos = np.nonzero(idx_flat < n)[0]
    vals = idx_flat[pos]
    order = np.argsort(vals, kind="stable")
    sorted_v = vals[order]
    sorted_p = pos[order].astype(np.int32)
    counts = np.bincount(sorted_v, minlength=n)
    dmax = max(int(counts.max()) if counts.size else 0, 1)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    slot = np.arange(sorted_v.shape[0]) - np.repeat(starts, counts)

    if slots is None:
        s = dmax
    else:
        cands = np.arange(1, dmax + 1)
        overflow = np.array(
            [np.maximum(counts - c, 0).sum() for c in cands]
        )
        cost = (
            n * cands * _GATHER_US_PER_KROW
            + overflow * _SCATTER_US_PER_KROW
        )
        s = int(cands[int(np.argmin(cost))])

    main = slot < s
    inv = np.full((n, s), l, np.int32)
    inv[sorted_v[main], slot[main]] = sorted_p[main]
    extra_pos = sorted_p[~main]
    extra_vert = sorted_v[~main].astype(np.int32)
    return inv, extra_pos, extra_vert


_EMPTY_I32 = None  # lazy module-level empty (jnp at import time is costly)


def _empty_i32():
    global _EMPTY_I32
    if _EMPTY_I32 is None:
        _EMPTY_I32 = jnp.zeros(0, jnp.int32)
    return _EMPTY_I32


@jax.custom_vjp
def _gather_rows_inv_p(table, idx, inv, extra_pos, extra_vert):
    return table[idx]


def _gri_fwd(table, idx, inv, extra_pos, extra_vert):
    return table[idx], (inv, extra_pos, extra_vert, table.shape[1])


def _gri_bwd(res, g):
    inv, extra_pos, extra_vert, c = res
    gpad = jnp.concatenate([g, jnp.zeros((1, c), g.dtype)], axis=0)
    n, s = inv.shape
    dtable = jnp.sum(gpad[inv.reshape(-1)].reshape(n, s, c), axis=1)
    if extra_pos.shape[0]:
        dtable = dtable.at[extra_vert].add(g[extra_pos])
    return (dtable, None, None, None, None)


_gather_rows_inv_p.defvjp(_gri_fwd, _gri_bwd)


def gather_rows_inv(
    table: jnp.ndarray,  # (N, C)
    idx: jnp.ndarray,  # (L,) int32, values < N
    inv: jnp.ndarray,  # (N, S) int32 from build_inverse_incidence[_split]
    extra_pos: jnp.ndarray = None,  # (M,) overflow positions (optional)
    extra_vert: jnp.ndarray = None,  # (M,) overflow target rows
) -> jnp.ndarray:
    """``table[idx]`` whose backward is a row gather, not a scatter-add.

    With split tables the backward is the dense (N, S) gather-sum plus
    one scatter-add for the M overflow positions.
    """
    if extra_pos is None:
        extra_pos = extra_vert = _empty_i32()
    return _gather_rows_inv_p(table, idx, inv, extra_pos, extra_vert)
