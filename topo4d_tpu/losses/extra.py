"""Latent mesh regularizers kept available but not on the default path.

The reference defines LaplacianLoss / ARAPLoss / EdgeLoss / NormLoss
(loss_util.py:9-111) without ever invoking them from train.py (SURVEY §1
"dead/latent code"); they are capabilities users may enable, so we provide
TPU-friendly equivalents: host-side sparse precompute + jitted gathers
(no dense (V, V) Laplacian matmuls — the reference materializes those).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax.numpy as jnp
import numpy as np


class EdgeSet(NamedTuple):
    edges: np.ndarray  # (E, 2) unique undirected edges


def build_edge_set(faces: np.ndarray) -> EdgeSet:
    """Unique directed-as-inserted edge set of EdgeLoss (loss_util.py:80-88).

    The reference inserts (f0,f1), (f1,f2), (f0,f2) unsorted into a set; we
    keep the same multiset of segments (direction does not affect length).
    """
    faces = np.asarray(faces, np.int64)
    e = np.concatenate(
        [faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [0, 2]]], axis=0
    )
    e = np.unique(e, axis=0)
    return EdgeSet(e.astype(np.int32))


def edge_loss(
    vertices: jnp.ndarray, edge_set: EdgeSet, size_factor: float = 1.0
) -> jnp.ndarray:
    """Std of edge lengths (EdgeLoss.forward, loss_util.py:91-98)."""
    x = vertices * size_factor
    e = jnp.asarray(edge_set.edges)
    d = jnp.linalg.norm(x[e[:, 0]] - x[e[:, 1]], axis=-1)
    return jnp.std(d, ddof=1)


def norm_loss(x: jnp.ndarray, norm: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """mean(1 - |cos(x, norm)|) (NormLoss.forward, loss_util.py:101-111)."""
    num = jnp.sum(x * norm, axis=1)
    den = jnp.maximum(
        jnp.linalg.norm(x, axis=1) * jnp.linalg.norm(norm, axis=1), eps
    )
    return jnp.mean(1.0 - jnp.abs(num / den))


class UniformLaplacian(NamedTuple):
    """Row-normalized adjacency as padded gathers (TPU-friendly sparse)."""

    neighbor_indices: np.ndarray  # (N, K) padded with self
    neighbor_weight: np.ndarray  # (N, K) rows sum to 1 over real neighbors
    delta_rest: Optional[np.ndarray] = None  # (N, 3) rest-pose delta coords


def build_uniform_laplacian(
    vertices: np.ndarray, faces: np.ndarray
) -> UniformLaplacian:
    """Uniform-weight graph Laplacian from triangle faces.

    The reference uses trimesh's (optionally cotan-weighted) laplacian
    (loss_util.py:13-15); uniform weights are the ``equal_weight`` variant.
    Stores rest-pose delta coordinates for delta preservation.
    """
    faces = np.asarray(faces, np.int64)
    nv = int(np.asarray(vertices).shape[0])  # incl. face-less tail verts
    adj = [set() for _ in range(nv)]
    for f in faces:
        for a in range(3):
            for b in range(3):
                if a != b:
                    adj[f[a]].add(int(f[b]))
    max_k = max(1, max(len(s) for s in adj))
    idx = np.zeros((nv, max_k), np.int32)
    wgt = np.zeros((nv, max_k), np.float32)
    for i, s in enumerate(adj):
        lst = sorted(s)
        k = len(lst)
        idx[i, :k] = lst
        idx[i, k:] = i
        if k:
            wgt[i, :k] = 1.0 / k
    delta = _laplacian_delta(np.asarray(vertices, np.float32), idx, wgt)
    return UniformLaplacian(idx, wgt, delta)


def _laplacian_delta(v, idx, wgt):
    return np.einsum("nk,nkc->nc", wgt, v[idx]) - v


def laplacian_loss(
    vertices: jnp.ndarray,
    lap: UniformLaplacian,
    mask: Optional[Sequence[int]] = None,
) -> jnp.ndarray:
    """Sum of squared delta-coordinate drift (LaplacianLoss.forward)."""
    idx = jnp.asarray(lap.neighbor_indices)
    wgt = jnp.asarray(lap.neighbor_weight)
    delta = jnp.einsum("nk,nkc->nc", wgt, vertices[idx]) - vertices
    rest = jnp.asarray(lap.delta_rest)
    diff = delta - rest
    if mask is not None:
        diff = diff[jnp.asarray(np.asarray(mask, np.int32))]
    return jnp.sum(diff**2)


def arap_loss(
    x: jnp.ndarray,  # (N, 3) current vertices
    dx: jnp.ndarray,  # (N, 3) displacements
    lap: UniformLaplacian,
) -> jnp.ndarray:
    """As-rigid-as-possible edge-length-change penalty.

    TPU re-design of ARAPLoss (loss_util.py:38-73): instead of dense
    (V, V) difference matrices, compare squared edge lengths of x and
    x+dx over the one-ring — the same invariance the reference measures.
    """
    idx = jnp.asarray(lap.neighbor_indices)
    real = jnp.asarray(lap.neighbor_weight) > 0
    ex = x[idx] - x[:, None]
    edx = (x + dx)[idx] - (x + dx)[:, None]
    diff = jnp.abs(jnp.sum(ex**2, -1) - jnp.sum(edx**2, -1))
    return jnp.sum(diff * real) / jnp.maximum(jnp.sum(real), 1)
