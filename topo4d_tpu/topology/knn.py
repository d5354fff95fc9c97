"""Brute-force k-nearest-neighbor distances (replaces Open3D KDTree, SURVEY N3).

Used only at init to size the Gaussians (reference helpers.py:147-157,
train.py:132/245: k=1 for the 8.3k geometry verts, k=4 for the ~300k dense
verts). Tiled jnp distance matrix: O(N*M) but MXU/VPU-friendly and exact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def knn_sq_dists(
    points: np.ndarray, k: int, block: int | None = None
) -> np.ndarray:
    """Squared distances to each point's k nearest OTHER points -> (N, k).

    Matches o3d_knn's exclusion of the query point itself
    (helpers.py:154 takes neighbors [1:]). ``block`` (query rows per
    dispatch) auto-sizes so the (block, N) distance matrix stays under
    ~1 GB — a fixed 4096 allocates block*N*4 bytes, which at the dense
    texture scale (N in the 10^5..10^6 range, train.py:245) exceeds
    HBM.
    """
    pts = jnp.asarray(points, jnp.float32)
    n = pts.shape[0]
    if block is None:
        block = max(256, min(4096, int(1e9 // (4 * max(n, 1)))))
    k_eff = min(k, n - 1)

    @jax.jit
    def block_knn(query, start):
        # (B, N) squared distances
        d = (
            jnp.sum(query**2, axis=1, keepdims=True)
            - 2.0 * query @ pts.T
            + jnp.sum(pts**2, axis=1)[None, :]
        )
        # exclude self BY INDEX: float32 cancellation in the expanded
        # form can make the computed self-distance exceed a true
        # neighbor's, so "drop sorted column 0" would drop a real
        # neighbor (coincident duplicates are other points and stay)
        rows = jnp.arange(d.shape[0])[:, None] + start
        cols = jnp.arange(n)[None, :]
        d = jnp.where(rows == cols, jnp.inf, d)
        neg, _ = jax.lax.top_k(-d, k_eff)
        return -neg  # ascending among OTHER points

    out = np.empty((n, k_eff), np.float32)
    for start in range(0, n, block):
        q = pts[start : start + block]
        d = np.asarray(block_knn(q, start))
        out[start : start + q.shape[0]] = d
    return np.maximum(out, 0.0)


def mean_knn_sq_dist(points: np.ndarray, k: int) -> np.ndarray:
    """Mean of k-NN squared distances, clipped (reference train.py:133)."""
    return knn_sq_dists(points, k).mean(axis=-1).clip(min=1e-7)
