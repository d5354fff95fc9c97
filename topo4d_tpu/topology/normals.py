"""Vertex normals as a jitted segment-sum (replaces trimesh, SURVEY N4).

Area-weighted face normals accumulated per vertex then normalized —
trimesh.Trimesh.vertex_normals semantics (used at reference train.py:135-136
for rotation init and helpers.py:968-969 for export offsetting). Pure jnp
so it can live inside the jitted export/step path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def vertex_normals(
    vertices: jnp.ndarray, tri_faces: jnp.ndarray, eps: float = 1e-12
) -> jnp.ndarray:
    """(V, 3) x (F, 3) int -> (V, 3) unit normals.

    Cross-product face normals carry their area weighting naturally
    (|cross| = 2 * area), matching trimesh's default weighting.
    """
    tri = jnp.asarray(tri_faces)
    v0 = vertices[tri[:, 0]]
    v1 = vertices[tri[:, 1]]
    v2 = vertices[tri[:, 2]]
    fn = jnp.cross(v1 - v0, v2 - v0)  # (F, 3), area-weighted
    acc = jnp.zeros_like(vertices)
    acc = acc.at[tri[:, 0]].add(fn)
    acc = acc.at[tri[:, 1]].add(fn)
    acc = acc.at[tri[:, 2]].add(fn)
    norm = jnp.linalg.norm(acc, axis=-1, keepdims=True)
    return acc / jnp.maximum(norm, eps)


def vertex_normals_np(vertices: np.ndarray, tri_faces: np.ndarray) -> np.ndarray:
    """NumPy twin for host-side init paths."""
    return np.asarray(vertex_normals(jnp.asarray(vertices), jnp.asarray(tri_faces)))
