"""One-ring adjacency and face/vertex mask utilities (host-side precompute).

Reference semantics: helpers.py:657-723 (``find_adjacent_vertices``,
``triangulate_faces``, ``vertex2face``, ``vertex2face_more``) and the
padding + Gaussian neighbor-weight construction of train.py:168-206.
Note the reference quirk: a quad connects ALL FOUR of its vertices
mutually — including the two diagonals — and we reproduce that, since the
rigid/rot/iso losses were tuned against it.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence, Set

import numpy as np


def find_adjacent_vertices(
    num_vertices: int, faces: Sequence[Sequence[int]]
) -> List[List[int]]:
    """Per-vertex one-ring sets (quads connect all 4 verts incl. diagonals).

    Returns ragged lists indexed by vertex id (reference helpers.py:670-689;
    the reference's dict-of-sets iteration order is reproduced by Python
    set-of-small-ints ordering — we sort for determinism instead, which
    does not change any loss value: all consumers are order-invariant sums).
    """
    adj: List[Set[int]] = [set() for _ in range(num_vertices)]
    for face in faces:
        for v in face:
            adj[v].update(int(u) for u in face if u != v)
    return [sorted(s) for s in adj]


@dataclasses.dataclass
class OneRing:
    """Padded one-ring with the reference's neighbor weights."""

    indices: np.ndarray  # (N, K) int32, padded with self index
    dist: np.ndarray  # (N, K) float32 rest distances (self-pads too)
    weight: np.ndarray  # (N, K) float32 exp(-2000 d^2), self-pads zeroed
    ragged: List[List[int]]  # original ragged lists (umbrella loss needs them)
    inv: np.ndarray = None  # (N, K) inverse slots (scatter-free grads)


def pad_one_ring(ragged: List[List[int]]) -> np.ndarray:
    """Pad ragged neighbor lists with the vertex's own index (train.py:173-176)."""
    max_k = max(len(lst) for lst in ragged)
    out = np.empty((len(ragged), max_k), np.int32)
    for i, lst in enumerate(ragged):
        out[i, : len(lst)] = lst
        out[i, len(lst):] = i
    return out


def build_one_ring(
    vertices: np.ndarray,
    faces: Sequence[Sequence[int]],
    boundary_mask: Sequence[int] = (),
) -> OneRing:
    """One-ring indices + rest distances + Gaussian weights.

    ``boundary_mask`` reproduces the eye-region trick of train.py:183-186:
    for a vertex OUTSIDE the mask with a neighbor INSIDE it, the weight is
    computed from the distance inflated x1000 (driving it to ~0) while the
    stored rest distance stays true. Self-padded entries get weight 0
    (train.py:196-197: exp(0) == 1 entries are zeroed).
    """
    ragged = find_adjacent_vertices(vertices.shape[0], faces)
    idx = pad_one_ring(ragged)
    n, k = idx.shape
    diffs = vertices[idx] - vertices[:, None]
    sq = np.sum(diffs * diffs, axis=-1)
    dist = np.sqrt(sq)

    wh_sq = sq.copy()
    if len(boundary_mask):
        inside = np.zeros(n, bool)
        inside[np.asarray(boundary_mask, np.int64)] = True
        cross = inside[idx] & ~inside[:, None]
        wh_sq = np.where(cross, sq * 1000.0**2, sq)
    weight = np.exp(-2000.0 * wh_sq)
    weight[weight == 1.0] = 0.0  # self-pads (d == 0) contribute nothing
    idx32 = idx.astype(np.int32)
    return OneRing(
        indices=idx32,
        dist=dist.astype(np.float32),
        weight=weight.astype(np.float32),
        ragged=ragged,
        inv=inverse_slots(idx32),
    )


def inverse_slots(indices: np.ndarray) -> np.ndarray:
    """For each (v, j): the slot s with indices[indices[v, j], s] == v.

    One-ring adjacency is symmetric (u in ring(v) <=> v in ring(u)), and
    self-pads point at themselves, so the inverse always exists. The
    inverse turns the backward of ``x[indices]`` into a GATHER
    (dx[v] = sum_j dy[indices[v,j], inv[v,j]]) instead of a scatter-add —
    scatters serialize on TPU (losses/neighbors.py).
    """
    n, k = indices.shape
    inv = np.zeros((n, k), np.int32)
    # slot lookup table: pos[u][v] = slot of v in u's ring (first match)
    pos = [dict() for _ in range(n)]
    for u in range(n):
        for s in range(k - 1, -1, -1):  # first occurrence wins
            pos[u][int(indices[u, s])] = s
    for v in range(n):
        for j in range(k):
            u = int(indices[v, j])
            # self-pad slots must each route their own cotangent back
            inv[v, j] = j if u == v else pos[u][v]
    return inv


def triangulate_faces(faces: Sequence[Sequence[int]]) -> List[List[int]]:
    """Fan-triangulate quads (q0,q1,q2)+(q0,q2,q3); keep tris (helpers.py:657-667)."""
    out: List[List[int]] = []
    for face in faces:
        if len(face) == 4:
            out.append([face[0], face[1], face[2]])
            out.append([face[0], face[2], face[3]])
        elif len(face) == 3:
            out.append(list(face))
    return out


def faces_fully_inside(faces: np.ndarray, mask: Sequence[int]) -> np.ndarray:
    """Faces whose vertices are ALL in the mask (reference ``vertex2face``)."""
    inside = _to_bool(faces, mask)
    return np.asarray(faces)[inside.all(axis=1)]


def faces_touching(faces: np.ndarray, mask: Sequence[int]) -> np.ndarray:
    """Faces with ANY vertex in the mask (reference ``vertex2face_more``)."""
    inside = _to_bool(faces, mask)
    return np.asarray(faces)[inside.any(axis=1)]


def split_faces_by_mask(
    faces: np.ndarray, face_idx: np.ndarray, mask: Sequence[int]
):
    """Split faces into (touching, idx, not-touching, idx) — reference
    ``get_face_faces`` (helpers.py:361-378), used to select the frontal
    quads for UV densification (train.py:222-224)."""
    faces = np.asarray(faces)
    face_idx = np.asarray(face_idx)
    touching = _to_bool(faces, mask).any(axis=1)
    return (
        faces[touching],
        face_idx[touching].astype(np.int32),
        faces[~touching],
        face_idx[~touching].astype(np.int32),
    )


def _to_bool(faces: np.ndarray, mask: Sequence[int]) -> np.ndarray:
    faces = np.asarray(faces)
    mask_ids = np.asarray(list(mask), np.int64)
    if faces.size == 0:
        return np.zeros(faces.shape, bool)
    # size by BOTH the face subset and the mask: a masked vertex id can
    # legitimately exceed every id in this face subset (e.g. a whole-mesh
    # region mask applied to the quad-only faces)
    n = int(faces.max()) + 1
    if mask_ids.size:
        n = max(n, int(mask_ids.max()) + 1)
    lut = np.zeros(n, bool)
    lut[mask_ids] = True
    return lut[faces]
