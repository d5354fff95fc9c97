"""Flatten (dihedral-angle) loss family.

Reference semantics: loss_util.py:114-371. The shared-edge quadruple
precompute is a one-off host-side NumPy step (vectorized here — the
reference's Python loops take O(E^2)-ish time); the per-step forward is a
handful of jnp gathers, jit-friendly.

Three variants, all used by train.py:511-533:
- ``flatten_loss``: hard dihedral penalty, (cos+1)^2 with cos>threshold
  snapped to -1 (FlattenLoss, loss_util.py:114-220).
- ``soft_flatten_loss``: penalty on deviation from *initial* dihedral
  angles, 1 - cos|theta - theta_init| (SoftFlattenLoss, loss_util.py:262-371).
- ``umbrella_flatten_loss``: MSE between a vertex and the mean of its
  one-ring, over a region mask (FlattenLoss_v2, loss_util.py:223-260).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class DihedralQuadruples(NamedTuple):
    """Shared-edge quadruples (v0, v1) edge with opposite verts (v2, v3)."""

    v0: np.ndarray
    v1: np.ndarray
    v2: np.ndarray
    v3: np.ndarray


def build_dihedral_quadruples(faces: np.ndarray) -> DihedralQuadruples:
    """Vectorized port of the FlattenLoss constructor (loss_util.py:121-169).

    Candidate edges are (f0,f1) and (f1,f2) of each triangle — NOT (f0,f2) —
    reproducing the reference's candidate set exactly. An edge is kept iff
    exactly two faces of ``faces`` contain both endpoints; v2/v3 are the
    third vertices of those two faces in ascending face-id order.
    """
    faces = np.asarray(faces, np.int64)
    cand = np.sort(
        np.concatenate([faces[:, 0:2], faces[:, 1:3]], axis=0), axis=1
    )
    cand = np.unique(cand, axis=0)

    # All (edge, face) incidences: face contains both endpoints of the edge.
    # Build via sorted edge keys of every unordered vertex pair within a face.
    f_pairs = np.concatenate(
        [faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [0, 2]]], axis=0
    )
    f_pairs = np.sort(f_pairs, axis=1)
    face_ids = np.tile(np.arange(faces.shape[0]), 3)

    nmax = int(faces.max()) + 1
    cand_keys = cand[:, 0] * nmax + cand[:, 1]
    pair_keys = f_pairs[:, 0] * nmax + f_pairs[:, 1]

    # one lexsort: primary pair key, secondary ascending face id
    order = np.lexsort((face_ids, pair_keys))
    pair_keys_s = pair_keys[order]
    face_ids_s = face_ids[order]

    left = np.searchsorted(pair_keys_s, cand_keys, side="left")
    right = np.searchsorted(pair_keys_s, cand_keys, side="right")
    count = right - left

    keep = count == 2
    v0 = cand[keep, 0]
    v1 = cand[keep, 1]
    fa = face_ids_s[left[keep]]
    fb = face_ids_s[left[keep] + 1]

    def third_vertex(face_rows, a, b):
        f = faces[face_rows]
        mask = (f != a[:, None]) & (f != b[:, None])
        # exactly one True per row for triangles
        return f[np.arange(f.shape[0]), np.argmax(mask, axis=1)]

    v2 = third_vertex(fa, v0, v1)
    v3 = third_vertex(fb, v0, v1)
    return DihedralQuadruples(
        v0.astype(np.int32), v1.astype(np.int32),
        v2.astype(np.int32), v3.astype(np.int32),
    )


def dihedral_cos(
    vertices: jnp.ndarray, quads: DihedralQuadruples, eps: float = 1e-6
) -> jnp.ndarray:
    """Cosine of the dihedral angle across each shared edge -> (E,).

    The double-projection formulation of loss_util.py:171-208: project the
    two opposite vertices onto the plane orthogonal to the shared edge and
    take the cosine between the residuals. Computed in COMPONENT form —
    flat (E,) vectors per xyz component — because (E, 3) intermediates pad
    their minor dim to 128 lanes on TPU (~42x op cost; see losses.temporal
    module docstring).
    """
    # ONE row gather for all four corners (fast along sublanes; a
    # per-component lane gather is ~10x slower — losses.temporal note),
    # 128-padded so the four lane slices stay aligned. Padding uses the
    # sentinel N (clamped by the gather, excluded from the inverse
    # incidence) so the scatter-free backward never touches vertex 0.
    from topo4d_tpu.losses.neighbors import (
        build_inverse_incidence_split,
        gather_rows_inv,
    )

    n = vertices.shape[0]
    e = int(np.asarray(quads.v0).shape[0])
    ep = -(-max(e, 1) // 128) * 128
    idx = np.full(4 * ep, n, np.int32)
    for j, f in enumerate((quads.v0, quads.v1, quads.v2, quads.v3)):
        idx[j * ep : j * ep + e] = np.asarray(f)
    inv, extra_pos, extra_vert = build_inverse_incidence_split(idx, n)
    g = gather_rows_inv(
        vertices, jnp.asarray(np.minimum(idx, n - 1)), jnp.asarray(inv),
        jnp.asarray(extra_pos), jnp.asarray(extra_vert),
    ).T  # (3, 4*Ep)
    v0 = g[:, 0:ep]
    v1 = g[:, ep : 2 * ep]
    v2 = g[:, 2 * ep : 3 * ep]
    v3 = g[:, 3 * ep : 4 * ep]
    a = [v1[c] - v0[c] for c in range(3)]
    b1 = [v2[c] - v0[c] for c in range(3)]
    b2 = [v3[c] - v0[c] for c in range(3)]

    def residual(a, b):
        al2 = a[0] * a[0] + a[1] * a[1] + a[2] * a[2]
        bl2 = b[0] * b[0] + b[1] * b[1] + b[2] * b[2]
        al1 = jnp.sqrt(al2 + eps)
        bl1 = jnp.sqrt(bl2 + eps)
        ab = a[0] * b[0] + a[1] * b[1] + a[2] * b[2]
        cos = ab / (al1 * bl1 + eps)
        sin = jnp.sqrt(1 - cos**2 + eps)
        s = ab / (al2 + eps)
        cb = [b[c] - a[c] * s for c in range(3)]
        cbl1 = bl1 * sin
        return cb, cbl1

    cb1, cb1l1 = residual(a, b1)
    cb2, cb2l1 = residual(a, b2)
    dot = cb1[0] * cb2[0] + cb1[1] * cb2[1] + cb1[2] * cb2[2]
    return (dot / (cb1l1 * cb2l1 + eps))[:e]


def flatten_loss(
    vertices: jnp.ndarray,
    quads: DihedralQuadruples,
    threshold_deg: float = 0.0,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """Hard flatten penalty sum (cos+1)^2 (FlattenLoss.forward)."""
    cos = dihedral_cos(vertices, quads, eps)
    threshold = math.cos(threshold_deg * math.pi / 180.0)
    cos = jnp.where(cos > threshold, -1.0, cos)
    return jnp.sum((cos + 1.0) ** 2)


def soft_flatten_loss(
    vertices: jnp.ndarray,
    quads: DihedralQuadruples,
    cos_init: Optional[jnp.ndarray] = None,
    eps: float = 1e-6,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Soft flatten penalty vs initial dihedral angles (SoftFlattenLoss).

    Returns (loss, current cosines) so frame 0 can cache the init angles
    (reference train.py:364-368).
    """
    cos = dihedral_cos(vertices, quads, eps)
    if cos_init is not None:
        loss = jnp.sum(
            1.0
            - jnp.cos(
                jnp.abs(
                    jnp.arccos(jnp.clip(cos, -1.0, 1.0))
                    - jnp.arccos(jnp.clip(cos_init, -1.0, 1.0))
                )
            )
        )
    else:
        loss = jnp.sum((cos + 1.0) ** 2)
    # The cached cosines are detached in the reference (loss_util.py:357).
    return loss, jax.lax.stop_gradient(cos)


class FusedFlatten(NamedTuple):
    """All dihedral flatten sets concatenated for ONE fused evaluation.

    Nine separate flatten losses cost ~3 ms/step on TPU (many small
    gather/It kernels); fused into one segmented computation they cost a
    fraction. Entries keep their set id so traced per-set weights apply
    per entry; soft entries compare against a single concatenated
    ``cos_init`` vector cached at frame 0.
    """

    quads: DihedralQuadruples  # concatenation of every set's quadruples
    hard_sets: tuple  # set names, order = segment order
    soft_sets: tuple
    hard_segment: np.ndarray  # (Eh,) set index into hard_sets
    soft_segment: np.ndarray  # (Es,) set index into soft_sets
    num_hard: int  # entries 0..num_hard are hard, rest soft


def build_fused_flatten(
    quadruples: "dict[str, DihedralQuadruples]",
    hard_sets: Sequence[str],
    soft_sets: Sequence[str],
) -> FusedFlatten:
    hard_sets = tuple(k for k in hard_sets if k in quadruples)
    soft_sets = tuple(k for k in soft_sets if k in quadruples)

    def cat(names):
        qs = [quadruples[k] for k in names]
        seg = np.concatenate(
            [np.full(q.v0.shape[0], i, np.int32) for i, q in enumerate(qs)]
        ) if qs else np.zeros(0, np.int32)
        fields = [
            np.concatenate([getattr(q, f) for q in qs])
            if qs else np.zeros(0, np.int32)
            for f in ("v0", "v1", "v2", "v3")
        ]
        return DihedralQuadruples(*fields), seg

    hq, hseg = cat(hard_sets)
    sq, sseg = cat(soft_sets)
    quads = DihedralQuadruples(
        v0=np.concatenate([hq.v0, sq.v0]),
        v1=np.concatenate([hq.v1, sq.v1]),
        v2=np.concatenate([hq.v2, sq.v2]),
        v3=np.concatenate([hq.v3, sq.v3]),
    )
    return FusedFlatten(
        quads=quads,
        hard_sets=hard_sets,
        soft_sets=soft_sets,
        hard_segment=hseg,
        soft_segment=sseg,
        num_hard=int(hq.v0.shape[0]),
    )


def fused_flatten_loss(
    vertices: jnp.ndarray,
    fused: FusedFlatten,
    weights: "dict[str, jnp.ndarray]",
    soft_cos_init: Optional[jnp.ndarray] = None,  # (Es,) or None (frame 0)
    eps: float = 1e-6,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> (weighted total over all sets, current soft cosines (Es,)).

    Frame 0 (``soft_cos_init=None``): soft sets use the (cos+1)^2 form and
    the returned cosines are cached; frames > 0 use 1 - cos|theta - theta0|
    — exactly the per-set losses of loss_util.py, just evaluated once.
    """
    cos = dihedral_cos(vertices, fused.quads, eps)
    nh = fused.num_hard

    def segment_weights(names, segment):
        # per-entry weight via compare-select — a tiny-table lane gather
        # (table[segment]) serializes on TPU
        seg = jnp.asarray(segment)
        w = jnp.zeros(seg.shape, jnp.float32)
        for i, k in enumerate(names):
            w = jnp.where(seg == i, weights[k], w)
        return w

    hard_cos = jnp.where(cos[:nh] > 1.0, -1.0, cos[:nh])  # threshold 0 deg
    hard_vals = (hard_cos + 1.0) ** 2
    hard_w = (
        segment_weights(fused.hard_sets, fused.hard_segment)
        if fused.hard_sets
        else jnp.zeros(0)
    )

    soft_cos = cos[nh:]
    if soft_cos_init is None:
        soft_vals = (soft_cos + 1.0) ** 2
    else:
        soft_vals = 1.0 - jnp.cos(
            jnp.abs(
                jnp.arccos(jnp.clip(soft_cos, -1.0, 1.0))
                - jnp.arccos(jnp.clip(soft_cos_init, -1.0, 1.0))
            )
        )
    soft_w = (
        segment_weights(fused.soft_sets, fused.soft_segment)
        if fused.soft_sets
        else jnp.zeros(0)
    )
    total = jnp.sum(hard_vals * hard_w) + jnp.sum(soft_vals * soft_w)
    return total, jax.lax.stop_gradient(soft_cos)


class FusedUmbrella(NamedTuple):
    """The umbrella (one-ring mean) flatten sets fused via per-vertex
    coefficients: sum_k w_k * MSE_k == sum_v c_v * |ave_v - v|^2 with
    c_v = sum_k w_k [v in region_k] / (3 |region_k|)."""

    neighbor_indices: np.ndarray  # (N, K)
    neighbor_mask: np.ndarray  # (N, K)
    neighbor_num: np.ndarray  # (N,)
    set_names: tuple
    coeff: np.ndarray  # (S, N) per-set per-vertex 1/(3|R_k|) indicators


def build_fused_umbrella(
    umbrellas: "dict[str, UmbrellaFlatten]", set_names: Sequence[str]
) -> Optional[FusedUmbrella]:
    names = tuple(k for k in set_names if k in umbrellas)
    if not names:
        return None
    first = umbrellas[names[0]]
    n = first.neighbor_indices.shape[0]
    coeff = np.zeros((len(names), n), np.float32)
    for i, k in enumerate(names):
        reg = umbrellas[k].region
        coeff[i, reg] = 1.0 / (3.0 * reg.shape[0])
    return FusedUmbrella(
        neighbor_indices=first.neighbor_indices,
        neighbor_mask=first.neighbor_mask,
        neighbor_num=first.neighbor_num,
        set_names=names,
        coeff=coeff,
    )


def fused_umbrella_loss(
    vertices: jnp.ndarray,
    fused: FusedUmbrella,
    weights: "dict[str, jnp.ndarray]",
) -> jnp.ndarray:
    # row gather + transposed (K, N) component math (TPU layout rule)
    from topo4d_tpu.losses.temporal import _gather_rows_t

    idx = jnp.asarray(fused.neighbor_indices).T  # (K, N)
    nb = _gather_rows_t(vertices, idx)  # (3, K, N)
    return fused_umbrella_from_nb(nb, vertices.T, fused, weights)


def fused_umbrella_from_nb(
    nb: jnp.ndarray,  # (C>=3, K, N) gathered one-ring data, comps 0-2 = xyz
    xt: jnp.ndarray,  # (3, N) transposed vertices
    fused: FusedUmbrella,
    weights: "dict[str, jnp.ndarray]",
) -> jnp.ndarray:
    """Umbrella total from an EXISTING one-ring gather.

    Lets the track step share the temporal loss's (K, N) neighbor gather —
    the gather + its backward scatter dominate the umbrella cost (~0.7 ms
    of 0.77 on a v5e chip). Requires ``fused.neighbor_indices`` to equal
    the gather's index table (both are self-padded ``ring.ragged``).
    """
    msk = jnp.asarray(fused.neighbor_mask).T  # (K, N)
    num = jnp.asarray(fused.neighbor_num)  # (N,)
    sq = jnp.zeros_like(num)
    for c in range(3):
        # isolated vertices (num==0) must yield 0, not 0/0=NaN
        ave = jnp.sum(nb[c] * msk, axis=0) / jnp.maximum(num, 1.0)
        d = ave - xt[c]
        sq = sq + d * d
    w = jnp.stack([weights[k] for k in fused.set_names])  # (S,)
    cf = jnp.einsum("s,sn->n", w, jnp.asarray(fused.coeff))
    return jnp.sum(cf * sq)


class UmbrellaFlatten(NamedTuple):
    """Precomputed state for FlattenLoss_v2 (loss_util.py:223-251)."""

    neighbor_indices: np.ndarray  # (N, K) padded with self
    neighbor_mask: np.ndarray  # (N, K) 1 for real neighbors
    neighbor_num: np.ndarray  # (N,)
    region: np.ndarray  # (R,) vertex indices the MSE runs over


def build_umbrella_flatten(
    neighbor_indices_ragged: Sequence[Sequence[int]],
    num_vertices: int,
    region: Optional[Sequence[int]] = None,
    ex_mask: Sequence[int] = (),
) -> UmbrellaFlatten:
    """Build padded one-ring state + region selection.

    ``region=None`` means all vertices (the reference's empty-mask
    fallback, loss_util.py:248-249).
    """
    max_k = max(len(lst) for lst in neighbor_indices_ragged)
    idx = np.zeros((num_vertices, max_k), np.int32)
    msk = np.zeros((num_vertices, max_k), np.float32)
    num = np.zeros((num_vertices,), np.float32)
    for i, lst in enumerate(neighbor_indices_ragged):
        k = len(lst)
        idx[i, :k] = lst
        idx[i, k:] = i
        msk[i, :k] = 1.0
        num[i] = k
    if region is None:
        reg = np.arange(num_vertices)
    else:
        reg = np.asarray(sorted(set(int(r) for r in region) - set(ex_mask)))
        if reg.size == 0:
            reg = np.arange(num_vertices)
    return UmbrellaFlatten(idx, msk, num, reg.astype(np.int32))


def umbrella_flatten_loss(
    vertices: jnp.ndarray, state: UmbrellaFlatten
) -> jnp.ndarray:
    """MSE(mean of one-ring, vertex) over the region (FlattenLoss_v2.forward)."""
    nbr = vertices[jnp.asarray(state.neighbor_indices)]  # (N, K, 3)
    nbr = nbr * jnp.asarray(state.neighbor_mask)[..., None]
    ave = jnp.sum(nbr, axis=1) / jnp.maximum(
        jnp.asarray(state.neighbor_num)[:, None], 1.0
    )
    reg = jnp.asarray(state.region)
    return jnp.mean((ave[reg] - vertices[reg]) ** 2)
