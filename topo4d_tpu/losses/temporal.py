"""Temporal / topological regularizers: rigid, rot, iso.

Reference semantics: train.py:331-346 with the per-region weight matrices
built at train.py:546-585. All math runs in TRANSPOSED layout — components
as leading dims, vertices on the 128-lane minor dim:

  TPU layout rule: an (N, 3) or (N, K) array pads its minor dim to 128
  lanes in vregs/tiles — every elementwise op costs ~42x its logical
  size. Transposed (3, N) / (K, N) layouts make the same ops ~1x.
  (This cut the measured fwd+bwd cost of this loss ~3x on a v5e chip.)

Gathers stay in ROW form — table[(K·N,) indices] over an (N, C) table —
because TPU gathers are fast along the sublane (row) dim and pathologically
slow along lanes (measured: a per-component (N,)-table gather made this
loss 4x SLOWER). One transpose then feeds the component math; its autodiff
backward is transpose + row scatter-add, both fast.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax.numpy as jnp


def _gather_rows_t(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """(N, C) table, (K, N) indices -> (C, K, N) transposed neighbor data."""
    k, n = idx.shape
    rows = table[idx.reshape(-1)]  # (K*N, C) sublane row gather
    return rows.T.reshape(table.shape[1], k, n)


class TemporalPriors(NamedTuple):
    """State cached at the start of each timestep (train.py:420-438).

    TRANSPOSED layout (see module docstring): components lead, vertices
    ride the minor dim.
    """

    prev_inv_rot: jnp.ndarray  # (4, N) conjugate of previous normalized quats
    prev_offset: jnp.ndarray  # (3, K, N) one-ring offsets in prev frame


def _quat_mult_t(q1, q2):
    """Hamilton product in (4, N) component layout."""
    w1, x1, y1, z1 = q1[0], q1[1], q1[2], q1[3]
    w2, x2, y2, z2 = q2[0], q2[1], q2[2], q2[3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ]
    )


def make_temporal_priors(
    means3d: jnp.ndarray,  # (N, 3)
    rotations: jnp.ndarray,  # (N, 4) normalized quats
    neighbor_indices: jnp.ndarray,  # (K, N)
) -> TemporalPriors:
    """Cache previous-frame pose for the rigid loss (train.py:420-432)."""
    xt = means3d.T  # (3, N)
    nb = _gather_rows_t(means3d, neighbor_indices)  # (3, K, N)
    prev_offset = nb - xt[:, None, :]  # (3, K, N)
    qt = rotations.T  # (4, N)
    prev_inv_rot = jnp.stack([qt[0], -qt[1], -qt[2], -qt[3]])
    return TemporalPriors(prev_inv_rot=prev_inv_rot, prev_offset=prev_offset)


def rigid_rot_iso_losses(
    means3d: jnp.ndarray,  # (N, 3)
    rotations: jnp.ndarray,  # (N, 4) normalized
    priors: TemporalPriors,
    neighbor_indices: jnp.ndarray,  # (K, N)
    neighbor_dist: jnp.ndarray,  # (K, N) rest-pose neighbor distances
    rig_w: jnp.ndarray,  # (K, N)
    rot_w: jnp.ndarray,  # (K, N)
    iso_w: jnp.ndarray,  # (K, N)
    extra=None,  # optional fn(nb (7,K,N), xt (3,N)) -> scalar
    ring_inv=None,  # (N·K-position inverse incidence) np.int32 or None
) -> Dict[str, jnp.ndarray]:
    """The three temporal losses of train.py:331-346.

    rigid: one-ring offsets rotated into the previous frame's local frame
      must match the cached previous offsets.
    rot: neighbors must share the same relative rotation.
    iso: one-ring distances must match the rest-pose distances.

    ``extra`` lets other one-ring losses (the umbrella flatten) reuse this
    loss's neighbor gather — the gather and its backward scatter are the
    dominant cost of any one-ring term. Its value is returned pre-weighted
    under key "extra"; the caller must treat it as such.

    ``ring_inv`` (from ``neighbors.build_inverse_incidence`` over the
    FLATTENED (K, N) index table) turns the gather's backward scatter-add
    into a row gather (~3x cheaper on TPU). The caller must guarantee it
    was built from exactly ``neighbor_indices.reshape(-1)``.
    """
    eps = 1e-20
    idx = neighbor_indices
    qt = rotations.T  # (4, N)
    rel = _quat_mult_t(qt, priors.prev_inv_rot)  # (4, N) unnormalized product

    # rotation matrix entries from the normalized relative quaternion
    # (reference build_rotation normalizes its input, external.py:26-43)
    nrm = jnp.sqrt(rel[0] ** 2 + rel[1] ** 2 + rel[2] ** 2 + rel[3] ** 2)
    r, x, y, z = (rel[c] / nrm for c in range(4))
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - r * z)
    r02 = 2 * (x * z + r * y)
    r10 = 2 * (x * y + r * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - r * x)
    r20 = 2 * (x * z - r * y)
    r21 = 2 * (y * z + r * x)
    r22 = 1 - 2 * (x * x + y * y)

    # ONE row gather covers both the means and the relative quaternions
    xt = means3d.T  # (3, N)
    tbl = jnp.concatenate([means3d, rel.T], axis=1)  # (N, 7)
    if ring_inv is not None:
        from topo4d_tpu.losses.neighbors import gather_rows_inv

        k, n = idx.shape
        rows = gather_rows_inv(tbl, idx.reshape(-1), jnp.asarray(ring_inv))
        nb = rows.T.reshape(tbl.shape[1], k, n)  # (7, K, N)
    else:
        nb = _gather_rows_t(tbl, idx)  # (7, K, N)
    off = [nb[c] - xt[c][None, :] for c in range(3)]  # 3 x (K, N)

    # R^T @ offset: rotate current offsets into the previous local frame
    o0 = r00 * off[0] + r10 * off[1] + r20 * off[2]
    o1 = r01 * off[0] + r11 * off[1] + r21 * off[2]
    o2 = r02 * off[0] + r12 * off[1] + r22 * off[2]
    d0 = o0 - priors.prev_offset[0]
    d1 = o1 - priors.prev_offset[1]
    d2 = o2 - priors.prev_offset[2]
    rigid = jnp.mean(
        jnp.sqrt((d0 * d0 + d1 * d1 + d2 * d2) * rig_w + eps)
    )

    # neighbor relative-rotation consistency (on the unnormalized product,
    # matching the reference's gather of rel_rot)
    s4 = jnp.zeros_like(rot_w)
    for c in range(4):
        dq = nb[3 + c] - rel[c][None, :]
        s4 = s4 + dq * dq
    rot = jnp.mean(jnp.sqrt(s4 * rot_w + eps))

    mag = jnp.sqrt(
        off[0] ** 2 + off[1] ** 2 + off[2] ** 2 + eps
    )
    dd = mag - neighbor_dist
    iso = jnp.mean(jnp.sqrt(dd * dd * iso_w + eps))

    out = {"rigid": rigid, "rot": rot, "iso": iso}
    if extra is not None:
        out["extra"] = extra(nb, xt)
    return out
