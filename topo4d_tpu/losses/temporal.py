"""Temporal / topological regularizers: rigid, rot, iso.

Reference semantics: train.py:331-346 with the per-region weight matrices
built at train.py:546-585. All three are jnp gathers over precomputed
one-ring neighbor indices — fully jittable, no Python loops.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax.numpy as jnp

from topo4d_tpu.core.quaternion import quat_conjugate, quat_mult, quat_to_rotmat
from topo4d_tpu.losses.image import weighted_l2_loss_v1, weighted_l2_loss_v2
from topo4d_tpu.losses.neighbors import gather_neighbors


class TemporalPriors(NamedTuple):
    """State cached at the start of each timestep (train.py:420-438)."""

    prev_inv_rot: jnp.ndarray  # (N, 4) conjugate of previous normalized quats
    prev_offset: jnp.ndarray  # (N, K, 3) one-ring offsets in prev frame


def make_temporal_priors(
    means3d: jnp.ndarray,
    rotations: jnp.ndarray,  # normalized quats
    neighbor_indices: jnp.ndarray,  # (N, K)
) -> TemporalPriors:
    """Cache previous-frame pose for the rigid loss (train.py:420-432)."""
    prev_offset = means3d[neighbor_indices] - means3d[:, None]
    return TemporalPriors(
        prev_inv_rot=quat_conjugate(rotations), prev_offset=prev_offset
    )


def rigid_rot_iso_losses(
    means3d: jnp.ndarray,  # (N, 3)
    rotations: jnp.ndarray,  # (N, 4) normalized
    priors: TemporalPriors,
    neighbor_indices: jnp.ndarray,  # (N, K)
    neighbor_dist: jnp.ndarray,  # (N, K) rest-pose neighbor distances
    rig_w: jnp.ndarray,  # (N, K)
    rot_w: jnp.ndarray,  # (N, K)
    iso_w: jnp.ndarray,  # (N, K)
    neighbor_inv: jnp.ndarray = None,  # (N, K) inverse slots (optional)
) -> Dict[str, jnp.ndarray]:
    """The three temporal losses of train.py:331-346.

    rigid: one-ring offsets rotated into the previous frame's local frame
      must match the cached previous offsets.
    rot: neighbors must share the same relative rotation.
    iso: one-ring distances must match the rest-pose distances.

    With ``neighbor_inv`` the one-ring gathers differentiate via transpose
    gathers instead of scatter-adds (TPU scatters serialize).
    """
    rel_rot = quat_mult(rotations, priors.prev_inv_rot)  # (N, 4)
    rot_mats = quat_to_rotmat(rel_rot)  # (N, 3, 3)

    if neighbor_inv is not None:
        gather = lambda x: gather_neighbors(x, neighbor_indices, neighbor_inv)
    else:
        gather = lambda x: x[neighbor_indices]
    neighbor_pts = gather(means3d)  # (N, K, 3)
    curr_offset = neighbor_pts - means3d[:, None]  # (N, K, 3)
    # R^T @ offset: rotate current offsets back into the previous local frame
    curr_offset_in_prev = jnp.einsum("nji,nkj->nki", rot_mats, curr_offset)
    rigid = weighted_l2_loss_v2(curr_offset_in_prev, priors.prev_offset, rig_w)

    rot = weighted_l2_loss_v2(gather(rel_rot), rel_rot[:, None], rot_w)

    curr_offset_mag = jnp.sqrt(jnp.sum(curr_offset**2, axis=-1) + 1e-20)
    iso = weighted_l2_loss_v1(curr_offset_mag, neighbor_dist, iso_w)

    return {"rigid": rigid, "rot": rot, "iso": iso}
