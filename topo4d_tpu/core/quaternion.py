"""Quaternion / rotation math (pure jnp, batched, differentiable).

Semantics match the reference implementation used by Topo4D
(reference: external.py:26-61, helpers.py:137-144): quaternions are
stored (w, x, y, z); ``normal_to_quat`` aligns the +x axis to a given
direction (the reference's ``build_quaterion``).
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """L2-normalize quaternions along the last axis."""
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (..., 4) (w,x,y,z) -> rotation matrices (..., 3, 3).

    Normalizes the input first (reference: external.py:26-43).
    """
    q = quat_normalize(q)
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)], axis=-1
    )
    row1 = jnp.stack(
        [2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)], axis=-1
    )
    row2 = jnp.stack(
        [2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)], axis=-1
    )
    return jnp.stack([row0, row1, row2], axis=-2)


def quat_mult(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of (..., 4) quaternions (reference: helpers.py:137-144)."""
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    """Conjugate (w, -x, -y, -z); inverse for unit quaternions."""
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def normal_to_quat_reference(
    directions: jnp.ndarray, eps: float = 1e-12
) -> jnp.ndarray:
    """Reference-parity quaternion init from normals (..., 3) -> (..., 4).

    Byte-for-byte port of the reference's ``build_quaterion``
    (external.py:45-61): axis = cross(x_axis, dir) *without normalizing the
    axis* (its length is sin(angle)), so the result is only an approximate
    x->normal rotation away from 0/90/180 degrees. The reference uses this
    as the Gaussian rotation INIT (train.py:136), which optimization then
    refines — we reproduce the quirk for trajectory parity. For an exact
    rotation use :func:`normal_to_quat`.
    """
    unit = directions / jnp.maximum(
        jnp.linalg.norm(directions, axis=-1, keepdims=True), eps
    )
    x_axis = jnp.zeros_like(unit).at[..., 0].set(1.0)
    axes = jnp.cross(x_axis, unit)
    angles = jnp.arccos(jnp.clip(unit[..., 0], -1.0, 1.0))
    w = jnp.cos(angles / 2)
    xyz = axes * jnp.sin(angles / 2)[..., None]
    return jnp.concatenate([w[..., None], xyz], axis=-1)


def normal_to_quat(directions: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Exact quaternion rotating +x onto each direction (..., 3) -> (..., 4).

    Uses the half-way construction q = normalize([1 + <x, n>, cross(x, n)]),
    which is singularity-free except for n == -x (handled by falling back to
    a 180-degree rotation about +y).
    """
    unit = directions / jnp.maximum(
        jnp.linalg.norm(directions, axis=-1, keepdims=True), eps
    )
    x_axis = jnp.zeros_like(unit).at[..., 0].set(1.0)
    w = 1.0 + unit[..., 0]
    xyz = jnp.cross(x_axis, unit)
    q = jnp.concatenate([w[..., None], xyz], axis=-1)
    antiparallel = w < 1e-6
    fallback = jnp.zeros_like(q).at[..., 2].set(1.0)  # 180 deg about +y
    q = jnp.where(antiparallel[..., None], fallback, q)
    return quat_normalize(q, eps)


def quaternion_similarity(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Angle in degrees between two unit quaternions (helpers.py:133-135)."""
    dot = jnp.clip(jnp.sum(q1 * q2, axis=-1), -1.0, 1.0)
    return jnp.rad2deg(jnp.arccos(jnp.clip(2.0 * dot**2 - 1.0, -1.0, 1.0)))
