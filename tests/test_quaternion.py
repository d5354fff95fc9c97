import jax.numpy as jnp
import numpy as np
import pytest

from topo4d_tpu.core.quaternion import (
    normal_to_quat,
    normal_to_quat_reference,
    quat_conjugate,
    quat_mult,
    quat_normalize,
    quat_to_rotmat,
)


def random_quats(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n, 4)).astype(np.float32)


def test_quat_to_rotmat_is_rotation():
    q = random_quats(32)
    r = np.asarray(quat_to_rotmat(jnp.asarray(q)))
    eye = np.einsum("nij,nkj->nik", r, r)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (32, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(r), np.ones(32), atol=1e-5)


def test_quat_to_rotmat_identity():
    q = jnp.array([[1.0, 0.0, 0.0, 0.0]])
    np.testing.assert_allclose(np.asarray(quat_to_rotmat(q))[0], np.eye(3), atol=1e-7)


def test_quat_mult_matches_rotmat_composition():
    q1 = quat_normalize(jnp.asarray(random_quats(16, 1)))
    q2 = quat_normalize(jnp.asarray(random_quats(16, 2)))
    r12 = np.asarray(quat_to_rotmat(quat_mult(q1, q2)))
    r1r2 = np.asarray(quat_to_rotmat(q1)) @ np.asarray(quat_to_rotmat(q2))
    np.testing.assert_allclose(r12, r1r2, atol=1e-5)


def test_quat_conjugate_inverts():
    q = quat_normalize(jnp.asarray(random_quats(16, 3)))
    prod = np.asarray(quat_mult(q, quat_conjugate(q)))
    expected = np.tile(np.array([1.0, 0, 0, 0]), (16, 1))
    np.testing.assert_allclose(prod, expected, atol=1e-5)


def test_normal_to_quat_rotates_x_axis_onto_normal():
    rng = np.random.default_rng(4)
    n = rng.normal(size=(64, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    q = normal_to_quat(jnp.asarray(n))
    r = np.asarray(quat_to_rotmat(q))
    x_rotated = r @ np.array([1.0, 0.0, 0.0])
    np.testing.assert_allclose(x_rotated, n, atol=1e-4)


def test_normal_to_quat_matches_reference_formula():
    # Independent check against the reference math (external.py:45-61).
    rng = np.random.default_rng(5)
    d = rng.normal(size=(32, 3))
    unit = d / np.linalg.norm(d, axis=1, keepdims=True)
    x = np.tile(np.array([1.0, 0.0, 0.0]), (32, 1))
    axes = np.cross(x, unit)
    ang = np.arccos(np.clip(np.sum(x * unit, axis=1), -1, 1))
    expected = np.concatenate(
        [np.cos(ang / 2)[:, None], axes * np.sin(ang / 2)[:, None]], axis=1
    )
    got = np.asarray(normal_to_quat_reference(jnp.asarray(d.astype(np.float32))))
    np.testing.assert_allclose(got, expected, atol=1e-5)
