"""Vertex lighting (face3d mesh/light.py parity, jnp/einsum).

Gouraud point-light shading and spherical-harmonics irradiance over
per-vertex albedo. The reference accumulates face normals through its
Cython kernel (`/root/reference/face3d/mesh/light.py:14-42`); here the
accumulation is the same segment-sum as ``topology.normals`` with
face3d's zero-normal convention (degenerate vertices get the +x axis).
"""

from __future__ import annotations

import jax.numpy as jnp


def get_normal(vertices: jnp.ndarray, triangles: jnp.ndarray) -> jnp.ndarray:
    """(V, 3) x (F, 3) -> (V, 3) unit vertex normals.

    face3d semantics (light.py:14-42): unnormalized face cross products
    summed per vertex; vertices touching no face get the +x axis.
    """
    tri = jnp.asarray(triangles)
    p0 = vertices[tri[:, 0]]
    p1 = vertices[tri[:, 1]]
    p2 = vertices[tri[:, 2]]
    fn = jnp.cross(p0 - p1, p0 - p2)  # (F, 3)
    acc = jnp.zeros_like(vertices)
    for k in range(3):
        acc = acc.at[tri[:, k]].add(fn)
    mag = jnp.sum(acc**2, axis=1)
    zero = mag == 0
    acc = jnp.where(
        zero[:, None],
        jnp.array([1.0, 0.0, 0.0], vertices.dtype)[None, :],
        acc,
    )
    mag = jnp.where(zero, 1.0, mag)
    return acc / jnp.sqrt(mag)[:, None]


def add_light(
    vertices: jnp.ndarray,
    triangles: jnp.ndarray,
    colors: jnp.ndarray,
    light_positions: jnp.ndarray,
    light_intensities: jnp.ndarray,
) -> jnp.ndarray:
    """Gouraud diffuse point lights, clipped to [0, 1] (light.py:76-115).

    Lambertian: per light l, contribution = albedo * (n . dir_to(l)) *
    intensity(l), summed over lights. The reference's direction sign
    (vertex - light) is kept verbatim — it is part of the contract.
    """
    normals = get_normal(vertices, triangles)  # (V, 3)
    dirs = vertices[None, :, :] - light_positions[:, None, :]  # (L, V, 3)
    dirs = dirs / jnp.maximum(
        jnp.linalg.norm(dirs, axis=2, keepdims=True), 1e-12
    )
    ndl = jnp.einsum("vc,lvc->lv", normals, dirs)  # (L, V)
    lit = jnp.einsum("vc,lv,lc->vc", colors, ndl, light_intensities)
    return jnp.clip(lit, 0.0, 1.0)


def sh_basis(normals: jnp.ndarray) -> jnp.ndarray:
    """(V, 3) unit normals -> (V, 9) real SH basis (light.py:45-73).

    The reference's ``add_light_sh`` references an undefined name and is
    marked TODO; this is the basis it documents:
    (1, nx, ny, nz, nx*ny, nx*nz, ny*nz, nx^2-ny^2, 3nz^2-1).
    """
    nx, ny, nz = normals[:, 0], normals[:, 1], normals[:, 2]
    return jnp.stack(
        [
            jnp.ones_like(nx), nx, ny, nz,
            nx * ny, nx * nz, ny * nz,
            nx**2 - ny**2, 3 * nz**2 - 1,
        ],
        axis=1,
    )


def add_light_sh(
    vertices: jnp.ndarray,
    triangles: jnp.ndarray,
    colors: jnp.ndarray,
    sh_coeff: jnp.ndarray,
) -> jnp.ndarray:
    """Lambertian SH lighting: albedo * (Y(n) @ sh_coeff) (light.py:45-73,
    with the reference's undefined-variable bug fixed — documented)."""
    normals = get_normal(vertices, triangles)
    ref = sh_basis(normals) @ jnp.reshape(sh_coeff, (9, 1))  # (V, 1)
    return colors * ref


def fit_light_sh(
    observed: jnp.ndarray,
    albedo: jnp.ndarray,
    normals: jnp.ndarray,
    lamb: float = 10.0,
) -> jnp.ndarray:
    """Ridge-solve 9 SH coefficients from per-vertex observations.

    min ||observed - albedo * (Y(n) @ c)||^2 + lamb * ||c||^2 over the
    provided (visible) vertices, channels stacked — a working version of
    the reference's unfinished ``fit_light`` (light.py:121-212).
    observed/albedo: (V, C); normals: (V, 3). Returns (9,).
    """
    basis = sh_basis(normals)  # (V, 9)
    a = (albedo[:, :, None] * basis[:, None, :]).reshape(-1, 9)  # (V*C, 9)
    y = observed.reshape(-1)
    lhs = a.T @ a + lamb * jnp.eye(9, dtype=a.dtype)
    rhs = a.T @ y
    return jnp.linalg.solve(lhs, rhs)
