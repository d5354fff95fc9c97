"""Latent regularizers (losses/extra.py) vs the reference formulas
(loss_util.py:9-111) — capabilities kept available though never invoked
from the reference's train loop."""

import jax.numpy as jnp
import numpy as np

from topo4d_tpu.losses.extra import (
    arap_loss,
    build_edge_set,
    build_uniform_laplacian,
    edge_loss,
    laplacian_loss,
    norm_loss,
)
from topo4d_tpu.testing import make_grid_mesh
from topo4d_tpu.topology.adjacency import triangulate_faces


def _tri_mesh(seed=0):
    verts, faces = make_grid_mesh(5, 5, extent=0.5, seed=seed)
    tris = np.asarray(triangulate_faces([list(f) for f in faces]), np.int64)
    return verts.astype(np.float32), tris


def test_edge_loss_matches_reference_formula():
    verts, tris = _tri_mesh()
    es = build_edge_set(tris)
    # undirected-unique edge multiset == the reference's set inserts
    ref_edges = set()
    for t in tris:
        ref_edges |= {
            tuple(sorted((t[0], t[1]))),
            tuple(sorted((t[1], t[2]))),
            tuple(sorted((t[0], t[2]))),
        }
    assert {tuple(sorted(e)) for e in es.edges.tolist()} == ref_edges
    d = np.linalg.norm(
        verts[es.edges[:, 0]] - verts[es.edges[:, 1]], axis=-1
    )
    # torch.std is Bessel-corrected
    np.testing.assert_allclose(
        float(edge_loss(jnp.asarray(verts), es)), d.std(ddof=1), rtol=1e-5
    )


def test_norm_loss_matches_cosine_formula():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(40, 3)).astype(np.float32)
    n = rng.normal(size=(40, 3)).astype(np.float32)
    cos = np.sum(x * n, 1) / (
        np.linalg.norm(x, axis=1) * np.linalg.norm(n, axis=1)
    )
    want = np.mean(1 - np.abs(cos))
    np.testing.assert_allclose(
        float(norm_loss(jnp.asarray(x), jnp.asarray(n))), want, rtol=1e-5
    )
    # aligned vectors -> zero
    assert float(norm_loss(jnp.asarray(n * 3.0), jnp.asarray(n))) < 1e-6


def test_laplacian_loss_zero_at_rest_and_positive_after_noise():
    verts, tris = _tri_mesh()
    lap = build_uniform_laplacian(verts, tris)
    v = jnp.asarray(verts)
    assert float(laplacian_loss(v, lap)) < 1e-10
    rng = np.random.default_rng(1)
    noisy = v + jnp.asarray(
        rng.normal(0, 0.01, verts.shape).astype(np.float32)
    )
    assert float(laplacian_loss(noisy, lap)) > 1e-6
    # masked variant only counts the masked rows
    full = float(laplacian_loss(noisy, lap))
    sub = float(laplacian_loss(noisy, lap, mask=[0, 1, 2]))
    assert 0 <= sub <= full


def test_laplacian_loss_matches_dense_uniform_laplacian():
    verts, tris = _tri_mesh()
    lap = build_uniform_laplacian(verts, tris)
    nv = verts.shape[0]
    dense = np.zeros((nv, nv), np.float64)
    for i, (row_i, row_w) in enumerate(
        zip(lap.neighbor_indices, lap.neighbor_weight)
    ):
        for j, w in zip(row_i, row_w):
            dense[i, j] += w
        dense[i, i] -= 1.0
    rng = np.random.default_rng(2)
    vp = verts + rng.normal(0, 0.01, verts.shape).astype(np.float32)
    want = np.sum((dense @ vp - dense @ verts) ** 2)
    got = float(laplacian_loss(jnp.asarray(vp), lap))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_arap_loss_zero_for_rigid_motion():
    verts, tris = _tri_mesh()
    lap = build_uniform_laplacian(verts, tris)
    x = jnp.asarray(verts)
    # rigid: rotation + translation => edge lengths preserved
    th = 0.3
    rot = np.array(
        [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0],
         [0, 0, 1]], np.float32,
    )
    moved = verts @ rot.T + np.array([0.1, -0.2, 0.05], np.float32)
    dx = jnp.asarray(moved - verts)
    assert float(arap_loss(x, dx, lap)) < 1e-6
    # non-rigid stretch is penalized
    stretch = verts * np.array([1.3, 1.0, 1.0], np.float32) - verts
    assert float(arap_loss(x, jnp.asarray(stretch), lap)) > 1e-5
