"""mesh3d.mesh_numpy (pure-NumPy oracle tier) vs the native C++ tier.

The reference ships face3d/mesh_numpy as the documented CPU oracle for
its Cython renderer (mesh_numpy/__init__.py:1-10); here the NumPy tier
mirrors topo4d_tpu.native (scanline.cpp) — same signatures, same
semantics including the documented inclusive-far-edge deviation and
first-triangle-wins z ties — so the two independently-written
implementations check each other on random meshes.
"""

import numpy as np
import pytest

from topo4d_tpu.mesh3d import mesh_numpy as mnp


def _random_mesh(seed, n_tris=40, h=48, w=64):
    rng = np.random.default_rng(seed)
    nv = n_tris + 2
    verts = np.empty((nv, 3), np.float32)
    verts[:, 0] = rng.uniform(-5, w + 5, nv)
    verts[:, 1] = rng.uniform(-5, h + 5, nv)
    verts[:, 2] = rng.uniform(-1, 1, nv)
    tris = rng.integers(0, nv, (n_tris, 3)).astype(np.int32)
    return verts, tris


@pytest.fixture(scope="module")
def native():
    from topo4d_tpu import native as nat

    try:
        nat._lib()
    except Exception as exc:  # pragma: no cover - no toolchain
        pytest.skip(f"native build unavailable: {exc}")
    return nat


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_render_colors_matches_native(native, seed):
    verts, tris = _random_mesh(seed)
    rng = np.random.default_rng(100 + seed)
    cols = rng.uniform(0, 1, (verts.shape[0], 3)).astype(np.float32)
    a = mnp.render_colors(verts, tris, cols, 48, 64)
    b = native.render_colors(verts, tris, cols, 48, 64)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("seed", [0, 3])
def test_rasterize_matches_native(native, seed):
    verts, tris = _random_mesh(seed)
    da, ta, ba = mnp.rasterize_triangles(verts, tris, 48, 64)
    db, tb, bb = native.rasterize_triangles(verts, tris, 48, 64)
    np.testing.assert_array_equal(ta, tb)
    np.testing.assert_allclose(da, db, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(ba, bb, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("bilinear", [True, False])
def test_render_texture_matches_native(native, bilinear):
    verts, tris = _random_mesh(7)
    rng = np.random.default_rng(7)
    tex = rng.uniform(0, 1, (32, 40, 3)).astype(np.float32)
    tc = np.empty((verts.shape[0] + 3, 2), np.float32)
    tc[:, 0] = rng.uniform(0, 39, tc.shape[0])
    tc[:, 1] = rng.uniform(0, 31, tc.shape[0])
    ttris = rng.integers(0, tc.shape[0], tris.shape).astype(np.int32)
    a = mnp.render_texture(verts, tris, tex, tc, ttris, 48, 64, bilinear)
    b = native.render_texture(verts, tris, tex, tc, ttris, 48, 64, bilinear)
    # nearest-neighbor sampling rounds tex indices: a half-integer UV is
    # a legitimate rounding knife between lround (C) and np.rint
    # (banker's); exclude those single texels from the comparison
    if not bilinear:
        diff = np.abs(a - b).max(axis=-1)
        frac = diff > 1e-5
        assert frac.mean() < 0.01, frac.mean()
        a = np.where(frac[..., None], 0, a)
        b = np.where(frac[..., None], 0, b)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_vertex_normals_matches_native(native):
    verts, tris = _random_mesh(11)
    a = mnp.vertex_normals(verts, tris)
    b = native.vertex_normals(verts, tris)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_render_colors_ties_first_triangle_wins():
    # two identical triangles, different colors: the FIRST one must own
    # every tied pixel (C++ `z > depth` keeps the earlier triangle)
    tri = np.array([[2, 2, 0.5], [20, 2, 0.5], [2, 20, 0.5]], np.float32)
    verts = np.concatenate([tri, tri])  # two identical copies
    tris = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    cols = np.array(
        [[1, 0, 0]] * 3 + [[0, 1, 0]] * 3, np.float32
    )
    out = mnp.render_colors(verts, tris, cols, 24, 24)
    covered = out.sum(-1) > 0
    assert covered.any()
    assert np.allclose(out[covered], [1, 0, 0], atol=1e-6)
