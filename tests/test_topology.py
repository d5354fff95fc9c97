import os

import jax.numpy as jnp
import numpy as np
import pytest

from topo4d_tpu.topology.adjacency import (
    build_one_ring,
    faces_fully_inside,
    faces_touching,
    find_adjacent_vertices,
    split_faces_by_mask,
    triangulate_faces,
)
from topo4d_tpu.topology.densify_uv import build_dense_topology, densify_quads
from topo4d_tpu.topology.interpolate import interpolate_dense_attribute
from topo4d_tpu.topology.knn import knn_sq_dists, mean_knn_sq_dist
from topo4d_tpu.topology.normals import vertex_normals_np
from topo4d_tpu.topology.obj_io import (
    MeshObj,
    load_obj,
    sample_vertex_colors,
    vertex_uv_multiplicity,
    write_obj_with_uv,
)


def make_quad_grid(rows, cols, with_uvs=True):
    """Vertices + quad faces + per-vertex uvs (1:1, no seams)."""
    ys, xs = np.meshgrid(np.arange(rows), np.arange(cols), indexing="ij")
    verts = np.stack([xs, ys, np.zeros_like(xs)], -1).reshape(-1, 3).astype(np.float32)
    uvs = np.stack([xs / (cols - 1), ys / (rows - 1)], -1).reshape(-1, 2).astype(np.float32)
    faces, uv_faces = [], []
    for i in range(rows - 1):
        for j in range(cols - 1):
            v0 = i * cols + j
            faces.append([v0, v0 + 1, v0 + cols + 1, v0 + cols])
            uv_faces.append([v0, v0 + 1, v0 + cols + 1, v0 + cols])
    return verts, uvs, faces, uv_faces


# ------------------------------------------------------------ adjacency


def test_find_adjacent_vertices_quad_includes_diagonals():
    # reference quirk: all 4 quad verts mutually adjacent (helpers.py:676-682)
    adj = find_adjacent_vertices(4, [[0, 1, 2, 3]])
    assert adj[0] == [1, 2, 3]
    assert adj[2] == [0, 1, 3]


def test_one_ring_weights_and_padding():
    verts, _, faces, _ = make_quad_grid(3, 3)
    ring = build_one_ring(verts, faces)
    n, k = ring.indices.shape
    assert n == 9
    # corner vertex 0 has 3 neighbors (1, 3, 4): padded entries point to self
    assert set(ring.indices[0]) >= {1, 3, 4, 0}
    # self-padded entries have zero weight
    self_pad = ring.indices == np.arange(n)[:, None]
    assert (ring.weight[self_pad] == 0).all()
    # real neighbor weights are exp(-2000 d^2)
    real = ~self_pad
    np.testing.assert_allclose(
        ring.weight[real], np.exp(-2000 * ring.dist[real] ** 2), rtol=1e-5
    )


def test_one_ring_boundary_mask_zeroes_cross_weights():
    verts, _, faces, _ = make_quad_grid(3, 3)
    verts = verts * 0.01  # mm-scale edges so exp(-2000 d^2) stays > 0
    ring = build_one_ring(verts, faces, boundary_mask=[4])  # center vertex
    # neighbors of center keep true distance but weight ~0 for edges INTO it
    for i in range(9):
        if i == 4:
            continue
        sel = ring.indices[i] == 4
        if sel.any():
            assert (ring.weight[i][sel] < 1e-30).all()
    # the center's own outgoing weights are unaffected
    sel = ring.indices[4] != 4
    assert (ring.weight[4][sel] > 0).all()


def test_triangulate_and_face_masks():
    tris = triangulate_faces([[0, 1, 2, 3], [4, 5, 6]])
    assert tris == [[0, 1, 2], [0, 2, 3], [4, 5, 6]]
    faces = np.array([[0, 1, 2], [2, 3, 4], [4, 5, 6]])
    inside = faces_fully_inside(faces, [0, 1, 2, 3, 4])
    assert inside.shape == (2, 3)
    touching = faces_touching(faces, [4])
    assert touching.shape == (2, 3)
    f, fi, nf, nfi = split_faces_by_mask(faces, np.arange(3), [0])
    assert f.shape[0] == 1 and nf.shape[0] == 2


# ------------------------------------------------------------ normals/knn


def test_vertex_normals_flat_grid():
    verts, _, faces, _ = make_quad_grid(4, 4)
    tris = np.asarray(triangulate_faces(faces))
    n = vertex_normals_np(verts, tris)
    # flat grid in z=0 plane: normals all +/- z
    np.testing.assert_allclose(np.abs(n[:, 2]), 1.0, atol=1e-5)
    np.testing.assert_allclose(n[:, :2], 0.0, atol=1e-5)


def test_knn_matches_bruteforce():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(200, 3)).astype(np.float32)
    got = knn_sq_dists(pts, 4)
    d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    expected = np.sort(d2, axis=1)[:, :4]
    np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-4)
    m = mean_knn_sq_dist(pts, 1)
    np.testing.assert_allclose(m, expected[:, 0], rtol=1e-3, atol=1e-4)


# ------------------------------------------------------------ obj io


def test_obj_roundtrip(tmp_path):
    verts, uvs, faces, uv_faces = make_quad_grid(3, 4)
    path = os.path.join(tmp_path, "mesh.obj")
    write_obj_with_uv(path, verts, faces, uvs, uv_faces)
    mesh = load_obj(path)
    np.testing.assert_allclose(mesh.vertices, verts, atol=1e-5)
    np.testing.assert_allclose(mesh.uvs, uvs, atol=1e-6)
    assert mesh.faces == faces
    assert mesh.uv_faces == uv_faces


def test_vertex_uv_multiplicity_detects_seams():
    verts, uvs, faces, uv_faces = make_quad_grid(2, 3)
    # duplicate a uv for vertex 1 in the second face -> multiplicity 2
    uvs2 = np.concatenate([uvs, [[0.9, 0.9]]], axis=0)
    uv_faces2 = [list(f) for f in uv_faces]
    uv_faces2[1][0] = 6  # vertex 1 now uses uv 6 in face 1 but uv 1 in face 0
    mult = [len(m) for m in vertex_uv_multiplicity(6, faces, uv_faces2, uvs2)]
    assert mult[1] == 2
    assert mult[0] == 1


def test_sample_vertex_colors_constant_texture():
    verts, uvs, faces, uv_faces = make_quad_grid(2, 2)
    tex = np.full((8, 8, 3), 200, np.uint8)
    colors = sample_vertex_colors(tex, 4, faces, uv_faces, uvs)
    np.testing.assert_allclose(colors, 200.0)


# ------------------------------------------------------------ densify


@pytest.mark.parametrize("density", [1, 3])
def test_densify_counts_and_positions(density):
    rows = cols = 4
    verts, uvs, faces, uv_faces = make_quad_grid(rows, cols)
    verts = verts + np.random.default_rng(0).normal(0, 0.05, verts.shape).astype(np.float32)
    mult = [1] * verts.shape[0]
    quad_faces = np.asarray(faces)
    topo = densify_quads(verts, uvs, quad_faces, np.asarray(uv_faces), density, mult)

    f = quad_faces.shape[0]
    d = density
    # every unique grid edge is shareable (incl. boundary edges, which the
    # reference also allocates once in edge_dict)
    n_shared_expected = rows * (cols - 1) + cols * (rows - 1)
    assert topo.num_shared_edges == n_shared_expected
    assert topo.num_seam_edge_instances == 0
    new_pts = topo.dense_vertices.shape[0] - verts.shape[0]
    assert new_pts == f * d * d + n_shared_expected * d
    assert topo.dense_quad_faces.shape == (f * (d + 1) ** 2, 4)

    # every new vertex sits at its bilinear position
    corners = verts[quad_faces[topo.father_face]]
    pos = np.einsum("pk,pkc->pc", topo.weights, corners)
    np.testing.assert_allclose(
        topo.dense_vertices[verts.shape[0]:], pos, atol=1e-5
    )
    # weights are a partition of unity
    np.testing.assert_allclose(topo.weights.sum(1), 1.0, atol=1e-6)

    # uvs of new points are the bilinear interp of corner uvs
    c_uv = uvs[np.asarray(uv_faces)[topo.father_face]]
    uv_pos = np.einsum("pk,pkc->pc", topo.weights, c_uv)
    np.testing.assert_allclose(topo.dense_uvs[uvs.shape[0]:], uv_pos, atol=1e-5)


def test_densify_watertight_no_duplicate_positions():
    # no seams -> every 3D position appears exactly once
    rows = cols = 3
    verts, uvs, faces, uv_faces = make_quad_grid(rows, cols)
    mult = [1] * verts.shape[0]
    topo = densify_quads(verts, uvs, np.asarray(faces), np.asarray(uv_faces), 2, mult)
    pts = np.round(topo.dense_vertices, 5)
    uniq = np.unique(pts, axis=0)
    assert uniq.shape[0] == pts.shape[0]


def test_densify_manifold_interior_edges():
    verts, uvs, faces, uv_faces = make_quad_grid(3, 3)
    mult = [1] * verts.shape[0]
    topo = densify_quads(verts, uvs, np.asarray(faces), np.asarray(uv_faces), 2, mult)
    # count edge usage: every edge used by exactly 1 (boundary) or 2 faces
    q = topo.dense_quad_faces
    edges = np.concatenate(
        [q[:, [0, 1]], q[:, [1, 2]], q[:, [2, 3]], q[:, [3, 0]]], axis=0
    )
    edges = np.sort(edges, axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert counts.max() == 2
    assert counts.min() >= 1


def test_densify_seam_edges_duplicate_points():
    # make the shared edge a seam: both endpoints multi-UV
    verts, uvs, faces, uv_faces = make_quad_grid(2, 3)  # two quads sharing edge (1, 4)
    mult = [1] * verts.shape[0]
    mult[1] = 2
    mult[4] = 2
    topo = densify_quads(verts, uvs, np.asarray(faces), np.asarray(uv_faces), 2, mult)
    assert topo.num_seam_edge_instances == 2  # the shared edge, once per face
    # coincident duplicated points exist along the seam
    pts = np.round(topo.dense_vertices, 5)
    uniq = np.unique(pts, axis=0)
    assert uniq.shape[0] == pts.shape[0] - 2  # 2 duplicated seam points


def test_build_dense_topology_composition():
    verts, uvs, faces, uv_faces = make_quad_grid(3, 3)
    faces = [list(f) for f in faces]
    # add one triangle face off the grid
    verts2 = np.concatenate([verts, [[9.0, 9.0, 0.0]]], axis=0).astype(np.float32)
    uvs2 = np.concatenate([uvs, [[0.5, 0.5]]], axis=0).astype(np.float32)
    faces.append([6, 7, 9])
    uv_faces = [list(f) for f in uv_faces] + [[6, 7, 9]]
    mult = [1] * verts2.shape[0]
    # frontal mask covers only the first column of quads
    mesh = build_dense_topology(verts2, uvs2, faces, uv_faces, [0, 1, 3, 4], 2, mult)
    # final faces: 1 tri + densified frontal (touching mask) + rest quads as 2 tris
    assert mesh.tri_faces.shape[1] == 3
    assert mesh.tri_faces.shape[0] == mesh.tri_uv_faces.shape[0]


def test_interpolate_dense_attribute_matches_reference_semantics():
    verts, uvs, faces, uv_faces = make_quad_grid(3, 3)
    mult = [1] * verts.shape[0]
    topo = densify_quads(verts, uvs, np.asarray(faces), np.asarray(uv_faces), 2, mult)
    attr = np.random.default_rng(1).normal(size=(verts.shape[0], 3)).astype(np.float32)
    out = np.asarray(
        interpolate_dense_attribute(
            jnp.asarray(attr),
            jnp.asarray(topo.quad_faces),
            jnp.asarray(topo.father_face),
            jnp.asarray(topo.weights),
        )
    )
    # reference semantics (helpers.py:237-253): base attrs pass through,
    # new attrs are the weighted sum over the father quad's corners
    np.testing.assert_allclose(out[: verts.shape[0]], attr, atol=1e-6)
    expected = np.einsum(
        "pk,pkc->pc", topo.weights, attr[topo.quad_faces[topo.father_face]]
    )
    np.testing.assert_allclose(out[verts.shape[0]:], expected, atol=1e-5)
    # interpolating positions reproduces the dense vertices themselves
    out_pos = np.asarray(
        interpolate_dense_attribute(
            jnp.asarray(verts),
            jnp.asarray(topo.quad_faces),
            jnp.asarray(topo.father_face),
            jnp.asarray(topo.weights),
        )
    )
    np.testing.assert_allclose(out_pos, topo.dense_vertices, atol=1e-5)


def test_write_obj_del_vertex(tmp_path):
    from topo4d_tpu.topology.obj_io import load_obj, write_obj_del_vertex

    verts, uvs, faces, uv_faces = make_quad_grid(3, 3)
    path = os.path.join(tmp_path, "del.obj")
    # delete the corner vertex 0 (its ring must also be listed to qualify)
    write_obj_del_vertex(path, verts, faces, uvs, uv_faces, [0, 1, 3, 4])
    # without neighbors given, all four vanish; faces touching them dropped
    mesh = load_obj(path)
    assert mesh.vertices.shape[0] == 5
    assert all(max(f) < 5 for f in mesh.faces)


def test_scale_image_and_rotate_cam():
    from topo4d_tpu.core.agisoft import rotate_image_cam, scale_image

    img = np.arange(8 * 8 * 3, dtype=np.float64).reshape(8, 8, 3)
    cam = {
        "intrinsics": np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]]),
        "image_size": np.array([8, 8]),
    }
    small, cam2 = scale_image(img, 0.5, cam)
    assert small.shape[:2] == (4, 4)
    assert cam2["intrinsics"][0, 0] == 50.0
    rot, cam3 = rotate_image_cam(img, dict(cam), angle=90)
    assert rot.shape[:2] == (8, 8)
    assert cam3["intrinsics"][0, 0] == 100.0  # fy moved into fx slot
    assert tuple(cam3["image_size"]) == (8, 8)


def test_scale_image_non_integer_factor():
    """Non-integer rescale (reference camera.py:246-254, skimage path).

    Bilinear resampling preserves linear ramps, so a gradient image must
    survive a 0.4x rescale to close tolerance; intrinsics scale by the
    factor exactly.
    """
    from topo4d_tpu.core.agisoft import scale_image

    h, w = 40, 50
    ys, xs = np.meshgrid(
        np.linspace(0, 1, h), np.linspace(0, 1, w), indexing="ij"
    )
    img = np.stack([xs, ys, xs + ys], axis=-1)
    cam = {
        "intrinsics": np.array(
            [[100.0, 0, 25], [0, 100.0, 20], [0, 0, 1]]
        ),
        "image_size": np.array([w, h]),
    }
    small, cam2 = scale_image(img, 0.4, cam)
    assert small.shape[:2] == (16, 20)
    assert cam2["intrinsics"][0, 0] == 40.0
    ys2, xs2 = np.meshgrid(
        np.linspace(0, 1, 16), np.linspace(0, 1, 20), indexing="ij"
    )
    # interior pixels of a linear ramp reproduce the ramp (edges feel
    # the filter's boundary handling)
    np.testing.assert_allclose(
        small[2:-2, 2:-2, 0], xs2[2:-2, 2:-2], atol=0.03
    )
    np.testing.assert_allclose(
        small[2:-2, 2:-2, 1], ys2[2:-2, 2:-2], atol=0.03
    )


def test_quaternion_similarity():
    from topo4d_tpu.core.quaternion import quaternion_similarity

    q = jnp.asarray([1.0, 0, 0, 0])
    assert float(quaternion_similarity(q, q)) < 1e-3
    q90 = jnp.asarray([np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)])
    np.testing.assert_allclose(float(quaternion_similarity(q, q90)), 90.0, atol=1e-3)


def test_to_bool_mask_ids_beyond_face_subset():
    """Region masks can reference vertices absent from the face subset."""
    from topo4d_tpu.topology.adjacency import faces_fully_inside

    tris = np.array([[0, 1, 2], [1, 2, 3]])
    # mask includes vertex 10, which no face in this subset touches
    inside = faces_fully_inside(tris, [0, 1, 2, 10])
    np.testing.assert_array_equal(inside, [[0, 1, 2]])
    # empty face array: no crash, empty result
    empty = faces_fully_inside(np.zeros((0, 3), np.int64), [5])
    assert empty.shape[0] == 0


def test_load_obj_normals_only_faces(tmp_path):
    """'f v//vn' records keep uv_faces corner-aligned with faces."""
    from topo4d_tpu.topology.obj_io import load_obj

    p = tmp_path / "m.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\n"
        "vn 0 0 1\n"
        "f 1//1 2//1 3//1\n"
    )
    mesh = load_obj(str(p))
    assert mesh.faces == [[0, 1, 2]]
    assert mesh.uv_faces == [[0, 1, 2]]  # vertex-index fallback


def test_knn_self_exclusion_by_index():
    """Near-coincident clusters: the true neighbor survives even when
    f32 cancellation inflates the computed self-distance."""
    from topo4d_tpu.topology.knn import knn_sq_dists

    rng = np.random.default_rng(0)
    base = rng.uniform(-1, 1, (64, 3)).astype(np.float32)
    pts = base + 100.0  # large offset maximizes cancellation error
    d = knn_sq_dists(pts, k=1)
    # reported distances belong to OTHER points: finite (never the inf
    # self slot) and non-negative
    assert np.isfinite(d).all() and (d >= 0).all()
    # values agree with float64 truth up to the f32 cancellation noise of
    # the expanded form itself (~|p|^2 * eps ~ 1e-2 at this offset); the
    # old sorted-column-0 heuristic returned the INFLATED SELF distance
    # on the rows it broke, an error unbounded by this tolerance
    diff = pts[:, None].astype(np.float64) - pts[None, :].astype(np.float64)
    dd = (diff**2).sum(-1)
    np.fill_diagonal(dd, np.inf)
    want = dd.min(axis=1)
    np.testing.assert_allclose(d[:, 0], want, atol=2e-2)
