"""mesh3d: the face3d vendored-library surface (transform/light/io/BFM).

Reference semantics contracts: face3d/mesh/transform.py,
face3d/mesh/light.py, face3d/mesh/io.py,
face3d/morphable_model/{fit,morphabel_model,load}.py.
"""

import numpy as np
import jax.numpy as jnp

from topo4d_tpu.mesh3d import bfm, io, light, transform


def test_angle2matrix_properties_and_roundtrip():
    angles = np.array([12.0, -25.0, 33.0])
    r = np.asarray(transform.angle2matrix(angles))
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)
    assert abs(np.linalg.det(r) - 1.0) < 1e-6
    rx, ry, rz = transform.matrix2angle(jnp.asarray(r))
    np.testing.assert_allclose(
        [float(rx), float(ry), float(rz)], angles, atol=1e-3
    )


def test_angle2matrix_composition_order():
    # Rz @ Ry @ Rx: a pure-z rotation of the x axis lands in the xy plane
    r = np.asarray(transform.angle2matrix([0.0, 0.0, 90.0]))
    np.testing.assert_allclose(r @ np.array([1.0, 0, 0]),
                               [0.0, 1.0, 0.0], atol=1e-6)
    # single-axis 3ddfa factors are the transposes of the standard ones
    x = 0.37
    ra = np.asarray(transform.angle2matrix_3ddfa([x, 0.0, 0.0]))
    rb = np.asarray(transform.angle2matrix([np.rad2deg(x), 0.0, 0.0]))
    np.testing.assert_allclose(ra, rb.T, atol=1e-6)


def test_rotate_and_similarity_transform():
    rng = np.random.default_rng(0)
    v = rng.normal(size=(17, 3)).astype(np.float32)
    r = transform.angle2matrix([5.0, -10.0, 20.0])
    out = transform.similarity_transform(
        jnp.asarray(v), 2.5, r, [0.1, -0.2, 0.3]
    )
    expect = 2.5 * v @ np.asarray(r).T + np.array([0.1, -0.2, 0.3])
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(transform.rotate(jnp.asarray(v), [5.0, -10.0, 20.0])),
        v @ np.asarray(r).T, rtol=1e-5, atol=1e-6,
    )


def test_lookat_camera_identity_pose():
    # camera on +z looking at the origin, y up: pure -z translation
    v = np.array([[0.3, 0.2, 0.0], [0.0, 0.0, 0.5]], np.float32)
    out = np.asarray(transform.lookat_camera(jnp.asarray(v), [0, 0, 2.0]))
    np.testing.assert_allclose(out, v - [0, 0, 2.0], atol=1e-6)


def test_perspective_and_to_image():
    v = jnp.asarray(np.array([[0.0, 0.0, -5.0]], np.float32))
    p = np.asarray(transform.perspective_project(v, 30.0))
    np.testing.assert_allclose(p[0, :2], [0.0, 0.0], atol=1e-6)
    # reference convention (transform.py:185-193): homogeneous divide by
    # w = -z, then the NDC z is negated
    near, far, z = 0.1, 1000.0, -5.0
    ndc_z = (-(far + near) / (far - near) * z
             - 2 * far * near / (far - near)) / (-z)
    np.testing.assert_allclose(p[0, 2], -ndc_z, rtol=1e-5)
    img = np.asarray(transform.to_image(jnp.zeros((1, 3)), 64, 128))
    np.testing.assert_allclose(img[0], [64.0, 64 - 32 - 1, 0.0], atol=1e-6)


def test_estimate_affine_and_p2srt_recover_pose():
    rng = np.random.default_rng(1)
    x3d = rng.normal(size=(50, 3)).astype(np.float32)
    s_true = 2.3
    r_true = np.asarray(transform.angle2matrix([10.0, 20.0, 5.0]))
    t_true = np.array([3.0, -2.0], np.float32)
    x2d = s_true * x3d @ r_true[:2].T + t_true
    p = transform.estimate_affine_matrix_3d22d(
        jnp.asarray(x3d), jnp.asarray(x2d)
    )
    s, r, t = transform.p2srt(p)
    assert abs(float(s) - s_true) < 1e-3
    np.testing.assert_allclose(np.asarray(r), r_true, atol=1e-3)
    np.testing.assert_allclose(np.asarray(t)[:2], t_true, atol=1e-3)


def _plane_mesh(k=4):
    xs, ys = np.meshgrid(np.linspace(0, 1, k), np.linspace(0, 1, k))
    verts = np.stack(
        [xs.reshape(-1), ys.reshape(-1), np.zeros(k * k)], 1
    ).astype(np.float32)
    idx = np.arange(k * k).reshape(k, k)
    a, b = idx[:-1, :-1].reshape(-1), idx[:-1, 1:].reshape(-1)
    c, d = idx[1:, 1:].reshape(-1), idx[1:, :-1].reshape(-1)
    tris = np.concatenate(
        [np.stack([a, b, c], 1), np.stack([a, c, d], 1)]
    ).astype(np.int32)
    return verts, tris


def test_get_normal_plane_and_degenerate():
    verts, tris = _plane_mesh()
    n = np.asarray(light.get_normal(jnp.asarray(verts), jnp.asarray(tris)))
    # cross(p0-p1, p0-p2) on this winding gives -z for the xy plane
    assert np.allclose(np.abs(n[:, 2]), 1.0, atol=1e-6)
    # an isolated vertex gets the +x convention (light.py:36-38)
    verts2 = np.vstack([verts, [[9.0, 9.0, 9.0]]]).astype(np.float32)
    n2 = np.asarray(light.get_normal(jnp.asarray(verts2), jnp.asarray(tris)))
    np.testing.assert_allclose(n2[-1], [1.0, 0.0, 0.0])


def test_add_light_cosine_falloff():
    verts, tris = _plane_mesh()
    colors = jnp.ones((verts.shape[0], 3)) * 0.8
    n = np.asarray(light.get_normal(jnp.asarray(verts), jnp.asarray(tris)))
    nz = n[0, 2]  # -1 or +1 plane normal
    # put the light on the side the reference's (vertex - light) sign
    # illuminates: n . (v - L) = +1 when L sits OPPOSITE the normal
    lp = jnp.asarray([[0.5, 0.5, -10.0 * nz]], jnp.float32)
    li = jnp.asarray([[1.0, 0.5, 0.25]], jnp.float32)
    lit = np.asarray(
        light.add_light(jnp.asarray(verts), jnp.asarray(tris), colors, lp, li)
    )
    center = verts[:, :2] - 0.5
    cos = 10.0 / np.sqrt(10.0**2 + (center**2).sum(1))
    np.testing.assert_allclose(lit, 0.8 * cos[:, None] * np.asarray(li),
                               rtol=1e-4, atol=1e-5)
    # flipping the light to the normal side must clip to black
    dark = np.asarray(
        light.add_light(
            jnp.asarray(verts), jnp.asarray(tris), colors, -lp, li
        )
    )
    assert dark.max() < 1e-6


def test_add_light_sh_dc_term_and_fit():
    verts, tris = _plane_mesh()
    colors = jnp.full((verts.shape[0], 3), 0.6)
    coeff = jnp.zeros((9,)).at[0].set(1.0)
    lit = np.asarray(light.add_light_sh(
        jnp.asarray(verts), jnp.asarray(tris), colors, coeff
    ))
    np.testing.assert_allclose(lit, 0.6, atol=1e-6)

    rng = np.random.default_rng(2)
    normals = rng.normal(size=(400, 3))
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    albedo = rng.uniform(0.2, 0.9, size=(400, 3)).astype(np.float32)
    c_true = rng.normal(size=(9,)).astype(np.float32)
    observed = albedo * np.asarray(
        light.sh_basis(jnp.asarray(normals, jnp.float32)) @ c_true
    )[:, None]
    c_fit = np.asarray(light.fit_light_sh(
        jnp.asarray(observed), jnp.asarray(albedo),
        jnp.asarray(normals, jnp.float32), lamb=1e-4,
    ))
    np.testing.assert_allclose(c_fit, c_true, atol=1e-3)


def test_write_obj_with_colors_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    verts = rng.normal(size=(5, 3))
    tris = np.array([[0, 1, 2], [2, 3, 4]], np.int32)
    colors = rng.uniform(size=(5, 3))
    path = str(tmp_path / "face.obj")
    io.write_obj_with_colors(path, verts, tris, colors)
    vrows, frows = [], []
    for line in open(path):
        tok = line.split()
        if tok[0] == "v":
            vrows.append([float(t) for t in tok[1:]])
        elif tok[0] == "f":
            frows.append([int(t) for t in tok[1:]])
    np.testing.assert_allclose(
        np.asarray(vrows), np.concatenate([verts, colors], 1), rtol=1e-7
    )
    # reversed, 1-based (io.py:55-57)
    assert frows == [[3, 2, 1], [5, 4, 3]]


def test_write_obj_with_texture(tmp_path):
    verts, tris = _plane_mesh(3)
    uv = verts[:, :2]
    tex = np.zeros((8, 8, 3), np.uint8)
    path = str(tmp_path / "face.obj")
    io.write_obj_with_texture(path, verts, tris, tex, uv)
    text = open(path).read()
    assert text.startswith("mtllib ")
    assert "usemtl FaceTexture" in text
    assert (tmp_path / "face.mtl").exists()
    assert (tmp_path / "face_texture.png").exists()
    # vt rows are v-flipped
    vt = [l.split()[1:] for l in text.splitlines() if l.startswith("vt ")]
    np.testing.assert_allclose(float(vt[0][1]), 1.0 - uv[0, 1], atol=1e-7)


def _synthetic_model(rng, nver=40, n_sp=5, n_ep=3):
    mu = rng.normal(0, 10.0, size=(3 * nver,)).astype(np.float32)
    spc = rng.normal(size=(3 * nver, n_sp)).astype(np.float32)
    epc = rng.normal(size=(3 * nver, n_ep)).astype(np.float32)
    return bfm.MorphableModel(
        shape_mu=jnp.asarray(mu),
        shape_pc=jnp.asarray(spc),
        shape_ev=jnp.asarray(np.full((n_sp,), 1e3, np.float32)),
        exp_pc=jnp.asarray(epc),
        exp_ev=jnp.asarray(np.full((n_ep,), 1e3, np.float32)),
        triangles=jnp.zeros((1, 3), jnp.int32),
    )


def test_generate_vertices_layout():
    rng = np.random.default_rng(4)
    model = _synthetic_model(rng)
    sp = rng.normal(size=(5,)).astype(np.float32)
    ep = rng.normal(size=(3,)).astype(np.float32)
    v = np.asarray(bfm.generate_vertices(model, jnp.asarray(sp), jnp.asarray(ep)))
    flat = (
        np.asarray(model.shape_mu)
        + np.asarray(model.shape_pc) @ sp
        + np.asarray(model.exp_pc) @ ep
    )
    np.testing.assert_allclose(v, flat.reshape(-1, 3), rtol=1e-5)


def test_fit_points_recovers_pose_and_coefficients():
    rng = np.random.default_rng(5)
    model = _synthetic_model(rng)
    sp_true = rng.normal(0, 1.0, size=(5,)).astype(np.float32)
    ep_true = rng.normal(0, 1.0, size=(3,)).astype(np.float32)
    v = np.asarray(
        bfm.generate_vertices(model, jnp.asarray(sp_true), jnp.asarray(ep_true))
    )
    s_true = 1.7
    r_true = np.asarray(transform.angle2matrix([8.0, -15.0, 25.0]))
    t_true = np.array([5.0, -3.0], np.float32)
    x = s_true * v @ r_true[:2].T + t_true  # scaled orthographic
    x_ind = np.arange(v.shape[0], dtype=np.int32)

    sp, ep, s, r, t = bfm.fit_points(
        jnp.asarray(x), jnp.asarray(x_ind), model, max_iter=6
    )
    assert abs(float(s) - s_true) < 1e-2 * s_true
    np.testing.assert_allclose(np.asarray(r), r_true, atol=2e-2)
    # reprojection of the fitted model must match the observations
    v_fit = np.asarray(bfm.generate_vertices(model, sp, ep))
    x_fit = float(s) * v_fit @ np.asarray(r)[:2].T + np.asarray(t)[:2]
    err = np.abs(x_fit - x).max() / (np.abs(x).max() + 1e-9)
    assert err < 2e-3, err


def test_fit_euler_wrapper():
    rng = np.random.default_rng(6)
    model = _synthetic_model(rng)
    v = np.asarray(bfm.generate_vertices(
        model, jnp.zeros((5,)), jnp.zeros((3,))
    ))
    x = 2.0 * v[:, :2] + np.array([1.0, 2.0], np.float32)
    sp, ep, s, angles, t = bfm.fit(
        model, jnp.asarray(x), jnp.arange(v.shape[0], dtype=np.int32)
    )
    assert abs(float(s) - 2.0) < 1e-2
    for a in angles:
        assert abs(float(a)) < 1.0


def test_plot_mesh_renders_offscreen(tmp_path):
    """vis.plot_mesh (reference face3d/mesh/vis.py): trisurf renders and
    saves headlessly; nontrivial pixel coverage on a toy mesh."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    from topo4d_tpu.mesh3d.vis import plot_mesh

    verts = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0.3]], np.float32
    )
    tris = np.array([[0, 1, 2], [1, 3, 2]], np.int32)
    fig = plt.figure(figsize=(2, 2))
    ax = plot_mesh(verts, tris, title="toy")
    out = tmp_path / "mesh.png"
    fig.savefig(out)
    plt.close(fig)
    from PIL import Image

    im = np.asarray(Image.open(out).convert("L"))
    assert im.shape[0] > 0 and (im < 250).mean() > 0.01  # drew something
