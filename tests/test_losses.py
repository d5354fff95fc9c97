import jax
import jax.numpy as jnp
import numpy as np
import pytest

from topo4d_tpu.losses.flatten import (
    build_dihedral_quadruples,
    build_umbrella_flatten,
    dihedral_cos,
    flatten_loss,
    soft_flatten_loss,
    umbrella_flatten_loss,
)
from topo4d_tpu.losses.image import (
    l1_loss,
    l1_loss_sum_last,
    photometric_loss,
    psnr,
    ssim,
    weighted_l2_loss_v1,
    weighted_l2_loss_v2,
)
from topo4d_tpu.losses.temporal import make_temporal_priors, rigid_rot_iso_losses
from topo4d_tpu.core.quaternion import quat_normalize


def test_ssim_matches_torch_reference():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    from math import exp

    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, (3, 37, 41)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape).astype(np.float32), 0, 1)

    # independent torch transcription of reference external.py:73-116
    def gaussian(ws, sigma):
        g = torch.tensor([exp(-((x - ws // 2) ** 2) / (2 * sigma**2)) for x in range(ws)])
        return g / g.sum()

    w1d = gaussian(11, 1.5).unsqueeze(1)
    win = w1d.mm(w1d.t()).float().unsqueeze(0).unsqueeze(0).expand(3, 1, 11, 11).contiguous()
    t1, t2 = torch.tensor(a), torch.tensor(b)
    mu1 = F.conv2d(t1, win, padding=5, groups=3)
    mu2 = F.conv2d(t2, win, padding=5, groups=3)
    s11 = F.conv2d(t1 * t1, win, padding=5, groups=3) - mu1**2
    s22 = F.conv2d(t2 * t2, win, padding=5, groups=3) - mu2**2
    s12 = F.conv2d(t1 * t2, win, padding=5, groups=3) - mu1 * mu2
    c1, c2 = 0.01**2, 0.03**2
    smap = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / ((mu1**2 + mu2**2 + c1) * (s11 + s22 + c2))
    expected = float(smap.mean())

    got = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    assert abs(got - expected) < 1e-5


def test_pallas_blur_matches_shift_conv():
    """The production SSIM window conv (Pallas separable blur) == the
    shifted-slice oracle, values AND grads, aligned + ragged shapes.

    The kernel's VJP is itself (symmetric taps + zero 'same' padding:
    the conv is its own transpose) — checked against autodiff of the
    oracle.
    """
    import jax

    from topo4d_tpu.losses.blur_pallas import gauss_blur_pallas
    from topo4d_tpu.losses.image import _shift_pass

    def oracle(x):
        return _shift_pass(_shift_pass(x, 1, 11, 1.5), 2, 11, 1.5)

    rng = np.random.default_rng(0)
    for shape in [(3, 37, 51), (15, 200, 300), (2, 128, 128)]:
        x = jnp.asarray(rng.uniform(-1, 1, shape).astype(np.float32))
        np.testing.assert_allclose(
            gauss_blur_pallas(x, interpret=True), oracle(x),
            rtol=1e-5, atol=1e-6,
        )
    x = jnp.asarray(rng.uniform(-1, 1, (2, 40, 60)).astype(np.float32))
    w = jnp.asarray(rng.uniform(-1, 1, (2, 40, 60)).astype(np.float32))
    g1 = jax.grad(
        lambda a: jnp.sum(gauss_blur_pallas(a, interpret=True) * w)
    )(x)
    g2 = jax.grad(lambda a: jnp.sum(oracle(a) * w))(x)
    np.testing.assert_allclose(g1, g2, rtol=1e-5, atol=1e-6)


def test_ssim_identical_images():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.uniform(0, 1, (3, 32, 32)).astype(np.float32))
    assert float(ssim(a, a)) > 0.99


def test_psnr_known_value():
    a = jnp.zeros((3, 8, 8))
    b = jnp.full((3, 8, 8), 0.1)
    np.testing.assert_allclose(np.asarray(psnr(a, b)).ravel(), 20.0, rtol=1e-5)


def test_weighted_l2_losses_match_reference_formulas():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(10, 6, 3)).astype(np.float32)
    y = rng.normal(size=(10, 6, 3)).astype(np.float32)
    w = rng.uniform(0, 1, (10, 6)).astype(np.float32)
    v2 = float(weighted_l2_loss_v2(jnp.asarray(x), jnp.asarray(y), jnp.asarray(w)))
    expected = np.mean(np.sqrt(((x - y) ** 2).sum(-1) * w + 1e-20))
    assert abs(v2 - expected) < 1e-6
    xm = np.linalg.norm(x, axis=-1)
    ym = np.linalg.norm(y, axis=-1)
    v1 = float(weighted_l2_loss_v1(jnp.asarray(xm), jnp.asarray(ym), jnp.asarray(w)))
    expected1 = np.mean(np.sqrt((xm - ym) ** 2 * w + 1e-20))
    assert abs(v1 - expected1) < 1e-6


# ---------------------------------------------------------------- flatten


def quad_grid_tris(rows=4, cols=4):
    """Triangulated grid: vertices + tri faces."""
    verts = np.stack(
        np.meshgrid(np.arange(rows, dtype=np.float32),
                    np.arange(cols, dtype=np.float32), indexing="ij"),
        -1,
    ).reshape(-1, 2)
    verts = np.concatenate([verts, np.zeros((verts.shape[0], 1), np.float32)], 1)
    tris = []
    for i in range(rows - 1):
        for j in range(cols - 1):
            v0 = i * cols + j
            tris.append([v0, v0 + 1, v0 + cols + 1])
            tris.append([v0, v0 + cols + 1, v0 + cols])
    return verts, np.asarray(tris)


def reference_quadruples(faces):
    """Literal (slow) port of loss_util.py:121-169 as an oracle."""
    vertices = list(set(tuple(v) for v in np.sort(
        np.concatenate((faces[:, 0:2], faces[:, 1:3]), axis=0))))
    vert_face = {}
    for k, v in enumerate(faces):
        for vx in v:
            vert_face.setdefault(vx, []).append(k)
    v0s = np.array([v[0] for v in vertices], "int32")
    v1s = np.array([v[1] for v in vertices], "int32")
    v2s, v3s, nosin = [], [], []
    idx = 0
    for v0, v1 in zip(v0s, v1s):
        shared = sorted(set(vert_face[v0]) & set(vert_face[v1]))
        if len(shared) > 2:
            continue
        if len(shared) == 2:
            nosin.append(idx)
        count = 0
        for fid in shared:
            f = faces[fid]
            if v0 in f and v1 in f:
                v = np.copy(f)
                v = v[v != v0]
                v = v[v != v1]
                if count == 0:
                    v2s.append(int(v[0]))
                    count += 1
                else:
                    v3s.append(int(v[0]))
        idx += 1
    v2s = np.array(v2s, "int32")[nosin]
    v3s = np.array(v3s, "int32")
    return v0s[nosin], v1s[nosin], v2s, v3s


def test_quadruples_match_reference_constructor():
    _, tris = quad_grid_tris(5, 5)
    got = build_dihedral_quadruples(tris)
    e0, e1, e2, e3 = reference_quadruples(tris)
    got_set = set(zip(got.v0.tolist(), got.v1.tolist(), got.v2.tolist(), got.v3.tolist()))
    exp_set = set(zip(e0.tolist(), e1.tolist(), e2.tolist(), e3.tolist()))
    assert got_set == exp_set


def test_flat_mesh_has_pi_dihedrals_and_zero_soft_loss():
    verts, tris = quad_grid_tris(4, 4)
    quads = build_dihedral_quadruples(tris)
    cos = np.asarray(dihedral_cos(jnp.asarray(verts), quads))
    # flat mesh: opposite vertices are across the edge -> cos ~ -1
    np.testing.assert_allclose(cos, -1.0, atol=1e-2)
    loss, cos_now = soft_flatten_loss(jnp.asarray(verts), quads, cos_init=jnp.asarray(cos))
    assert float(loss) < 1e-4


def test_flatten_loss_penalizes_folds():
    verts, tris = quad_grid_tris(4, 4)
    quads = build_dihedral_quadruples(tris)
    flat = float(flatten_loss(jnp.asarray(verts), quads))
    bent = verts.copy()
    bent[::2, 2] += 0.8  # crumple alternate vertices
    bent_val = float(flatten_loss(jnp.asarray(bent), quads))
    assert bent_val > flat


def test_umbrella_flatten_zero_for_linear_sheet():
    # a plane is the fixed point of the umbrella operator's interior
    verts, tris = quad_grid_tris(5, 5)
    nbrs = [[] for _ in range(verts.shape[0])]
    for t in tris:
        for a in t:
            for b in t:
                if a != b and b not in nbrs[a]:
                    nbrs[a].append(int(b))
    interior = [i * 5 + j for i in range(1, 4) for j in range(1, 4)]
    st = build_umbrella_flatten(nbrs, verts.shape[0], region=interior)
    # value should be small (uniform grid: one-ring mean == vertex in plane)
    val = float(umbrella_flatten_loss(jnp.asarray(verts), st))
    assert val < 1e-8
    crumpled = verts.copy()
    crumpled[12, 2] += 1.0
    assert float(umbrella_flatten_loss(jnp.asarray(crumpled), st)) > 1e-3


# ---------------------------------------------------------------- temporal


def test_temporal_losses_zero_for_rigid_motion():
    rng = np.random.default_rng(3)
    n, k = 50, 4
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    nbr = rng.integers(0, n, (n, k)).astype(np.int32)
    rot0 = quat_normalize(jnp.asarray(np.tile([1.0, 0, 0, 0], (n, 1)).astype(np.float32)))
    priors = make_temporal_priors(jnp.asarray(pts), rot0, jnp.asarray(nbr.T))

    # apply a global rigid motion: rotation R + translation
    angle = 0.3
    q = np.array([np.cos(angle / 2), 0, 0, np.sin(angle / 2)], np.float32)
    from topo4d_tpu.core.quaternion import quat_to_rotmat
    r = np.asarray(quat_to_rotmat(jnp.asarray(q[None])))[0]
    pts2 = pts @ r.T + np.array([0.1, -0.2, 0.3], np.float32)
    rot2 = quat_normalize(jnp.asarray(np.tile(q, (n, 1))))

    dist = np.linalg.norm(pts[nbr] - pts[:, None], axis=-1)
    w = jnp.ones((k, n))
    losses = rigid_rot_iso_losses(
        jnp.asarray(pts2), rot2, priors, jnp.asarray(nbr.T),
        jnp.asarray(dist.T), w, w, w,
    )
    # all three are sqrt(eps)-floored means: 1e-10 per element
    for name, val in losses.items():
        assert float(val) < 1e-4, (name, float(val))


def test_temporal_losses_detect_nonrigid_motion():
    rng = np.random.default_rng(4)
    n, k = 50, 4
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    nbr = rng.integers(0, n, (n, k)).astype(np.int32)
    rot0 = quat_normalize(jnp.asarray(np.tile([1.0, 0, 0, 0], (n, 1)).astype(np.float32)))
    priors = make_temporal_priors(jnp.asarray(pts), rot0, jnp.asarray(nbr.T))
    pts2 = pts * np.array([1.5, 1.0, 0.7], np.float32)  # non-rigid stretch
    dist = np.linalg.norm(pts[nbr] - pts[:, None], axis=-1)
    w = jnp.ones((k, n))
    losses = rigid_rot_iso_losses(
        jnp.asarray(pts2), rot0, priors, jnp.asarray(nbr.T),
        jnp.asarray(dist.T), w, w, w,
    )
    assert float(losses["rigid"]) > 1e-2
    assert float(losses["iso"]) > 1e-2


def test_photometric_loss_gradient_finite():
    rng = np.random.default_rng(5)
    a = jnp.asarray(rng.uniform(0, 1, (3, 24, 24)).astype(np.float32))
    b = jnp.asarray(rng.uniform(0, 1, (3, 24, 24)).astype(np.float32))
    g = jax.grad(lambda x: photometric_loss(x, b))(a)
    assert np.isfinite(np.asarray(g)).all()


def test_gather_neighbors_grads_match_plain_gather():
    from topo4d_tpu.losses.neighbors import gather_neighbors
    from topo4d_tpu.topology.adjacency import build_one_ring, inverse_slots
    from topo4d_tpu.testing import make_grid_mesh

    verts, faces = make_grid_mesh(5, 5)
    ring = build_one_ring(verts, faces)
    idx = jnp.asarray(ring.indices)
    inv = jnp.asarray(ring.inv)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(verts.shape[0], 3)).astype(np.float32))
    cot = jnp.asarray(
        rng.normal(size=(idx.shape[0], idx.shape[1], 3)).astype(np.float32)
    )

    def plain(x):
        return jnp.sum(x[idx] * cot)

    def custom(x):
        return jnp.sum(gather_neighbors(x, idx, inv) * cot)

    g_plain = np.asarray(jax.grad(plain)(x))
    g_custom = np.asarray(jax.grad(custom)(x))
    np.testing.assert_allclose(g_custom, g_plain, rtol=1e-5, atol=1e-6)


def test_fused_umbrella_from_nb_matches_standalone():
    """The gather-sharing umbrella path equals the standalone loss, incl grads."""
    from topo4d_tpu.losses.flatten import (
        FusedUmbrella,
        build_fused_umbrella,
        fused_umbrella_from_nb,
        fused_umbrella_loss,
    )
    from topo4d_tpu.losses.temporal import _gather_rows_t
    from topo4d_tpu.topology.adjacency import find_adjacent_vertices
    from topo4d_tpu.losses.flatten import build_umbrella_flatten

    rng = np.random.default_rng(3)
    n = 40
    faces = [[i, i + 1, i + 2] for i in range(0, n - 2, 1)]
    ragged = find_adjacent_vertices(n, faces)
    umbs = {
        "flat_eye": build_umbrella_flatten(ragged, n, region=np.arange(0, 20)),
        "flat_lip_socket": build_umbrella_flatten(ragged, n, region=np.arange(15, 35)),
    }
    fused = build_fused_umbrella(umbs, ("flat_eye", "flat_lip_socket"))
    weights = {"flat_eye": jnp.asarray(2.0), "flat_lip_socket": jnp.asarray(0.5)}
    x = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))

    def shared(v):
        idx = jnp.asarray(fused.neighbor_indices).T
        nb = _gather_rows_t(v, idx)
        return fused_umbrella_from_nb(nb, v.T, fused, weights)

    def standalone(v):
        return fused_umbrella_loss(v, fused, weights)

    va, ga = jax.value_and_grad(shared)(x)
    vb, gb = jax.value_and_grad(standalone)(x)
    np.testing.assert_allclose(np.asarray(va), np.asarray(vb), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), rtol=1e-5, atol=1e-7)


def test_rigid_rot_iso_extra_hook_returns_extra():
    rng = np.random.default_rng(0)
    n, k = 12, 4
    x = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    q = quat_normalize(jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32)))
    idx = jnp.asarray(rng.integers(0, n, size=(k, n)).astype(np.int32))
    pri = make_temporal_priors(x, q, idx)
    w = jnp.ones((k, n))
    d = jnp.ones((k, n))
    out = rigid_rot_iso_losses(
        x, q, pri, idx, d, w, w, w,
        extra=lambda nb, xt: jnp.sum(nb[0]) + jnp.sum(xt),
    )
    assert "extra" in out
    base = rigid_rot_iso_losses(x, q, pri, idx, d, w, w, w)
    for key in ("rigid", "rot", "iso"):
        np.testing.assert_allclose(np.asarray(out[key]), np.asarray(base[key]))


def test_gather_rows_inv_grads_match_plain_gather():
    """Inverse-incidence backward equals autodiff scatter-add, incl sentinels."""
    from topo4d_tpu.losses.neighbors import (
        build_inverse_incidence,
        gather_rows_inv,
    )

    rng = np.random.default_rng(5)
    n, l, c = 23, 200, 3
    idx = rng.integers(0, n, l).astype(np.int32)
    # sentinel entries (>= n) must be excluded from the inverse incidence
    idx[::17] = n
    inv = build_inverse_incidence(idx, n)
    idx_d = jnp.asarray(np.minimum(idx, n - 1))
    inv_d = jnp.asarray(inv)
    x = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(l, c)).astype(np.float32))
    # zero cotangent on sentinel positions (the flatten caller guarantees
    # this by slicing the output); both backwards then agree exactly
    cot = cot * jnp.asarray((idx < n)[:, None].astype(np.float32))

    def custom(x):
        return jnp.sum(gather_rows_inv(x, idx_d, inv_d) * cot)

    def plain(x):
        return jnp.sum(x[idx_d] * cot)

    np.testing.assert_allclose(
        np.asarray(jax.grad(custom)(x)), np.asarray(jax.grad(plain)(x)),
        rtol=1e-6, atol=1e-7,
    )


def test_rigid_rot_iso_ring_inv_matches_plain():
    """ring_inv path reproduces the plain-gather losses and grads."""
    from topo4d_tpu.losses.neighbors import build_inverse_incidence
    from topo4d_tpu.topology.adjacency import build_one_ring

    rng = np.random.default_rng(1)
    n = 30
    faces = [[i, i + 1, i + 2] for i in range(0, n - 2)]
    verts = rng.normal(size=(n, 3)).astype(np.float32)
    ring = build_one_ring(verts, faces)
    idx = jnp.asarray(ring.indices.T)  # (K, N)
    k = idx.shape[0]
    x = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    q = quat_normalize(jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32)))
    pri = make_temporal_priors(x, q, idx)
    w = jnp.asarray(rng.uniform(size=(k, n)).astype(np.float32))
    d = jnp.ones((k, n))
    inv = build_inverse_incidence(ring.indices.T.reshape(-1), n)

    def total(x, ring_inv):
        out = rigid_rot_iso_losses(
            x, q, pri, idx, d, w, w, w, ring_inv=ring_inv
        )
        return out["rigid"] + out["rot"] + out["iso"]

    va, ga = jax.value_and_grad(total)(x, None)
    vb, gb = jax.value_and_grad(total)(x, inv)
    np.testing.assert_allclose(np.asarray(va), np.asarray(vb), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ga), np.asarray(gb), rtol=1e-5, atol=1e-7
    )


def test_gather_rows_inv_split_matches_plain():
    """Split (dense + overflow scatter) backward equals autodiff."""
    from topo4d_tpu.losses.neighbors import (
        build_inverse_incidence_split,
        gather_rows_inv,
    )

    rng = np.random.default_rng(9)
    n, c = 17, 3
    # heavily skewed incidence so the split actually triggers
    idx = np.concatenate([
        rng.integers(0, n, 120),
        np.full(60, 3),  # one vertex referenced 60+ times
    ]).astype(np.int32)
    inv, epos, evert = build_inverse_incidence_split(idx, n)
    assert epos.size > 0, "expected overflow entries in this fixture"
    x = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(idx.size, c)).astype(np.float32))
    idx_d = jnp.asarray(idx)

    def custom(x):
        return jnp.sum(gather_rows_inv(
            x, idx_d, jnp.asarray(inv), jnp.asarray(epos),
            jnp.asarray(evert)) * cot)

    def plain(x):
        return jnp.sum(x[idx_d] * cot)

    np.testing.assert_allclose(
        np.asarray(jax.grad(custom)(x)), np.asarray(jax.grad(plain)(x)),
        rtol=1e-5, atol=1e-6,
    )


def test_banded_window_conv_matches_dense():
    """The 128-block banded conv equals the dense Toeplitz form exactly."""
    from topo4d_tpu.losses import image as im

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.uniform(0, 1, (3, 150, 530)).astype(np.float32))
    dense_max = im._DENSE_MAX
    try:
        im._DENSE_MAX = 4096
        a = np.asarray(im._window_conv(x))
        im._DENSE_MAX = 1  # force banded on both axes
        b = np.asarray(im._window_conv(x))
    finally:
        im._DENSE_MAX = dense_max
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_ssim_banded_gradient_matches_dense():
    from topo4d_tpu.losses import image as im

    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.uniform(0, 1, (3, 140, 260)).astype(np.float32))
    y = jnp.asarray(rng.uniform(0, 1, (3, 140, 260)).astype(np.float32))
    dense_max = im._DENSE_MAX
    try:
        im._DENSE_MAX = 4096
        ga = np.asarray(jax.grad(lambda a: im.ssim(a, y))(x))
        im._DENSE_MAX = 1
        gb = np.asarray(jax.grad(lambda a: im.ssim(a, y))(x))
    finally:
        im._DENSE_MAX = dense_max
    np.testing.assert_allclose(ga, gb, rtol=1e-4, atol=1e-7)


def test_umbrella_flatten_isolated_vertex_no_nan():
    """A zero-neighbor vertex must contribute 0, not 0/0 = NaN."""
    verts, tris = quad_grid_tris(4, 4)
    # append an isolated vertex referenced by no face
    verts = np.vstack([verts, [[9.0, 9.0, 9.0]]]).astype(np.float32)
    n = verts.shape[0]
    nbrs = [[] for _ in range(n)]
    for t in tris:
        for a in t:
            for b in t:
                if a != b and b not in nbrs[a]:
                    nbrs[a].append(int(b))
    assert len(nbrs[-1]) == 0
    st = build_umbrella_flatten(nbrs, n, region=list(range(n)))
    val = float(umbrella_flatten_loss(jnp.asarray(verts), st))
    assert np.isfinite(val)
    g = jax.grad(lambda v: umbrella_flatten_loss(v, st))(jnp.asarray(verts))
    assert np.isfinite(np.asarray(g)).all()
