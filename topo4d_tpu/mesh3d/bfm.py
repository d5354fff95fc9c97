"""Morphable model (BFM) layer: load / generate / fit.

TPU-native equivalent of the reference's vendored
`face3d/morphable_model/` (morphabel_model.py, fit.py, load.py —
vendored-unused on the live path, reproduced as capability parity).
The model is a NamedTuple of arrays; generation is two matmuls; the
pose/shape/expression fit is the reference's alternation (affine-camera
Gold Standard pose + ridge-regularized linear solves, fit.py:162-211)
expressed as jnp least squares.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from topo4d_tpu.mesh3d.transform import (
    angle2matrix,
    estimate_affine_matrix_3d22d,
    matrix2angle,
    p2srt,
    similarity_transform,
)


class MorphableModel(NamedTuple):
    """3DMM arrays (BFM layout, morphabel_model.py:11-44).

    shape_mu: (3V,) mean shape (the BFM loader folds expMU in);
    shape_pc: (3V, n_sp); shape_ev: (n_sp,); exp_pc: (3V, n_ep);
    exp_ev: (n_ep,); tex_mu/tex_pc/tex_ev: texture PCA (optional);
    triangles: (F, 3) int32 0-based; kpt_ind: (68,) int32 0-based.
    Vertex coordinate layout is interleaved xyz per vertex (BFM's
    Fortran flattening).
    """

    shape_mu: jnp.ndarray
    shape_pc: jnp.ndarray
    shape_ev: jnp.ndarray
    exp_pc: jnp.ndarray
    exp_ev: jnp.ndarray
    triangles: jnp.ndarray
    kpt_ind: Optional[jnp.ndarray] = None
    tex_mu: Optional[jnp.ndarray] = None
    tex_pc: Optional[jnp.ndarray] = None
    tex_ev: Optional[jnp.ndarray] = None

    @property
    def nver(self) -> int:
        return self.shape_mu.shape[0] // 3

    @property
    def n_shape_para(self) -> int:
        return self.shape_pc.shape[1]

    @property
    def n_exp_para(self) -> int:
        return self.exp_pc.shape[1]


def load_bfm(model_path: str) -> MorphableModel:
    """Load a BFM .mat (load.py:9-50): fold expMU into the mean, cast to
    f32, transpose triangles to (F, 3) and shift 1-based indices to 0."""
    import scipy.io as sio

    c = sio.loadmat(model_path)["model"][0, 0]
    tri = np.vstack(
        [
            c["tri"].T.astype(np.int64),
            c["tri_mouth"].T.astype(np.int64) if "tri_mouth" in c.dtype.names
            else np.zeros((0, 3), np.int64),
        ][:1]
    )  # base triangles only; tri_mouth is a supplement (see full_triangles)
    model = MorphableModel(
        shape_mu=jnp.asarray(
            (c["shapeMU"] + c["expMU"]).astype(np.float32).reshape(-1)
        ),
        shape_pc=jnp.asarray(c["shapePC"].astype(np.float32)),
        shape_ev=jnp.asarray(c["shapeEV"].astype(np.float32).reshape(-1)),
        exp_pc=jnp.asarray(c["expPC"].astype(np.float32)),
        exp_ev=jnp.asarray(c["expEV"].astype(np.float32).reshape(-1)),
        triangles=jnp.asarray((tri - 1).astype(np.int32)),
        kpt_ind=jnp.asarray(
            (np.squeeze(c["kpt_ind"]) - 1).astype(np.int32)
        ),
        tex_mu=jnp.asarray(c["texMU"].astype(np.float32).reshape(-1)),
        tex_pc=jnp.asarray(c["texPC"].astype(np.float32)),
        tex_ev=jnp.asarray(c["texEV"].astype(np.float32).reshape(-1)),
    )
    return model


def generate_vertices(
    model: MorphableModel, shape_para: jnp.ndarray, exp_para: jnp.ndarray
) -> jnp.ndarray:
    """mu + shapePC @ sp + expPC @ ep -> (V, 3)
    (morphabel_model.py:63-74)."""
    flat = (
        model.shape_mu
        + model.shape_pc @ jnp.reshape(shape_para, (-1,))
        + model.exp_pc @ jnp.reshape(exp_para, (-1,))
    )
    return flat.reshape(-1, 3)


def generate_colors(model: MorphableModel, tex_para: jnp.ndarray) -> jnp.ndarray:
    """texMU + texPC @ (tp * texEV), /255 -> (V, 3)
    (morphabel_model.py:84-94)."""
    flat = model.tex_mu + model.tex_pc @ (
        jnp.reshape(tex_para, (-1,)) * model.tex_ev
    )
    return flat.reshape(-1, 3) / 255.0


def transform(model: MorphableModel, vertices, s, angles, t3d):
    """Similarity transform by degree Euler angles
    (morphabel_model.py:112-114)."""
    return similarity_transform(vertices, s, angle2matrix(angles), t3d)


def _ridge_coeff(pc_2d, sigma, x_flat, b_flat, lamb):
    """Solve (pc'pc + lamb diag(1/sigma^2)) c = pc'(x - b) (fit.py:99-106)."""
    lhs = pc_2d.T @ pc_2d + lamb * jnp.diag(1.0 / jnp.square(sigma))
    rhs = pc_2d.T @ (x_flat - b_flat)
    return jnp.linalg.solve(lhs, rhs)


def _project_pc(pc, a):
    """(3n, k) principal components -> (2n, k) image-plane components
    under the affine A (2, 3) (fit.py:83-88): per-vertex xyz rows hit A."""
    k = pc.shape[1]
    n = pc.shape[0] // 3
    pc3 = pc.reshape(n, 3, k)
    pc2 = jnp.einsum("ij,njk->nik", a, pc3)  # (n, 2, k)
    return pc2.reshape(2 * n, k)


def fit_points(
    x: jnp.ndarray,
    x_ind: jnp.ndarray,
    model: MorphableModel,
    n_sp: Optional[int] = None,
    n_ep: Optional[int] = None,
    max_iter: int = 4,
    lamb_exp: float = 20.0,
    lamb_shape: float = 40.0,
):
    """Alternating pose / expression / shape fit to 2D keypoints.

    x: (n, 2) image points; x_ind: (n,) model vertex indices. Each
    iteration estimates the affine camera from the current 3D shape
    (Gold Standard), decomposes it to s/R/t, then ridge-solves exp
    (lamb 20) and shape (lamb 40) with the other fixed — exactly the
    reference's schedule (fit.py:162-211). Returns (sp, ep, s, R, t).
    """
    n_sp = n_sp if n_sp is not None else model.n_shape_para
    n_ep = n_ep if n_ep is not None else model.n_exp_para
    idx = jnp.reshape(jnp.asarray(x_ind, jnp.int32), (-1,))
    rows = (3 * idx[:, None] + jnp.arange(3)[None, :]).reshape(-1)

    mu = model.shape_mu[rows]  # (3n,)
    spc = model.shape_pc[rows, :n_sp]  # (3n, n_sp)
    epc = model.exp_pc[rows, :n_ep]
    sev = model.shape_ev[:n_sp]
    eev = model.exp_ev[:n_ep]
    x = jnp.asarray(x, jnp.float32)
    x_flat = x.reshape(-1)  # (2n,) interleaved uv per point
    n = x.shape[0]

    sp = jnp.zeros((n_sp,), jnp.float32)
    ep = jnp.zeros((n_ep,), jnp.float32)
    s = jnp.asarray(1.0)
    r = jnp.eye(3)
    t = jnp.zeros((3,))
    for _ in range(max_iter):
        x3d = (mu + spc @ sp + epc @ ep).reshape(n, 3)
        p = estimate_affine_matrix_3d22d(x3d, x)
        s, r, t = p2srt(p)
        a = s * r[:2, :]  # (2, 3) scaled orthographic camera

        # expression with shape fixed
        base = (mu + spc @ sp).reshape(n, 3)
        b = (base @ a.T + t[None, :2]).reshape(-1)
        ep = _ridge_coeff(_project_pc(epc, a), eev, x_flat, b, lamb_exp)

        # shape with expression fixed
        base = (mu + epc @ ep).reshape(n, 3)
        b = (base @ a.T + t[None, :2]).reshape(-1)
        sp = _ridge_coeff(_project_pc(spc, a), sev, x_flat, b, lamb_shape)
    return sp, ep, s, r, t


def fit(model: MorphableModel, x, x_ind, max_iter: int = 4):
    """fit_points + Euler decomposition (morphabel_model.py:121-141)."""
    sp, ep, s, r, t = fit_points(x, x_ind, model, max_iter=max_iter)
    return sp, ep, s, matrix2angle(r), t
