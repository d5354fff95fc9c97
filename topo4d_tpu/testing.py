"""Synthetic fixtures and independent NumPy oracles for tests and benches.

The reference repo ships no test data (SURVEY §4); everything here builds
synthetic scenes with the same shapes/statistics as the real pipeline
(8,280-vertex head mesh, 24 calibrated views, reference train.py:131-146)
plus a *sequential* NumPy re-implementation of the CUDA blending loop that
independently validates the parallel cumprod formulation used on TPU.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from topo4d_tpu.core.camera import Camera, make_camera
from topo4d_tpu.core.gaussian import (
    ALPHA_MAX,
    ALPHA_MIN,
    TRANSMITTANCE_MIN,
)


def make_synthetic_scene(
    n: int = 256,
    seed: int = 0,
    spread: float = 0.5,
    scale: float = 0.03,
) -> Dict[str, np.ndarray]:
    """Random raw (pre-activation) Gaussian params centered at the origin."""
    rng = np.random.default_rng(seed)
    means = rng.normal(0.0, spread, (n, 3)).astype(np.float32)
    return {
        "means3D": means,
        "rgb_colors": rng.uniform(0.0, 1.0, (n, 3)).astype(np.float32),
        "unnorm_rotations": rng.normal(0.0, 1.0, (n, 4)).astype(np.float32),
        "logit_opacities": rng.normal(2.0, 1.0, (n, 1)).astype(np.float32),
        "log_scales": np.log(
            rng.uniform(0.5 * scale, 2.0 * scale, (n, 3))
        ).astype(np.float32),
    }


def make_synthetic_camera(
    width: int = 64,
    height: int = 48,
    distance: float = 2.0,
    angle: float = 0.0,
) -> Camera:
    """A camera on a circle around the origin, looking at it (COLMAP axes)."""
    f = 0.9 * max(width, height)
    k = np.array(
        [[f, 0, width / 2.0], [0, f, height / 2.0], [0, 0, 1.0]], np.float32
    )
    # Camera position on xz circle, looking at origin: build c2w then invert.
    pos = np.array(
        [distance * np.sin(angle), 0.0, -distance * np.cos(angle)], np.float32
    )
    forward = -pos / np.linalg.norm(pos)  # +z of camera looks at origin
    up = np.array([0.0, -1.0, 0.0], np.float32)  # COLMAP y points down
    right = np.cross(up, forward)
    right /= np.linalg.norm(right)
    up2 = np.cross(forward, right)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up2, forward, pos
    w2c = np.linalg.inv(c2w)
    return make_camera(k, w2c, width, height)


def make_camera_ring(
    num_views: int,
    width: int = 64,
    height: int = 48,
    distance: float = 2.0,
) -> Camera:
    """A batched Camera of ``num_views`` poses on a ring (the 24-view rig)."""
    cams = [
        make_synthetic_camera(
            width, height, distance, angle=2 * np.pi * i / max(num_views, 1) * 0.45
        )
        for i in range(num_views)
    ]
    return Camera(
        w2c=np.stack([np.asarray(c.w2c) for c in cams]),
        fx=np.stack([np.asarray(c.fx) for c in cams]),
        fy=np.stack([np.asarray(c.fy) for c in cams]),
        cx=np.stack([np.asarray(c.cx) for c in cams]),
        cy=np.stack([np.asarray(c.cy) for c in cams]),
        width=width,
        height=height,
    )


def make_grid_mesh(
    rows: int = 8, cols: int = 8, extent: float = 1.0, seed: int = 0
) -> Tuple[np.ndarray, list]:
    """A quad-grid 'head patch': (V, 3) vertices + mixed quad faces list."""
    rng = np.random.default_rng(seed)
    ys, xs = np.meshgrid(
        np.linspace(-extent, extent, rows), np.linspace(-extent, extent, cols),
        indexing="ij",
    )
    zs = 0.3 * np.exp(-(xs**2 + ys**2)) + 0.02 * rng.normal(size=xs.shape)
    verts = np.stack([xs, ys, zs], axis=-1).reshape(-1, 3).astype(np.float32)
    faces = []
    for i in range(rows - 1):
        for j in range(cols - 1):
            v0 = i * cols + j
            faces.append([v0, v0 + 1, v0 + cols + 1, v0 + cols])
    return verts, faces


def make_synthetic_regions(num_vertices: int, faces, seed: int = 0):
    """A plausible FacialRegions for a synthetic mesh.

    Partitions vertices into the 26 named regions plus the derived masks
    and flat-face subsets of the reference's facial_regions.pkl schema
    (SURVEY §2), sized so every pipeline constraint path is exercised.
    """
    from topo4d_tpu.topology.adjacency import triangulate_faces
    from topo4d_tpu.topology.regions import FACE_REGION_NAMES, FacialRegions

    rng = np.random.default_rng(seed)
    perm = rng.permutation(num_vertices)
    chunks = np.array_split(perm, len(FACE_REGION_NAMES))
    region_masks = {
        name: np.sort(chunk).astype(np.int32)
        for name, chunk in zip(FACE_REGION_NAMES, chunks)
    }

    def pick(frac, s):
        k = max(1, int(num_vertices * frac))
        r = np.random.default_rng(s)
        return np.sort(r.choice(num_vertices, k, replace=False)).astype(np.int32)

    tris = np.asarray(triangulate_faces(faces), np.int32)

    def tri_subset(frac, s):
        r = np.random.default_rng(s)
        k = max(1, int(tris.shape[0] * frac))
        return tris[np.sort(r.choice(tris.shape[0], k, replace=False))]

    masks = {
        "face_flat_masks": pick(0.1, 1),
        "lip_socket_flat_masks": pick(0.05, 2),
        "eye_lid_up_masks": pick(0.04, 3),
        "lip_flat_edge_masks": pick(0.01, 4),
        "face_masks": pick(0.5, 5),
        "face_bottom_masks": pick(0.1, 6),
        "dynamic_masks": pick(0.15, 7),
        "dynamic_eye_masks": pick(0.05, 8),
        "dynamic_mouth_masks": pick(0.1, 9),
        "eye_around_masks": pick(0.1, 10),
        "eye_inner_masks": pick(0.03, 11),
        "eye_del_masks": pick(0.04, 12),
        "mouth_around_masks": pick(0.06, 13),
        "mouth_inner_masks": pick(0.03, 14),
        "static_masks": pick(0.25, 15),
    }
    flat_faces = {
        "flat_faces": tri_subset(0.8, 20),
        "lip_bottom_flat_faces": tri_subset(0.2, 21),
        "lip_flat_faces": tri_subset(0.25, 22),
        "mouth_flat_faces": tri_subset(0.1, 23),
        "lid_top_flat_faces": tri_subset(0.08, 24),
        "lid_bottom_flat_faces": tri_subset(0.1, 25),
    }
    return FacialRegions(
        region_masks=region_masks, masks=masks, flat_faces=flat_faces
    )


def make_head_fixture(
    rows: int = 92,
    cols: int = 90,
    num_views: int = 24,
    width: int = 375,
    height: int = 512,
    seed: int = 0,
):
    """Reference-scale synthetic fixture: 8,280 mesh-bound Gaussians, 24 views.

    Mirrors the operational scale of the reference pipeline (SURVEY §6:
    8,280-vertex startup mesh, 24 calibrated views, 512x375 geometry-phase
    images). Returns (params, cams, mesh) where params are raw
    (pre-activation) Gaussian attributes bound to the mesh vertices.
    """
    rng = np.random.default_rng(seed)
    verts, faces = make_grid_mesh(rows, cols, extent=0.5, seed=seed)
    n = verts.shape[0]
    # per-vertex scale from grid pitch (like the reference's knn init)
    pitch = 1.0 / max(rows, cols)
    params = {
        "means3D": verts.astype(np.float32),
        "rgb_colors": rng.uniform(0.1, 0.9, (n, 3)).astype(np.float32),
        "unnorm_rotations": np.tile(
            np.array([1.0, 0, 0, 0], np.float32), (n, 1)
        ),
        "logit_opacities": np.full((n, 1), 6.0, np.float32),
        "log_scales": np.full((n, 3), np.log(pitch / 2), np.float32),
        "cam_m": np.zeros((num_views, 3), np.float32),
        "cam_c": np.zeros((num_views, 3), np.float32),
    }
    cams = make_camera_ring(num_views, width=width, height=height, distance=2.0)
    return params, cams, (verts, faces)


def sequential_blend_numpy(
    pix: np.ndarray,  # (P, 2)
    means2d: np.ndarray,  # (M, 2) front-to-back order
    conics: np.ndarray,  # (M, 3)
    colors: np.ndarray,  # (M, 3)
    depths: np.ndarray,  # (M,)
    opacities: np.ndarray,  # (M,)
    valid: np.ndarray,  # (M,)
    bg: np.ndarray,  # (3,)
    rect=None,  # optional (x0, y0, x1, y1) tile rects, tile units
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Literal sequential port of the CUDA per-pixel blending loop.

    Independent of the cumprod formulation — used to prove equivalence.
    ``rect`` enables CUDA's tile-rect culling (a splat is only blended by
    pixels whose 16x16 tile lies in the splat's touched-tile rect).
    Returns (rgb (P,3), depth (P,), alpha (P,)).
    """
    p = pix.shape[0]
    rgb = np.zeros((p, 3))
    dep = np.zeros(p)
    out_a = np.zeros(p)
    for pi in range(p):
        t = 1.0
        c = np.zeros(3)
        d = 0.0
        ptx = int(np.floor(pix[pi, 0] / 16.0))
        pty = int(np.floor(pix[pi, 1] / 16.0))
        for gi in range(means2d.shape[0]):
            if not valid[gi]:
                continue
            if rect is not None:
                x0, y0, x1, y1 = rect
                if not (x0[gi] <= ptx < x1[gi] and y0[gi] <= pty < y1[gi]):
                    continue
            dx = means2d[gi, 0] - pix[pi, 0]
            dy = means2d[gi, 1] - pix[pi, 1]
            power = (
                -0.5 * (conics[gi, 0] * dx * dx + conics[gi, 2] * dy * dy)
                - conics[gi, 1] * dx * dy
            )
            if power > 0.0:
                continue
            alpha = min(ALPHA_MAX, opacities[gi] * np.exp(power))
            if alpha < ALPHA_MIN:
                continue
            test_t = t * (1.0 - alpha)
            if test_t < TRANSMITTANCE_MIN:
                break
            c = c + colors[gi] * alpha * t
            d = d + depths[gi] * alpha * t
            t = test_t
        rgb[pi] = c + t * bg
        dep[pi] = d
        out_a[pi] = 1.0 - t
    return rgb, dep, out_a
