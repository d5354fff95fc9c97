"""Native C++ scanline rasterizer (ctypes-bound, built on demand).

The TPU framework's native runtime component replacing the reference's
Cython mesh_core (SURVEY N2). g++ compiles ``scanline.cpp`` to a cached
shared object on first use; the JAX UV-bake (``texture.bake``) is the
production path, this is the bit-exact CPU oracle/fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None


def _build_lib() -> str:
    src = os.path.join(_HERE, "scanline.cpp")
    cache_dir = os.environ.get(
        "TOPO4D_NATIVE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "topo4d_tpu"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, "libscanline.so")
    if (
        not os.path.exists(so_path)
        or os.path.getmtime(so_path) < os.path.getmtime(src)
    ):
        # unique tmp per process: concurrent builders (parallel pytest,
        # two trainers on a fresh machine) must not interleave writes
        # before the atomic replace
        tmp = f"{so_path}.tmp.{os.getpid()}"
        try:
            proc = subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", tmp, src],
                capture_output=True,
            )
            if proc.returncode != 0:
                raise RuntimeError(
                    "g++ failed building the native scanline rasterizer:\n"
                    + proc.stderr.decode(errors="replace")
                )
            os.replace(tmp, so_path)
        finally:
            if os.path.exists(tmp):
                os.remove(tmp)
    return so_path


def _lib() -> ctypes.CDLL:
    global _LIB
    with _LOCK:
        if _LIB is None:
            lib = ctypes.CDLL(_build_lib())
            f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
            i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
            lib.render_colors.argtypes = [
                f32p, ctypes.c_int, i32p, ctypes.c_int, f32p,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, f32p,
            ]
            lib.rasterize_triangles.argtypes = [
                f32p, ctypes.c_int, i32p, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, f32p, i32p, f32p,
            ]
            lib.vertex_normals.argtypes = [
                f32p, ctypes.c_int, i32p, ctypes.c_int, f32p,
            ]
            lib.render_texture.argtypes = [
                f32p, ctypes.c_int, i32p, ctypes.c_int, f32p,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, f32p, i32p,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, f32p,
            ]
            _LIB = lib
        return _LIB


def render_colors(
    vertices: np.ndarray,  # (V, 3) pixel-space coords + z
    triangles: np.ndarray,  # (F, 3) int
    colors: np.ndarray,  # (V, C)
    h: int,
    w: int,
) -> np.ndarray:
    """Scanline z-buffer render -> (H, W, C) float32."""
    verts = np.ascontiguousarray(vertices, np.float32)
    tris = np.ascontiguousarray(triangles, np.int32)
    cols = np.ascontiguousarray(colors, np.float32)
    if tris.size and int(tris.max()) >= min(verts.shape[0], cols.shape[0]):
        raise ValueError("triangle index exceeds vertex/color rows")
    c = cols.shape[1]
    out = np.zeros((h, w, c), np.float32)
    _lib().render_colors(
        verts, verts.shape[0], tris, tris.shape[0], cols, c, h, w, out
    )
    return out


def rasterize_triangles(
    vertices: np.ndarray, triangles: np.ndarray, h: int, w: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """-> (depth (H, W), tri_id (H, W) int32 -1=none, bary (H, W, 3))."""
    verts = np.ascontiguousarray(vertices, np.float32)
    tris = np.ascontiguousarray(triangles, np.int32)
    depth = np.empty((h, w), np.float32)
    tri = np.empty((h, w), np.int32)
    bary = np.empty((h, w, 3), np.float32)
    _lib().rasterize_triangles(
        verts, verts.shape[0], tris, tris.shape[0], h, w, depth, tri, bary
    )
    return depth, tri, bary


def render_texture(
    vertices: np.ndarray,  # (V, 3) pixel-space coords + z
    triangles: np.ndarray,  # (F, 3) int
    texture: np.ndarray,  # (TH, TW, C)
    tex_coords: np.ndarray,  # (TV, 2) texture-PIXEL coords
    tex_triangles: np.ndarray,  # (F, 3) int into tex_coords
    h: int,
    w: int,
    bilinear: bool = True,
) -> np.ndarray:
    """Texture-mapped z-buffer render -> (H, W, C) float32.

    The reference's ``_render_texture_core`` capability
    (mesh_core.cpp:237-336) with consistent texture-triangle indexing
    (see scanline.cpp for the documented deviation).
    """
    verts = np.ascontiguousarray(vertices, np.float32)
    tris = np.ascontiguousarray(triangles, np.int32)
    tex = np.ascontiguousarray(texture, np.float32)
    tc = np.ascontiguousarray(tex_coords, np.float32)
    ttris = np.ascontiguousarray(tex_triangles, np.int32)
    if ttris.shape != tris.shape:
        raise ValueError(
            f"tex_triangles {ttris.shape} must match triangles {tris.shape}"
        )
    if ttris.size and int(ttris.max()) >= tc.shape[0]:
        raise ValueError("tex_triangles index exceeds tex_coords rows")
    th, tw, c = tex.shape
    out = np.zeros((h, w, c), np.float32)
    _lib().render_texture(
        verts, verts.shape[0], tris, tris.shape[0], tex, th, tw, c,
        tc, ttris, h, w, int(bilinear), out,
    )
    return out


def vertex_normals(vertices: np.ndarray, triangles: np.ndarray) -> np.ndarray:
    """Area-weighted one-ring vertex normals -> (V, 3)."""
    verts = np.ascontiguousarray(vertices, np.float32)
    tris = np.ascontiguousarray(triangles, np.int32)
    out = np.zeros((verts.shape[0], 3), np.float32)
    _lib().vertex_normals(verts, verts.shape[0], tris, tris.shape[0], out)
    return out
