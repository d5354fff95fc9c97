"""Colored / textured OBJ writers (face3d mesh/io.py parity).

Host-side, vectorized (one formatted block per section instead of the
reference's per-line Python loop, io.py:31-103). Face order follows the
reference: indices written REVERSED (2,1,0), 1-based; textured OBJs get
a companion .mtl + texture PNG. Reading lives in ``topology.obj_io``.
"""

from __future__ import annotations

import os

import numpy as np


def _fmt_rows(prefix: str, arr: np.ndarray) -> str:
    return "".join(
        prefix + " " + " ".join(repr(float(x)) for x in row) + "\n"
        for row in np.asarray(arr)
    )


def write_obj_with_colors(
    path: str, vertices: np.ndarray, triangles: np.ndarray, colors: np.ndarray
) -> None:
    """v-lines carry xyz + rgb; f-lines reversed 1-based (io.py:31-59)."""
    if not path.endswith(".obj"):
        path += ".obj"
    tri = np.asarray(triangles, np.int64) + 1
    with open(path, "w") as f:
        f.write(_fmt_rows("v", np.concatenate([vertices, colors], axis=1)))
        for a, b, c in tri:
            f.write(f"f {c} {b} {a}\n")


def write_obj_with_texture(
    path: str,
    vertices: np.ndarray,
    triangles: np.ndarray,
    texture: np.ndarray,
    uv_coords: np.ndarray,
) -> None:
    """OBJ + .mtl + texture PNG; vt v-flipped; f v/vt pairs share the
    same (reversed, 1-based) index (io.py:62-103)."""
    if not path.endswith(".obj"):
        path += ".obj"
    mtl_path = path[:-4] + ".mtl"
    tex_path = path[:-4] + "_texture.png"
    tri = np.asarray(triangles, np.int64) + 1
    uv = np.asarray(uv_coords, np.float64)
    with open(path, "w") as f:
        f.write(f"mtllib {os.path.abspath(mtl_path)}\n")
        f.write(_fmt_rows("v", vertices))
        f.write(_fmt_rows("vt", np.stack([uv[:, 0], 1.0 - uv[:, 1]], axis=1)))
        f.write("usemtl FaceTexture\n")
        for a, b, c in tri:
            f.write(f"f {c}/{c} {b}/{b} {a}/{a}\n")
    with open(mtl_path, "w") as f:
        f.write("newmtl FaceTexture\n")
        f.write(f"map_Kd {os.path.abspath(tex_path)}\n")
    _write_png(tex_path, texture)


def write_asc(path: str, vertices: np.ndarray) -> None:
    """Plain-text xyz dump (io.py:21-29)."""
    if not path.endswith(".asc"):
        path += ".asc"
    np.savetxt(path, np.asarray(vertices))


def _write_png(path: str, image: np.ndarray) -> None:
    from PIL import Image

    arr = np.asarray(image)
    if arr.dtype != np.uint8:
        arr = (np.clip(arr, 0.0, 1.0) * 255).astype(np.uint8)
    Image.fromarray(arr).save(path)
