"""Mesh visualization (the face3d vendored surface's last module).

Covers reference face3d/mesh/vis.py:1-24 (``plot_mesh``: a trisurf
render of a head mesh onto a matplotlib 3-D axis, top-down default
view) — the one face3d module previously left as a documented cut.
Matplotlib import is deferred so headless pipelines never pay for it;
callers save or show the returned figure themselves.
"""

from __future__ import annotations

import numpy as np


def plot_mesh(
    vertices: np.ndarray,  # (V, 3)
    triangles: np.ndarray,  # (F, 3) int
    subplot=(1, 1, 1),
    title: str = "mesh",
    el: float = 90.0,
    az: float = -90.0,
    lwdt: float = 0.1,
    color: str = "grey",
    ax=None,
):
    """Trisurf plot of a triangle mesh; returns the 3-D axis.

    Same surface as the reference (frontal elev=90/azim=-90 view, axes
    off, configurable line width/color); accepts an existing 3-D ``ax``
    instead of the reference's implicit pyplot state, and drops the
    deprecated ``ax.dist`` mutation (removed in matplotlib >= 3.7 — use
    ``ax.set_box_aspect``/figure size instead).
    """
    import matplotlib.pyplot as plt

    v = np.asarray(vertices, np.float64)
    tris = np.asarray(triangles, np.int64)
    if ax is None:
        ax = plt.subplot(*subplot, projection="3d")
    ax.plot_trisurf(
        v[:, 0], v[:, 1], v[:, 2],
        triangles=tris, lw=lwdt, color=color, alpha=1,
    )
    ax.axis("off")
    ax.view_init(elev=el, azim=az)
    ax.set_title(title)
    return ax
