"""Generic mesh toolkit: the face3d vendored-library surface, TPU-native.

The reference vendors face3d with a `mesh` toolkit (transform/light/io,
`/root/reference/face3d/mesh/`) and a Basel-Face-Model morphable-model
layer (`/root/reference/face3d/morphable_model/`). Only
`mesh.render.render_colors` sits on the live training path (covered by
`topo4d_tpu.texture.bake` + `native/scanline.cpp`); the rest is the
library's public capability surface, reproduced here as jittable jnp
functions (transform/light/fit) and small host-side IO helpers.
"""

from topo4d_tpu.mesh3d import io, light, transform  # noqa: F401
from topo4d_tpu.mesh3d.bfm import MorphableModel, fit_points, load_bfm  # noqa: F401
