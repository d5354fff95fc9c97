"""Per-frame dense attribute interpolation (jitted gather).

Replaces the reference's ``compute_vertex_attribute_by_weight_2``
(helpers.py:237-253), which roundtrips GPU->CPU->GPU every frame
(train.py:504-506). Here it is a fused device-side gather:
``dense_attr = concat(attr, sum_k w_k * attr[quad[father, k]])``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def interpolate_dense_attribute(
    attr: jnp.ndarray,  # (V, C) base-vertex attribute
    quad_faces: jnp.ndarray,  # (F, 4) frontal quads (vertex ids)
    father_face: jnp.ndarray,  # (P,) new-point -> frontal quad index
    weights: jnp.ndarray,  # (P, 4) bilinear weights
) -> jnp.ndarray:
    """-> (V + P, C): base attrs followed by bilinearly interpolated ones."""
    corners = attr[quad_faces[father_face]]  # (P, 4, C)
    new = jnp.einsum("pk,pkc->pc", weights, corners)
    return jnp.concatenate([attr, new], axis=0)
