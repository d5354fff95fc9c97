"""Device mesh construction and sharding helpers.

The problem's first-class parallel axis is the camera rig: the 24 views are
embarrassingly parallel given a summed-gradient update rule (SURVEY §2.3).
We shard the view batch across a 1-D ``view`` mesh axis; Gaussian params
stay replicated and their gradients all-reduce over ICI (XLA inserts the
psum from the sharding annotations). Multi-host extends the same mesh via
``jax.distributed.initialize`` — same code path.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_view_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """A 1-D mesh over the ``view`` axis."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), ("view",))


def shard_view_batch(mesh: Mesh, batch):
    """Place a [V, ...] pytree with the leading axis sharded over ``view``."""
    def put(x):
        spec = P("view", *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batch)


def replicated(mesh: Mesh, tree):
    """Fully replicate a pytree over the mesh."""
    def put(x):
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(put, tree)
