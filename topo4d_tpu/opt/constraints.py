"""Post-step region constraint scatters.

The reference hard-writes region attributes after every optimizer step
under no_grad (train.py:619-700): pin static vertices, force eye/mouth
opacities, scales and colors, restore frame-0 colors. On TPU these become
static-index ``.at[idx].set()`` scatters fused into the jitted train step
(SURVEY §7 hard part 4) instead of Python-side tensor surgery.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ScatterConstraint:
    """param[idx] = value, applied after the optimizer step.

    ``param`` is static pytree metadata; ``idx``/``value`` are traced.
    """

    idx: np.ndarray  # (M,) int32
    value: jnp.ndarray  # (M, C) or broadcastable
    param: str = dataclasses.field(metadata=dict(static=True))


def apply_constraints(
    params: Dict[str, jnp.ndarray], constraints: Sequence[ScatterConstraint]
) -> Dict[str, jnp.ndarray]:
    out = dict(params)
    for c in constraints:
        out[c.param] = out[c.param].at[jnp.asarray(c.idx)].set(c.value)
    return out


def constant_constraint(
    param: str, idx: np.ndarray, value, shape_like: jnp.ndarray
) -> ScatterConstraint:
    """Constraint writing a constant scalar to params[param][idx]."""
    idx = np.asarray(idx, np.int32)
    val = jnp.full((idx.shape[0],) + shape_like.shape[1:], value, shape_like.dtype)
    return ScatterConstraint(param=param, idx=idx, value=val)


def inverse_sigmoid(x: float) -> float:
    return float(np.log(x / (1.0 - x)))
