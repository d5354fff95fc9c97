"""Orbax resume backend: typed roundtrip of the full trainer payload."""

import numpy as np
import jax.numpy as jnp
import pytest

from topo4d_tpu.losses.temporal import TemporalPriors
from topo4d_tpu.opt.adam import adam_init
from topo4d_tpu.opt.step import GeometryPriors, TrainState
from topo4d_tpu.pipeline.checkpoint import (
    load_resume_orbax,
    save_resume_orbax,
)
from topo4d_tpu.texture.dense import TextureState


def test_orbax_resume_roundtrip(tmp_path):
    n, k = 12, 4
    params = {"means3D": jnp.ones((n, 3)), "rgb_colors": jnp.zeros((n, 3))}
    state = TrainState(
        params=params, opt=adam_init(params), max_2d_radius=jnp.zeros(n)
    )
    priors = GeometryPriors(
        neighbor_indices=jnp.zeros((k, n), jnp.int32),
        neighbor_dist=jnp.ones((k, n)),
        iso_w=jnp.ones((k, n)),
        rig_w=jnp.ones((k, n)),
        rot_w=jnp.ones((k, n)),
        init_scale=jnp.ones(n),
        temporal=TemporalPriors(
            prev_inv_rot=jnp.ones((4, n)),
            prev_offset=jnp.ones((3, k, n)),
        ),
        cos_init=jnp.ones(7),
    )
    dense = {"dense_rgb_colors": jnp.full((5, 3), 0.5)}
    tex = TextureState(params=dense, opt=adam_init(dense))
    out = str(tmp_path / "out")
    assert load_resume_orbax(out) is None
    save_resume_orbax(
        out, 5, state, priors, {"a": np.ones(3)},
        [{"means3D": np.ones((n, 3))}], tex,
    )
    p = load_resume_orbax(out)
    assert p["frame"] == 5
    assert isinstance(p["state"], TrainState)
    assert isinstance(p["priors"], GeometryPriors)
    assert isinstance(p["texture_state"], TextureState)
    np.testing.assert_array_equal(
        p["state"].params["means3D"], np.ones((n, 3))
    )
    np.testing.assert_array_equal(
        p["priors"].temporal.prev_offset, np.ones((3, k, n))
    )
    np.testing.assert_array_equal(
        p["texture_state"].params["dense_rgb_colors"], 0.5 * np.ones((5, 3))
    )
    np.testing.assert_array_equal(p["first_frame_attrs"]["a"], np.ones(3))
    assert len(p["output_params"]) == 1
