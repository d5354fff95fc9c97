"""Worker for the real 2-process jax.distributed smoke test.

VERDICT r2 item 5: ``parallel.multihost.initialize_multihost`` had only
been exercised with monkeypatched no-ops. This worker runs it FOR REAL:
two of these processes (spawned by tests/test_multiprocess_smoke.py or
by hand, see below) rendezvous at a localhost coordinator, see the
4-device global CPU topology (2 virtual devices per process), run one
view-sharded batched geometry step over the shared mesh — the gradient
psum crosses the process boundary — and host 0 alone writes the result.

By hand:
  for i in 0 1; do
    JAX_PLATFORMS=cpu PYTHONPATH=<repo> \
    XLA_FLAGS=--xla_force_host_platform_device_count=2 \
    JAX_COORDINATOR_ADDRESS=127.0.0.1:12399 JAX_NUM_PROCESSES=2 \
    JAX_PROCESS_ID=$i python scripts/smoke_multiprocess_worker.py $i /tmp/out &
  done; wait
"""

import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> None:
    pid = int(sys.argv[1])
    out_dir = sys.argv[2]

    from topo4d_tpu.parallel.multihost import initialize_multihost, is_host0

    distributed = initialize_multihost()  # env-var mode (the real path)
    assert distributed, "initialize_multihost() did not go distributed"

    import jax
    import jax.numpy as jnp
    import numpy as np

    assert jax.process_count() == 2, jax.process_count()
    assert jax.process_index() == pid, (jax.process_index(), pid)
    devs = jax.devices()
    assert len(devs) == 4, devs  # 2 virtual CPU devices per process
    assert len(jax.local_devices()) == 2

    from topo4d_tpu.losses.temporal import TemporalPriors
    from topo4d_tpu.opt.adam import adam_init
    from topo4d_tpu.opt.step import GeometryPriors, TrainState
    from topo4d_tpu.parallel.batched import make_batched_geometry_step
    from topo4d_tpu.parallel.mesh import (
        make_view_mesh,
        replicated,
        shard_view_batch,
    )
    from topo4d_tpu.rasterizer.tiled import render_gaussians_tiled
    from topo4d_tpu.testing import make_head_fixture

    v, w, h = 4, 48, 32
    params_np, cams, (verts, _) = make_head_fixture(
        rows=8, cols=8, num_views=v, width=w, height=h
    )
    n = verts.shape[0]
    params = {k: jnp.asarray(x) for k, x in params_np.items()}
    rng = np.random.default_rng(0)  # same data on both processes
    images = jnp.asarray(
        rng.uniform(0, 1, (v, 3, h, w)).astype(np.float32)
    )
    priors = GeometryPriors(
        neighbor_indices=jnp.zeros((4, n), jnp.int32),
        neighbor_dist=jnp.zeros((4, n)),
        iso_w=jnp.zeros((4, n)),
        rig_w=jnp.zeros((4, n)),
        rot_w=jnp.zeros((4, n)),
        init_scale=jnp.full((n,), 0.05),
        temporal=TemporalPriors(
            prev_inv_rot=jnp.zeros((4, n)),
            prev_offset=jnp.zeros((3, 4, n)),
        ),
        cos_init=jnp.zeros(0),
    )
    state = TrainState(
        params=params, opt=adam_init(params), max_2d_radius=jnp.zeros(n)
    )
    lr = {k: jnp.asarray(1e-3, jnp.float32) for k in params}
    weights = {"im": 1.0, "scale": 0.0, "scale_max": 0.0}

    step = make_batched_geometry_step(
        {}, {},
        lambda rv, cam: render_gaussians_tiled(rv, cam, max_span=4,
                                               capacity=128),
    )
    mesh = make_view_mesh(4)
    with mesh:
        images_s = shard_view_batch(mesh, images)
        cams_s = shard_view_batch(mesh, cams)
        state_r = replicated(mesh, state)
        priors_r = replicated(mesh, priors)
        new_state, _, metrics = step(
            state_r, images_s, cams_s, priors_r, [], lr, weights, "init"
        )
    loss = float(metrics["loss_total"])
    delta = float(
        jnp.max(jnp.abs(new_state.params["means3D"] - params["means3D"]))
    )
    print(
        f"[smoke] process {pid}: loss {loss:.6f} max|dmeans| {delta:.2e} "
        f"global devices {len(devs)}",
        flush=True,
    )
    # host-0-gated IO: exactly one process writes
    if is_host0():
        with open(os.path.join(out_dir, "result.json"), "w") as fh:
            json.dump(
                {
                    "loss": loss,
                    "max_dmeans": delta,
                    "process_count": jax.process_count(),
                },
                fh,
            )
    else:
        with open(os.path.join(out_dir, f"proc{pid}.loss"), "w") as fh:
            fh.write(repr(loss))

    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
