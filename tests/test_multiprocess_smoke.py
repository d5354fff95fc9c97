"""Real 2-process jax.distributed smoke test (VERDICT r2 item 5).

Spawns two fresh interpreters that rendezvous at a localhost coordinator
through ``initialize_multihost``'s env-var path (the production path —
previously covered only by monkeypatched unit tests), share a 4-device
global CPU mesh, run one view-sharded batched step whose gradient psum
crosses the process boundary, and gate IO to host 0. The in-process
single-host step on the same fixture must produce the same loss.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "scripts", "smoke_multiprocess_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_step(tmp_path):
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            {
                "JAX_PLATFORMS": "cpu",
                "PYTHONPATH": REPO,  # drop the axon sitecustomize path
                "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
                "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
                "JAX_NUM_PROCESSES": "2",
                "JAX_PROCESS_ID": str(pid),
            }
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, WORKER, str(pid), str(tmp_path)],
                env=env,
                cwd=str(tmp_path),
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"

    # host-0-gated write: result.json from host 0 only
    result = json.load(open(tmp_path / "result.json"))
    assert result["process_count"] == 2
    assert result["max_dmeans"] > 0  # the step moved the params
    # both processes computed the same (psum-complete) loss
    loss1 = float(open(tmp_path / "proc1.loss").read())
    assert loss1 == pytest.approx(result["loss"], rel=1e-6)

    # cross-check against the same fixture in THIS process (8 virtual
    # devices, single process): same batched objective, same loss
    import jax.numpy as jnp
    import numpy as np
    from topo4d_tpu.losses.temporal import TemporalPriors
    from topo4d_tpu.opt.adam import adam_init
    from topo4d_tpu.opt.step import GeometryPriors, TrainState
    from topo4d_tpu.parallel.batched import make_batched_geometry_step
    from topo4d_tpu.rasterizer.tiled import render_gaussians_tiled
    from topo4d_tpu.testing import make_head_fixture

    v, w, h = 4, 48, 32
    params_np, cams, (verts, _) = make_head_fixture(
        rows=8, cols=8, num_views=v, width=w, height=h
    )
    n = verts.shape[0]
    params = {k: jnp.asarray(x) for k, x in params_np.items()}
    rng = np.random.default_rng(0)
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
    _, _, metrics = step(
        state, images, cams, priors, [], lr, weights, "init"
    )
    assert float(metrics["loss_total"]) == pytest.approx(
        result["loss"], rel=1e-5
    )
