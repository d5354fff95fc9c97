"""Finite-difference arbiter for the anisotropic-fixture gradient split.

On the r5 bench gate's anisotropic fixture, the remat oracle's
parameter gradients diverge from pallas+tiled (which agree to ~1.6e-4)
by 0.755 at p99.9 on TPU — deterministically, independent of process
context, with NO knife-edge pixels / alpha clamps / span crops on the
fixture (all measured). Forward pixels agree across all three to 6e-7,
so central finite differences of the forward loss are an
implementation-neutral arbiter of which backward is computing the true
gradient. This probe:

  1. builds the exact bench gate fixture (seed 7 recipe),
  2. computes remat-oracle and tiled gradients,
  3. picks the worst-disagreeing means3D components (+ agreeing
     controls),
  4. evaluates central differences of BOTH the oracle forward loss and
     the tiled forward loss at those components,
  5. prints FD vs oracle-grad vs tiled-grad per component.

Run on TPU (ambient) and optionally CPU (TOPO4D_PROBE_CPU=1).
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

T0 = time.perf_counter()


def note(m):
    print(f"[fd +{time.perf_counter() - T0:6.1f}s] {m}", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from topo4d_tpu.core.gaussian import activate_params
    from topo4d_tpu.rasterizer.pallas import render_gaussians_pallas
    from topo4d_tpu.rasterizer.reference import render_gaussians
    from topo4d_tpu.rasterizer.tiled import render_gaussians_tiled
    from topo4d_tpu.testing import make_head_fixture
    from topo4d_tpu.utils.profiling import sync_value

    backend = jax.devices()[0].platform
    note(f"backend {backend}")
    params_np, cams, _ = make_head_fixture()
    cam0 = cams[0]
    params = {k: jnp.asarray(v) for k, v in params_np.items()}
    interpret = backend == "cpu"

    rng = np.random.default_rng(7)
    n = int(params["means3D"].shape[0])
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    params = dict(params)
    params["unnorm_rotations"] = jnp.asarray(q)
    params["log_scales"] = params["log_scales"] + jnp.asarray(
        rng.uniform(np.log(0.5), np.log(2.0), (n, 3)).astype(np.float32))
    params["logit_opacities"] = jnp.asarray(
        rng.uniform(2.0, 6.0, (n, 1)).astype(np.float32))

    gt = sync_value(render_gaussians_pallas(
        activate_params(params), cam0, max_span=2, chunk=128,
        interpret=interpret).image)
    target = jnp.clip(0.8 * gt + 0.05, 0.0, 1.0)

    def loss_of(render):
        def loss(params):
            rv = activate_params(params)
            return jnp.sum(jnp.square(render(rv).image - target))

        return loss

    oracle_fwd = jax.jit(loss_of(lambda rv: render_gaussians(rv, cam0)))
    tiled_fwd = jax.jit(loss_of(lambda rv: render_gaussians_tiled(
        rv, cam0, max_span=2, capacity=1024)))

    def oracle_loss_remat(params):
        rv = activate_params(params)
        return jnp.sum(jnp.square(
            render_gaussians(rv, cam0, remat=True).image - target))

    g_rm = jax.jit(jax.grad(oracle_loss_remat))(params)
    note("remat grads done")
    g_t = jax.jit(jax.grad(loss_of(lambda rv: render_gaussians_tiled(
        rv, cam0, max_span=2, capacity=1024))))(params)
    note("tiled grads done")

    a = np.asarray(g_rm["means3D"])
    b = np.asarray(g_t["means3D"])
    err = np.abs(a - b).reshape(-1)
    order_bad = np.argsort(err)[::-1]
    idxs = list(order_bad[:8]) + list(order_bad[len(err) // 2:len(err) // 2 + 2])

    base = jnp.asarray(params["means3D"])
    print(f"{'flat_idx':>9} {'fd_oracle':>12} {'fd_tiled':>12} "
          f"{'g_remat':>12} {'g_tiled':>12}")
    for fi in idxs:
        vi, ci = divmod(int(fi), 3)
        eps = 1e-4
        pert = np.zeros((n, 3), np.float32)
        pert[vi, ci] = eps
        pp = dict(params); pp["means3D"] = base + jnp.asarray(pert)
        pm = dict(params); pm["means3D"] = base - jnp.asarray(pert)
        fo = (float(oracle_fwd(pp)) - float(oracle_fwd(pm))) / (2 * eps)
        ft = (float(tiled_fwd(pp)) - float(tiled_fwd(pm))) / (2 * eps)
        print(f"{fi:9d} {fo:12.5f} {ft:12.5f} "
              f"{a.reshape(-1)[fi]:12.5f} {b.reshape(-1)[fi]:12.5f}",
              flush=True)


if __name__ == "__main__":
    if os.environ.get("TOPO4D_PROBE_CPU"):
        import jax

        jax.config.update("jax_platforms", "cpu")
    main()
