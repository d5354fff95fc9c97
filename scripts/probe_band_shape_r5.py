"""Same-process A/B of the two line-equivalent banded oracle programs.

probe_oracle_grad_r5 (bench-r4-style band: gathers inlined in the tuple
argument) measures ~1.07 p99.9 divergence vs remat on TPU;
probe_band_bisect_r5 (identical math, gathered arrays passed through an
inner function) measures ~4e-7. This runs BOTH formulations plus remat
in one process to exclude any cross-process difference."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from topo4d_tpu.core.gaussian import activate_params, project_gaussians
    from topo4d_tpu.rasterizer import reference as ref
    from topo4d_tpu.rasterizer.pallas import render_gaussians_pallas
    from topo4d_tpu.rasterizer.reference import render_gaussians
    from topo4d_tpu.testing import make_head_fixture
    from topo4d_tpu.utils.profiling import sync_value

    backend = jax.devices()[0].platform
    params_np, cams, _ = make_head_fixture()
    cam0 = cams[0]
    h, w = cam0.height, cam0.width
    params = {k: jnp.asarray(v) for k, v in params_np.items()}
    interpret = backend == "cpu"
    rv0 = activate_params(params)
    gt = sync_value(render_gaussians_pallas(
        rv0, cam0, max_span=2, chunk=128, interpret=interpret).image)
    target = jnp.clip(0.8 * gt + 0.05, 0.0, 1.0)
    bg = jnp.zeros(3, jnp.float32)
    rb = 64

    def oracle_loss(params):
        rv = activate_params(params)
        out = render_gaussians(rv, cam0, remat=True)
        return jnp.sum(jnp.square(out.image - target))
    g_rm = jax.jit(jax.grad(oracle_loss))(params)
    g_rm = {k: np.asarray(v) for k, v in g_rm.items()}
    print(f"[{backend}] remat done", flush=True)

    @jax.jit
    def vg_bench(params, ys, target_rows):
        def loss(params):
            rv = activate_params(params)
            proj = project_gaussians(rv, cam0)
            order = ref.depth_sorted_order(proj)
            rx0, ry0, rx1, ry1, _, _ = ref.tile_rect(proj, w, h)
            rgb, _, _ = ref._render_rows(
                ys, w, proj.means2d[order], proj.conics[order],
                rv.colors[order], proj.depths[order],
                rv.opacities[order], proj.mask[order], bg,
                (rx0[order], ry0[order], rx1[order], ry1[order]),
            )
            return jnp.sum(jnp.square(rgb - target_rows))
        return jax.grad(loss)(params)

    @jax.jit
    def vg_wrap(params, ys, target_rows):
        def loss(params):
            rv = activate_params(params)
            proj = project_gaussians(rv, cam0)
            order = ref.depth_sorted_order(proj)
            rx0, ry0, rx1, ry1, _, _ = ref.tile_rect(proj, w, h)
            def rows(ms, cs, col, dp, op, va, r0, r1, r2, r3):
                return ref._render_rows(
                    ys, w, ms, cs, col, dp, op, va, bg, (r0, r1, r2, r3))[0]
            rgb = rows(
                proj.means2d[order], proj.conics[order], rv.colors[order],
                proj.depths[order], rv.opacities[order], proj.mask[order],
                rx0[order], ry0[order], rx1[order], ry1[order])
            return jnp.sum(jnp.square(rgb - target_rows))
        return jax.grad(loss)(params)

    def band_grads(vg):
        g = None
        for y0 in range(0, h, rb):
            ys = jnp.arange(y0, y0 + rb)
            tr = jnp.transpose(target[:, y0:y0 + rb, :], (1, 2, 0))
            gb = vg(params, ys, tr)
            g = gb if g is None else jax.tree_util.tree_map(jnp.add, g, gb)
        return {k: np.asarray(v) for k, v in g.items()}

    g_a = band_grads(vg_bench)
    print(f"[{backend}] bench-style done", flush=True)
    g_b = band_grads(vg_wrap)
    print(f"[{backend}] wrapped-style done", flush=True)
    for name, g in (("bench-style", g_a), ("wrapped", g_b)):
        worst = 0.0
        for k in ("means3D", "rgb_colors", "log_scales"):
            d = np.abs(g[k] - g_rm[k])
            worst = max(worst, float(np.percentile(d, 99.9)) /
                        max(float(np.abs(g_rm[k]).max()), 1e-12))
        print(f"{name} vs remat p99.9: {worst:.3e}", flush=True)

if __name__ == "__main__":
    main()
