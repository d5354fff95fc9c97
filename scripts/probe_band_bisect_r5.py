"""Bisect the banded-oracle TPU gradient divergence (r5 follow-up).

probe_oracle_grad_r5 established: the banded oracle-gradient program
diverges from remat/tiled/pallas by ~1 at p99.9 ON TPU ONLY,
deterministically and band-size-invariantly — and (post-fix rerun) the
divergence SURVIVES the blend_weights custom VJP, falsifying the
cumprod-JVP hypothesis. The formulations compute identical math on CPU;
what differs on TPU is the compiled program. This probe bisects:

  A. banded FORWARD pixels vs the plain oracle forward (is the
     divergence already in the band program's forward?)
  B. banded grad with jax.checkpoint around the row render (remat's
     distinguishing structure, applied to the band program)
  C. banded grad with the projection/sort/gather precomputed OUTSIDE
     the grad (grad w.r.t. the gathered per-gaussian arrays only) —
     splits projection-chain backward from blend backward.

Prints per-leaf error tables against the remat-oracle reference.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

T0 = time.perf_counter()


def note(msg):
    print(f"[bisect +{time.perf_counter() - T0:6.1f}s] {msg}", flush=True)


LEAVES = ("means3D", "rgb_colors", "unnorm_rotations", "logit_opacities",
          "log_scales")


def rel_table(name, ga, gb, leaves=LEAVES):
    print(f"--- {name}")
    for k in leaves:
        a, b = np.asarray(ga[k]), np.asarray(gb[k])
        denom = max(float(np.max(np.abs(b))), 1e-12)
        err = np.abs(a - b)
        print(
            f"  {k:20s} p99.9 {float(np.percentile(err, 99.9))/denom:.3e}"
            f"  max {float(np.max(err))/denom:.3e}"
            f"  n>1% {int(np.sum(err > 0.01*denom)):5d}"
        )


def main():
    import jax
    import jax.numpy as jnp

    from topo4d_tpu.core.gaussian import activate_params, project_gaussians
    from topo4d_tpu.rasterizer import reference as ref
    from topo4d_tpu.rasterizer.pallas import render_gaussians_pallas
    from topo4d_tpu.rasterizer.reference import render_gaussians
    from topo4d_tpu.testing import make_head_fixture
    from topo4d_tpu.utils.profiling import sync_value

    backend = jax.devices()[0].platform
    note(f"backend {backend}")
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

    # reference: remat oracle grads
    def oracle_loss(params):
        rv = activate_params(params)
        out = render_gaussians(rv, cam0, remat=True)
        return jnp.sum(jnp.square(out.image - target))

    g_rm = {k: np.asarray(v) for k, v in
            jax.jit(jax.grad(oracle_loss))(params).items() if k in LEAVES}
    note("remat grads done")

    # A: banded forward pixels vs plain oracle forward
    out_o = render_gaussians(rv0, cam0)
    pix_o = np.asarray(out_o.image)  # (3, H, W)

    @jax.jit
    def band_fwd(params, ys):
        rv = activate_params(params)
        proj = project_gaussians(rv, cam0)
        order = ref.depth_sorted_order(proj)
        rx0, ry0, rx1, ry1, _, _ = ref.tile_rect(proj, w, h)
        rgb, _, _ = ref._render_rows(
            ys, w, proj.means2d[order], proj.conics[order],
            rv.colors[order], proj.depths[order], rv.opacities[order],
            proj.mask[order], bg,
            (rx0[order], ry0[order], rx1[order], ry1[order]))
        return rgb

    worst = 0.0
    for y0 in range(0, h, rb):
        rgb = np.asarray(band_fwd(params, jnp.arange(y0, y0 + rb)))
        want = pix_o[:, y0:y0 + rb, :].transpose(1, 2, 0)
        worst = max(worst, float(np.max(np.abs(rgb - want))))
    print(f"A: banded fwd vs oracle fwd max abs pixel diff: {worst:.3e}")

    def make_band_vg(use_ckpt):
        @jax.jit
        def vg(params, ys, target_rows):
            def loss(params):
                rv = activate_params(params)
                proj = project_gaussians(rv, cam0)
                order = ref.depth_sorted_order(proj)
                rx0, ry0, rx1, ry1, _, _ = ref.tile_rect(proj, w, h)

                def rows(ms, cs, col, dp, op, va, r0, r1, r2, r3):
                    return ref._render_rows(
                        ys, w, ms, cs, col, dp, op, va, bg,
                        (r0, r1, r2, r3))[0]

                f = jax.checkpoint(rows) if use_ckpt else rows
                rgb = f(
                    proj.means2d[order], proj.conics[order],
                    rv.colors[order], proj.depths[order],
                    rv.opacities[order], proj.mask[order],
                    rx0[order], ry0[order], rx1[order], ry1[order])
                return jnp.sum(jnp.square(rgb - target_rows))

            return jax.grad(loss)(params)

        return vg

    def band_grads(vg):
        g = None
        for y0 in range(0, h, rb):
            ys = jnp.arange(y0, y0 + rb)
            tr = jnp.transpose(target[:, y0:y0 + rb, :], (1, 2, 0))
            gb = vg(params, ys, tr)
            g = gb if g is None else jax.tree_util.tree_map(jnp.add, g, gb)
        return {k: np.asarray(v) for k, v in g.items() if k in LEAVES}

    g_plain = band_grads(make_band_vg(False))
    note("banded plain grads done")
    rel_table("B0: banded(plain) vs remat", g_plain, g_rm)
    g_ckpt = band_grads(make_band_vg(True))
    note("banded ckpt grads done")
    rel_table("B1: banded(jax.checkpoint) vs remat", g_ckpt, g_rm)

    # C: grad w.r.t. the GATHERED arrays only (projection chain outside)
    proj = project_gaussians(rv0, cam0)
    order = ref.depth_sorted_order(proj)
    rx0, ry0, rx1, ry1, _, _ = ref.tile_rect(proj, w, h)
    rect = (rx0[order], ry0[order], rx1[order], ry1[order])
    gathered = dict(
        means2d=proj.means2d[order], conics=proj.conics[order],
        colors=rv0.colors[order], depths=proj.depths[order],
        opacities=rv0.opacities[order],
    )
    valid = proj.mask[order]

    @jax.jit
    def vg_mid(gath, ys, target_rows):
        def loss(gath):
            rgb, _, _ = ref._render_rows(
                ys, w, gath["means2d"], gath["conics"], gath["colors"],
                gath["depths"], gath["opacities"], valid, bg, rect)
            return jnp.sum(jnp.square(rgb - target_rows))

        return jax.grad(loss)(gath)

    def mid_grads():
        g = None
        for y0 in range(0, h, rb):
            ys = jnp.arange(y0, y0 + rb)
            tr = jnp.transpose(target[:, y0:y0 + rb, :], (1, 2, 0))
            gb = vg_mid(gathered, ys, tr)
            g = gb if g is None else jax.tree_util.tree_map(jnp.add, g, gb)
        return {k: np.asarray(v) for k, v in g.items()}

    g_mid = mid_grads()
    note("mid grads done")
    np.savez_compressed(
        f"/tmp/probe_band_bisect_{backend}.npz",
        **{f"mid_{k}": v for k, v in g_mid.items()},
        **{f"plain_{k}": v for k, v in g_plain.items()},
        **{f"ckpt_{k}": v for k, v in g_ckpt.items()},
        **{f"remat_{k}": v for k, v in g_rm.items()},
    )
    note(f"saved /tmp/probe_band_bisect_{backend}.npz")


if __name__ == "__main__":
    import os

    if os.environ.get("TOPO4D_PROBE_CPU"):
        import jax

        jax.config.update("jax_platforms", "cpu")
    main()
